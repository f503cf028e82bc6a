package graft

import org.apache.spark.sql.functions._
import graft.functions.Native
import graft.llm.Gen

/** Native codegen ArrayDotProduct: equality with the unrolled
  * expression form (bit-exact), null handling, and arbitrary dims. */
class NativeFunctionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot == unrolled 64-term expression, bit-exact, on real vectors") {
    Native.register(spark)
    val unrolled = (0 until 64).map(i => s"v[$i] * v[$i]").mkString(" + ")
    val df = graft.io.Tables.embeddings(spark, sfTiny)
      .selectExpr("vec_id", s"${Gen.toDoubleArr("embedding", Gen.SparkD)} AS v")
      .selectExpr("vec_id", "graft_dot(v, v) AS nat", s"$unrolled AS unr")
    val rows = df.select("nat", "unr").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, u) => n == u })
  }

  test("GraftExtensions installs graft_dot at session build time") {
    import org.apache.spark.sql.SparkSession
    val base = spark // shared context stays up
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // fresh sessionState on the same context — graft_dot must come
      // from the extensions, not from any earlier Native.register call
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val got = s2.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(got == 11.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("graft_dot handles arbitrary dims and nulls") {
    Native.register(spark)
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(4.0, 5.0, 6.0))),
      (None, Some(Array(1.0))),
      (Some(Array(2.0)), Some(Array(8.0))))
      .toDF("a", "b")
      .selectExpr("graft_dot(a, b) AS d")
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(32.0), None, Some(16.0)))
  }
}
