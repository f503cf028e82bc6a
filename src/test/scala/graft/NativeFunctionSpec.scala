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
