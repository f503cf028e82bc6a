package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Writers

/** Partitioned-write round-trip: layout, dynamic partition overwrite,
  * and partition pruning on read-back. */
class WritersSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write: hive layout, dynamic overwrite, pruning on read") {
    val dir = Files.createTempDirectory("graft_writers").toString
    val df = Seq((1, 2024, 1), (2, 2024, 1), (3, 2024, 2))
      .toDF("id", "year", "month")
    Writers.processed(df, dir, Seq("year", "month"))
    val root = new java.io.File(s"$dir/year=2024")
    assert(root.isDirectory)
    assert(root.list().sorted.toSeq == Seq("month=1", "month=2"))

    // dynamic overwrite replaces only the incoming partition
    val df2 = Seq((9, 2024, 2)).toDF("id", "year", "month")
    Writers.processed(df2, dir, Seq("year", "month"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3) // month=1 rows survive, month=2 replaced
    assert(back.filter(col("month") === 2).select("id").as[Int].collect().toSeq == Seq(9))

    // partition pruning visible in the plan
    val plan = back.filter(col("month") === 1).queryExecution.executedPlan.toString
    assert(!plan.contains("month=2") )
    val pruned = back.filter(col("month") === 1)
    assert(pruned.count() == 2)
  }

  test("curated write round-trips unicode strings") {
    val dir = Files.createTempDirectory("graft_curated").toString
    val df = Seq((1, "⭐⭐⭐")).toDF("rating", "icon")
    Writers.curated(df, dir)
    val back = spark.read.parquet(dir).as[(Int, String)].collect().toSeq
    assert(back == Seq((1, "⭐⭐⭐")))
  }
}
