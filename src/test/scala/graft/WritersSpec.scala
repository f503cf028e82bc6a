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

  test("compaction rewrites a many-small-file dataset into few files") {
    val src = Files.createTempDirectory("graft_frag").toString
    val dst = Files.createTempDirectory("graft_compact").toString
    spark.range(0, 10000).toDF("id")
      .repartition(50) // simulate per-event micro-batch accretion
      .write.mode("overwrite").parquet(src)
    val before = new java.io.File(src).list().count(_.endsWith(".parquet"))
    assert(before == 50)
    val n = Writers.compacted(spark.read.parquet(src), dst, 64L * 1024 * 1024)
    val after = new java.io.File(dst).list().count(_.endsWith(".parquet"))
    assert(n == 1 && after == 1)
    assert(spark.read.parquet(dst).count() == 10000)
  }

  test("quarantined csv read splits clean rows from malformed lines") {
    val dir = Files.createTempDirectory("graft_quarantine").toString
    val f = new java.io.PrintWriter(s"$dir/in.csv")
    f.println("id,qty"); f.println("1,10"); f.println("2,notanumber")
    f.println("3,30"); f.close()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("qty", org.apache.spark.sql.types.IntegerType)))
    val (clean, bad) = graft.io.Readers.csvQuarantined(spark, schema, dir)
    assert(clean.select("id").as[Int].collect().sorted.toSeq == Seq(1, 3))
    assert(bad.as[String].collect().toSeq == Seq("2,notanumber"))
  }

  test("schema evolution: widened batch merges with mergeSchema on read") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    // v1 batch: (id, qty); v2 adds a discount column (the inventory
    // old/new generational split, done at the storage layer)
    Seq((1, 10), (2, 20)).toDF("id", "qty")
      .write.mode("append").parquet(dir)
    Seq((3, 30, 0.1)).toDF("id", "qty", "discount")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "qty", "discount"))
    assert(merged.count() == 3)
    val d = merged.filter(col("id") === 1).select("discount").collect().head
    assert(d.isNullAt(0)) // old rows surface NULL for the new column
  }

  test("curated write round-trips unicode strings") {
    val dir = Files.createTempDirectory("graft_curated").toString
    val df = Seq((1, "⭐⭐⭐")).toDF("rating", "icon")
    Writers.curated(df, dir)
    val back = spark.read.parquet(dir).as[(Int, String)].collect().toSeq
    assert(back == Seq((1, "⭐⭐⭐")))
  }

  test("sorted zone: keys co-located per file, rows sorted within each file") {
    val dir = Files.createTempDirectory("graft_sorted_zone").toString
    val ev = graft.io.Tables.events(spark, sfTiny)
      .select("event_id", "user_id", "ts")
    Writers.sortedZone(ev, dir, "user_id",
      Seq("user_id", "ts", "event_id"), numFiles = 4)

    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length > 1, "fixture session writes multiple files")

    // every user's rows live in exactly one file (clustering), and
    // each file is sorted by the declared sort key (the property row-
    // group skipping and delta encoding actually depend on)
    val perFile = files.map { f =>
      f -> spark.read.parquet(f)
        .select("user_id", "ts", "event_id")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    }
    perFile.foreach { case (f, rows) =>
      assert(rows.sameElements(rows.sortBy(identity)), s"$f not sorted")
    }
    val owners = perFile.flatMap { case (f, rows) =>
      rows.map(_._1).distinct.map(_ -> f) }
    owners.groupBy(_._1).foreach { case (u, fs) =>
      assert(fs.map(_._2).distinct.length == 1, s"user $u split across files")
    }
    // nothing lost in the rewrite
    assert(perFile.map(_._2.length).sum == ev.count())
  }
}
