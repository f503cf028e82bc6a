package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for each named
  * query (or all). Used to confirm filter/column pushdown into the
  * parquet scans, broadcast choices, and whole-stage-codegen coverage.
  *
  * Usage: graft.Explain <sfDir> [query,query,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // run_verify.sh always passes an outDir as args(1); anything that
    // names no known query (empty, or a path) means "all queries".
    val names: Seq[String] = {
      val asked =
        if (args.length > 1) args(1).split(",").toSeq.filter(_.nonEmpty) else Seq.empty
      val known = asked.filter(SparkEntry.queries.contains)
      if (known.nonEmpty) known else SparkEntry.queries.keys.toSeq.sorted
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
