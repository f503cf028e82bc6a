package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** The streaming READ's contract below the replication oracle's
  * reach: admission control batches by version under a file budget,
  * a non-append commit fails fast unless skipChangeCommits opts out,
  * `startingVersion=latest` tails only post-start commits, and the
  * checkpointed version offset makes a resumed drain consume exactly
  * the unseen commits. */
class LedgerStreamReadSpec extends graft.SparkSpec {
  import spark.implicits._

  private val ledger = classOf[LedgerSink].getName

  private def freshDir(tag: String) = {
    val d = Files.createTempDirectory(s"ledger_stream_read_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def append(dir: String, ids: Seq[Long], files: Int = 1,
      overwrite: Boolean = false): Unit =
    ids.toDF("id").repartition(files)
      .write.format(ledger).option("path", dir)
      .mode(if (overwrite) "overwrite" else "append").save()

  private def drain(dir: String, ckpt: String, sinkName: String,
      opts: Map[String, String]): Int = {
    val reader = spark.readStream.format(ledger).option("path", dir)
    opts.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load()
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach(p => info(s"batch ${p.batchId}: " +
      s"rows=${p.numInputRows} " +
      s"${p.sources.headOption.map(s => s"${s.startOffset}->${s.endOffset}").getOrElse("")}"))
    q.recentProgress.count(_.numInputRows > 0)
  }

  private def sunk(sinkName: String): Seq[Long] =
    spark.table(sinkName).as[Long].collect().toSeq.sorted

  test("admission control: maxFilesPerTrigger batches by version") {
    val dir = freshDir("adm")
    append(dir, Seq(1L, 2L), files = 1, overwrite = true) // v1: 1 file
    append(dir, Seq(3L, 4L), files = 1)                   // v2: 1 file
    append(dir, Seq(5L), files = 1)                       // v3: 1 file
    val n = drain(dir, freshDir("adm_ck"), "adm_sink",
      Map("maxFilesPerTrigger" -> "1"))
    // budget 1 admits exactly one 1-file version per trigger
    assert(n == 3, s"expected 3 non-empty batches, got $n")
    assert(sunk("adm_sink") == Seq(1L, 2L, 3L, 4L, 5L))
    // no budget: the whole backlog drains as one batch
    val n1 = drain(dir, freshDir("adm_ck_all"), "adm_sink_all", Map.empty)
    assert(n1 == 1, s"expected one unbounded batch, got $n1")
    assert(sunk("adm_sink_all") == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("admission control: maxBytesPerTrigger batches by version, composes with files") {
    val dir = freshDir("admb")
    append(dir, Seq(1L, 2L), files = 1, overwrite = true) // v1: 1 file, ~6 B
    append(dir, Seq(3L, 4L), files = 1)                   // v2: 1 file
    append(dir, Seq(5L), files = 1)                       // v3: 1 file
    // 1-byte budget: versions are indivisible, so each trigger still
    // advances exactly one data-bearing version — three batches
    val n = drain(dir, freshDir("admb_ck"), "admb_sink",
      Map("maxBytesPerTrigger" -> "1"))
    assert(n == 3, s"expected 3 byte-bounded batches, got $n")
    assert(sunk("admb_sink") == Seq(1L, 2L, 3L, 4L, 5L))
    // a budget covering everything: one batch
    val n1 = drain(dir, freshDir("admb_ck_all"), "admb_sink_all",
      Map("maxBytesPerTrigger" -> (64L << 20).toString))
    assert(n1 == 1, s"expected one batch under a huge byte budget, got $n1")
    // composite: byte budget loose, file budget tight — files win
    val n2 = drain(dir, freshDir("admb_ck_mix"), "admb_sink_mix",
      Map("maxBytesPerTrigger" -> (64L << 20).toString,
        "maxFilesPerTrigger" -> "1"))
    assert(n2 == 3, s"composite limit must honor the tighter budget, got $n2")
    assert(sunk("admb_sink_mix") == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("a non-append commit fails the stream unless skipChangeCommits") {
    val dir = freshDir("chg")
    append(dir, Seq(1L, 2L), overwrite = true)            // v1
    append(dir, Seq(3L))                                  // v2
    LedgerMaintenance.optimize(spark, dir, 64L << 20): Unit // v3: rewrite
    append(dir, Seq(4L))                                  // v4
    val ex = intercept[StreamingQueryException] {
      drain(dir, freshDir("chg_ck1"), "chg_fail", Map.empty)
    }
    assert(ex.getMessage.contains("non-append") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-append")))
    drain(dir, freshDir("chg_ck2"), "chg_skip",
      Map("skipChangeCommits" -> "true"))
    assert(sunk("chg_skip") == Seq(1L, 2L, 3L, 4L),
      "skipChangeCommits must skip the rewrite, not the data around it")
  }

  test("startingVersion=latest tails only post-start commits; resume is exact") {
    val dir = freshDir("tail")
    append(dir, Seq(1L, 2L), overwrite = true)            // v1 (history)
    // the memory sink can't recover a checkpoint; resume goes through
    // the ledger sink (the replication oracle's shape)
    val dst = freshDir("tail_dst")
    val ckpt = freshDir("tail_ck")
    def drainToLedger(): Unit = {
      val q = spark.readStream.format(ledger).option("path", dir)
        .option("startingVersion", "latest").load()
        .writeStream.format(ledger).option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def dstIds: Seq[Long] = LedgerSink.readManifest(
        java.nio.file.Paths.get(dst)) match {
      case None => Seq.empty // no commit yet: nothing streamed
      case Some(_) => spark.read.format(ledger).option("path", dst)
        .load().as[Long].collect().toSeq.sorted
    }
    drainToLedger()
    assert(dstIds.isEmpty, "latest must not replay history")
    append(dir, Seq(3L, 4L))                              // v2 (new)
    drainToLedger()
    assert(dstIds == Seq(3L, 4L),
      "resume from the checkpointed offset must consume exactly v2")
  }

  test("pushed stats predicate prunes streamed files") {
    val dir = freshDir("prune")
    append(dir, Seq(1L, 2L), overwrite = true)            // v1: max id 2
    append(dir, Seq(100L, 101L))                          // v2: min id 100
    val reader = spark.readStream.format(ledger).option("path", dir)
    val q = reader.load().filter(col("id") >= 100L)
      .writeStream.format("memory").queryName("prune_sink")
      .option("checkpointLocation", freshDir("prune_ck"))
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(sunk("prune_sink") == Seq(100L, 101L))
  }
}
