package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write.PhysicalWriteInfo

/** The streaming sink's exactly-once mechanics, below the oracle's
  * reach: a REPLAYED epoch commit (Structured Streaming's recovery
  * path re-commits the last epoch) must not double-append, an aborted
  * epoch must leave no files, and the AvailableNow drain must really
  * commit multiple epochs (not one big batch). */
class LedgerStreamingSpec extends graft.SparkSpec {

  private val schema = StructType(Seq(StructField("id", LongType)))

  private def freshDir(tag: String) = {
    val d = Files.createTempDirectory(s"ledger_stream_spec_$tag")
    d.toFile.deleteOnExit()
    d
  }

  private def rows(dir: java.nio.file.Path): Seq[Long] =
    spark.read.format(classOf[LedgerSink].getName)
      .option("path", dir.toString).load()
      .collect().map(_.getLong(0)).toSeq.sorted

  private def streamingWrite(dir: java.nio.file.Path) =
    new LedgerStreamingWrite(dir, schema)

  private def writeEpoch(sw: LedgerStreamingWrite, epoch: Long,
      values: Seq[Long]) = {
    val factory = sw.createStreamingWriterFactory(
      new PhysicalWriteInfo { override def numPartitions(): Int = 1 })
    val w = factory.createWriter(0, 0L, epoch)
    values.foreach(v => w.write(new GenericInternalRow(Array[Any](v))))
    Array(w.commit())
  }

  test("replayed epoch commit is idempotent (no double append)") {
    val dir = freshDir("replay")
    val sw = streamingWrite(dir)
    val msgs1 = writeEpoch(sw, 7L, Seq(1L, 2L, 3L))
    sw.commit(7L, msgs1)
    assert(rows(dir) == Seq(1L, 2L, 3L))
    // recovery path: the SAME epoch re-stages (new task attempt) and
    // re-commits — table state must not change, and the duplicate
    // staged file must be cleaned up rather than left to leak
    val msgs2 = writeEpoch(sw, 7L, Seq(1L, 2L, 3L))
    sw.commit(7L, msgs2)
    assert(rows(dir) == Seq(1L, 2L, 3L), "replayed epoch double-appended")
    // a LATER epoch still appends normally
    sw.commit(8L, writeEpoch(sw, 8L, Seq(10L)))
    assert(rows(dir) == Seq(1L, 2L, 3L, 10L))
  }

  test("aborted epoch leaves no staged files and no manifest change") {
    val dir = freshDir("abort")
    val sw = streamingWrite(dir)
    sw.commit(1L, writeEpoch(sw, 1L, Seq(5L)))
    val msgs = writeEpoch(sw, 2L, Seq(6L, 7L))
    sw.abort(2L, msgs)
    assert(rows(dir) == Seq(5L), "aborted epoch visible")
    val staged = Files.list(dir.resolve("_staging"))
    val leftover = try {
      import scala.jdk.CollectionConverters._
      staged.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("epoch-2-")).toSeq
    } finally staged.close()
    assert(leftover.isEmpty, s"aborted epoch left staged files: $leftover")
  }

  test("AvailableNow drain commits >= 4 distinct epochs exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = freshDir("drain")
    Files.delete(dir) // writeStream wants to create it
    val q = spark.readStream.format(classOf[SyntheticSource].getName)
      .option("rows", "100000").option("slices", "8")
      .option("maxRowsPerBatch", "25000").load()
      .writeStream.format(classOf[LedgerSink].getName)
      .option("path", dir.toString)
      .option("checkpointLocation", s"$dir/_checkpoint")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val entries = LedgerSink.readManifest(dir).map(_.files).getOrElse(Seq.empty)
    val epochs = entries.map(_.file).flatMap { f =>
      "epoch-(\\d+)-".r.findFirstMatchIn(f).map(_.group(1))
    }.distinct
    assert(epochs.size >= 4, s"expected >=4 epochs, saw $epochs")
    val total = spark.read.format(classOf[LedgerSink].getName)
      .option("path", dir.toString).load().count()
    assert(total == 100000L, s"exactly-once violated: $total rows")
  }
}
