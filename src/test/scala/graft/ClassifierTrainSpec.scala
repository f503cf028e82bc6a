package graft

/** The in-engine GD trainer must actually LEARN, not just run: value
  * equality with the DuckDB recurrence is the oracle's job; this spec
  * pins the training dynamics the hash can't see — the distilled
  * linear model beats the majority-class baseline by a wide margin
  * (plain uniform-rate GD scored 38% then exactly-majority 62% before
  * the diagonal-Newton preconditioner; the spec would have caught
  * both), and the outcome is partitioning-independent. */
class ClassifierTrainSpec extends SparkSpec {

  private def ledger(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("trained model beats the majority baseline by >= 15 points") {
    val m = ledger(graft.llm.TextAnalysis.classifierTrainGd(spark, sfTiny))
    val acc = m("train_acc_micro")
    val pos = m("train_pos_micro")
    val majority = math.max(pos, 1000000L - pos)
    assert(acc >= majority + 150000,
      s"trainer did not learn: acc=$acc majority=$majority")
    assert(acc >= 900000, s"accuracy regressed: $acc")
  }

  test("weights are partitioning-independent (exact integer trajectory)") {
    val base = ledger(graft.llm.TextAnalysis.classifierTrainGd(spark, sfTiny))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val alt = ledger(graft.llm.TextAnalysis.classifierTrainGd(spark, sfTiny))
      assert(alt == base, s"trajectory depends on partitioning:\n$base\n$alt")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
