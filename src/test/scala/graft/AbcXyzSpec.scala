package graft

/** XYZ boundary behavior on crafted monthly-demand series — the
  * fixture's intermittent demand lands everything in Z, so the X and Y
  * predicates are pinned here: CV = 0 is X, CV exactly 0.5 is still X
  * (boundary inclusive), mildly variable is Y, one-spike is Z. */
class AbcXyzSpec extends SparkSpec {
  import spark.implicits._

  test("xyz classes at and around the integer CV boundaries") {
    val mq = (
      (0 until 10).map(m => (1L, m.toLong, 10L)) ++          // constant: X
      (0 until 10).map(m => (2L, m.toLong, if (m % 2 == 0) 5L else 15L)) ++ // CV=0.5: X
      (0 until 10).map(m => (3L, m.toLong, if (m % 2 == 0) 4L else 16L)) ++ // CV=0.6: Y
      Seq((4L, 0L, 100L))                                     // one spike: Z
    ).toDF("l_partkey", "mth", "mq")
    val got = graft.sql.Extras.xyzClasses(mq).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "X", 2L -> "X", 3L -> "Y", 4L -> "Z"))
  }
}
