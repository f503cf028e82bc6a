package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Exact edit-distance similarity self-join (Ed-Join lineage,
  * Xiao/Wang/Lin 2008): every document pair within Levenshtein
  * distance [[d]], found WITHOUT the all-pairs product.
  *
  * This is the character-level member of the engine's lossless
  * candidate-generator family (set-Jaccard has the rarity-prefix
  * join, containment has pigeonhole bands, Hamming has SimHash
  * bands). The filter chain, every link a theorem:
  *
  * 1. LENGTH: ed(s,t) ≤ d ⇒ ||s|−|t|| ≤ d (each edit changes length
  *    by ≤ 1).
  * 2. GRAM-SET PREFIX: one character edit rewrites at most [[q]]
  *    of a string's q-gram windows and leaves every other window's
  *    CONTENT unchanged, so it can remove at most q values from the
  *    DISTINCT-gram set; d edits remove ≤ q·d. Hence
  *    |set(s) ∩ set(t)| ≥ |set(s)| − q·d, and by the standard prefix
  *    argument (Chaudhuri et al., SSJoin) under any shared total
  *    order on gram values, the first q·d+1 grams of each side must
  *    share a value. Set semantics are load-bearing here: the BAG
  *    version of the prefix theorem fails under an occurrence-ordinal
  *    encoding (deleting one early occurrence of a frequent gram
  *    cascades every later ordinal), so we prefix over
  *    `array_distinct` grams and never tag occurrences.
  * 3. The prefix argument needs the required overlap max(1, |A|−qd)
  *    to be ≥ 1 for a reason: when max(|s|,|t|) ≥ q·(d+1) the BAG
  *    intersection is ≥ max(|s|,|t|)−q+1−q·d ≥ 1, so a shared value
  *    exists and α = 1 is justified even for a pathologically
  *    repetitive side whose distinct-set is tiny (its prefix is then
  *    its whole set — the min(qd+1, |set|) cap is automatic because
  *    rank ≤ |set|). Pairs where BOTH sides are shorter than
  *    q·(d+1) chars carry no such guarantee, so they go through an
  *    explicit short-document fallback: all pairs within the length
  *    filter among docs with length < q·(d+1). That relation is
  *    bounded by the short-doc count squared — empty on the fixture
  *    corpus (min length 44 ≥ 39) and exercised by crafted strings
  *    in EditJoinSpec.
  * 4. VERIFY: Spark's thresholded `levenshtein(a, b, d)` — the
  *    banded O(d·min|s|) algorithm, not the O(|s|·|t|) full matrix —
  *    returns the exact distance when ≤ d and −1 past it.
  *
  * Rarity ordering (document frequency asc, gram asc — a total order
  * because gram is unique per df group) is what keeps the prefix
  * equi-join sparse: boilerplate grams shared by half the corpus
  * sort to the back and never enter a prefix unless a document has
  * nothing rarer. Scale shape: the df relation is gram-vocabulary-
  * sized; prefix rows are ≤ (q·d+1)/doc; candidates dedup BEFORE
  * verification so each surviving pair pays the banded distance once;
  * the verify joins are doc_id equi-joins AQE can broadcast when one
  * side is small. Nothing is ever all-pairs on the long-document
  * population, and the output is bounded by the true result size.
  *
  * The prefix machinery only earns its keep when grams DISCRIMINATE:
  * [[editDistancePairsImpl]] measures gram-vocabulary saturation and
  * dispatches saturated corpora to a direct length-band broadcast
  * join instead, with a counting-filter ([[graft.functions.HistL1]])
  * + banded-verify tail shared by both paths (12.5 s → 1.0 s at
  * sf0.1 on this fixture; EditJoinSpec pins path equivalence).
  *
  * Reference tie-in: the reference dedups records by exact key
  * equality only (05_inventory_reconciliation_etl.py:53
  * dropDuplicates) —
  * this operator is the typo-tolerant tier of the same dedup duty.
  *
  * Relation to [[Dedup.editDistancePairs]] (`dedup_edit_distance`):
  * that tier verifies LSH-band candidates by edit distance —
  * candidate-LOSSY (a pair that never band-collides is never seen)
  * with a length-relative threshold; this one is candidate-LOSSLESS
  * at a fixed distance bound — the same completeness split as
  * `dedup_containment_pairs` (MinHash, lossy) vs
  * `dedup_containment_banded` (pigeonhole, lossless).
  */
object EditJoin {

  /** Edit-distance threshold: pairs at distance ≤ d qualify. */
  private val d = 12
  /** Gram width. */
  private val q = 3
  /** Prefix length per the set-prefix theorem. */
  private val prefixLen = q * d + 1
  /** Both-sides-shorter-than-this pairs bypass the gram filter. */
  private val shortLen = q * (d + 1)

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "text", "length(text) AS len")

  /** (doc_a, doc_b, edit_dist) for every pair with
    * levenshtein ≤ [[d]], doc_a < doc_b, totally ordered. */
  def editDistancePairs(spark: SparkSession, dir: String): DataFrame =
    editDistancePairsImpl(docs(spark, dir))

  /** Brute force with only the trivially-correct length filter —
    * DuckDB's levenshtein is the same unit-cost metric. */
  val editDistancePairsOracle: String =
    s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
        FROM documents a JOIN documents b
          ON a.doc_id < b.doc_id
          AND abs(length(a.text) - length(b.text)) <= $d
        WHERE levenshtein(a.text, b.text) <= $d
        ORDER BY doc_a, doc_b"""

  /** Test seam: the same join over an arbitrary (doc_id, text)
    * relation, for the crafted-corpus losslessness spec. The broadcast
    * bound is overridable so the over-threshold fixture can exercise
    * the shuffle-band fallback without a 64 MB corpus. */
  private[graft] def pairsOf(docsIn: DataFrame,
      maxBroadcastBytes: Long = bandBroadcastMaxBytes): DataFrame =
    editDistancePairsImpl(
      docsIn.selectExpr("doc_id", "text", "length(text) AS len"),
      maxBroadcastBytes)

  /** Corpus-adaptive dispatch, the [[graft.llm.PrefixJoin]]
    * containment join's lesson applied here: on a gram-SATURATED
    * corpus (distinct 3-gram vocabulary smaller than the document
    * population — this fixture measures 377 grams over 5,000 docs)
    * the rarity prefixes stop discriminating: at sf0.1 the gram join
    * fanned out 4.9 M rows and its deduped candidate set was 616 k
    * pairs — 99.9 % of the length-banded pair population, i.e. the
    * expensive machinery reproduced the trivial length filter. The
    * saturated path therefore skips gram candidacy entirely:
    * a LENGTH-BAND broadcast self-join (band width d+1, probe side
    * emits the three adjacent bands, so every |Δlen| ≤ d pair appears
    * exactly once with no dedup) carries both texts inline — one
    * broadcast, zero shuffles — and the counting filter + banded
    * verify run fused in the same codegen stage. Zipfian corpora
    * (gram vocabulary ≫ docs, posting lists genuinely sparse) keep
    * the prefix join. Either way candidacy is lossless and the same
    * verify pipeline ([[verifyPairs]]) decides. The saturation probe
    * is one approx-distinct aggregate — a driver-side strategy read,
    * same as [[graft.llm.PrefixJoin.containmentFrom]]'s vocabulary
    * count.
    *
    * Scale honesty: when BOTH the corpus is huge and its grams are
    * saturated, every lossless candidate scheme (grams, segments,
    * bands) degenerates toward the quadratic truth — such a corpus
    * has a near-quadratic answer. The dispatch picks the cheaper
    * plan per regime; it cannot beat the answer's own size.
    *
    * Broadcast guard: the band join carries the whole document
    * relation WITH TEXTS on its build side, so an unguarded
    * `broadcast()` of a 100×-larger corpus would collect it to the
    * driver and die before answering. The dispatch therefore measures
    * corpus rows AND bytes (one cheap agg on the base relation) and
    * only broadcasts below [[bandBroadcastMaxBytes]]/
    * [[bandBroadcastMaxRows]]; above the bound the SAME band equi-join
    * runs as a shuffle join — identical candidates, no driver
    * collect, survives any corpus size (EditJoinSpec pins the
    * fallback plan carries no BroadcastExchange and the answer is
    * unchanged). */
  private[graft] def editDistancePairsImpl(base: DataFrame,
      maxBroadcastBytes: Long = bandBroadcastMaxBytes): DataFrame = {
    graft.functions.Native.register(base.sparkSession)
    import org.apache.spark.sql.Row
    // octet_length, not length: the guard bounds UTF-8 BYTES on the
    // build side, and a CJK-heavy corpus is up to 4 bytes per char
    val Row(nDocs: Long, totalBytes: Long) = base
      .agg(count(lit(1)).as("nd"),
        coalesce(sum(expr("octet_length(text)")), lit(0L)).as("bytes")).head()
    val Row(nGrams: Long) = base
      .selectExpr(
        s"explode(array_distinct(transform(sequence(1, greatest(len - $q + 1, 1)), " +
          s"i -> substring(text, i, $q)))) AS gram")
      .agg(expr("approx_count_distinct(gram) AS ng")).head()
    val paired =
      if (nGrams <= nDocs)
        bandScanPairs(base, broadcastBuild =
          totalBytes <= maxBroadcastBytes && nDocs <= bandBroadcastMaxRows)
      else prefixCandidatePairs(base)
    verifyPairs(paired)
  }

  /** Corpus bounds under which the band join's build side (the doc
    * relation, texts inline) may be broadcast: comfortably inside
    * executor/driver memory at local and cluster scale; above either
    * bound the band join runs as a shuffle join instead. */
  private[graft] val bandBroadcastMaxBytes: Long = 64L << 20
  private[graft] val bandBroadcastMaxRows: Long = 4L << 20

  /** Saturated-corpus candidacy: length-band self-join with texts
    * inline. The probe (left) side emits bands {b−1, b, b+1}, the
    * build side stays at its own band, and the |Δlen| ≤ d +
    * orientation filters run inside the join — no gram explode, no
    * 4.9 M-row shuffle, no distinct. Below the broadcast bound the
    * build side (the document RELATION, dimension-sized next to any
    * pair set) broadcasts for a zero-shuffle plan; above it the same
    * equi-join shuffles on the band key — same candidate set, scales
    * with the cluster instead of the driver's heap. */
  private[graft] def bandScanPairs(base: DataFrame,
      broadcastBuild: Boolean): DataFrame = {
    val probe = base.selectExpr("doc_id AS doc_a", "len AS len_a",
      "text AS text_a",
      s"explode(array(len DIV ${d + 1} - 1, len DIV ${d + 1}, " +
        s"len DIV ${d + 1} + 1)) AS band")
    val build = base.selectExpr("doc_id AS doc_b", "len AS len_b",
      "text AS text_b", s"len DIV ${d + 1} AS band")
    probe.join(if (broadcastBuild) broadcast(build) else build, Seq("band"))
      .filter(col("doc_a") < col("doc_b") &&
        abs(col("len_a") - col("len_b")) <= d)
      .select("doc_a", "doc_b", "text_a", "text_b")
  }

  /** Zipfian-corpus candidacy: the rarity-prefix gram join
    * ([[candidatesImpl]]) joined back to its texts. */
  private[graft] def prefixCandidatePairs(base: DataFrame): DataFrame = {
    val texts = base.select("doc_id", "text")
    candidatesImpl(base)
      .join(texts.selectExpr("doc_id AS doc_a", "text AS text_a"), "doc_a")
      .join(texts.selectExpr("doc_id AS doc_b", "text AS text_b"), "doc_b")
  }

  /** Shared verify: COUNTING FILTER then banded edit distance. The
    * filter is the classic frequency lower bound ed ≥ hist_l1/2
    * ([[graft.functions.HistL1]]): one ~|a|+|b| pass refutes a pair
    * before the (2d+1)·min|s| verify — on the fixture it removes
    * 99.6 % of surviving candidates (616,770 → 2,425 measured at
    * sf0.1), so the banded levenshtein runs only on near-answers. */
  private[graft] def verifyPairs(paired: DataFrame): DataFrame =
    paired
      .filter(expr(s"graft_hist_l1(text_a, text_b) <= ${2 * d}"))
      .selectExpr("doc_a", "doc_b",
        s"levenshtein(text_a, text_b, $d) AS edit_dist")
      .filter(col("edit_dist") >= 0)
      .selectExpr("doc_a", "doc_b", "CAST(edit_dist AS BIGINT) AS edit_dist")
      .orderBy("doc_a", "doc_b")

  // Deduped candidate pairs from the rarity-prefix gram join plus the
  // short-document fallback.
  private def candidatesImpl(base: DataFrame): DataFrame = {
    val grams = base
      .filter(col("len") >= q)
      .selectExpr("doc_id", "len",
        s"explode(array_distinct(transform(sequence(1, len - $q + 1), " +
          s"i -> substring(text, i, $q)))) AS gram")
    val df = grams.groupBy("gram").agg(count(lit(1)).as("df_g"))
    val ranked = grams.join(df, Seq("gram"))
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY doc_id ORDER BY df_g, gram)"))
      .filter(col("rk") <= prefixLen)
      .select("doc_id", "len", "gram")
    // The equi-join key is (gram, length band), not gram alone: with a
    // band width of d+1, ||s|−|t|| ≤ d forces band(s) and band(t) to
    // differ by at most 1 (floor division), so probing the three
    // adjacent bands loses nothing — and on a low-entropy corpus whose
    // gram vocabulary is tiny (377 three-grams at sf0.1), splitting
    // each dense gram bucket by length cuts the join's pair fan-out
    // ~13× (63.7M → 4.9M rows measured) while producing the IDENTICAL
    // candidate set. The probe side emits bands {b−1, b, b+1} so every
    // adjacent-band pair is found regardless of id order; duplicates
    // die in the existing distinct.
    val b = ranked.selectExpr("doc_id AS doc_b", "len AS len_b", "gram",
      s"len DIV ${d + 1} AS band")
    val a = ranked.selectExpr("doc_id AS doc_a", "len AS len_a", "gram",
        s"explode(array(len DIV ${d + 1} - 1, len DIV ${d + 1}, " +
          s"len DIV ${d + 1} + 1)) AS band")
    val prefixCand = a.join(b, Seq("gram", "band"))
      .filter(col("doc_a") < col("doc_b") &&
        abs(col("len_a") - col("len_b")) <= d)
      .select("doc_a", "doc_b")
    val short = base.filter(col("len") < shortLen)
    val shortCand = short.selectExpr("doc_id AS doc_a", "len AS len_a")
      .join(short.selectExpr("doc_id AS doc_b", "len AS len_b"),
        col("doc_a") < col("doc_b") &&
          abs(col("len_a") - col("len_b")) <= d)
      .select("doc_a", "doc_b")
    prefixCand.unionByName(shortCand).distinct()
  }
}
