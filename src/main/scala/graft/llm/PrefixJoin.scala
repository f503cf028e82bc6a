package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Gen._

/** Exact set-similarity self-join via prefix filtering (AllPairs /
  * PPJoin lineage) — the LOSSLESS candidate generator: unlike MinHash /
  * SimHash banding (probabilistic, tunable false-negative rate), prefix
  * filtering guarantees every pair with Jaccard ≥ t is a candidate.
  * Order each document's distinct tokens by GLOBAL rarity (document
  * frequency ascending); two token sets with |A∩B|/|A∪B| ≥ t MUST share
  * at least one token among each side's first |x| − ⌈t·|x|⌉ + 1 rarest
  * tokens, so an equi-join on prefix tokens finds all qualifying pairs
  * while common tokens (the quadratic blowup) never enter the join.
  *
  * Everything is integer arithmetic: the prefix length uses
  * ⌈4s/5⌉ = (4s+4) DIV 5 exactly, and the verify threshold
  * inter/union ≥ 4/5 is the cross-multiplication 5·inter ≥ 4·union —
  * no float appears anywhere except the reported jaccard readout.
  *
  * Scale shape: token df is one map-side-combined agg; the global
  * order ships to each doc's tokens via an equi-join on the token key
  * (the df relation is vocabulary-sized); candidates come from the
  * prefix-token equi-join (bounded by rare-token occupancy — the
  * frequency ordering exists precisely to keep that join sparse); and
  * verification joins only candidate pairs back to their token lists.
  * This is the standard exact-dedup shape at corpus scale when a
  * false-negative budget of zero is the requirement LSH can't meet.
  */
object PrefixJoin {

  // Jaccard threshold 4/5 = 0.8, kept as a ratio for integer math
  private val tNum = 4
  private val tDen = 5

  // per-doc partner cap for the output-bounded variant
  private val topK = 5

  /** The verified pair set (doc_a < doc_b, inter, uni, jaccard),
    * unordered — shared by [[prefixFilterPairs]] and
    * [[prefixFilterTopK]] through the staged-zone side-table (one
    * build per bench session; Verify measures the cold path). */
  def verifiedPairs(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache.sideTable(spark, "prefix_pairs", dir) {
      buildPairs(spark, dir)
    }

  private def buildPairs(spark: SparkSession, dir: String): DataFrame = {
    // the distinct-token ARRAY rides alongside the exploded rows: the
    // verify step intersects arrays per candidate pair (one codegen'd
    // hash-intersect per row) instead of re-joining each pair against
    // its token LISTS — on a boilerplate-heavy corpus the qualifying
    // pairs are near-quadratic, and the list-join formulation pushed
    // |pairs|·|tokens| rows through two shuffles (measured 73 s at
    // sf0.1; the array form verifies each pair with one codegen'd
    // merge-walk against the doc→array relation — AQE-broadcast when
    // small, doc_id shuffle join otherwise — and runs in a few seconds)
    // both checkpoints bound RECOMPUTATION, not size: docsArr is
    // corpus-row-sized and prefix is ~sz/5 rows per doc, but each is
    // referenced twice by the self-join (and docsArr twice more by the
    // verify), so without them the tokenize+df+window lineage runs 4×
    graft.functions.Native.register(spark)
    // arrays are SORTED once here so verification can merge-walk
    // (graft_sorted_inter) instead of hash-building per pair
    val docsArr = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        s"sort_array(${arrDistinct(words("lower(text)", SparkD), SparkD)}) AS toks")
      .selectExpr("doc_id", "toks", "size(toks) AS sz")
      .transform(graft.ops.Checkpoints.cut)
    val toks = docsArr.select(col("doc_id"), col("sz"),
      explode(col("toks")).as("tok"))
    val dfT = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = toks.join(dfT, Seq("tok"))
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY doc_id ORDER BY df, tok)"))
    val prefix = ranked.filter(
      expr(s"rk <= sz - (($tNum * sz + $tNum) DIV $tDen) + 1"))
      .select("doc_id", "tok", "sz", "rk")
      .transform(graft.ops.Checkpoints.cut)
    // the pre-distinct pair stream repeats a pair once per shared
    // prefix token — project it down to the two ids BEFORE the
    // distinct so the dedup shuffle moves 16 bytes/row, not the
    // token/size payload (the size + positional filters run
    // pre-projection)
    val cand = prefix.selectExpr("doc_id AS doc_a", "tok", "sz AS sz_a",
        "rk AS pa")
      .join(prefix.selectExpr("doc_id AS doc_b", "tok", "sz AS sz_b",
        "rk AS pb"), Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      // size filter: |B| ≥ t·|A| is necessary for Jaccard ≥ t
      .filter(expr(s"$tDen * sz_b >= $tNum * sz_a AND $tDen * sz_a >= $tNum * sz_b"))
      // PPJoin positional filter: Jaccard ≥ t needs overlap
      // o ≥ ⌈tNum·(sz_a+sz_b)/(tNum+tDen)⌉, and a shared token at
      // positions (pa, pb) of the two globally-ordered token lists
      // admits at most 1 + min(sz_a − pa, sz_b − pb) overlap beyond
      // any common tokens BEFORE it. The first shared token (the
      // global rarity order is shared, so "first" is consistent on
      // both sides) has zero common-before, making the bound valid
      // and the test guaranteed to pass for every true pair — so
      // keeping pairs with ANY passing row is lossless (the
      // completeness spec pins it against brute force). Rows failing
      // the test vanish BEFORE the distinct: pruned rows never enter
      // the candidate dedup shuffle. Integer form of
      // (1+m) ≥ ⌈tNum·S/(tNum+tDen)⌉ via a ≥ ⌈p/q⌉ ⟺ q·a ≥ p.
      .filter(expr(s"${tNum + tDen} * (1 + least(sz_a - pa, sz_b - pb)) " +
        s">= $tNum * (sz_a + sz_b)"))
      .select("doc_a", "doc_b").distinct()
    // doc→array is corpus-row-sized; at fixture scale it is tiny next
    // to the pair set and SHOULD broadcast, but an explicit broadcast()
    // hint is honored unconditionally by the planner — at corpus scale
    // it would try to collect the whole doc→token-array relation to
    // the driver and die at the 8 GB broadcast hard limit rather than
    // degrade. So: NO hint. The checkpointed relation carries no stats,
    // which means the static plan is a doc_id shuffle join — the shape
    // that survives any corpus size — and AQE converts it to a
    // broadcast join at runtime from the OBSERVED shuffle size whenever
    // the side actually fits under the threshold. Small corpus →
    // runtime broadcast (measured equal to the old hinted plan); big
    // corpus → the shuffle join just runs. PlanContractSpec pins the
    // fallback by forcing the thresholds to -1 and asserting no
    // broadcast appears while results stay identical.
    cand
      .join(docsArr.selectExpr(
        "doc_id AS doc_a", "toks AS toks_a", "sz AS sz_a"), Seq("doc_a"))
      .join(docsArr.selectExpr(
        "doc_id AS doc_b", "toks AS toks_b", "sz AS sz_b"), Seq("doc_b"))
      .selectExpr("doc_a", "doc_b",
        "graft_sorted_inter(toks_a, toks_b) AS inter", "sz_a", "sz_b")
      .selectExpr("doc_a", "doc_b", "CAST(inter AS BIGINT) AS inter",
        "CAST(sz_a + sz_b - inter AS BIGINT) AS uni")
      .filter(s"$tDen * inter >= $tNum * uni")
      .selectExpr("doc_a", "doc_b", "inter", "uni",
        "CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard")
  }

  def prefixFilterPairs(spark: SparkSession, dir: String): DataFrame =
    verifiedPairs(spark, dir).orderBy("doc_a", "doc_b")

  /** Output-bounded variant: each document's [[topK]] most-similar
    * partners instead of every pair above threshold. On a
    * boilerplate-heavy corpus the all-pairs output is near-quadratic
    * (the fixture's regenerated corpus qualifies ~30k pairs from 500
    * docs); a per-doc cap bounds the OUTPUT at k·|docs| no matter how
    * self-similar the corpus is — the shape a downstream consumer
    * (cluster collapse, canonical selection) actually wants. The cap
    * is a doc_id-partitioned window over the symmetrized pair set:
    * shuffle by doc, per-doc heap-sized sort, never global. Ties are
    * totally ordered (jaccard is one exact division of the same two
    * BIGINTs in both engines; partner_id breaks exact ties). */
  def prefixFilterTopK(spark: SparkSession, dir: String): DataFrame = {
    val p = verifiedPairs(spark, dir)
    val sym = p.selectExpr("doc_a AS doc_id", "doc_b AS partner_id",
        "inter", "uni", "jaccard")
      .unionByName(p.selectExpr("doc_b AS doc_id", "doc_a AS partner_id",
        "inter", "uni", "jaccard"))
    sym.withColumn("rank", expr(
        "row_number() OVER (PARTITION BY doc_id " +
          "ORDER BY jaccard DESC, partner_id)"))
      .filter(col("rank") <= topK)
      .selectExpr("doc_id", "partner_id", "inter", "uni", "jaccard",
        "CAST(rank AS INTEGER) AS rank")
      .orderBy("doc_id", "rank")
  }

  val prefixFilterPairsOracle: String =
    s"""WITH $pairsCtes
        SELECT doc_a, doc_b, inter, uni, jaccard FROM pairs_t
        ORDER BY doc_a, doc_b"""

  /** Shared CTE prefix of [[prefixFilterPairsOracle]] up to the
    * verified pair set (no ORDER BY). */
  private def pairsCtes: String = {
    val d = DuckD
    s"""docs_arr AS (
          SELECT doc_id, ${arrDistinct(words("lower(text)", d), d)} AS toks
          FROM documents),
        sized AS (SELECT doc_id, toks, ${arrLen("toks", d)} AS sz FROM docs_arr),
        toks AS (SELECT doc_id, sz, unnest(toks) AS tok FROM sized),
        df_t AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
        ranked AS (
          SELECT t.doc_id, t.tok, t.sz,
            row_number() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.tok) AS rk
          FROM toks t JOIN df_t f ON t.tok = f.tok),
        prefix AS (
          SELECT doc_id, tok, sz, rk FROM ranked
          WHERE rk <= sz - (($tNum * sz + $tNum) // $tDen) + 1),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.sz AS sz_a, b.sz AS sz_b
          FROM prefix a JOIN prefix b ON a.tok = b.tok
            AND a.doc_id < b.doc_id
          WHERE $tDen * b.sz >= $tNum * a.sz
            AND $tDen * a.sz >= $tNum * b.sz
            AND ${tNum + tDen} * (1 + least(a.sz - a.rk, b.sz - b.rk))
              >= $tNum * (a.sz + b.sz)),
        inter_t AS (
          SELECT c.doc_a, c.doc_b,
            CAST(${interSize("sa.toks", "sb.toks", d)} AS BIGINT) AS inter,
            CAST(c.sz_a + c.sz_b - ${interSize("sa.toks", "sb.toks", d)} AS BIGINT) AS uni
          FROM cand c
          JOIN sized sa ON sa.doc_id = c.doc_a
          JOIN sized sb ON sb.doc_id = c.doc_b),
        pairs_t AS (
          SELECT doc_a, doc_b, inter, uni,
            CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
          FROM inter_t
          WHERE $tDen * inter >= $tNum * uni)"""
  }

  val prefixFilterTopKOracle: String =
    s"""WITH $pairsCtes,
        sym AS (
          SELECT doc_a AS doc_id, doc_b AS partner_id, inter, uni, jaccard
          FROM pairs_t
          UNION ALL
          SELECT doc_b AS doc_id, doc_a AS partner_id, inter, uni, jaccard
          FROM pairs_t),
        rk_t AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY jaccard DESC, partner_id) AS rank
          FROM sym)
        SELECT doc_id, partner_id, inter, uni, jaccard,
          CAST(rank AS INTEGER) AS rank
        FROM rk_t WHERE rank <= $topK
        ORDER BY doc_id, rank"""

  // ---- banded containment join (asymmetric near-dup) ----

  // containment threshold 9/10 and the size band |big| <= 2 |small|
  private val cNum = 9
  private val cDen = 10

  /** Asymmetric containment pairs, LOSSLESS within the band — closes
    * the false-negative gap [[graft.llm.Dedup.containmentPairs]]
    * documents (its candidates come from MinHash bands, and a true
    * containment pair with low RESEMBLANCE may never share a band;
    * these candidates come from the prefix lemma, so within the size
    * band every qualifying pair is guaranteed found).
    *
    * C(A→B) = |A∩B|/|A| ≥ 9/10 with
    * the size band |B| ≤ 2·|A|: the quote-plus-commentary duplicate
    * Jaccard structurally misses (A ⊂ B with B twice A's size has
    * Jaccard ≤ ½ — invisible at any symmetric threshold, yet exactly
    * the expansion-dup a curation pass wants). The band is the SCALE
    * CONTRACT, not a shortcut: unbounded containment search cannot
    * bound the container's prefix (a token of A may sit anywhere in
    * an arbitrarily large B), so the lossless self-join form exists
    * only per size band — within it, overlap ≥ ⌈9·szA/10⌉ ≥
    * ⌈9·szB/20⌉ gives BOTH sides a rarity-ordered prefix, and the
    * classic prefix lemma (overlap ≥ o ⇒ the two (sz−o+1)-prefixes
    * intersect) applies; outside it you build an inverted index
    * (the [[graft.llm.LanguageModel.postingLists]] shape) and probe.
    * Bigger bands = longer container prefixes, same plan. Verify is
    * the exact merge-walk intersect; direction is size (tie: id).
    * Top-200 by containment keeps the output bounded; the ordering
    * is total.
    *
    * Cost note: this fixture is vocabulary-saturated (31 distinct
    * words across every doc — [[graft.llm.TextAnalysis.zipfSlope]]
    * measures −0.16 against natural text's ≈ −1), so the TRUE
    * banded-containment answer is near-quadratic in docs and the
    * rarity prefixes stop pruning (85 % of ordered pairs survived the
    * prefix join at sf0.1). [[containmentFrom]] exploits the same
    * saturation instead: vocab ≤ 64 → token sets become single-long
    * bitmasks, pair math collapses to distinct-set grain with one
    * popcount per pair, and the top-200 is recovered through a
    * provably lossless minimal-pair bound without expanding the
    * quadratic answer (23 s → ~4.5 s cold at sf0.1). Zipfian corpora
    * keep the prefix join, whose sparse candidates are the right
    * plan there. Like [[verifiedPairs]], the build stages once per
    * session; Verify still measures the cold path. */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache.sideTable(spark, "containment_banded", dir) {
      buildContainment(spark, dir)
    }

  private def buildContainment(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Native.register(spark)
    val docsArr = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        s"sort_array(${arrDistinct(words("lower(text)", SparkD), SparkD)}) AS toks")
      .selectExpr("doc_id", "toks", "size(toks) AS sz")
      .transform(graft.ops.Checkpoints.cut)
    containmentFrom(docsArr)
  }

  /** Corpus-adaptive dispatch between the two lossless containment
    * plans. On a vocabulary-saturated corpus (the regime the cost
    * note above describes — THIS fixture's 31-word vocabulary) the
    * rarity prefixes stop pruning: measured at sf0.1, 10.7 M of the
    * 12.5 M ordered doc pairs survive the prefix join and each pays
    * an array merge-walk verify (~23 s isolated, worse under fleet
    * memory pressure). But saturation is also an OPPORTUNITY: when
    * the distinct-token vocabulary fits 64 bits, a token set IS a
    * bitmask — dictionary-encode once, collapse docs to distinct
    * masks, and the verify becomes one AND+popcount per DISTINCT-SET
    * pair. That path is [[maskedContainment]]; Zipfian corpora (large
    * vocab, sparse prefixes) keep the prefix-join plan, which is the
    * one that scales there. The vocabulary count is a driver-side
    * strategy read (like the AQE-style reads documented in
    * [[graft.ops.Scale]]) against the checkpointed docsArr — one
    * cheap distinct-count, not a data collect.
    *
    * Mask-count guard: the masked path's set-pair join is a broadcast
    * nested loop over the DISTINCT-MASK relation, and "thousands of
    * rows by construction" is data-dependent, not guaranteed — a
    * ≤64-token vocabulary still admits up to 2^vocab distinct subsets,
    * so an adversarial corpus could blow the masks² BNLJ up. The
    * dispatch therefore also requires the distinct token-SET count
    * (distinct sorted arrays ≡ distinct masks, one agg on the
    * checkpointed docsArr) at or below [[maskedMaxMasks]]; above it
    * the prefix join runs — also lossless, same answer, no quadratic
    * mask product (ContainmentMaskedSpec pins the fallback). */
  private[graft] def containmentFrom(docsArr: DataFrame,
      maxMasks: Long = maskedMaxMasks): DataFrame = {
    val vocab = docsArr
      .select(explode(col("toks")).as("tok")).distinct()
    if (vocab.count() <= 64 &&
        docsArr.select(col("toks")).distinct().count() <= maxMasks)
      maskedContainment(docsArr, vocab)
    else prefixContainment(docsArr)
  }

  /** Distinct-mask bound for the masked path: 2^16 masks keep the
    * masks² popcount BNLJ around 4·10⁹ cheap comparisons — bounded
    * work regardless of corpus row count. */
  private[graft] val maskedMaxMasks: Long = 1L << 16

  /** Saturated-vocabulary fast path: dictionary-encode tokens to bit
    * positions, fold each doc's token set into ONE 64-bit mask
    * (`bit_or(1L << tid)`), and collapse the corpus to its distinct
    * masks. All pair math then happens at DISTINCT-SET grain —
    * `bit_count(mask_s & mask_b)` is the exact intersection size, so
    * the same integer cross-multiplication threshold applies with no
    * arrays and no merge-walk. The set-pair join is a broadcast
    * nested-loop over the mask relation (thousands of rows on a
    * saturated corpus by construction — saturation is WHY distinct
    * sets are few), never over docs.
    *
    * The top-200 output is recovered WITHOUT expanding the
    * near-quadratic doc-pair answer, via a minimal-pair bound: a
    * set-pair's expanded doc pairs all share its containment value,
    * so its best-ranked doc pair uses each side's smallest member
    * ids; and if a set-pair contributes ANY top-200 doc pair, its
    * minimal pair ranks ≤ the 200th pair overall. Minimal pairs of
    * distinct set-pairs are distinct doc pairs, so AT MOST 200
    * set-pairs can contribute — TakeOrdered(200) on set-pair minimal
    * keys is provably lossless. Expansion then joins only those ≤200
    * set-pairs against members capped at the 201 smallest ids per
    * set (a doc ranked >201 on its side has ≥200 same-containment,
    * smaller-id pairs ahead of it, so it cannot reach the top-200) —
    * a viral group of 10⁶ identical docs costs 201 rows here, not
    * C(10⁶,2). */
  private[graft] def maskedContainment(docsArr: DataFrame,
      vocab: DataFrame): DataFrame = {
    val dict = vocab.withColumn("tid",
      expr("row_number() OVER (ORDER BY tok) - 1"))
    val masks = docsArr
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(broadcast(dict), Seq("tok"))
      .groupBy("doc_id")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), tid))").as("mask"))
    val sets = masks.groupBy("mask")
      .agg(count(lit(1)).as("members"), min("doc_id").as("min1"))
      .selectExpr("mask", "CAST(bit_count(mask) AS INT) AS sz",
        "members", "min1")
      .filter("sz >= 1") // empty token sets never enter the prefix join
      .transform(graft.ops.Checkpoints.cut)
    // members capped at the 201 smallest ids per set (see scaladoc);
    // rn 1..2 double as each set's minimal intra pair
    val m201 = masks
      .withColumn("rn",
        expr("row_number() OVER (PARTITION BY mask ORDER BY doc_id)"))
      .filter("rn <= 201")
      .transform(graft.ops.Checkpoints.cut)
    val s = sets.selectExpr("mask AS mask_s", "sz AS sz_s", "min1 AS min1_s")
    val b = sets.selectExpr("mask AS mask_b", "sz AS sz_b", "min1 AS min1_b")
    // cross-set candidates: orientation small→big by (sz, mask), the
    // size band, and the containment threshold — one popcount each.
    // Equal sizes tie-break ASYMMETRICALLY on the mask (an unordered
    // set-pair must enter once): inter and containment are symmetric
    // when sz_s = sz_b, and the per-doc-pair orientation happens at
    // expansion, so which side is "s" is immaterial — but emitting
    // BOTH orientations would duplicate every expanded doc pair and
    // let duplicates evict genuine contributors from the top-200
    val cross = b.join(broadcast(s), expr(
        s"""(sz_s < sz_b OR (sz_s = sz_b AND mask_s < mask_b))
            AND sz_b <= 2 * sz_s
            AND $cDen * CAST(bit_count(mask_s & mask_b) AS INT)
                >= $cNum * sz_s"""))
      .selectExpr("mask_s", "mask_b", "sz_s", "sz_b",
        "CAST(bit_count(mask_s & mask_b) AS INT) AS inter",
        // minimal pair: sizes differ → (min_s, min_b); equal sizes
        // orient per-doc by id, so the global min id is contained and
        // the other set's min is its best container
        "IF(sz_s < sz_b, min1_s, least(min1_s, min1_b)) AS c1",
        "IF(sz_s < sz_b, min1_b, greatest(min1_s, min1_b)) AS c2")
    val intra = sets.filter("members >= 2")
      .join(m201.filter("rn = 2").selectExpr("mask", "doc_id AS min2"),
        Seq("mask"))
      .selectExpr("mask AS mask_s", "mask AS mask_b", "sz AS sz_s",
        "sz AS sz_b", "sz AS inter", "min1 AS c1", "min2 AS c2")
    val top = cross.unionByName(intra)
      .selectExpr("mask_s", "mask_b", "sz_s", "sz_b", "inter",
        "CAST(inter AS DOUBLE) / CAST(sz_s AS DOUBLE) AS cont", "c1", "c2")
      .orderBy(desc("cont"), asc("c1"), asc("c2"))
      .limit(200)
    top
      .join(m201.selectExpr("mask AS mask_s", "doc_id AS doc_sm"),
        Seq("mask_s"))
      .join(m201.selectExpr("mask AS mask_b", "doc_id AS doc_bg"),
        Seq("mask_b"))
      // intra set-pairs enumerate members × members: keep one
      // orientation; cross pairs draw from disjoint sets, no dup
      .filter("mask_s <> mask_b OR doc_sm < doc_bg")
      .selectExpr(
        "IF(sz_s < sz_b, doc_sm, least(doc_sm, doc_bg)) AS contained_id",
        "IF(sz_s < sz_b, doc_bg, greatest(doc_sm, doc_bg)) AS container_id",
        "CAST(inter AS BIGINT) AS inter",
        "CAST(sz_s AS BIGINT) AS sz_small", "CAST(sz_b AS BIGINT) AS sz_big",
        "CAST(inter AS DOUBLE) / CAST(sz_small AS DOUBLE) AS containment")
      .orderBy(desc("containment"), asc("contained_id"), asc("container_id"))
      .limit(200)
  }

  /** Zipfian-corpus path: the classic rarity-prefix self-join (see
    * the class scaladoc) — sparse prefixes keep the candidate join
    * linear-ish in the answer; verify is the exact merge-walk. */
  private[graft] def prefixContainment(docsArr: DataFrame): DataFrame = {
    val toks = docsArr.select(col("doc_id"), col("sz"),
      explode(col("toks")).as("tok"))
    val dfT = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = toks.join(dfT, Seq("tok"))
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY doc_id ORDER BY df, tok)"))
      .transform(graft.ops.Checkpoints.cut)
    // small side: overlap >= ceil(9 sz/10); big side (<= 2x small):
    // overlap >= ceil(9 sz/20)
    val prefS = ranked.filter(
      expr(s"rk <= sz - (($cNum * sz + $cDen - 1) DIV $cDen) + 1"))
    val prefB = ranked.filter(
      expr(s"rk <= sz - (($cNum * sz + 2 * $cDen - 1) DIV (2 * $cDen)) + 1"))
    val cand = prefS.selectExpr("doc_id AS doc_s", "tok", "sz AS sz_s")
      .join(prefB.selectExpr("doc_id AS doc_b", "tok", "sz AS sz_b"),
        Seq("tok"))
      .filter("doc_s <> doc_b")
      // orient: small ⊆ big by size then id; band |big| <= 2 |small|
      .filter("(sz_s < sz_b OR (sz_s = sz_b AND doc_s < doc_b)) " +
        "AND sz_b <= 2 * sz_s")
      .select("doc_s", "doc_b").distinct()
    cand
      .join(docsArr.selectExpr(
        "doc_id AS doc_s", "toks AS toks_s", "sz AS sz_s"), Seq("doc_s"))
      .join(docsArr.selectExpr(
        "doc_id AS doc_b", "toks AS toks_b", "sz AS sz_b"), Seq("doc_b"))
      .selectExpr("doc_s AS contained_id", "doc_b AS container_id",
        "CAST(graft_sorted_inter(toks_s, toks_b) AS BIGINT) AS inter",
        "CAST(sz_s AS BIGINT) AS sz_small", "CAST(sz_b AS BIGINT) AS sz_big")
      .filter(s"$cDen * inter >= $cNum * sz_small")
      .selectExpr("contained_id", "container_id", "inter", "sz_small",
        "sz_big",
        "CAST(inter AS DOUBLE) / CAST(sz_small AS DOUBLE) AS containment")
      .orderBy(desc("containment"), asc("contained_id"), asc("container_id"))
      .limit(200)
  }

  val containmentPairsOracle: String =
    s"""WITH docs_t AS (SELECT doc_id,
          list_sort(${arrDistinct(words("lower(text)", DuckD), DuckD)}) AS toks
        FROM documents),
      docs_a AS (SELECT doc_id, toks, len(toks) AS sz FROM docs_t),
      tk AS (SELECT doc_id, sz, unnest(toks) AS tok FROM docs_a),
      dft AS (SELECT tok, count(*) AS df FROM tk GROUP BY tok),
      rk_t AS (SELECT tk.doc_id, tk.sz, tk.tok,
          row_number() OVER (PARTITION BY tk.doc_id ORDER BY dft.df, tk.tok) AS rk
        FROM tk JOIN dft ON tk.tok = dft.tok),
      pref_s AS (SELECT * FROM rk_t
        WHERE rk <= sz - (($cNum * sz + $cDen - 1) // $cDen) + 1),
      pref_b AS (SELECT * FROM rk_t
        WHERE rk <= sz - (($cNum * sz + 2 * $cDen - 1) // (2 * $cDen)) + 1),
      cand AS (SELECT DISTINCT s.doc_id AS doc_s, b.doc_id AS doc_b
        FROM pref_s s JOIN pref_b b ON s.tok = b.tok
        WHERE s.doc_id <> b.doc_id
          AND (s.sz < b.sz OR (s.sz = b.sz AND s.doc_id < b.doc_id))
          AND b.sz <= 2 * s.sz),
      ver AS (SELECT c.doc_s AS contained_id, c.doc_b AS container_id,
          CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
          CAST(a.sz AS BIGINT) AS sz_small, CAST(b.sz AS BIGINT) AS sz_big
        FROM cand c
        JOIN docs_a a ON c.doc_s = a.doc_id
        JOIN docs_a b ON c.doc_b = b.doc_id)
      SELECT contained_id, container_id, inter, sz_small, sz_big,
        CAST(inter AS DOUBLE) / CAST(sz_small AS DOUBLE) AS containment
      FROM ver WHERE $cDen * inter >= $cNum * sz_small
      ORDER BY containment DESC, contained_id, container_id LIMIT 200"""
}
