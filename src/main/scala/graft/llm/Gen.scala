package graft.llm

/** SQL-text generators shared by the Spark side (via `expr(...)`) and
  * the DuckDB oracle, parameterized only where the dialects diverge
  * (array indexing base, list vs array function names, bit operators).
  * Generating both sides from one builder is what makes the LLM
  * operators bit-reproducible across engines: identical operation
  * shape → identical IEEE-754 results.
  */
object Gen {

  sealed trait Dialect
  case object SparkD extends Dialect
  case object DuckD extends Dialect

  /** Array element i (0-based logical index). */
  def idx(arr: String, i: Int, d: Dialect): String = d match {
    case SparkD => s"$arr[$i]"
    case DuckD  => s"$arr[${i + 1}]"
  }

  def arrLen(arr: String, d: Dialect): String = d match {
    case SparkD => s"size($arr)"
    case DuckD  => s"len($arr)"
  }

  /** Whitespace tokenization of trimmed text. */
  def words(text: String, d: Dialect): String = d match {
    case SparkD => s"split(trim($text), '\\\\s+')"
    case DuckD  => s"regexp_split_to_array(trim($text), '\\s+')"
  }

  /** Integer (floor-toward-zero) division — both engines floor-divide
    * non-negative operands identically; only used with n >= 0 here. */
  def intDiv(a: String, b: String, d: Dialect): String = d match {
    case SparkD => s"($a DIV $b)"
    case DuckD  => s"($a // $b)"
  }

  /** Count of regex matches. */
  def reCount(s: String, re: String, d: Dialect): String = d match {
    case SparkD => s"size(regexp_extract_all($s, '$re', 0))"
    case DuckD  => s"len(regexp_extract_all($s, '$re'))"
  }

  /** Spark-only let binding: evaluate `bound` once per row, name it
    * `v`, use it in `body`. Catalyst inlines shared subexpressions
    * textually through projection collapse, so a words array
    * referenced inside a transform lambda would otherwise re-run the
    * regex split per ELEMENT (O(tokens²) regex work per row — measured
    * 14s on text_contamination at sf0.1 before this binding); routing
    * it through a single-element-array HOF forces one evaluation, and
    * the optimizer cannot substitute through the lambda variable.
    * DuckDB oracles bind via CTE columns instead and don't need it. */
  def let1(bound: String, v: String, body: String): String =
    s"transform(array($bound), $v -> $body)[0]"

  /** Distinct word 3-gram shingles of a `words` array expression. */
  def shingles(w: String, d: Dialect): String = d match {
    case SparkD =>
      s"CASE WHEN size($w) >= 3 THEN array_distinct(transform(sequence(0, size($w) - 3), " +
        s"i -> concat(element_at($w, i + 1), ' ', element_at($w, i + 2), ' ', element_at($w, i + 3)))) " +
        s"ELSE array() END"
    case DuckD =>
      s"CASE WHEN len($w) >= 3 THEN list_distinct(list_transform(range(1, len($w) - 1), " +
        s"i -> concat($w[i], ' ', $w[i + 1], ' ', $w[i + 2]))) " +
        s"ELSE [] END"
  }

  /** Word 3-grams WITHOUT distinct-ing (the multiset form — repetition
    * analysis needs the duplicates [[shingles]] throws away). */
  def grams3(w: String, d: Dialect): String = d match {
    case SparkD =>
      s"CASE WHEN size($w) >= 3 THEN transform(sequence(0, size($w) - 3), " +
        s"i -> concat(element_at($w, i + 1), ' ', element_at($w, i + 2), ' ', element_at($w, i + 3))) " +
        s"ELSE array() END"
    case DuckD =>
      s"CASE WHEN len($w) >= 3 THEN list_transform(range(1, len($w) - 1), " +
        s"i -> concat($w[i], ' ', $w[i + 1], ' ', $w[i + 2])) " +
        s"ELSE [] END"
  }

  def arrDistinct(arr: String, d: Dialect): String = d match {
    case SparkD => s"array_distinct($arr)"
    case DuckD  => s"list_distinct($arr)"
  }

  /** MinHash signature j of a shingle array: min over shingles of
    * md5(j || '|' || shingle). Lexicographic min over hex strings is a
    * uniform permutation surrogate; deterministic in both engines. */
  def minhashSig(sh: String, j: Int, d: Dialect): String = d match {
    case SparkD => s"array_min(transform($sh, s -> md5(concat('$j|', s))))"
    case DuckD  => s"list_min(list_transform($sh, s -> md5(concat('$j|', s))))"
  }

  /** |A ∩ B| for distinct-element arrays. Both builtins are hash-based
    * (linear in |A|+|B|) and return distinct elements, so the counts
    * agree even though element order differs. */
  def interSize(a: String, b: String, d: Dialect): String = d match {
    case SparkD => s"size(array_intersect($a, $b))"
    case DuckD  => s"len(list_intersect($a, $b))"
  }

  /** First 8 chars of an md5-hex column as a 32-bit value in a BIGINT —
    * built from instr positional arithmetic so both engines parse hex
    * identically (no dialect-specific hex casts). Pass a *precomputed*
    * md5 column so the digest is evaluated once, not per term. */
  def hexPrefix32(hexCol: String): String =
    (0 until 8).map { i =>
      val pow = java.lang.Long.toString(1L << (4 * (7 - i)))
      s"(instr('0123456789abcdef', substr($hexCol, ${i + 1}, 1)) - 1) * CAST($pow AS BIGINT)"
    }.mkString("(", " + ", ")")

  def shiftRight(e: String, n: Int, d: Dialect): String = d match {
    case SparkD => s"shiftright($e, $n)"
    case DuckD  => s"($e >> $n)"
  }

  def bitXor(a: String, b: String, d: Dialect): String = d match {
    case SparkD => s"($a ^ $b)"
    case DuckD  => s"xor($a, $b)"
  }

  /** SimHash band layout over the 32-bit hash: 9 bands (5×4 bits +
    * 4×3 bits) as (offset, width). Pigeonhole: two hashes with Hamming
    * distance <= 8 differ in at most 8 bit positions, so at least one
    * of the 9 bands is bit-identical — an equi-join on (band_idx,
    * band_val) is a lossless candidate generator for the <= 8 filter. */
  val simhashBands: Seq[(Int, Int)] =
    Seq((0, 4), (4, 4), (8, 4), (12, 4), (16, 4), (20, 3), (23, 3), (26, 3), (29, 3))

  /** Band value: `width` bits of `e` starting at `offset`. */
  def simhashBandVal(e: String, offset: Int, width: Int, d: Dialect): String =
    s"(${shiftRight(e, offset, d)} & ${(1 << width) - 1})"

  /** SimHash bit-balance aggregates: for each of 32 bits, the signed
    * count sum(±1) over token-hash column `h` (call under GROUP BY). */
  def simhashBitSums(h: String, d: Dialect): Seq[String] =
    (0 until 32).map { i =>
      s"CAST(sum(CASE WHEN (${shiftRight(h, i, d)} & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s_$i"
    }

  /** Assemble the 32-bit SimHash from the s_i balance columns. */
  def simhashAssemble(d: Dialect): String =
    (0 until 32).map { i =>
      s"CASE WHEN s_$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString("(", " + ", ")")

  /** Dimensionality of the fixture `embeddings.embedding` column —
    * the ONE constant every unrolled oracle expression and the
    * kmeans-step oracle's dim range derive from, so a fixture change
    * fails at this line instead of silently under-covering. */
  val embeddingDims = 64

  /** Dot product of two double-array expressions. Spark side uses the
    * native codegen ArrayDotProduct (graft.functions — register via
    * Native.register); DuckDB side unrolls 64 left-associated terms.
    * Both are the same sequential fold → bit-identical doubles. */
  def dot64(a: String, b: String, d: Dialect): String = d match {
    case SparkD => s"graft_dot($a, $b)"
    case DuckD  => (0 until embeddingDims).map(i => s"${idx(a, i, d)} * ${idx(b, i, d)}").mkString(" + ")
  }

  /** Squared L2 distance over the contiguous dim range [from, from+len)
    * of two double-array expressions, unrolled left-associated — the
    * same sequential fold on both engines → bit-identical doubles.
    * The per-subspace distance of a product quantizer. */
  def l2sqRange(a: String, b: String, from: Int, len: Int, d: Dialect): String =
    (from until from + len).map { i =>
      val (x, y) = (idx(a, i, d), idx(b, i, d))
      s"($x - $y) * ($x - $y)"
    }.mkString(" + ")

  /** Cosine similarity of two 64-dim double arrays. */
  def cosine64(a: String, b: String, d: Dialect): String =
    s"(${dot64(a, b, d)}) / (sqrt(${dot64(a, a, d)}) * sqrt(${dot64(b, b, d)}))"

  /** L2 norm of a 64-dim double array (precompute once per vector —
    * turns the 3-dot cosine into 1 dot + 1 multiply per pair). */
  def norm64(a: String, d: Dialect): String =
    s"sqrt(${dot64(a, a, d)})"

  /** Cosine from a pair dot product and precomputed norms; identical
    * arithmetic shape to [[cosine64]], so values are bit-equal. */
  def cosineWithNorms(a: String, b: String, normA: String, normB: String,
                      d: Dialect): String =
    s"(${dot64(a, b, d)}) / ($normA * $normB)"

  /** Cast a float array to a double array (so all arithmetic is done in
    * doubles on both engines). */
  def toDoubleArr(e: String, d: Dialect): String = d match {
    case SparkD => s"transform($e, x -> CAST(x AS DOUBLE))"
    case DuckD  => s"CAST($e AS DOUBLE[])"
  }

  /** Deterministic ±1 pseudo-random hyperplane weight for LSH plane j,
    * dimension i (integer arithmetic, engine-agnostic). */
  def planeSign(j: Int, i: Int): String = {
    val v = (((j + 1).toLong * 1103515245L + i.toLong * 12345L) % 97L) % 2L
    if (v == 0) "1.0" else "-1.0"
  }

  /** Signed projection of a 64-dim double array onto pseudo-random
    * hyperplane j. */
  def lshProjection(a: String, j: Int, d: Dialect): String =
    (0 until embeddingDims).map(i => s"${idx(a, i, d)} * ${planeSign(j, i)}").mkString(" + ")

  /** LSH bucket id from `nPlanes` sign bits. */
  def lshBucket(a: String, nPlanes: Int, d: Dialect): String =
    (0 until nPlanes).map { j =>
      s"CASE WHEN (${lshProjection(a, j, d)}) > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** LSH band value from the sign bits of an explicit plane subset —
    * banding (OR over bands of AND-ed planes) trades per-bucket
    * occupancy against recall, the standard near-dup knob. */
  def lshBandVal(a: String, planes: Seq[Int], d: Dialect): String =
    planes.zipWithIndex.map { case (j, k) =>
      s"CASE WHEN (${lshProjection(a, j, d)}) > 0 THEN ${1 << k} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** Rolling polynomial fingerprint over a words array: fold
    * acc = (acc * 31 + term(w)) % 1000000007, where term(w) mixes word
    * length and first letter. DuckDB's list_reduce seeds with the first
    * element, so the zero seed is prepended there. */
  private def wordTerm(w: String): String =
    s"CAST(length($w) * 17 + instr('abcdefghijklmnopqrstuvwxyz', substr($w, 1, 1)) AS BIGINT)"

  def rollingFingerprint(wordsArr: String, d: Dialect): String = d match {
    case SparkD =>
      s"aggregate(transform($wordsArr, w -> ${wordTerm("w")}), CAST(0 AS BIGINT), " +
        s"(acc, x) -> (acc * 31 + x) % 1000000007)"
    case DuckD =>
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($wordsArr, w -> ${wordTerm("w")})), " +
        s"(acc, x) -> (acc * 31 + x) % 1000000007)"
  }
}
