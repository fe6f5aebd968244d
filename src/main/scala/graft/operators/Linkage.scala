package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X154 — Fellegi-Sunter probabilistic record-linkage scoring: given
  * candidate pairs (from any blocking family — the X133
  * sorted-neighborhood walk, X127 deletion keys, or a plain blocked
  * equi-join) with BOOLEAN per-field agreement columns, score each
  * pair with the classic log-likelihood match weight
  *
  *   w = Σ_f  agree_f ? log₂(m_f/u_f) : log₂((1−m_f)/(1−u_f))
  *
  * where m_f = P(field agrees | true match) and u_f = P(field agrees
  * | non-match), then band into match / possible / nonmatch by the
  * upper/lower thresholds (the review-queue triage of every entity-
  * resolution pipeline).
  *
  * Determinism: the weight is a FIXED-SHAPE expression — per-field
  * ln(x)/ln(2) terms added in declaration order, no data-ordered
  * summation — so both engines produce bit-identical doubles;
  * round(6). Scale shape: pure per-row arithmetic over the candidate
  * table; cost lives in the upstream blocking, which is the point of
  * the Fellegi-Sunter decomposition.
  */
object Linkage {

  /** `fields`: (agreementColumn, m, u) with 0 < u, m < 1. */
  def score(pairs: DataFrame, fields: Seq[(String, Double, Double)],
      upper: Double, lower: Double): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    require(upper >= lower, s"upper $upper < lower $lower")
    fields.foreach { case (f, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1,
        s"field $f: m/u must be in (0,1), got m=$m u=$u")
    }
    val ln2 = lit(math.log(2.0))
    val w = fields.map { case (f, m, u) =>
      when(col(f), lit(math.log(m / u)) / ln2)
        .otherwise(lit(math.log((1 - m) / (1 - u))) / ln2)
    }.reduce(_ + _)
    pairs.withColumn("score", round(w, 6))
      .withColumn("decision",
        when(col("score") >= upper, "match")
          .when(col("score") <= lower, "nonmatch")
          .otherwise("possible"))
  }

  /** Jaro similarity of two strings — the classic record-linkage
    * edit measure: m matching chars within the ⌊max(‖a‖,‖b‖)/2⌋−1
    * window, t raw out-of-order mismatches among them, sim =
    * (m/‖a‖ + m/‖b‖ + (m − ⌊t/2⌋)/m)/3. Any empty side is 0 (both
    * empty included); equal non-empty strings are 1. A tight loop
    * (JIT territory — the Hilbert/CDC rolling-hash UDF class): the
    * per-pair state is two boolean scratch arrays, no regex, no
    * allocation beyond them.
    */
  private[graft] def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    // DuckDB order: any empty side is 0 — including BOTH empty
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var hit = false
      while (j <= hi && !hit) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // rapidfuzz/DuckDB FLOOR the transposition halving (integer
    // division) — odd mismatch counts differ from the t/2.0 textbook
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }

  /** Jaro-Winkler: [[jaro]] plus the Winkler common-prefix boost
    * jw = j + ℓ·0.1·(1−j) for prefix length ℓ ≤ 4, applied only when
    * j exceeds the classic 0.7 boost threshold — the exact semantics
    * of DuckDB's `jaro_winkler_similarity` (and the rapidfuzz family
    * it derives from), so the oracle is the real library, not a
    * replay.
    */
  private[graft] def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** X276 — Jaro-Winkler near-match pairs over a NAME column: the
    * fuzzy-key record-linkage primitive (X133's sorted-neighborhood
    * and X127's deletion keys find typo-distance candidates; this
    * scores free-form name drift — "red widgett" vs "red widget").
    *
    * Scale shape: pairing happens on the DISTINCT-name table
    * (vocabulary-bounded, the X73 BPE convention — 10¹⁰ rows with
    * 10⁵ distinct names pair 10⁵, not 10¹⁰), blocked by the name's
    * first character so candidate generation is an equi-join, never
    * all-pairs; each name also carries its row multiplicity so
    * callers can weight matches back to row space. The UDF cost is
    * per CANDIDATE, bounded by Σ_block c², the declared blocking
    * trade-off every linkage pipeline makes.
    *
    * Determinism: the double is a fixed loop over two concrete
    * strings — bit-identical everywhere; round(6) on output;
    * (name_a < name_b) canonicalizes pair order.
    */
  def nameMatchPairs(df: DataFrame, nameCol: String,
      minSim: Double = 0.8): DataFrame = {
    require(minSim >= 0 && minSim <= 1, s"bad minSim $minSim")
    val jw = udf((a: String, b: String) => jaroWinkler(a, b))
    val names = df.groupBy(col(nameCol).as("__n"))
      .agg(count(lit(1)).as("__rows"))
      // case-folded block key: 'Catherine' and 'catherine' must land
      // in one block (exact-case blocking silently split case
      // variants — r10 ADVICE); cross-letter variants ('K'/'C')
      // remain the declared blocking recall trade-off
      .withColumn("__blk", lower(substring(col("__n"), 1, 1)))
    val a = names.select(col("__blk"), col("__n").as("name_a"),
      col("__rows").as("rows_a"))
    val b = names.select(col("__blk"), col("__n").as("name_b"),
      col("__rows").as("rows_b"))
    a.join(b, Seq("__blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("sim", round(jw(col("name_a"), col("name_b")), 6))
      .filter(col("sim") >= minSim)
      .select(col("name_a"), col("name_b"), col("rows_a"),
        col("rows_b"), col("sim"))
  }

  /** American Soundex of a single alphabetic word as a FIXED-SHAPE
    * Column expression — translate + per-digit collapse, no loops —
    * so the identical chain transliterates to the DuckDB oracle and
    * both engines produce the code by construction (neither ships a
    * common soundex: Spark's builtin is Hive/commons-codec flavored,
    * DuckDB has none).
    *
    * Rules encoded: vowels+Y become '.' separators (same codes
    * ACROSS a vowel stay distinct), H/W vanish BEFORE digit mapping
    * (same codes across H/W merge — the commons-codec refinement),
    * adjacent duplicate digits collapse, the first letter keeps its
    * letter and drops its own code slot (absorbed duplicates and
    * all), right-padded with zeros to letter+3. Assumes an
    * uppercase-able alphabetic word; the caller extracts those.
    */
  def soundexCode(word: Column): Column = {
    val u = upper(word)
    // vowels+Y -> '.', H/W deleted (translate drops unmapped chars)
    val marked = translate(u, "AEIOUYHW", "......")
    val digits = translate(marked,
      "BFPVCGJKQSXZDTLMNR", "111122222222334556")
    val collapsed = (1 to 6).foldLeft(digits) { (c, d) =>
      regexp_replace(c, s"$d$d+", s"$d")
    }
    val stripped = replace(collapsed, lit("."), lit(""))
    // the first letter's own code slot exists in `stripped` only when
    // that letter is a CODED consonant: vowels+Y left a '.' that the
    // strip removed, H/W were deleted outright — both survive this
    // delete-translate as '' and must NOT drop a digit
    val firstIsCoded =
      translate(substring(u, 1, 1), "AEIOUYHW", "") =!= ""
    val tail3 = when(firstIsCoded, substring(stripped, 2, 3))
      .otherwise(substring(stripped, 1, 3))
    concat(substring(u, 1, 1), rpad(tail3, 3, "0"))
  }

  /** X277 — soundex blocking profile: group a word table by
    * [[soundexCode]] and report each block's size, implied candidate
    * pair count c·(c−1)/2, and member list — the BLOCKING-QUALITY
    * view (X248's pair-completeness/reduction trade) for the
    * phonetic key family. Vocabulary-bounded end to end: input is
    * the distinct-word table; the member list is a bounded
    * sort_array fold (blocks are code-bounded, ≤ 26·7³ codes).
    */
  def soundexBlocks(words: DataFrame, wordCol: String): DataFrame = {
    val coded = words.select(col(wordCol).as("__w"))
      .distinct()
      .withColumn("code", soundexCode(upper(col("__w"))))
    coded.groupBy(col("code"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        (count(lit(1)) * (count(lit(1)) - 1) / 2).cast("long")
          .as("n_pairs"),
        concat_ws(",", sort_array(collect_list(col("__w"))))
          .as("members"))
  }
}
