package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word error rate — THE evaluation metric of the reference's domain
  * (ASR): WER = word-level edit distance(ref, hyp) / |ref words|,
  * aggregated per utterance and corpus-wide.
  *
  * Two implementations with identical results:
  *
  *   - [[wordErrorRate]]: the general path — a per-row word-level
  *     Levenshtein DP kernel (O(|ref|·|hyp|) per pair, two-row
  *     memory) inside a typed map, like the [[SequenceMatcher]]
  *     alignment kernels. Works for any vocabulary.
  *   - [[charMappedWer]]: the declarative path — a corpus dictionary
  *     maps each distinct word to one unicode codepoint (dense rank,
  *     deterministic), utterances collapse to strings, and the
  *     built-in `levenshtein` (codegen'd, present in Spark AND every
  *     SQL engine) computes the same distance. Valid while the
  *     vocabulary fits the mapped codepoint range — the spec asserts
  *     equality of the two paths, and this path powers the exact
  *     cross-engine oracle.
  *
  * Scale shape: both are embarrassingly per-row after cheap prep;
  * the char-mapped path pays one vocabulary aggregate + an exploded
  * dictionary equi-join (Σ tokens, map-side combinable) — no
  * quadratic stage anywhere.
  */
object Wer {

  /** Classic word-level Levenshtein with two-row memory. */
  private[operators] def editDistance(a: IndexedSeq[String],
      b: IndexedSeq[String]): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  /** Per-row WER over (idCol, refCol, hypCol) text pairs: whitespace
    * tokenization (as [[Dedup.tokens]]), word-level DP distance.
    * Output: (idCol, n_ref, dist, wer) with wer = round(dist/n_ref, 6)
    * (an empty ref with a non-empty hyp reports wer = dist — the
    * insertion-only convention; 0/0 reports 0.0).
    */
  def wordErrorRate(pairs: DataFrame, idCol: String, refCol: String,
      hypCol: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val dist = udf { (ref: Seq[String], hyp: Seq[String]) =>
      editDistance(ref.toIndexedSeq, hyp.toIndexedSeq)
    }
    // null text tokenizes to an EMPTY sequence (same convention as
    // charMappedWer's left joins) rather than a null that NPEs the
    // kernel
    val empty = array().cast("array<string>")
    pairs.select(col(idCol),
      coalesce(Dedup.tokens(col(refCol)), empty).as("__r"),
      coalesce(Dedup.tokens(col(hypCol)), empty).as("__h"))
      .withColumn("n_ref", size(col("__r")).cast("long"))
      .withColumn("dist", dist(col("__r"), col("__h")).cast("long"))
      .select(col(idCol), col("n_ref"), col("dist"),
        when(col("n_ref") === 0 && col("dist") === 0, lit(0.0))
          .otherwise(round(col("dist") /
            greatest(col("n_ref"), lit(1L)), 6)).as("wer"))
  }

  /** Declarative WER: map each distinct word (over BOTH columns) to
    * one character by dense rank, collapse utterances to strings,
    * apply the built-in `levenshtein`. Distance-equal to
    * [[wordErrorRate]] whenever the combined vocabulary fits
    * `maxVocab` characters (guarded loudly). Characters are the
    * single-byte printable ASCII range 33..126 — a HARD ceiling of
    * 94: several SQL engines (DuckDB included) implement levenshtein
    * over BYTES, so any symbol past 127 becomes 2-byte UTF-8 and the
    * byte distance silently diverges from the character distance
    * (measured: DuckDB levenshtein(chr(65), chr(201)) = 2). This is
    * the small-vocabulary twin that powers the exact cross-engine
    * oracle, NOT the general path (that's the DP kernel above).
    */
  def charMappedWer(pairs: DataFrame, idCol: String, refCol: String,
      hypCol: String, maxVocab: Int = 94): DataFrame = {
    require(maxVocab >= 1 && maxVocab <= 94,
      s"maxVocab=$maxVocab outside 1..94 — codes must stay single-byte " +
        "ASCII or byte-based SQL levenshtein implementations diverge")
    // null text tokenizes to an EMPTY sequence, exactly as in
    // wordErrorRate — otherwise concat(__r, __h) is null for the row
    // and the non-null side's words never reach the vocabulary, so
    // mapped()'s inner join drops them and dist collapses to 0 where
    // the DP path reports the insertion count
    val emptyArr = array().cast("array<string>")
    val both = pairs.select(col(idCol),
      coalesce(Dedup.tokens(col(refCol)), emptyArr).as("__r"),
      coalesce(Dedup.tokens(col(hypCol)), emptyArr).as("__h"))
    // one pass for guard AND mapping: the distinct vocabulary is
    // <= maxVocab+1 rows, so collect it once instead of running the
    // corpus-wide distinct aggregate twice (count + join)
    val spark = pairs.sparkSession
    val words = both
      .select(explode(concat(col("__r"), col("__h"))).as("w")).distinct()
      .orderBy(col("w"))
      .limit(maxVocab + 1)
      .collect().map(_.getString(0))
    require(words.length <= maxVocab,
      s"combined vocabulary exceeds maxVocab=$maxVocab characters — " +
        "use wordErrorRate (the DP path) instead")
    import spark.implicits._
    val vocab = words.zipWithIndex
      .map { case (w, i) => (w, i + 33) }.toSeq.toDF("w", "code")
    def mapped(side: String) = both
      .select(col(idCol), posexplode(col(s"__$side")).as(Seq("pos", "w")))
      .join(broadcast(vocab), "w")
      .groupBy(col(idCol))
      .agg(concat_ws("", array_sort(collect_list(struct(col("pos"),
        chr(col("code")).as("c")))).getField("c")).as(s"__s$side"),
        count(lit(1)).as(s"__n$side"))
    both.select(col(idCol))
      .join(mapped("r"), Seq(idCol), "left")
      .join(mapped("h"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nr"), lit(0L)).as("n_ref"),
        levenshtein(coalesce(col("__sr"), lit("")),
          coalesce(col("__sh"), lit(""))).cast("long").as("dist"))
      .withColumn("wer",
        when(col("n_ref") === 0 && col("dist") === 0, lit(0.0))
          .otherwise(round(col("dist") /
            greatest(col("n_ref"), lit(1L)), 6)))
  }
}
