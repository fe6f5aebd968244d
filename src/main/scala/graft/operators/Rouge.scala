package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X97 — ROUGE-L (Lin 2004): longest-common-subsequence recall /
  * precision / F1 between reference and hypothesis token streams —
  * the summarization-eval staple next to [[Bleu]]'s n-gram precision
  * and [[Wer]]'s edit distance (reference anchor: the
  * transcript-vs-book comparisons around claude_research_optimal
  * .py:684 are exactly LCS territory — [[SequenceMatcher]] aligns
  * with a greedy difflib kernel, ROUGE-L scores with the TRUE LCS).
  *
  * True LCS, not difflib: the greedy longest-matching-block
  * decomposition underestimates the LCS on crossing matches; ROUGE's
  * published definition needs the real DP.
  *
  * Scale shape: embarrassingly per-row — one O(|ref|·|hyp|) two-row
  * DP per pair inside the scan, no shuffle at all before the caller's
  * ordering. The [[ChunkedMatcher]] straggler caveat applies to
  * million-token pairs; eval pairs are sentence/summary sized.
  */
object Rouge {

  /** Classic LCS length with two-row memory. */
  private[operators] def lcsLength(a: IndexedSeq[String],
      b: IndexedSeq[String]): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    var prev = new Array[Int](b.length + 1)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      var j = 1
      while (j <= b.length) {
        cur(j) =
          if (a(i - 1) == b(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(b.length)
  }

  /** Per-pair ROUGE-L: (idCol, n_ref, n_hyp, lcs, precision, recall,
    * f1), doubles rounded to 6. Empty sides score 0 through the same
    * CASE shape in both engines.
    */
  def rougeL(pairs: DataFrame, idCol: String, refCol: String,
      hypCol: String): DataFrame = {
    val lcsUdf = udf { (r: Seq[String], h: Seq[String]) =>
      lcsLength(Option(r).getOrElse(Seq.empty).toIndexedSeq,
        Option(h).getOrElse(Seq.empty).toIndexedSeq)
    }
    val base = pairs.select(col(idCol),
        coalesce(Dedup.tokens(col(refCol)), array().cast("array<string>"))
          .as("__r"),
        coalesce(Dedup.tokens(col(hypCol)), array().cast("array<string>"))
          .as("__h"))
      .select(col(idCol),
        size(col("__r")).cast("long").as("n_ref"),
        size(col("__h")).cast("long").as("n_hyp"),
        lcsUdf(col("__r"), col("__h")).cast("long").as("lcs"))
      .withColumn("__p",
        when(col("n_hyp") > 0,
          col("lcs").cast("double") / col("n_hyp")).otherwise(lit(0.0)))
      .withColumn("__rc",
        when(col("n_ref") > 0,
          col("lcs").cast("double") / col("n_ref")).otherwise(lit(0.0)))
    base.select(col(idCol), col("n_ref"), col("n_hyp"), col("lcs"),
      round(col("__p"), 6).as("precision"),
      round(col("__rc"), 6).as("recall"),
      round(when(col("__p") + col("__rc") > 0,
        lit(2.0) * col("__p") * col("__rc") / (col("__p") + col("__rc")))
        .otherwise(lit(0.0)), 6).as("f1"))
  }
}
