package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X86 — BLEU (Papineni et al. 2002): modified n-gram precision with
  * brevity penalty, the n-gram-overlap eval twin of [[Wer]]'s
  * edit-distance metric (reference anchor: the summary-quality checks
  * around claude_research_optimal.py:684 compare transcripts to book
  * text; BLEU is the standard corpus-level form of that comparison).
  *
  * Semantics (uncontroversial textbook form):
  *   p_n  = Σ_g min(cnt_hyp(g), cnt_ref(g)) / (len_hyp − n + 1)
  *   BP   = 1 if len_hyp ≥ len_ref else exp(1 − len_ref/len_hyp)
  *   BLEU = BP · exp(Σ_{n≤N} ln p_n / N), 0 if any p_n = 0 (unsmoothed)
  *
  * Exactness contract: every count is an exact 64-bit integer, every
  * p_n an exact integer ratio; ln/exp evaluate the same fixed-shape
  * expression on identical doubles in both engines, and outputs round
  * to 6 dp (the established ulp-absorption convention).
  *
  * Scale shape: n-gram assembly is per-row array math in the scan
  * (transform over a sequence — no explode until the count agg);
  * per-(doc, n, gram) counts are map-side combinable; the clip join
  * keys on (doc, n, gram) so its cost is Σ shared grams, never
  * all-pairs; the final per-doc assembly is one more combinable agg.
  * Corpus BLEU adds a single-row integer-sum aggregate on top.
  */
object Bleu {

  /** Overlapping n-grams WITH multiplicity (unlike [[Dedup.shingles]],
    * which is distinct-only — clipped counts need repeats).
    */
  private def grams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - n + 1),
        i => array_join(slice(toks, i, lit(n)), Dedup.Sep)))

  /** Per-pair (id, n) clipped-match and hyp-total counts plus the
    * token-length base — shared by the sentence and corpus forms.
    */
  private def stats(pairs: DataFrame, idCol: String, refCol: String,
      hypCol: String, maxN: Int): (DataFrame, DataFrame) = {
    require(maxN >= 1 && maxN <= 9, s"need 1 <= maxN <= 9, got $maxN")
    val toks = pairs.select(col(idCol),
      coalesce(Dedup.tokens(col(refCol)), array().cast("array<string>"))
        .as("__r"),
      coalesce(Dedup.tokens(col(hypCol)), array().cast("array<string>"))
        .as("__h"))
    val base = toks.select(col(idCol),
      size(col("__r")).cast("long").as("ref_len"),
      size(col("__h")).cast("long").as("hyp_len"))
    def counts(side: String, n: Int) = toks
      .select(col(idCol), explode(grams(col(side), n)).as("__g"))
      .groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as(s"__c$side"))
    val matches = (1 to maxN).map { n =>
      counts("__h", n).join(counts("__r", n), Seq(idCol, "__g"))
        .groupBy(col(idCol))
        .agg(sum(least(col("__c__h"), col("__c__r"))).as("__m"))
        .select(col(idCol), lit(n).as("__n"), col("__m"))
    }.reduce(_ union _)
    (base, matches)
  }

  /** Per-pair sentence BLEU: (idCol, ref_len, hyp_len, p_1..p_maxN,
    * bp, bleu), all doubles rounded to 6 dp.
    */
  def sentenceBleu(pairs: DataFrame, idCol: String, refCol: String,
      hypCol: String, maxN: Int = 4): DataFrame = {
    val (base, matches) = stats(pairs, idCol, refCol, hypCol, maxN)
    val mCols = (1 to maxN).map(n =>
      coalesce(sum(when(col("__n") === n, col("__m"))), lit(0L))
        .as(s"__m$n"))
    val joined = base.join(
      matches.groupBy(col(idCol)).agg(mCols.head, mCols.tail: _*),
      Seq(idCol), "left")
    assemble(joined, Seq(col(idCol), col("ref_len"), col("hyp_len")),
      col("ref_len"), col("hyp_len"), maxN)
  }

  /** Corpus BLEU: clip counts and lengths sum over all pairs BEFORE
    * the precision ratios (the standard corpus form — not a mean of
    * sentence scores). One row: (n_pairs, ref_len, hyp_len,
    * p_1..p_maxN, bp, bleu).
    */
  def corpusBleu(pairs: DataFrame, idCol: String, refCol: String,
      hypCol: String, maxN: Int = 4): DataFrame = {
    val (base, matches) = stats(pairs, idCol, refCol, hypCol, maxN)
    val mCols = (1 to maxN).map(n =>
      coalesce(sum(when(col("__n") === n, col("__m"))), lit(0L))
        .as(s"__m$n"))
    val totals = base.agg(count(lit(1)).as("n_pairs"),
      sum(col("ref_len")).as("ref_len"), sum(col("hyp_len")).as("hyp_len"))
    // per-n hyp totals need Σ max(hyp_len − n + 1, 0) per doc, so the
    // corpus totals aggregate the per-doc greatest() BEFORE summing
    val totN = (1 to maxN).map(n =>
      sum(greatest(col("hyp_len") - (n - 1), lit(0L))).as(s"__t$n"))
    val totals2 = base.agg(totN.head, totN.tail: _*)
    val joined = totals
      .crossJoin(totals2)
      .crossJoin(matches.agg(mCols.head, mCols.tail: _*))
    assembleWithTotals(joined,
      Seq(col("n_pairs"), col("ref_len"), col("hyp_len")),
      col("ref_len"), col("hyp_len"), maxN,
      n => col(s"__t$n"))
  }

  private def assemble(df: DataFrame, keep: Seq[Column],
      refLen: Column, hypLen: Column, maxN: Int): DataFrame =
    assembleWithTotals(df, keep, refLen, hypLen, maxN,
      n => greatest(hypLen - (n - 1), lit(0L)))

  private def assembleWithTotals(df: DataFrame, keep: Seq[Column],
      refLen: Column, hypLen: Column, maxN: Int,
      totalOf: Int => Column): DataFrame = {
    def p(n: Int): Column =
      when(totalOf(n) > 0,
        coalesce(col(s"__m$n"), lit(0L)).cast("double") / totalOf(n))
        .otherwise(lit(0.0))
    val bp = when(hypLen >= refLen, lit(1.0))
      .when(hypLen === 0, lit(0.0))
      .otherwise(exp(lit(1.0) - refLen.cast("double") / hypLen))
    val allPos = (1 to maxN).map(n => p(n) > 0).reduce(_ && _)
    val logSum = (1 to maxN).map(n => log(p(n))).reduce(_ + _)
    val bleu = when(allPos, bp * exp(logSum / maxN)).otherwise(lit(0.0))
    df.select(keep ++
      (1 to maxN).map(n => round(p(n), 6).as(s"p_$n")) ++
      Seq(round(bp, 6).as("bp"), round(bleu, 6).as("bleu")): _*)
  }
}
