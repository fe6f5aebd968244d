package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X181–X183 — rank statistics: Spearman rank correlation, Kendall
  * tau-b on a bounded contingency grid, and Borda rank aggregation.
  * The monotone-dependence and multi-signal-consensus readouts a
  * curation pipeline runs where Pearson (X15) is too linear: "does
  * quality rise with length AT ALL" (Spearman/Kendall), "which docs
  * do ALL the quality signals like" (Borda).
  *
  * Determinism contract (the [[Hypothesis]] conventions): values
  * quantize to micro-unit integers (exact for ≤6-dp inputs), every
  * aggregate is an exact integer/decimal sum, and the final statistic
  * is one fixed-shape double expression, round(6).
  */
object RankStats {

  private val dec = "decimal(38,0)"

  private def micro(c: Column): Column = round(c * 1e6, 0).cast("long")

  /** X181 — Spearman's ρ between two value columns: Pearson
    * correlation of the AVERAGE-TIE ranks. Ranks come from the
    * DISTINCT-value table (2·avgRank = 2·cntBelow + cnt + 1 — an
    * integer, so no fractional drift), built with a value-bounded
    * cumulative window (the rocAuc class — never a row sort) and
    * broadcast back to the scan. All moment sums are exact decimals;
    * ρ is one double expression at the end. Constant columns (zero
    * rank variance) report NULL.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String,
      broadcastRanks: Boolean = true): DataFrame = {
    val base = df.select(micro(col(xCol)).as("__x"),
      micro(col(yCol)).as("__y"))
    def rankTable(v: String, out: String): DataFrame = {
      val w = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.groupBy(col(v).as("__v")).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(w))
        .select(col("__v").as(v + "_v"),
          (lit(2L) * (col("__cum") - col("__c")) + col("__c") + 1L)
            .as(out))
    }
    // broadcastRanks: the rank tables are |distinct values|-sized —
    // small for genuinely discrete columns (the broadcast saves two
    // exchanges, measured ~1.7× on the contract query) but they can
    // approach n for CONTINUOUS micro-quantized columns, where a
    // forced broadcast is a driver collect of ~n rows. Callers with
    // continuous inputs pass false and let AQE pick the join side.
    def side(t: DataFrame): DataFrame =
      if (broadcastRanks) broadcast(t) else t
    val rx = side(rankTable("__x", "__xr"))
    val ry = side(rankTable("__y", "__yr"))
    val j = base
      .join(rx, col("__x") === col("__x_v"))
      .join(ry, col("__y") === col("__y_v"))
    val m = j.agg(count(lit(1)).cast("long").as("n"),
      sum(col("__xr").cast(dec)).as("__sx"),
      sum(col("__yr").cast(dec)).as("__sy"),
      sum((col("__xr").cast(dec) * col("__yr")).cast(dec)).as("__sxy"),
      sum((col("__xr").cast(dec) * col("__xr")).cast(dec)).as("__sxx"),
      sum((col("__yr").cast(dec) * col("__yr")).cast(dec)).as("__syy"))
    def d(c: String) = col(c).cast("double")
    val nd = col("n").cast("double")
    val num = nd * d("__sxy") - d("__sx") * d("__sy")
    val vx = nd * d("__sxx") - d("__sx") * d("__sx")
    val vy = nd * d("__syy") - d("__sy") * d("__sy")
    m.select(col("n"),
      when(col("n") > 1L && vx > 0.0 && vy > 0.0,
        round(num / sqrt(vx * vy), 6)).as("spearman_rho"))
  }

  /** X182 — Kendall tau-b on a bounded equal-width grid: both columns
    * bin to `bins` integer cells (exact integer arithmetic — bound:
    * \|v_micro\|·bins must fit a long, i.e. \|v\| ≲ 1.4e11 at
    * bins=64), then concordant/discordant pair MASS comes from the
    * ≤ bins² contingency table self-joined on the strict orderings —
    * state is bins²-bounded NO MATTER the row count, which is what
    * makes an exact tau computable at 100 TB (the unbinned statistic
    * needs a global inversion count). Tie corrections use the
    * marginal counts (tau-b). Pair counts can exceed a long at ~10¹²
    * rows, so the output reports them as FRACTIONS of all pairs plus
    * the tau itself.
    */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String,
      bins: Int = 64): DataFrame = {
    require(bins >= 2 && bins <= 1024, s"bins $bins out of [2,1024]")
    val base = df.select(micro(col(xCol)).as("__x"),
      micro(col(yCol)).as("__y"))
    val ext = base.agg(min(col("__x")).as("__xlo"),
      max(col("__x")).as("__xhi"),
      min(col("__y")).as("__ylo"), max(col("__y")).as("__yhi"))
    val cells = base.crossJoin(broadcast(ext))
      .select(
        expr(s"((__x - __xlo) * $bins) div (__xhi - __xlo + 1)").as("bx"),
        expr(s"((__y - __ylo) * $bins) div (__yhi - __ylo + 1)").as("by"))
      .groupBy(col("bx"), col("by")).agg(count(lit(1)).as("c"))
    val a = cells.select(col("bx").as("ax"), col("by").as("ay"),
      col("c").as("ac"))
    val b = cells.select(col("bx").as("cx"), col("by").as("cy"),
      col("c").as("bc"))
    def pairMass(cond: Column): DataFrame =
      a.join(broadcast(b), cond)
        .agg(coalesce(sum((col("ac").cast(dec) * col("bc")).cast(dec)),
          lit(0).cast(dec)).as("m"))
    val conc = pairMass(col("cx") > col("ax") && col("cy") > col("ay"))
      .select(col("m").as("__cc"))
    val disc = pairMass(col("cx") > col("ax") && col("cy") < col("ay"))
      .select(col("m").as("__dd"))
    // tie-corrected pair totals from the marginals: n0 = n(n−1)/2,
    // n1 = Σ_x tx(tx−1)/2, n2 = Σ_y ty(ty−1)/2
    def tieTerm(k: String, out: String): DataFrame =
      cells.groupBy(col(k)).agg(sum(col("c")).as("__t"))
        .agg(coalesce(sum((col("__t").cast(dec) * (col("__t") - 1L))
          .cast(dec)), lit(0).cast(dec)).as(out))
    val t1 = tieTerm("bx", "__t1")
    val t2 = tieTerm("by", "__t2")
    val tot = base.agg(count(lit(1)).cast("long").as("n"))
    def d(c: String) = col(c).cast("double")
    val res = tot.crossJoin(conc).crossJoin(disc).crossJoin(t1)
      .crossJoin(t2)
    val nd = col("n").cast("double")
    val n0 = nd * (nd - 1.0) / 2.0
    val n1 = d("__t1") / 2.0
    val n2 = d("__t2") / 2.0
    val den = sqrt((n0 - n1) * (n0 - n2))
    res.select(col("n"),
      when(col("n") > 1L, round(d("__cc") / n0, 6)).as("frac_concordant"),
      when(col("n") > 1L, round(d("__dd") / n0, 6)).as("frac_discordant"),
      when(col("n") > 1L && n0 - n1 > 0.0 && n0 - n2 > 0.0,
        round((d("__cc") - d("__dd")) / den, 6)).as("tau_b"))
  }

  /** X183 — Borda rank aggregation across quality signals: each
    * signal ranks every row (descending, id tie-break) with the
    * two-phase distributed rank (no single-partition window), a row
    * scores n − rank points per signal (winner takes n−1, the classic
    * Borda count), and the top k by total points survive. The
    * consensus selector that is robust to any one signal's scale or
    * outliers — only ORDER matters.
    *
    * Scale shape: one globalRank pass per signal + id-keyed joins;
    * the final top-k is a distributed sort-limit (take-ordered), and
    * the k-row dense rank runs on the k survivors only.
    */
  def bordaTopK(df: DataFrame, idCol: String, signalCols: Seq[String],
      k: Int): DataFrame = {
    require(signalCols.nonEmpty, "need at least one signal")
    require(k > 0, s"bad k $k")
    val withRanks = signalCols.foldLeft(df.select(col(idCol))) {
      case (acc, s) =>
        val ranked = CorpusOps.globalRank(
            df.select(col(idCol), col(s)),
            Seq(col(s).desc, col(idCol)))
          .select(col(idCol), (col("__rank") + 1L).as(s"rank_$s"))
        acc.join(ranked, Seq(idCol))
    }
    val cnt = df.agg(count(lit(1)).as("__n"))
    val scored = withRanks.crossJoin(broadcast(cnt))
      .withColumn("borda_score",
        signalCols.map(s => col("__n") - col(s"rank_$s")).reduce(_ + _))
      .drop("__n")
    val top = scored.orderBy(col("borda_score").desc, col(idCol)).limit(k)
    top.withColumn("borda_rank", row_number().over(
      Window.orderBy(col("borda_score").desc, col(idCol))))
  }

  /** X338 — Cliff's delta and Vargha-Delaney A: the rank effect sizes
    * that belong next to [[Hypothesis.mannWhitneyU]]'s verdict —
    * δ = (#(a>b) − #(a<b))/(n_a·n_b) reads in [−1, 1] ("how often
    * does a curated doc beat a raw one"), A = P(a>b) + ½P(a=b) is the
    * same quantity on [0, 1] (the common-language effect size). Both
    * are pure pair counts — no distributional assumption at all.
    *
    * Exactness: the three pair classes fold as exact integers on the
    * distinct micro-value grid — #(a>b) = Σ_v c_a(v)·cumBelow_b(v)
    * via one distributed cumulative pass ([[CorpusOps.cumSums]], no
    * single-task window), #(a=b) = Σ c_a·c_b, #(a<b) by complement;
    * δ and A are one fixed-shape double each, round(6), NULL when
    * either group is empty.
    */
  def cliffsDelta(df: DataFrame, valueCol: String, isA: Column)
      : DataFrame = {
    val dec = "decimal(38,0)"
    val per = df.groupBy(round(col(valueCol) * 1e6, 0).cast("long")
        .as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(isA, 0L).otherwise(1L)).as("__cb"))
    val cum = CorpusOps.cumSums(per, Seq(col("__v")), Seq("__cb"))
      .withColumn("__bBelow", col("__cum__cb") - col("__cb"))
    val w = cum.agg(
      sum(col("__ca")).cast("long").as("n_a"),
      sum(col("__cb")).cast("long").as("n_b"),
      coalesce(sum((col("__ca").cast(dec) * col("__bBelow")).cast(dec)),
        lit(0).cast(dec)).cast(dec).as("__gt"),
      coalesce(sum((col("__ca").cast(dec) * col("__cb")).cast(dec)),
        lit(0).cast(dec)).cast(dec).as("__eq"))
    val pairs = (col("n_a").cast(dec) * col("n_b")).cast(dec)
    val lt = (pairs - col("__gt") - col("__eq")).cast(dec)
    val pd = pairs.cast("double")
    val ok = col("n_a") > 0L && col("n_b") > 0L
    w.select(col("n_a"), col("n_b"),
      col("__gt").cast("long").as("n_gt"),
      col("__eq").cast("long").as("n_eq"),
      lt.cast("long").as("n_lt"),
      when(ok, round((col("__gt") - lt).cast("double") / pd, 6))
        .as("cliffs_delta"),
      when(ok, round((lit(2.0) * col("__gt").cast("double") +
        col("__eq").cast("double")) / (lit(2.0) * pd), 6)).as("vd_a"))
  }
}
