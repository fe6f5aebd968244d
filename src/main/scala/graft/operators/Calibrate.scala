package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X191–X192 — score calibration across sources: quantile
  * normalization (map every source's score distribution onto the
  * POOLED distribution, so "top 10% within its source" means the
  * same number everywhere — the cross-source comparability step
  * before any global threshold like X186's Otsu cut) and isotonic
  * regression (the monotone-nonparametric calibrator that turns a
  * ranked score into an honest probability, PAV's exact solution via
  * the minimax closed form — no sequential pooling loop).
  *
  * Determinism: micro-unit quantization, exact integer ranks/counts,
  * and double ratios of exact integers — identical in any engine.
  */
object Calibrate {

  /** X191 — grid quantile normalization: per group, a row at
    * average-position fraction (2r−1)/2n maps to grid point
    * ⌈frac·G⌉, and each grid point t carries the POOLED order
    * statistic at rank ⌈t·N/G⌉ — all ceilings exact integer
    * arithmetic. G=1024 bounds the lookup table no matter the data
    * size (the standard grid approximation; exact when n ≤ G).
    *
    * Scale shape: one per-group rank window (partitioned), one
    * value-bounded global cumulative pass, a G×\|V\| bounded
    * grid-build join, and a broadcast G-row lookup join back to the
    * scan. No global row window anywhere.
    */
  def quantileNormalize(df: DataFrame, groupCol: String,
      valueCol: String, idCol: String, gridSize: Int = 1024)
      : DataFrame = {
    require(gridSize >= 2 && gridSize <= 65536, s"bad grid $gridSize")
    val g = gridSize
    val base = df.select(col(groupCol), col(idCol),
      round(col(valueCol) * 1e6, 0).cast("long").as("__v"))
    val wr = Window.partitionBy(col(groupCol))
      .orderBy(col("__v"), col(idCol))
    val ranked = base
      .withColumn("__r", row_number().over(wr).cast("long"))
      .withColumn("__ng",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("__t",
        expr(s"((2 * __r - 1) * $g + 2 * __ng - 1) div (2 * __ng)"))
    // pooled CDF on the distinct-value table (value-bounded window)
    val wv = Window.orderBy(col("__gv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = base.groupBy(col("__v").as("__gv"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wv))
    val tot = cdf.agg(max(col("__cum")).cast("long").as("__nn"))
    val grid = df.sparkSession.range(1, g + 1)
      .select(col("id").as("__t"))
      .crossJoin(broadcast(tot))
      .withColumn("__target", expr(s"(__t * __nn + $g - 1) div $g"))
    val stats = grid.join(cdf, col("__cum") >= col("__target"))
      .groupBy(col("__t")).agg(min(col("__gv")).as("__stat"))
    ranked.join(broadcast(stats), Seq("__t"))
      .select(col(groupCol), col(idCol),
        round(col("__v").cast("double") / 1e6, 6).as("value"),
        round(col("__stat").cast("double") / 1e6, 6).as("norm_value"))
  }

  /** X192 — isotonic calibration on a bounded bin grid: scores bin
    * equal-width to ≤ `bins` cells, each cell carries exact
    * (n, positives), and the monotone fit is PAV's exact solution by
    * the minimax identity ŷᵢ = max_{j≤i} min_{k≥i} avg(j..k) —
    * interval averages come from cumulative sums, the triple
    * (i,j,k) constraint join is bins³-bounded, so NOTHING here
    * scales with the row count. Output per present bin:
    * (bin, n, pos, raw_rate, fitted) with fitted non-decreasing.
    */
  /** X204 — calibration metrics for a [0,1] probability column
    * against a boolean label: the Brier score (mean squared error of
    * the probability) and the expected calibration error (ECE —
    * bin-weighted \|confidence − accuracy\| over `bins` equal-width
    * probability bins). The honest-probability report card that X192
    * isotonic fitting is trying to improve.
    *
    * Exactness: p quantizes to micro-units; Brier's Σ(p−y)² is an
    * exact decimal in micro² (y scaled to 1e6), ECE's per-bin
    * confidence and accuracy are ratios of exact integers — one
    * fixed-shape double each at the end.
    */
  def calibrationMetrics(df: DataFrame, probCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bad bins $bins")
    val base = df.select(
      round(col(probCol) * 1e6, 0).cast("long").as("__p"),
      when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
    // Brier: Σ(p_micro − y·1e6)² exact, / (n·1e12) at the end
    val dec = "decimal(38,0)"
    val brier = base.agg(count(lit(1)).cast("long").as("n"),
      sum((((col("__p") - col("__y") * 1000000L).cast(dec)) *
        ((col("__p") - col("__y") * 1000000L).cast(dec))).cast(dec))
        .as("__se"))
    // ECE over equal-width bins of [0, 1e6]; p = 1 clamps into the
    // top bin
    val binned = base
      .withColumn("__b",
        least(expr(s"(__p * $bins) div 1000000"), lit(bins - 1L)))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__nb"), sum(col("__p")).as("__sp"),
        sum(col("__y")).as("__k"))
    val ece = binned.agg(coalesce(sum(
      col("__nb").cast("double") *
        abs(col("__sp").cast("double") /
          (col("__nb").cast("double") * 1e6) -
          col("__k").cast("double") / col("__nb").cast("double"))),
      lit(0.0)).as("__eceNum"))
    brier.crossJoin(ece)
      .select(col("n"),
        round(col("__se").cast("double") /
          (col("n").cast("double") * 1e12), 6).as("brier"),
        round(col("__eceNum") / col("n").cast("double"), 6).as("ece"))
  }

  /** X332 — the reliability diagram TABLE under [[calibrationMetrics]]'
    * summary: per probability bin, the count, mean stated confidence,
    * observed accuracy, and the signed gap — the artifact a
    * calibration dashboard actually plots (ECE is its weighted fold;
    * the table says WHERE the model lies: over-confident at the top,
    * under at the bottom). Same exact micro binning (p = 1 clamps
    * into the top bin); bins-bounded; one division pair per bin,
    * round(6).
    */
  def reliabilityTable(df: DataFrame, probCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bad bins $bins")
    val base = df.select(
      round(col(probCol) * 1e6, 0).cast("long").as("__p"),
      when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
    base
      .withColumn("__b",
        least(expr(s"(__p * $bins) div 1000000"), lit(bins - 1L)))
      .groupBy(col("__b").as("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__p")).as("__sp"), sum(col("__y")).cast("long")
          .as("n_positive"))
      .select(col("bin"), col("n"), col("n_positive"),
        round(col("__sp").cast("double") /
          (col("n").cast("double") * 1e6), 6).as("mean_confidence"),
        round(col("n_positive").cast("double") / col("n"), 6)
          .as("accuracy"),
        round(col("__sp").cast("double") /
          (col("n").cast("double") * 1e6) -
          col("n_positive").cast("double") / col("n"), 6).as("gap"))
  }

  /** X237 — Murphy (1973) decomposition of the Brier score over
    * probability bins: Brier ≈ RELIABILITY − RESOLUTION +
    * UNCERTAINTY, with REL = Σ n_k(p̄_k−ō_k)²/N (how far each bin's
    * forecast sits from its observed rate — what [[isotonicFit]]
    * fixes), RES = Σ n_k(ō_k−ō)²/N (how much the forecasts actually
    * separate outcomes — what no recalibration can buy), and
    * UNC = ō(1−ō) (the base-rate floor). [[calibrationMetrics]]
    * reports Brier+ECE as one number each; the decomposition says
    * WHICH lever moves it: a high-REL model needs calibration, a
    * low-RES model needs better features. The binned identity is
    * approximate (within-bin forecast variance is the residual, ≥ 0
    * and shrinking with bin width); the residual is reported, not
    * hidden.
    *
    * Same exactness contract as calibrationMetrics: micro-quantized
    * p, equal-width bins on [0, 1e6] (p = 1 clamps into the top
    * bin), every cell an exact integer, fixed-shape doubles out,
    * round(6). One bin agg + one global fold; one row out.
    */
  /** X254 — weight of evidence + information value per feature bin:
    * WoE_bin = ln(share of goods in bin) − ln(share of bads in bin)
    * and IV_term = (g/G − b/B)·WoE — the credit-scorecard standard
    * for "does this binned feature separate the classes, and where":
    * IV < 0.02 is noise, > 0.3 strong, > 0.5 suspicious (leakage).
    * The feature-selection gate in front of X109's quality
    * classifier that X176's mutual information approximates without
    * the per-bin DIRECTION WoE gives.
    *
    * Exactness: the nano-log convention on exact integer cells
    * (lnq(g)−lnq(G)−lnq(b)+lnq(B))/1e9 — engine-replayable; one-sided
    * bins (g = 0 or b = 0, infinite WoE) report NULL and contribute
    * nothing to IV, documented rather than smoothed. Bins-bounded:
    * one cell agg + a broadcast totals fold.
    */
  def weightOfEvidence(df: DataFrame, binCol: Column,
      labelCol: Column): DataFrame = {
    def lnq(v: Column): Column =
      round(log(v.cast("double")) * 1e9, 0).cast("long")
    val cells = df.groupBy(binCol.as("bin"))
      .agg(sum(when(labelCol, 1L).otherwise(0L)).cast("long")
        .as("goods"),
        sum(when(labelCol, 0L).otherwise(1L)).cast("long").as("bads"))
    val tot = cells.agg(sum(col("goods")).cast("long").as("__G"),
      sum(col("bads")).cast("long").as("__B"))
    val ok = col("goods") > 0L && col("bads") > 0L &&
      col("__G") > 0L && col("__B") > 0L
    val woe = (lnq(col("goods")) - lnq(col("__G")) -
      lnq(col("bads")) + lnq(col("__B"))).cast("double") / 1e9
    val diff = col("goods").cast("double") / col("__G").cast("double") -
      col("bads").cast("double") / col("__B").cast("double")
    cells.crossJoin(broadcast(tot))
      .select(col("bin"), (col("goods") + col("bads")).as("n"),
        col("goods"), col("bads"),
        when(ok, round(woe, 6)).as("woe"),
        when(ok, round(diff * woe, 6)).as("iv_term"))
  }

  def murphyDecomposition(df: DataFrame, probCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bad bins $bins")
    val dec = "decimal(38,0)"
    val base = df.select(
      round(col(probCol) * 1e6, 0).cast("long").as("__p"),
      when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
    val cells = base
      .withColumn("__b",
        least(expr(s"(__p * $bins) div 1000000"), lit(bins - 1L)))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__nb"), sum(col("__p")).as("__sp"),
        sum(col("__y")).as("__k"),
        sum((((col("__p") - col("__y") * 1000000L).cast(dec)) *
          ((col("__p") - col("__y") * 1000000L).cast(dec))).cast(dec))
          .as("__se"))
    val tot = cells.agg(sum(col("__nb")).cast("long").as("__n"),
      sum(col("__k")).cast("long").as("__x"))
    val nb = col("__nb").cast("double")
    val pbar = col("__sp").cast("double") / (nb * 1e6)
    val obar = col("__k").cast("double") / nb
    val og = col("__x").cast("double") / col("__n").cast("double")
    val w = cells.crossJoin(broadcast(tot))
      .agg(max(col("__n")).as("n"), max(col("__x")).as("successes"),
        sum(col("__se")).as("__seT"),
        sum(nb * (pbar - obar) * (pbar - obar)).as("__rel"),
        sum(nb * (obar - og) * (obar - og)).as("__res"),
        max(og * (lit(1.0) - og)).as("__unc"))
    val nd = col("n").cast("double")
    val brier = col("__seT").cast("double") / (nd * 1e12)
    val rel = col("__rel") / nd
    val res = col("__res") / nd
    w.select(col("n"), col("successes"),
      round(brier, 6).as("brier"),
      round(rel, 6).as("reliability"),
      round(res, 6).as("resolution"),
      round(col("__unc"), 6).as("uncertainty"),
      round(brier - (rel - res + col("__unc")), 6).as("residual"))
  }

  def isotonicFit(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 32): DataFrame = {
    require(bins >= 2 && bins <= 256, s"bad bins $bins")
    val base = df.select(
      round(col(scoreCol) * 1e6, 0).cast("long").as("__v"),
      when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
    val ext = base.agg(min(col("__v")).as("__lo"),
      max(col("__v")).as("__hi"))
    val binned = base.crossJoin(broadcast(ext))
      .select(expr(s"((__v - __lo) * $bins) div (__hi - __lo + 1)")
        .as("bin"), col("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
    val wb = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned
      .withColumn("__cn", sum(col("n")).over(wb))
      .withColumn("__ck", sum(col("pos")).over(wb))
    // interval [j..k] averages from the two cumulative rows
    val j = cum.select(col("bin").as("__jb"), col("n").as("__jn"),
      col("pos").as("__jk"), col("__cn").as("__jcn"),
      col("__ck").as("__jck"))
    val kk = cum.select(col("bin").as("__kb"), col("__cn").as("__kcn"),
      col("__ck").as("__kck"))
    val iv = j.join(kk, col("__jb") <= col("__kb"))
      .select(col("__jb"), col("__kb"),
        ((col("__kck") - col("__jck") + col("__jk")).cast("double") /
          (col("__kcn") - col("__jcn") + col("__jn")).cast("double"))
          .as("__avg"))
    val tri = binned.select(col("bin"), col("n"), col("pos"))
      .join(iv, col("__jb") <= col("bin") && col("__kb") >= col("bin"))
    val inner = tri.groupBy(col("bin"), col("n"), col("pos"),
        col("__jb"))
      .agg(min(col("__avg")).as("__mn"))
    inner.groupBy(col("bin"), col("n"), col("pos"))
      .agg(max(col("__mn")).as("__fit"))
      .select(col("bin"), col("n").cast("long").as("n"),
        col("pos").cast("long").as("pos"),
        round(col("pos").cast("double") / col("n").cast("double"), 6)
          .as("raw_rate"),
        round(col("__fit"), 6).as("fitted"))
  }
}
