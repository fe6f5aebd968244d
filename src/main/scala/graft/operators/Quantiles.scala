package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT quantiles over a distributed long column without sorting
  * anything: iterative histogram refinement on the VALUE domain —
  * each pass buckets the surviving value window `fanout` ways with
  * one map-side-combined groupBy, the driver picks the bucket
  * holding the target rank, and the window shrinks fanout-fold:
  * ⌈log_fanout(range)⌉ passes total (3 for a 2²⁴ domain at the
  * default 256), driver state three longs.
  *
  * Where it fits: `percentile` (exact) materializes and sorts every
  * value per group, and `approx_percentile` carries rank error — at
  * 100 TB, when the quantile feeds a CONTRACT (billing tiers, SLA
  * thresholds), this is "exact without a global sort": a handful of
  * full-scan histogram passes, no shuffle wider than `fanout` rows
  * per task. (A binary-search-on-count variant is simpler but pays
  * ~log₂(range) ≈ 40 sequential job round-trips — scheduler latency
  * dominates; fanout trades per-pass shuffle width for passes.)
  *
  * Result: the smallest v with rank(v) ≥ ⌈q·n⌉ — the lower exact
  * q-quantile, the definition a SQL oracle replays with one
  * cumulative-count window.
  */
object Quantiles {

  def exactQuantile(df: DataFrame, valueCol: String, q: Double,
      fanout: Int = 256): Long = {
    require(q > 0.0 && q <= 1.0, s"q must be in (0, 1], got $q")
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    val row = df.agg(min(col(valueCol)), max(col(valueCol)),
      count(col(valueCol))).head()
    require(!row.isNullAt(2) && row.getLong(2) > 0, "no non-null values")
    val (mn, mx, n) = (row.getLong(0), row.getLong(1), row.getLong(2))
    var target = math.max(math.ceil(q * n).toLong, 1L)
    var lo = mn
    var hi = mx
    // (v − lo) in the bucket key needs the domain span inside a
    // signed long; a column genuinely spanning ≥ 2⁶³ must be
    // shifted/scaled first — fail loudly, never bucket wrapped
    require(BigInt(mx) - BigInt(mn) <= Long.MaxValue,
      s"value domain [$mn, $mx] spans more than 2^63 — rescale first")
    while (lo < hi) {
      // ceil((span+1)/fanout) with the division IN BigInt — narrowing
      // before dividing wraps negative for spans near Long.MaxValue
      // and silently degrades to width=1 (per-distinct-value buckets)
      val width = math.max(
        ((BigInt(hi) - BigInt(lo) + fanout) / fanout).toLong, 1L)
      // integral `div`, not `/`: Column `/` is double division and
      // loses exactness past 2^53. (v − lo) needs the domain span to
      // fit a signed long — true unless the column spans all 2⁶⁴.
      val counts = df
        .filter(col(valueCol) >= lo && col(valueCol) <= hi)
        .groupBy(expr(
          s"CAST((`$valueCol` - (${lo}L)) div ${width}L AS BIGINT)")
          .as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .sortBy(_._1)
      // walk buckets until the target rank falls inside one
      var acc = 0L
      var chosen = -1L
      for ((b, c) <- counts if chosen < 0) {
        if (acc + c >= target) { chosen = b; target -= acc }
        else acc += c
      }
      // target rank is guaranteed inside [lo, hi], so a bucket matched
      lo = lo + chosen * width
      // clamp IN BigInt: lo + width − 1 wraps negative when lo sits
      // near Long.MaxValue (width can overshoot the window span by up
      // to fanout−1), making hi < lo and exiting unconverged
      hi = (BigInt(lo) + width - 1).min(BigInt(hi)).toLong
    }
    lo
  }

  /** Per-group exact lower q-quantile — ALL groups refine in the
    * same histogram passes; see [[exactQuantilesByGroup]] for the
    * multi-q form this delegates to.
    *
    * Output: (groupCol, quantile) one row per group with ≥1
    * non-null value.
    */
  def exactQuantileByGroup(df: DataFrame, groupCol: String,
      valueCol: String, q: Double, fanout: Int = 256): DataFrame =
    exactQuantilesByGroup(df, groupCol, valueCol, Seq(q), fanout)
      .drop("q")

  /** Per-group exact lower q-quantiles, SEVERAL q at once — every
    * (group, q) window refines in the same histogram passes: each
    * pass joins the rows against a tiny broadcast bounds table (one
    * (lo, width) per unconverged (group, q) window), buckets per
    * window, and narrows them all at once. Pass count = that of the
    * WIDEST window (⌈log_fanout(range)⌉), not Σ groups and not
    * Σ quantiles — a winsorize (p05 AND p95 per group) or a QTE grid
    * (4 quantiles × 2 arms) costs the same number of scans as one
    * median. Driver state is three longs per (group, q), so
    * (groups × qs) should be "dimension-sized", not "key-sized".
    *
    * Output: (groupCol, q, quantile) one row per requested q per
    * group with ≥1 non-null value.
    */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double], fanout: Int = 256)
      : DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    require(qs.distinct.size == qs.size, s"duplicate q in $qs")
    qs.foreach(q =>
      require(q > 0.0 && q <= 1.0, s"q must be in (0, 1], got $q"))
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    val spark = df.sparkSession
    val groupStats = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.get(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    groupStats.foreach { case (g, (lo, hi, _)) =>
      require(BigInt(hi) - BigInt(lo) <= Long.MaxValue,
        s"group $g spans more than 2^63 — rescale first")
    }
    // state: (group, q index) -> (lo, hi, remaining target rank)
    val init: Map[(Any, Int), (Long, Long, Long)] =
      groupStats.flatMap { case (g, (lo, hi, n)) =>
        qs.zipWithIndex.map { case (q, qi) =>
          (g, qi) -> (lo, hi,
            math.max(math.ceil(q * n).toLong, 1L))
        }
      }.toMap
    var state = init
    while (state.exists { case (_, (lo, hi, _)) => lo < hi }) {
      val open = state.filter { case (_, (lo, hi, _)) => lo < hi }
      val bounds = open.toSeq.map { case ((g, qi), (lo, hi, _)) =>
        val width = math.max(
          ((BigInt(hi) - BigInt(lo) + fanout) / fanout).toLong, 1L)
        (g, qi, lo, hi, width)
      }
      val boundsDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          bounds.map { case (g, qi, lo, hi, w) =>
            org.apache.spark.sql.Row(g, qi, lo, hi, w) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          df.schema(groupCol).copy(name = "__qg"),
          org.apache.spark.sql.types.StructField("__qi",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("__lo",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__hi",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__w",
            org.apache.spark.sql.types.LongType))))
      // null-safe join: a null GROUP key is legal (init keeps it), and
      // === would starve it of count rows → NoSuchElementException
      val counts = df
        .join(broadcast(boundsDf), col(groupCol) <=> col("__qg"))
        .filter(col(valueCol) >= col("__lo") &&
          col(valueCol) <= col("__hi"))
        .groupBy(col("__qg"), col("__qi"),
          expr(s"CAST((`$valueCol` - __lo) div __w AS BIGINT)").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(r => (r.get(0), r.getInt(1)))
        .map { case (k, rows) =>
          k -> rows.map(r => r.getLong(2) -> r.getLong(3)).sortBy(_._1)
        }
      val widths = bounds.map { case (g, qi, _, _, w) => (g, qi) -> w }
        .toMap
      state = state.map {
        case (k, st @ (lo, hi, _)) if lo >= hi => k -> st
        case (k, (lo, hi, target)) =>
          val width = widths(k)
          var acc = 0L; var chosen = -1L; var newTarget = target
          for ((b, c) <- counts(k) if chosen < 0) {
            if (acc + c >= target) { chosen = b; newTarget = target - acc }
            else acc += c
          }
          val newLo = lo + chosen * width
          // same BigInt clamp as exactQuantile: newLo + width − 1 can
          // wrap for windows ending near Long.MaxValue
          k -> (newLo, (BigInt(newLo) + width - 1).min(BigInt(hi)).toLong,
            newTarget)
      }
    }
    val out = state.toSeq.map { case ((g, qi), (lo, _, _)) =>
      (g, qs(qi), lo)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.map { case (g, q, v) =>
        org.apache.spark.sql.Row(g, q, v) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        df.schema(groupCol),
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("quantile",
          org.apache.spark.sql.types.LongType))))
  }

  /** Robust per-group outlier detection via median absolute deviation
    * — the quantile family's consumer: flag rows whose value sits more
    * than `c`·MAD from their group's median. Unlike mean/stddev
    * gating (X19 winsorize's cousin), median/MAD don't move when the
    * outliers themselves get bigger — the standard robust filter for
    * corrupt document lengths, runaway token counts, duplicated-blob
    * sizes.
    *
    * Both statistics are [[exactQuantileByGroup]] lower exact medians
    * (sort-free histogram refinement); value, median, MAD, and the
    * `dev > c·mad` comparison are all 64-bit integers, so the flags
    * reproduce bit-for-bit in any engine — no distribution
    * assumptions, no floating point anywhere.
    *
    * Output: (idCol, groupCol, valueCol, med, mad, is_outlier).
    *
    * Scale shape: 2×⌈log_fanout(range)⌉ full scans (the two grouped
    * refinements) + two broadcast joins of |groups|-row tables; no
    * shuffle wider than fanout rows per task. Degenerate groups
    * (≥ half the values identical → MAD 0) flag exactly the
    * non-median values when c·0 < dev — the conventional MAD=0
    * behavior, callers gate on group size if that bites.
    */
  def madOutliers(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, c: Long = 3L): DataFrame = {
    // join back with <=> — exactQuantileByGroup deliberately supports
    // a null group key, so the stat joins must not silently drop it
    // the way a Seq(groupCol) equi-join would
    val med = exactQuantileByGroup(df, groupCol, valueCol, q = 0.5)
      .withColumnRenamed("quantile", "med")
      .withColumnRenamed(groupCol, "__qg")
    val dev = df.join(broadcast(med), col(groupCol) <=> col("__qg"))
      .drop("__qg")
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    val mad = exactQuantileByGroup(dev, groupCol, "__dev", q = 0.5)
      .withColumnRenamed("quantile", "mad")
      .withColumnRenamed(groupCol, "__qg")
    dev.join(broadcast(mad), col(groupCol) <=> col("__qg"))
      .select(col(idCol), col(groupCol), col(valueCol),
        col("med"), col("mad"),
        (col("__dev") > lit(c) * col("mad")).as("is_outlier"))
  }

  /** X212 — split-conformal calibration threshold per group: the
    * k-th smallest nonconformity score with k = ⌈(1−α)(n+1)⌉ — the
    * FINITE-SAMPLE valid cutoff (accepting future scores ≤ it covers
    * with probability ≥ 1−α, no distributional assumption) that a
    * plain (1−α)-quantile does NOT give. The modern release-gate
    * companion to X153's percentile gate; α arrives as the exact
    * rational aNum/aDen so k is pure integer arithmetic. Groups too
    * small for the level (k > n) report a NULL threshold — the
    * honest "not enough calibration data" answer.
    *
    * Scale shape: per-group rank window (partitioned) + one filter;
    * \|groups\| rows out.
    */
  def conformalThreshold(df: DataFrame, groupCol: String,
      scoreCol: String, aNum: Long = 1L, aDen: Long = 10L)
      : DataFrame = {
    require(aNum > 0 && aNum < aDen, s"bad alpha $aNum/$aDen")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol),
      round(col(scoreCol) * 1e6, 0).cast("long").as("__s"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__s"))
    val ranked = base
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
    // k = ⌈(aDen−aNum)(n+1)/aDen⌉
    val k = expr(s"((${aDen - aNum}) * (__n + 1) + $aDen - 1)" +
      s" div $aDen")
    val at = ranked.withColumn("__k", k)
      .filter(col("__r") === col("__k"))
      .select(col(groupCol), col("__k"),
        round(col("__s").cast("double") / 1e6, 6).as("__thr"))
    ranked.groupBy(col(groupCol))
      .agg(max(col("__n")).cast("long").as("n"),
        max(k).cast("long").as("k"))
      .join(at, Seq(groupCol), "left")
      .select(col(groupCol), col("n"), col("k"),
        col("__thr").as("threshold"))
  }

  /** X314 — quantile treatment effects: the A−B gap at each
    * requested quantile — the DISTRIBUTIONAL effect readout where a
    * mean difference (X289's d) hides tail action ("the median moved
    * 2 chars but the p90 moved 400" is a different intervention than
    * a uniform shift). Each quantile comes from the X61 sort-free
    * grouped bisection, so the whole table costs
    * \|qs\|·⌈log(range)⌉ pushed-down count passes, never a sort;
    * every output is an exact order statistic (longs).
    */
  def quantileTreatmentEffect(df: DataFrame, valueCol: String,
      isA: Column, qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9))
      : DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val grouped = df.select(
      when(isA, "a").otherwise("b").as("__grp"),
      col(valueCol).cast("long").as("__v"))
    // ALL requested quantiles of BOTH arms refine in the same
    // histogram passes — the table costs ⌈log(range)⌉ pushed-down
    // count passes total, not |qs|·⌈log(range)⌉
    val t = exactQuantilesByGroup(grouped, "__grp", "__v", qs)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    val perQ = qs.map { q =>
      // a one-sided split (or empty input) yields no row for the
      // missing group — fail with the actual problem, not an opaque
      // driver NoSuchElementException (r10 ADVICE)
      require(t.contains(("a", q)) && t.contains(("b", q)),
        s"quantileTreatmentEffect needs both treatment groups " +
          s"non-empty; got only ${t.keys.map(_._1).toSet
            .mkString("{", ",", "}")}")
      (q, t(("a", q)), t(("b", q)), t(("a", q)) - t(("b", q)))
    }
    perQ.toDF("q", "quantile_a", "quantile_b", "qte")
  }
}
