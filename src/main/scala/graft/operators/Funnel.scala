package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis — the event-analytics staple: which keys (users)
  * progress through an ORDERED sequence of step predicates, where
  * step i counts only if it happens at-or-after the key's step i−1
  * time (first-touch semantics: each step's time is the EARLIEST
  * qualifying event).
  *
  * Scale shape: one filtered aggregate per step, each an equi-shuffle
  * on the key with map-side combine; step i's frame holds only keys
  * that reached step i (monotonically shrinking). No window over the
  * full event stream, no per-key state.
  */
object Funnel {

  /** Per-key step times. `steps` = (name, predicate) in funnel order.
    * `maxGapMicros`: optional conversion window — step i then counts
    * only within `[t_{i-1}, t_{i-1} + gap]` (the "purchase within an
    * hour of the click" form every funnel report actually uses).
    * Output: one row per key that completed step 1, with columns
    * `t_<name>` (timestamp of first qualifying event, null once the
    * key drops out of the funnel).
    */
  def stepTimes(events: DataFrame, keyCol: String, tsCol: String,
      steps: Seq[(String, Column)],
      maxGapMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // step frames: keys that reached step i, with that step's time
    val frames = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, ((name, pred), i)) =>
        val base = events.filter(pred)
        val qualified = prev match {
          case None => base
          case Some(p) =>
            val prevName = steps(i - 1)._1
            val inWindow = maxGapMicros match {
              case None => col(tsCol) >= col(s"t_$prevName")
              case Some(g) =>
                col(tsCol) >= col(s"t_$prevName") &&
                  unix_micros(col(tsCol)) <=
                    unix_micros(col(s"t_$prevName")) + g
            }
            base.join(p.select(col(keyCol), col(s"t_$prevName")), keyCol)
              .filter(inWindow)
        }
        Some(qualified.groupBy(col(keyCol))
          .agg(min(col(tsCol)).as(s"t_$name")))
    }.flatten
    // left-join chain: keys keep their deepest-reached step times
    frames.reduceLeft { (acc, next) =>
      acc.join(next, Seq(keyCol), "left")
    }
  }

  /** Step-completion counts: one row, `n_<name>` per step. */
  def counts(events: DataFrame, keyCol: String, tsCol: String,
      steps: Seq[(String, Column)],
      maxGapMicros: Option[Long] = None): DataFrame = {
    val times = stepTimes(events, keyCol, tsCol, steps, maxGapMicros)
    times.agg(
      count(col(s"t_${steps.head._1}")).as(s"n_${steps.head._1}"),
      steps.tail.map { case (n, _) => count(col(s"t_$n")).as(s"n_$n") }: _*)
  }

  /** X125 — retention cohort matrix (the product-analytics staple
    * next to [[counts]]' funnel): users cohort by FIRST-SEEN bucket
    * (`date_trunc(grain)` of their earliest event) and each
    * (cohort, offset) cell counts the distinct cohort members active
    * `offset` buckets later, with the retention rate against the
    * cohort's size. Offsets are exact integer epoch-bucket
    * differences; rates round at 6 dp — hash-exact.
    *
    * Scale shape: ONE events scan → per-user `collect_set` of
    * activity buckets (ONE shuffle by user, map-side combined down
    * to the distinct (user, bucket) volume; the per-user set is
    * bounded by the calendar — ≤ one entry per bucket of history) →
    * `array_min` is the cohort and an explode recovers the activity
    * rows → one (cohort, offset) count agg. The per-cell key sets
    * are distinct by construction (the set explode emits each
    * (user, bucket) once and bucket ↔ offset is injective given the
    * cohort), so a plain count replaces count_distinct — no dedup
    * exchange; and every user is active in their OWN first bucket,
    * so cohort_size ≡ the offset-0 cell — no separate sizes agg,
    * just a vocabulary-sized broadcast join of the offset-0 slice.
    * Nothing wider than the activity table moves, and nothing sorts.
    */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String,
      grain: String = "day"): DataFrame = {
    val active = events
      .select(col(keyCol), date_trunc(grain, col(tsCol)).as("__v"))
      .groupBy(col(keyCol))
      .agg(collect_set(col("__v")).as("__bs"))
      .select(array_min(col("__bs")).as("cohort"),
        explode(col("__bs")).as("__b"))
    // day/week offsets use CALENDAR date arithmetic (datediff over
    // to_date), not epoch-second division: under a DST session
    // timezone a 23-hour day would truncate to the previous offset
    // and disagree with any calendar-based oracle. Hour buckets are
    // uniform in epoch time, so the epoch division stays for them.
    val off = grain match {
      case "day" =>
        datediff(to_date(col("__b")), to_date(col("cohort"))).cast("long")
      case "week" =>
        (datediff(to_date(col("__b")), to_date(col("cohort"))) / lit(7))
          .cast("long")
      case _ =>
        ((unix_timestamp(col("__b")) - unix_timestamp(col("cohort"))) /
          lit(grainSeconds(grain))).cast("long")
    }
    val cells = active
      .withColumn("offset", off)
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
    // attach cohort_size with a window over the TINY cells table
    // (≤ cohorts × offsets rows — calendar-bounded), not a self-join:
    // a join would execute the whole upstream subtree twice
    import org.apache.spark.sql.expressions.Window
    cells
      .withColumn("cohort_size",
        max(when(col("offset") === 0L, col("n_active")))
          .over(Window.partitionBy(col("cohort"))))
      .select(col("cohort"), col("offset"), col("cohort_size"),
        col("n_active"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }

  /** X130 — active-user trend: per activity day, DAU (distinct users
    * that day), trailing-7-day WAU, and the DAU/WAU stickiness ratio
    * — the daily engagement report next to [[retentionCohorts]]'
    * cohort view. A windowed `count_distinct` doesn't exist in any
    * engine, so WAU comes from the COVERAGE trick: each (user, day)
    * activity row covers the next 7 report days (a bounded 7-way
    * explode of the SKINNY distinct-activity table), and WAU(d) is a
    * plain distinct count over cover rows — exact, not a sketch.
    * Integer counts + ratio at 6 dp → hash-exact.
    *
    * Scale shape: distinct (user, day) agg → ×7 bounded explode →
    * one (day) distinct-count agg; nothing wider than activity moves.
    */
  def activeUserTrend(events: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val act = events
      .select(col(keyCol), to_date(date_trunc("day", col(tsCol)))
        .as("__d"))
      .distinct()
    val dau = act.groupBy(col("__d").as("day"))
      .agg(count_distinct(col(keyCol)).as("dau"))
    val wau = act
      .select(col(keyCol), explode(sequence(lit(0), lit(6))).as("__o"),
        col("__d"))
      .select(col(keyCol), date_add(col("__d"), col("__o")).as("day"))
      .groupBy(col("day"))
      .agg(count_distinct(col(keyCol)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
  }

  private def grainSeconds(grain: String): Long = grain match {
    case "day" => 86400L
    case "hour" => 3600L
    case "week" => 604800L
    case other =>
      throw new IllegalArgumentException(s"unsupported grain: $other")
  }

  /** X213 — Kaplan-Meier survival estimator: Ŝ(t) = Π_{tᵢ≤t}
    * (1 − dᵢ/nᵢ) over the distinct observed event times, with
    * right-censored subjects leaving the risk set without an event —
    * time-to-conversion/-churn analysis where plain means are wrong
    * BECAUSE of the censoring. Input: one row per subject with
    * (duration, observed flag).
    *
    * Exactness: dᵢ and risk sets nᵢ are integer cumulative counts on
    * the distinct-duration table (value-bounded window); the product
    * folds as exp(Σ ln(1−d/n)) (ln-on-identical-doubles) with the
    * everyone-dies boundary (d = n → S = 0 from there on) handled by
    * a cumulative flag, not ln(0). Output per distinct EVENT time:
    * (t, n_risk, d, censored_here, survival).
    */
  def kaplanMeier(subjects: DataFrame, durationCol: String,
      observedCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = subjects
      .select(col(durationCol).cast("long").as("__t"),
        when(observedCol, 1L).otherwise(0L).as("__e"))
      .groupBy(col("__t"))
      .agg(sum(col("__e")).as("__d"),
        sum(lit(1L) - col("__e")).as("__c"))
    val w = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum(col("__d") + col("__c")).cast("long")
      .as("__nn"))
    val cum = per.crossJoin(broadcast(tot))
      .withColumn("__left", sum(col("__d") + col("__c")).over(w))
      // risk set at t = everyone not yet departed strictly before t
      .withColumn("__nrisk",
        col("__nn") - (col("__left") - col("__d") - col("__c")))
    val terms = cum
      .withColumn("__lnterm",
        when(col("__d") === 0L, lit(0.0))
          .when(col("__d") < col("__nrisk"),
            log(lit(1.0) - col("__d").cast("double") /
              col("__nrisk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("__dead",
        max(when(col("__d") === col("__nrisk"), 1L).otherwise(0L))
          .over(w))
      .withColumn("__lnsum", sum(col("__lnterm")).over(w))
    terms.filter(col("__d") > 0L)
      .select(col("__t").as("t"),
        col("__nrisk").cast("long").as("n_risk"),
        col("__d").cast("long").as("d"),
        col("__c").cast("long").as("censored_here"),
        when(col("__dead") === 1L, lit(0.0))
          .otherwise(round(exp(col("__lnsum")), 6)).as("survival"))
  }

  /** X386 — Aalen-Johansen cumulative incidence for two COMPETING
    * risks: CIF_k(t) = Σ_{tᵢ≤t} Ŝ(tᵢ−)·d_{k,i}/nᵢ with Ŝ the
    * all-cause Kaplan-Meier — the correct "probability cause k has
    * happened by t" when another event can preempt it (1 − KM_k
    * overstates every cause; the textbook competing-risks error).
    * Completes the survival shelf beside [[kaplanMeier]] (single
    * cause) and `nelsonAalen` (hazard). Input: one row per subject
    * with (duration, cause) — cause 0 = censored, 1, 2.
    *
    * Exactness: d/c/risk sets are exact integer cumulative counts on
    * the distinct-duration table (value-bounded windows, the KM
    * class); Ŝ(t−) folds as exp of the ORDERED lnterm prefix
    * (sequential in both engines); each CIF increment is one
    * fixed-shape double PICO-quantized before the cumulative sum, so
    * the running CIFs fold exactly. Output per distinct EVENT time.
    */
  def aalenJohansen(subjects: DataFrame, durationCol: String,
      causeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = subjects
      .select(col(durationCol).cast("long").as("__t"),
        col(causeCol).cast("int").as("__k"))
      .groupBy(col("__t"))
      .agg(sum(when(col("__k") === 1, 1L).otherwise(0L)).as("__d1"),
        sum(when(col("__k") === 2, 1L).otherwise(0L)).as("__d2"),
        sum(when(col("__k") === 0, 1L).otherwise(0L)).as("__c"))
    val w = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = col("__d1") + col("__d2") + col("__c")
    val tot = per.agg(sum(all).cast("long").as("__nn"))
    val d = col("__d1") + col("__d2")
    val rs = per.crossJoin(broadcast(tot))
      .withColumn("__left", sum(all).over(w))
      .withColumn("__nrisk", col("__nn") - (col("__left") - all))
    val lnterm =
      when(d === 0L, lit(0.0))
        .when(d < col("__nrisk"),
          log(lit(1.0) - d.cast("double") /
            col("__nrisk").cast("double")))
        .otherwise(lit(0.0))
    val cum = rs
      .withColumn("__lnprev",
        coalesce(sum(lnterm).over(wPrev), lit(0.0)))
      .withColumn("__deadprev",
        coalesce(max(when(d === col("__nrisk"), 1L).otherwise(0L))
          .over(wPrev), lit(0L)))
    val sPrev = when(col("__deadprev") === 1L, lit(0.0))
      .otherwise(exp(col("__lnprev")))
    def inc(dk: Column) = round(sPrev * dk.cast("double") /
      col("__nrisk").cast("double") * 1e12, 0).cast("long")
    cum
      .withColumn("__i1", inc(col("__d1")))
      .withColumn("__i2", inc(col("__d2")))
      .withColumn("__ci1", sum(col("__i1")).over(w))
      .withColumn("__ci2", sum(col("__i2")).over(w))
      .filter(d > 0L)
      .select(col("__t").as("t"),
        col("__nrisk").cast("long").as("n_risk"),
        col("__d1").cast("long").as("d1"),
        col("__d2").cast("long").as("d2"),
        col("__c").cast("long").as("censored_here"),
        round(col("__ci1").cast("double") / 1e12, 6).as("cif1"),
        round(col("__ci2").cast("double") / 1e12, 6).as("cif2"))
  }

  /** X200 — transition (conditional) entropy of an event stream:
    * per current state, H(next | cur) = −Σ_n p(n|cur)·ln p(n|cur)
    * from the exact bigram transition counts of each key's
    * time-ordered walk — how PREDICTABLE the next step is from here,
    * the information companion to X194's raw top-paths. Exact
    * integer cells (\|states\|²-bounded), ln-on-identical-doubles,
    * round(6); transitions come from partitioned lead windows.
    */
  def transitionEntropy(events: DataFrame, keyCol: String,
      stateCol: String, orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = events.select(Seq(col(keyCol),
      col(stateCol).as("__cur")) ++
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
    val ord = orderCols.indices.map(i => col(s"__o$i"))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val trans = cells
      .withColumn("__nxt", lead(col("__cur"), 1).over(w2))
      .filter(col("__nxt").isNotNull)
      .groupBy(col("__cur"), col("__nxt"))
      .agg(count(lit(1)).as("__c"))
    val rows = trans.groupBy(col("__cur"))
      .agg(sum(col("__c")).as("__row"),
        count(lit(1)).as("n_next_states"),
        (-sum(col("__c").cast("double") *
          log(col("__c").cast("double")))).as("__sclogc"))
    rows.select(col("__cur").as("cur_state"),
      col("__row").cast("long").as("n_trans"),
      col("n_next_states").cast("long").as("n_next_states"),
      // −Σ(c/R)ln(c/R) = ln R − (Σ c·ln c)/R
      round(log(col("__row").cast("double")) +
        col("__sclogc") / col("__row").cast("double"), 6)
        .as("h_next"))
  }

  /** X195 — RFM segmentation: per key the classic
    * recency/frequency/monetary triple, each scored 1..5 by EXACT
    * quintile q = ⌊5·rank₀/n⌋+1 over the two-phase distributed rank
    * (desc for F/M, asc for R — rank 0 is always the BEST key, so
    * score = 6 − q reads naturally: 555 = recent, frequent, big).
    * No ntile window (single-partition at scale) and no
    * approximate percentiles — ranks are exact and id-tie-broken,
    * so the same customer lands in the same cell in every engine.
    * Output: key, the three raw metrics, three scores, and the
    * 3-digit rfm_code.
    */
  def rfm(orders: DataFrame, keyCol: String, dateCol: String,
      amountCol: String): DataFrame = {
    val per = orders.groupBy(col(keyCol))
      .agg(max(to_date(col(dateCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(round(col(amountCol) * 100, 0).cast("long"))
          .as("monetary_cents"))
    val mx = per.agg(max(col("__last")).as("__mx"))
    val base = per.crossJoin(broadcast(mx))
      .withColumn("recency_days",
        datediff(col("__mx"), col("__last")).cast("long"))
      .drop("__last", "__mx")
    val cnt = base.agg(count(lit(1)).as("__n"))
    def score(metric: org.apache.spark.sql.Column, out: String)
        (df: DataFrame): DataFrame =
      CorpusOps.globalRank(df, Seq(metric, col(keyCol)))
        .crossJoin(broadcast(cnt))
        .withColumn(out,
          lit(6L) - (expr("(5 * __rank) div __n") + 1L))
        .drop("__rank", "__n")
    val scored = Seq(
      score(col("recency_days").asc, "r_score") _,
      score(col("frequency").desc, "f_score") _,
      score(col("monetary_cents").desc, "m_score") _)
      .foldLeft(base) { (df, f) => f(df) }
    scored.select(col(keyCol), col("recency_days"),
      col("frequency").cast("long").as("frequency"),
      col("monetary_cents"),
      col("r_score"), col("f_score"), col("m_score"),
      (col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
        .as("rfm_code"))
  }

  /** X269 — multi-touch conversion attribution: for every conversion
    * event, find the touch events (same key, earlier, within the
    * lookback) and split the credit three ways at once — FIRST touch,
    * LAST touch, and LINEAR (1/n each) — per touch channel. The
    * marketing-analytics staple that is really a provenance op: the
    * same shape answers "which SOURCE corpus earned credit for this
    * eval win". Conversions with no touch in the window land in the
    * '(none)' channel so credit is conserved (Σ = conversions,
    * spec-asserted).
    *
    * Scale shape: the range join is BUCKETIZED (the X16 hot-key
    * as-of lesson): touches key by their lookback-width time bucket
    * and each conversion explodes to the TWO buckets its window can
    * span, so the equi-join is (key, bucket) and a user's ancient
    * history never meets a new conversion — per-pair candidates are
    * bounded by two windows of touches, not the full per-user
    * product (which measured 25× on 10× data before this). Ordered
    * windows run PER CONVERSION (touch-bounded); one channel rollup.
    * Linear credit folds as exact micro ints (1e6/n per touch,
    * remainder assigned to the first touch so conservation is exact,
    * not ulp-approximate).
    */
  def attribution(touches: DataFrame, conversions: DataFrame,
      keyCol: String, tsCol: String, channelCol: String,
      convIdCol: String, lookbackDays: Int = 7): DataFrame = {
    require(lookbackDays >= 1, s"bad lookbackDays $lookbackDays")
    import org.apache.spark.sql.expressions.Window
    val bucketSecs = lookbackDays.toLong * 86400L
    val t = touches.select(col(keyCol).as("__k"),
      col(tsCol).as("__tt"), col(channelCol).as("__ch"))
      .withColumn("__b",
        expr(s"unix_timestamp(__tt) div ${bucketSecs}L"))
    val c = conversions.select(col(keyCol).as("__k"),
      col(tsCol).as("__ct"), col(convIdCol).as("__cid"))
      .withColumn("__b0",
        expr(s"unix_timestamp(__ct) div ${bucketSecs}L"))
      .withColumn("__b",
        explode(array(col("__b0") - 1L, col("__b0"))))
    val joined = c.join(t, Seq("__k", "__b"), "left")
      .withColumn("__ok", col("__tt").isNotNull &&
        col("__tt") <= col("__ct") &&
        col("__tt") >= col("__ct") - expr(s"INTERVAL $lookbackDays DAYS"))
      .withColumn("__ch",
        when(col("__ok"), col("__ch")).otherwise(lit(null)))
      // out-of-window touches must not win the first/last ranks:
      // null their ts for ranking so in-window rows sort first
      .withColumn("__tt", when(col("__ok"), col("__tt")))
    val w = Window.partitionBy(col("__cid"))
    val wAsc = w.orderBy(col("__tt").asc_nulls_last, col("__ch"))
    val wDesc = w.orderBy(col("__tt").desc_nulls_last, col("__ch"))
    val scored = joined
      .withColumn("__nT",
        sum(when(col("__ok"), 1L).otherwise(0L)).over(w))
      .withColumn("__rkA", row_number().over(wAsc))
      .withColumn("__rkD", row_number().over(wDesc))
      // keep one row per (conversion, touch); an untouched conversion
      // keeps exactly ONE of its (two bucket-explode) null rows
      .filter(col("__ok") ||
        (col("__nT") === 0L && col("__rkA") === 1))
      .withColumn("__chan", coalesce(col("__ch"), lit("(none)")))
      .withColumn("__first",
        when(col("__nT") === 0L || col("__rkA") === 1, 1L)
          .otherwise(0L))
      .withColumn("__last",
        when(col("__nT") === 0L || col("__rkD") === 1, 1L)
          .otherwise(0L))
      // linear micro-credit: 1e6 div n, remainder to the first touch
      .withColumn("__lin",
        when(col("__nT") === 0L, 1000000L).otherwise(
          expr("1000000 div __nT") +
            when(col("__rkA") === 1, pmod(lit(1000000L), col("__nT")))
              .otherwise(0L)))
    scored.groupBy(col("__chan").as("channel"))
      .agg(sum(col("__first")).cast("long").as("first_touch"),
        sum(col("__last")).cast("long").as("last_touch"),
        sum(col("__lin")).cast("long").as("__linMicro"),
        countDistinct(col("__cid")).cast("long")
          .as("conversions_touched"))
      .select(col("channel"), col("first_touch"), col("last_touch"),
        round(col("__linMicro").cast("double") / 1e6, 6)
          .as("linear_credit"),
        col("conversions_touched"))
  }

  /** X264 — Nelson-Aalen cumulative hazard: Ĥ(t) = Σ_{tᵢ≤t} dᵢ/nᵢ
    * over the distinct-duration table — the hazard-scale companion
    * to [[kaplanMeier]]'s survival curve: additive (hazards of
    * disjoint periods sum), so it's the right object for comparing
    * cohorts or reading the INSTANTANEOUS conversion pressure where
    * Ŝ multiplies. Same censoring-correct risk sets (integer suffix
    * counts), same distinct-duration-bounded ordered pass; each d/n
    * term nano-quantizes before the cumulative fold so the running
    * sum is an exact integer.
    */
  def nelsonAalen(subjects: DataFrame, durationCol: String,
      observedCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = subjects.select(col(durationCol).cast("long").as("__t"),
      when(observedCol, 1L).otherwise(0L).as("__d"))
    val per = base.groupBy(col("__t"))
      .agg(count(lit(1)).as("__m"), sum(col("__d")).as("__dd"))
    val wAll = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = per
      .withColumn("__before", coalesce(sum(col("__m"))
        .over(Window.orderBy(col("__t"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = per.agg(sum(col("__m")).cast("long").as("__nTot"))
    val risked = withRisk.crossJoin(broadcast(tot))
      .withColumn("__n", col("__nTot") - col("__before"))
      .filter(col("__dd") > 0L)
      .withColumn("__hn",
        round(col("__dd").cast("double") / col("__n").cast("double")
          * 1e9, 0).cast("long"))
    risked.withColumn("__H", sum(col("__hn")).over(wAll))
      .select(col("__t").as("duration"),
        col("__n").cast("long").as("n_at_risk"),
        col("__dd").cast("long").as("n_events"),
        round(col("__H").cast("double") / 1e9, 6)
          .as("cumulative_hazard"))
  }

  /** X252 — growth accounting (the SaaS "quick ratio" ledger): per
    * period, how many active users are NEW (first period ever),
    * RETAINED (active in the immediately previous period),
    * RESURRECTED (returning after a gap), and how many CHURNED INTO
    * this period (active last period, silent this one) — the
    * decomposition that says whether an X130-flat active curve is
    * healthy (retained) or a leaky bucket refilled by acquisition
    * (new ≈ churned). Identity: active(w) = new + retained +
    * resurrected, and churned_into(w) = active(w−1) − retained(w)
    * (both spec-asserted).
    *
    * Exact integers throughout: classification reads lag/lead over
    * the DISTINCT (user, period) table (per-user windows — activity-
    * bounded, never event-bounded); churn into period w+1 needs the
    * w+1 horizon, so the max period reports only its arrivals. One
    * row per period plus the quick ratio (new+resurrected)/churned
    * (NULL when nothing churned).
    */
  def growthAccounting(events: DataFrame, userCol: String,
      periodCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val active = events.select(col(userCol).as("__u"),
      periodCol.cast("long").as("__w")).distinct()
    val wu = Window.partitionBy(col("__u")).orderBy(col("__w"))
    val tagged = active
      .withColumn("__prev", lag(col("__w"), 1).over(wu))
      .withColumn("__next", lead(col("__w"), 1).over(wu))
    val classes = tagged.groupBy(col("__w"))
      .agg(count(lit(1)).cast("long").as("n_active"),
        sum(when(col("__prev").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_new"),
        sum(when(col("__prev") === col("__w") - 1L, 1L).otherwise(0L))
          .cast("long").as("n_retained"),
        sum(when(col("__prev").isNotNull &&
          col("__prev") < col("__w") - 1L, 1L).otherwise(0L))
          .cast("long").as("n_resurrected"))
    // a user active at w with no activity at w+1 churns INTO w+1
    val churn = tagged
      .filter(col("__next").isNull || col("__next") > col("__w") + 1L)
      .groupBy((col("__w") + 1L).as("__w"))
      .agg(count(lit(1)).cast("long").as("__ch"))
    classes.join(churn, Seq("__w"), "left")
      .withColumn("n_churned_in", coalesce(col("__ch"), lit(0L)))
      .select(col("__w").as("period"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"), col("n_churned_in"),
        when(col("n_churned_in") > 0L,
          round((col("n_new") + col("n_resurrected")).cast("double") /
            col("n_churned_in").cast("double"), 6)).as("quick_ratio"))
  }

  /** X320 — restricted mean survival time: RMST(τ) = ∫₀^τ Ŝ(t)dt,
    * the area under the [[kaplanMeier]] curve up to the horizon —
    * the EFFECT-SIZE face of survival analysis ("even-cohort users
    * take 2.3 fewer days to convert within the 30-day window") where
    * [[logRank]] only says "different" and a mean of durations is
    * censoring-broken. Computed from the KM table itself: each
    * inter-event segment contributes S_prev·Δt (micro-quantized
    * before the fold — S is already the curve's round(6) value), the
    * tail contributes S_last·(τ − t_last); no events by τ means
    * RMST = τ exactly. Event-time-bounded windows only.
    */
  def rmst(subjects: DataFrame, durationCol: String,
      observedCol: Column, tau: Long): DataFrame = {
    require(tau > 0, s"bad tau $tau")
    import org.apache.spark.sql.expressions.Window
    val km = kaplanMeier(subjects, durationCol, observedCol)
      .filter(col("t") <= tau)
    val w = Window.orderBy(col("t"))
    val seg = km
      .withColumn("__prevT", coalesce(lag(col("t"), 1).over(w), lit(0L)))
      .withColumn("__prevS",
        coalesce(lag(col("survival"), 1).over(w), lit(1.0)))
      .withColumn("__term",
        round(col("__prevS") * (col("t") - col("__prevT")) * 1e6, 0)
          .cast("long"))
    val folded = seg.agg(
      coalesce(sum(col("__term")), lit(0L)).cast("long").as("__area"),
      max(struct(col("t"), col("survival"))).as("__last"),
      coalesce(sum(col("d")), lit(0L)).cast("long").as("n_events"))
    val base = subjects.agg(count(lit(1)).cast("long").as("n_subjects"))
    val tailTerm = when(col("__last").isNull,
      lit(tau).cast("double") * 1e6)
      .otherwise(round(col("__last.survival") *
        (lit(tau) - col("__last.t")) * 1e6, 0))
    base.crossJoin(broadcast(folded))
      .select(col("n_subjects"), col("n_events"),
        lit(tau).as("tau"),
        round((col("__area").cast("double") + tailTerm) / 1e6, 6)
          .as("rmst"))
  }

  /** X288 — two-group log-rank test: does survival differ between
    * cohorts A and B — the censoring-correct comparison that a mean
    * or t-test on durations gets WRONG whenever observation windows
    * truncate (the exact reason [[kaplanMeier]] exists). At each
    * distinct event time: observed A-events d_Aj vs expected
    * e_j = d_j·n_Aj/n_j under the shared-hazard null, variance
    * v_j = d_j·(n_Aj/n_j)(1−n_Aj/n_j)(n_j−d_j)/(n_j−1);
    * z = (O−E)/√V.
    *
    * Same distinct-duration machinery as kaplanMeier (risk sets are
    * integer suffix counts per group; the ordered pass is
    * duration-bounded); each e_j and v_j term is a fixed-shape
    * double from exact integers, nano-quantized BEFORE the fold (the
    * nelsonAalen convention) so O, E, V are engine-exact integers.
    * Single-subject times (n_j = 1) contribute zero variance by the
    * (n_j−d_j)/(n_j−1) factor's guard. z NULL when V = 0.
    */
  def logRank(subjects: DataFrame, durationCol: String,
      observedCol: Column, isA: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = subjects.select(col(durationCol).cast("long").as("__t"),
      when(observedCol, 1L).otherwise(0L).as("__e"),
      when(isA, 1L).otherwise(0L).as("__a"))
    val per = base.groupBy(col("__t"))
      .agg(sum(when(col("__a") === 1L, 1L).otherwise(0L)).as("__ma"),
        sum(when(col("__a") === 0L, 1L).otherwise(0L)).as("__mb"),
        sum(when(col("__a") === 1L, col("__e")).otherwise(0L))
          .as("__da"),
        sum(when(col("__a") === 0L, col("__e")).otherwise(0L))
          .as("__db"))
    val tot = per.agg(sum(col("__ma")).cast("long").as("__na"),
      sum(col("__mb")).cast("long").as("__nb"))
    val wBefore = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risked = per
      .withColumn("__beforeA",
        coalesce(sum(col("__ma")).over(wBefore), lit(0L)))
      .withColumn("__beforeB",
        coalesce(sum(col("__mb")).over(wBefore), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("__rA", col("__na") - col("__beforeA"))
      .withColumn("__rB", col("__nb") - col("__beforeB"))
      .withColumn("__d", col("__da") + col("__db"))
      .withColumn("__r", col("__rA") + col("__rB"))
      .filter(col("__d") > 0L)
    val dd = col("__d").cast("double")
    val rr = col("__r").cast("double")
    val ra = col("__rA").cast("double")
    val eTerm = round(dd * ra / rr * 1e9, 0).cast("long")
    val vTerm = when(col("__r") > 1L,
      round(dd * (ra / rr) * (lit(1.0) - ra / rr) *
        (rr - dd) / (rr - 1.0) * 1e9, 0).cast("long"))
      .otherwise(lit(0L))
    val fold = risked.agg(max(col("__na")).as("n_a"),
      max(col("__nb")).as("n_b"),
      sum(col("__da")).cast("long").as("observed_a"),
      sum(eTerm).cast("long").as("__en"),
      sum(vTerm).cast("long").as("__vn"))
    val e = col("__en").cast("double") / 1e9
    val v = col("__vn").cast("double") / 1e9
    fold.select(col("n_a"), col("n_b"), col("observed_a"),
      round(e, 6).as("expected_a"),
      when(col("__vn") > 0L,
        round((col("observed_a").cast("double") - e) / sqrt(v), 6))
        .as("z_stat"))
  }

  /** X279 — sequential-pattern support: for every ordered pair of
    * event types (a, b), how many keys exhibit "a THEN b" — an a
    * event strictly before some b event — and that count as a share
    * of all keys. The length-2 sequence-mining core (the GSP/
    * PrefixSpan support table), and the direction signal X200's
    * transition entropy aggregates away (transitions see only
    * ADJACENT steps; this sees "signup eventually precedes purchase"
    * across any gap).
    *
    * The whole computation rides one EXISTS identity: key k has
    * a-then-b  ⟺  min_ts_k(a) < max_ts_k(b) — so the per-key state
    * is the (key, type, first, last) table (|keys|·|types| rows, a
    * map-side-combined groupBy), and pair generation is a per-key
    * equi-self-join with |types|² bounded fanout — never an
    * event×event join, never a window over the raw stream. Exact
    * integer supports; the share is one double division, round(6).
    */
  def sequencePairs(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    val per = events.groupBy(col(keyCol).as("__k"),
        col(typeCol).as("__t"))
      .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
    val tot = events.agg(
      countDistinct(col(keyCol)).cast("long").as("__nk"))
    val a = per.select(col("__k"), col("__t").as("type_first"),
      col("__first"))
    val b = per.select(col("__k"), col("__t").as("type_then"),
      col("__last"))
    a.join(b, Seq("__k"))
      .filter(col("type_first") =!= col("type_then") &&
        col("__first") < col("__last"))
      .groupBy(col("type_first"), col("type_then"))
      .agg(count(lit(1)).cast("long").as("n_keys"))
      .crossJoin(broadcast(tot))
      .select(col("type_first"), col("type_then"), col("n_keys"),
        round(col("n_keys").cast("double") / col("__nk"), 6)
          .as("support"))
  }

  /** X352 — top-k churn: day-over-day Jaccard of each period's top-k
    * key set — "is today's hot-content list the same list as
    * yesterday's" (Jaccard near 1 = stable ranking; a dip flags a
    * traffic regime change the X130 volume trend can't see, because
    * volume can hold while the MEMBERS rotate). The set-level
    * complement of X224's rank-weighted RBO.
    *
    * Scale shape: per-period top-k via a rank window PARTITIONED BY
    * period (keyed — each day sorts independently, no global funnel;
    * ties break by key for determinism); consecutive periods meet in
    * one k-bounded self-join on period = period+1, so the churn table
    * is (periods × k)-sized regardless of row count.
    */
  def topkChurn(events: DataFrame, tsCol: String, keyCol: String,
      k: Int = 20): DataFrame = {
    require(k >= 1, s"bad k $k")
    import org.apache.spark.sql.expressions.Window
    val daily = events.groupBy(to_date(col(tsCol)).as("__d"),
        col(keyCol).as("__key"))
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("__d"))
      .orderBy(col("__n").desc, col("__key"))
    val top = daily.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(col("__d"), col("__key"))
    val prev = top.select(date_add(col("__d"), 1).as("__d"),
      col("__key").as("__keyPrev"))
    val inter = top.join(prev,
        top("__d") === prev("__d") && col("__key") === col("__keyPrev"))
      .groupBy(top("__d").as("__d"))
      .agg(count(lit(1)).cast("long").as("__both"))
    val sizes = top.groupBy(col("__d"))
      .agg(count(lit(1)).cast("long").as("__sz"))
    val prevSizes = sizes.select(date_add(col("__d"), 1).as("__d"),
      col("__sz").as("__szPrev"))
    sizes.join(prevSizes, Seq("__d"))
      .join(inter, Seq("__d"), "left")
      .withColumn("__b", coalesce(col("__both"), lit(0L)))
      .select(col("__d").as("day"), col("__sz").as("k_today"),
        col("__szPrev").as("k_prev"), col("__b").as("n_shared"),
        round(col("__b").cast("double") /
          (col("__sz") + col("__szPrev") - col("__b")).cast("double"),
          6).as("jaccard"))
      .orderBy(col("day"))
  }
}
