package graft.queries

import org.apache.spark.sql.functions._

/** Table-stakes OLAP operators beyond the reference surface — pivot,
  * multi-level rollup, exact quantiles — so a user migrating any
  * analytics workload onto this engine finds them first-class and
  * oracle-verified.
  */
object OlapQueries {

  val defs: Seq[QueryDef] = Seq(

    // Pivot: per-user event counts, event types as columns. The plan
    // is ONE aggregation (Spark pivots in a single groupBy with
    // pivot-value partial aggregates — no per-column scans); pivot
    // values are declared, which at scale is mandatory (an undeclared
    // pivot needs a distinct-values pre-query).
    QueryDef(
      "q_pivot_event_counts",
      Some("""
        SELECT user_id,
          CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
          CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
          CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events
        GROUP BY user_id
        ORDER BY user_id
      """.trim),
      "pivot: per-user event-type count matrix")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.events(spark, dir)
          .groupBy($"user_id")
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(coalesce(count(lit(1)), lit(0L)))
          .na.fill(0L)
          .orderBy($"user_id")
      }),

    // Rollup: order totals at (status, priority), (status), and grand
    // -total levels in one pass — Spark expands grouping sets inside
    // a single shuffle with partial aggregation per set.
    QueryDef(
      "q_order_rollup",
      Some("""
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               count(*) AS n,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE), 2)
                 AS total_price
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY status NULLS FIRST, priority NULLS FIRST
      """.trim),
      "rollup: order totals at three grouping levels in one pass")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.table(spark, dir, "orders")
          .rollup($"o_orderstatus".as("status"),
            $"o_orderpriority".as("priority"))
          .agg(count(lit(1)).as("n"),
            round(sum($"o_totalprice".cast("decimal(20,6)")).cast("double"), 2)
              .as("total_price"))
          .orderBy($"status".asc_nulls_first, $"priority".asc_nulls_first)
      }),

    // Cube: all four grouping combinations of (status, priority) in
    // one pass — same grouping-sets machinery as rollup, 2ⁿ sets.
    QueryDef(
      "q_order_cube",
      Some("""
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               count(*) AS n
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY status NULLS FIRST, priority NULLS FIRST
      """.trim),
      "cube: order counts across every grouping combination")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.table(spark, dir, "orders")
          .cube($"o_orderstatus".as("status"),
            $"o_orderpriority".as("priority"))
          .agg(count(lit(1)).as("n"))
          .orderBy($"status".asc_nulls_first, $"priority".asc_nulls_first)
      }),

    // Set difference over NESTED deterministic samples: the 20% md5
    // sample minus the 10% sample must be exactly the hash band
    // [10%, 20%) — EXCEPT on one side, a closed-form predicate on the
    // oracle side. Verifies both the set operator and the sampler's
    // nesting guarantee in one query.
    QueryDef(
      "q_sample_band_except",
      Some(s"""
        SELECT doc_id
        FROM documents
        WHERE CAST(('0x' || substr(md5('s1' || text), 1, 8)) AS BIGINT)
              >= ${math.round(0.1 * 4294967296.0)}
          AND CAST(('0x' || substr(md5('s1' || text), 1, 8)) AS BIGINT)
              < ${math.round(0.2 * 4294967296.0)}
        ORDER BY doc_id
      """.trim),
      "EXCEPT of nested samples == the closed-form hash band")(
      (spark, dir) => {
        import spark.implicits._
        import graft.operators.CorpusOps
        val docs = QueryDef.table(spark, dir, "documents")
        CorpusOps.hashSample(docs, "text", 0.2, "s1").select($"doc_id")
          .except(
            CorpusOps.hashSample(docs, "text", 0.1, "s1").select($"doc_id"))
          .orderBy($"doc_id")
      }),

    // Exact quantiles per event type: Spark `percentile` and DuckDB
    // `quantile_cont` both use linear interpolation over the sorted
    // values — identical doubles, rounded for belt-and-braces. The
    // scale path swaps in approx_percentile (t-digest, no full sort);
    // the exact form is the oracle-able twin, same pairing as
    // HLL/countDistinct.
    QueryDef(
      "q_value_quantiles",
      Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.25), 6) AS p25,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.75), 6) AS p75,
               round(quantile_cont(value, 0.95), 6) AS p95
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """.trim),
      "exact per-group quantiles (linear interpolation)")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.events(spark, dir)
          .groupBy($"event_type")
          .agg(
            round(percentile($"value", lit(0.25)), 6).as("p25"),
            round(percentile($"value", lit(0.5)), 6).as("p50"),
            round(percentile($"value", lit(0.75)), 6).as("p75"),
            round(percentile($"value", lit(0.95)), 6).as("p95"))
          .orderBy($"event_type")
      }),

    // The 100 TB quantile path: approx_percentile (t-digest-style
    // sketch, partial-aggregatable, no per-group sort). Rows-only for
    // the driver (sketch values aren't SQL-reproducible); OlapSpec
    // bounds its error against the exact twin, the same pairing as
    // HLL vs countDistinct.
    QueryDef(
      "q_approx_quantiles",
      None,
      "approximate per-group quantiles (sketch; exact twin above)")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.events(spark, dir)
          .groupBy($"event_type")
          .agg(approx_percentile($"value", lit(0.5), lit(1000)).as("p50"),
            approx_percentile($"value", lit(0.95), lit(1000)).as("p95"))
          .orderBy($"event_type")
      }),

    // Analytic window-function suite over the per-user event stream:
    // lag delta, ntile quartile, percent_rank, cume_dist — one
    // window shuffle (partition by user), total order via (ts,
    // event_id). percent_rank/cume_dist are rationals of row counts,
    // identical doubles in any engine; the lag delta subtracts two
    // stored doubles — also engine-invariant.
    QueryDef(
      "q_window_funcs",
      Some("""
        SELECT event_id, user_id,
               round(value - lag(value) OVER w, 3) AS delta,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
      """.trim),
      "window suite: lag delta, ntile, percent_rank, cume_dist")(
      (spark, dir) => {
        import spark.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        QueryDef.events(spark, dir)
          .select($"event_id", $"user_id",
            round($"value" - lag($"value", 1).over(w), 3).as("delta"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy($"event_id")
      }),
  )
}
