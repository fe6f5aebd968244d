package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, SaltedJoin}
import graft.queries.QueryDef.table

/** Join-operator contract queries: the relational join surface the
  * engine exposes beyond the reference's sequence joins (SURVEY.md
  * §2.3 "not present in reference") — as-of, broadcast range/theta,
  * broadcast star joins, and per-group top-k. Every plan is checked
  * for its intended physical shape in JoinPlanSpec (broadcast dims
  * broadcast, single window shuffle for as-of).
  */
object JoinQueries {

  val defs: Seq[QueryDef] = Seq(

    // As-of join: each purchase event ⋈ the user's latest prior-or-
    // simultaneous click. One window shuffle, no range-candidate
    // blowup (AsOfJoin scaladoc). Oracle: DuckDB native ASOF JOIN.
    QueryDef(
      "q_asof_join",
      Some("""
        WITH p AS (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
                   FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, c.click_id, round(c.click_value, 3) AS click_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
      """.trim),
      "as-of join: purchase ⋈ latest prior click per user")(
      (spark, dir) => {
        import spark.implicits._
        val ev = QueryDef.events(spark, dir)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", $"event_id")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"),
            $"value".as("click_value"))
        AsOfJoin.asOf(purchases, clicks, "user_id", "ts",
            Seq("click_id", "click_value"))
          .select($"event_id", $"user_id", $"click_id",
            round($"click_value", 3).as("click_value"))
          .orderBy($"event_id")
      }),

    // Forward as-of with tolerance: each purchase joins the EARLIEST
    // following click within 7 days (pandas merge_asof(direction=
    // 'forward', tolerance=...) semantics); same one-shuffle window
    // plan, matched-ts distance checked from the carried right ts.
    QueryDef(
      "q_asof_forward",
      Some("""
        WITH p AS (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
                   FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id,
          CASE WHEN c.ts IS NOT NULL
                AND epoch_us(c.ts) - epoch_us(p.ts) <= 604800000000
               THEN c.click_id END AS click_id,
          CASE WHEN c.ts IS NOT NULL
                AND epoch_us(c.ts) - epoch_us(p.ts) <= 604800000000
               THEN round(c.click_value, 3) END AS click_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts <= c.ts
        ORDER BY p.event_id
      """.trim),
      "forward as-of join w/ 7-day tolerance: purchase ⋈ next click")(
      (spark, dir) => {
        import spark.implicits._
        val ev = QueryDef.events(spark, dir)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", $"event_id")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"),
            $"value".as("click_value"))
        AsOfJoin.asOf(purchases, clicks, "user_id", "ts",
            Seq("click_id", "click_value"),
            direction = "forward", tolerance = Some(604800000000L))
          .select($"event_id", $"user_id", $"click_id",
            round($"click_value", 3).as("click_value"))
          .orderBy($"event_id")
      }),

    // Hot-key as-of: the same purchase ⋈ latest-prior-click join
    // through the BUCKETED implementation (window partitioned by
    // (user, 6-hour bucket) + skinny cross-bucket carry) — the form
    // for keys whose event count exceeds one sort task. Same oracle
    // as q_asof_join: output must be identical.
    QueryDef(
      "q_asof_bucketed",
      Some("""
        WITH p AS (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
                   FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, c.click_id, round(c.click_value, 3) AS click_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
      """.trim),
      "bucketed hot-key as-of join, identical output to q_asof_join")(
      (spark, dir) => {
        import spark.implicits._
        val ev = QueryDef.events(spark, dir)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", $"event_id")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"),
            $"value".as("click_value"))
        AsOfJoin.asOfBucketed(purchases, clicks, "user_id", "ts",
            Seq("click_id", "click_value"),
            bucketWidth = 6L * 3600 * 1000000) // 6-hour buckets
          .select($"event_id", $"user_id", $"click_id",
            round($"click_value", 3).as("click_value"))
          .orderBy($"event_id")
      }),

    // Broadcast theta/range join: events banded into value tiers via
    // a non-equi join against a tiny broadcast dimension — the plan
    // must be BroadcastNestedLoopJoin with the 4-row side broadcast,
    // never a shuffle of the fact table.
    QueryDef(
      "q_range_join",
      Some("""
        WITH tiers(tier, lo, hi) AS (VALUES
          ('low', 0.0, 100.0), ('mid', 100.0, 250.0),
          ('high', 250.0, 400.0), ('top', 400.0, 1e9))
        SELECT t.tier, count(*) AS n, round(sum(e.value), 2) AS sum_value
        FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
        GROUP BY t.tier
        ORDER BY t.tier
      """.trim),
      "broadcast range join: events banded into value tiers")(
      (spark, dir) => {
        import spark.implicits._
        val tiers = Seq(
          ("low", 0.0, 100.0), ("mid", 100.0, 250.0),
          ("high", 250.0, 400.0), ("top", 400.0, 1e9))
          .toDF("tier", "lo", "hi")
        QueryDef.events(spark, dir).as("e")
          .join(broadcast(tiers).as("t"),
            $"e.value" >= $"t.lo" && $"e.value" < $"t.hi")
          .groupBy($"t.tier".as("tier"))
          .agg(count(lit(1)).as("n"),
            round(sum($"e.value"), 2).as("sum_value"))
          .orderBy($"tier")
      }),

    // Star join: fact orders ⋈ broadcast dims customer/nation/region,
    // revenue rollup. Catalyst should pick broadcast hash joins for
    // every dim (they are tiny); the only shuffle is the final agg.
    QueryDef(
      "q_star_join",
      Some("""
        SELECT r.r_name AS region, o.o_orderstatus AS status,
               count(*) AS n_orders,
               round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, o.o_orderstatus
        ORDER BY region, status
      """.trim),
      "star join: orders ⋈ customer ⋈ nation ⋈ region rollup")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "orders").as("o")
          .join(broadcast(table(spark, dir, "customer")).as("c"),
            $"o.o_custkey" === $"c.c_custkey")
          .join(broadcast(table(spark, dir, "nation")).as("n"),
            $"c.c_nationkey" === $"n.n_nationkey")
          .join(broadcast(table(spark, dir, "region")).as("r"),
            $"n.n_regionkey" === $"r.r_regionkey")
          .groupBy($"r.r_name".as("region"), $"o.o_orderstatus".as("status"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum($"o.o_totalprice".cast("decimal(20,6)")).cast("double"), 2)
              .as("revenue"))
          .orderBy($"region", $"status")
      }),

    // Per-group top-k: 3 highest-value orders per nation —
    // rank inside a window partitioned by the group key; only the
    // dims broadcast, the fact shuffles once for the window.
    QueryDef(
      "q_topk_per_group",
      Some("""
        SELECT nation, o_orderkey, price
        FROM (
          SELECT n.n_name AS nation, o.o_orderkey,
                 round(o.o_totalprice, 2) AS price,
                 row_number() OVER (PARTITION BY n.n_name
                   ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
        )
        WHERE rk <= 3
        ORDER BY nation, rk
      """.trim),
      "top-3 orders by totalprice per nation")(
      (spark, dir) => {
        import spark.implicits._
        val w = Window.partitionBy($"nation")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        table(spark, dir, "orders").as("o")
          .join(broadcast(table(spark, dir, "customer")).as("c"),
            $"o.o_custkey" === $"c.c_custkey")
          .join(broadcast(table(spark, dir, "nation")).as("n"),
            $"c.c_nationkey" === $"n.n_nationkey")
          .select($"n.n_name".as("nation"), $"o.o_orderkey",
            $"o.o_totalprice")
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 3)
          .orderBy($"nation", $"rk")
          .select($"nation", $"o_orderkey",
            round($"o_totalprice", 2).as("price"))
      }),

    // Left SEMI join: orders having at least one max-quantity line.
    // The probe side streams once against the filtered build side —
    // no row multiplication, no payload from the right (the physical
    // shape EXISTS compiles to).
    QueryDef(
      "q_semi_join",
      Some("""
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity >= 49)
        ORDER BY o_orderkey
      """.trim),
      "left semi join: orders with any line of quantity >= 49")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "orders")
          .join(table(spark, dir, "lineitem").filter($"l_quantity" >= 49),
            $"o_orderkey" === $"l_orderkey", "left_semi")
          .select($"o_orderkey", $"o_orderstatus",
            round($"o_totalprice", 2).as("price"))
          .orderBy($"o_orderkey")
      }),

    // Left ANTI join: orders with no lineitems at all — the NOT
    // EXISTS physical shape (null-safe, no row multiplication).
    QueryDef(
      "q_anti_join",
      Some("""
        SELECT o_orderkey, o_orderstatus, o_orderpriority
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey)
        ORDER BY o_orderkey
      """.trim),
      "left anti join: orders with no lineitems")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "orders")
          .join(table(spark, dir, "lineitem"),
            $"o_orderkey" === $"l_orderkey", "left_anti")
          .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
          .orderBy($"o_orderkey")
      }),

    // Salted skew join: events (every row of a hot user lands on the
    // same reducer in a plain shuffled join) ⋈ customer with the
    // probe side salted 8 ways and the build side replicated 8× —
    // output provably equal to the plain join (the oracle IS the
    // plain join). Decimal sum: order-independent across engines.
    QueryDef(
      "q_salted_join",
      Some("""
        SELECT c.c_mktsegment AS segment, count(*) AS n,
               round(CAST(sum(CAST(e.value AS DECIMAL(20,6))) AS DOUBLE), 2)
                 AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY segment
      """.trim),
      "salted (8-way) skew join events ⋈ customer, plain-join oracle")(
      (spark, dir) => {
        import spark.implicits._
        SaltedJoin.join(
            QueryDef.events(spark, dir),
            table(spark, dir, "customer"),
            "user_id", "c_custkey", $"event_id", numSalts = 8)
          .groupBy($"c_mktsegment".as("segment"))
          .agg(count(lit(1)).as("n"),
            round(sum($"value".cast("decimal(20,6)")).cast("double"), 2)
              .as("sum_value"))
          .orderBy($"segment")
      }),

    // Key-skew profile: the sizing query you run BEFORE choosing
    // between plain, salted (q_salted_join), and broadcast joins —
    // per-key counts, hot-key share, and the salt count that levels
    // the hottest key to the mean. Two skinny aggregation stages.
    QueryDef(
      "q_skew_profile",
      Some("""
        WITH c AS (
          SELECT l_suppkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1
        ), a AS (
          SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                 count(*) AS n_keys,
                 max(cnt) AS max_count
          FROM c
        ), h AS (
          SELECT k AS hot_key FROM c ORDER BY cnt DESC, k DESC LIMIT 1
        )
        SELECT n_rows, n_keys, max_count, hot_key,
               round(max_count * 1.0 / n_rows, 6) AS top_share,
               CAST(ceil(max_count * n_keys * 1.0 / n_rows) AS BIGINT)
                 AS suggested_salts
        FROM a, h
      """.trim),
      "join-key skew profile of lineitem.l_suppkey")(
      (spark, dir) => {
        import graft.operators.SaltedJoin
        SaltedJoin.skewProfile(table(spark, dir, "lineitem"), "l_suppkey")
      }),

    // Per-group top-k via the bounded TopKAgg Aggregator — same
    // result contract as q_topk_per_group's window, but map-side
    // combinable: each map task forwards <= k pairs per group, so the
    // exchange never carries whole groups and nothing sorts them.
    // Identical (value desc, id asc) order => window-SQL oracle
    // hash-matches.
    QueryDef(
      "q_topk_agg",
      Some("""
        SELECT nation, rk, o_orderkey, price
        FROM (
          SELECT n.n_name AS nation, o.o_orderkey,
                 round(o.o_totalprice, 2) AS price,
                 row_number() OVER (PARTITION BY n.n_name
                   ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
        )
        WHERE rk <= 3
        ORDER BY nation, rk
      """.trim),
      "top-3 orders per nation via partial-aggregating TopKAgg")(
      (spark, dir) => {
        import spark.implicits._
        import org.apache.spark.sql.Encoders
        import graft.functions.TopKAgg
        val topk = udaf(new TopKAgg(3),
          Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
        table(spark, dir, "orders").as("o")
          .join(broadcast(table(spark, dir, "customer")).as("c"),
            $"o.o_custkey" === $"c.c_custkey")
          .join(broadcast(table(spark, dir, "nation")).as("n"),
            $"c.c_nationkey" === $"n.n_nationkey")
          .groupBy($"n.n_name".as("nation"))
          .agg(topk($"o.o_totalprice", $"o.o_orderkey").as("tk"))
          .select($"nation", posexplode($"tk"))
          .select($"nation", ($"pos" + 1).cast("long").as("rk"),
            $"col._2".as("o_orderkey"), round($"col._1", 2).as("price"))
          .orderBy($"nation", $"rk")
      }),

    // Bloom-pruned semi join: probe (orders) pre-filtered in its scan
    // stage against a Bloom sketch of the build keys, exact semi join
    // on survivors — false positives never reach the output, so the
    // oracle is the plain EXISTS. The pruning is the point at 100 TB
    // (shuffle ∝ selectivity+fpp, not probe size); the RESULT is
    // identical at any fpp.
    QueryDef(
      "q_bloom_prune",
      Some("""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey
                        AND c.c_mktsegment = 'BUILDING')
        ORDER BY o_orderkey
      """.trim),
      "bloom-pruned semi join: orders of BUILDING-segment customers")(
      (spark, dir) => {
        import spark.implicits._
        import graft.operators.BloomPrune
        BloomPrune.semiJoin(
            table(spark, dir, "orders"),
            table(spark, dir, "customer")
              .filter($"c_mktsegment" === "BUILDING"),
            "o_custkey", "c_custkey",
            expectedItems = 10000L, fpp = 0.01)
          .select($"o_orderkey", $"o_custkey",
            round($"o_totalprice", 2).as("price"))
          .orderBy($"o_orderkey")
      }),
  )
}
