package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.QueryDef.table

/** Classic relational analytics over the TPC-H-style star schema —
  * the general-purpose query surface (scan → filter → join → agg →
  * sort) exercised at bench scale. Shapes follow TPC-H Q1/Q3/Q5;
  * selective filters push into the parquet scans, dimensions
  * broadcast, facts shuffle only for aggregation.
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape: pricing summary with filter pushdown and a
    // fully partial-aggregatable rollup over lineitem.
    QueryDef(
      "q_pricing_summary",
      Some("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE), 2) AS sum_base_price,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE), 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.trim),
      "TPC-H Q1 pricing summary")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "lineitem")
          .filter($"l_shipdate" <= lit(java.sql.Date.valueOf("1998-09-02")))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            round(sum($"l_extendedprice".cast("decimal(20,6)"))
              .cast("double"), 2).as("sum_base_price"),
            round(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
              .cast("decimal(20,6)")).cast("double"), 2)
              .as("sum_disc_price"),
            round(avg($"l_quantity"), 6).as("avg_qty"),
            round(avg($"l_discount"), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      }),

    // TPC-H Q3 shape: shipping priority — selective date filters on
    // both sides of a fact-fact join, top-10 by revenue.
    QueryDef(
      "q_shipping_priority",
      Some("""
        SELECT o.o_orderkey, round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue,
               o.o_orderdate
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderdate < DATE '1995-03-15'
          AND l.l_shipdate > DATE '1995-03-15'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o.o_orderkey
        LIMIT 10
      """.trim),
      "TPC-H Q3 shipping priority top-10")(
      (spark, dir) => {
        import spark.implicits._
        val o = table(spark, dir, "orders")
          .filter($"o_orderdate" < lit(java.sql.Date.valueOf("1995-03-15")))
        val l = table(spark, dir, "lineitem")
          .filter($"l_shipdate" > lit(java.sql.Date.valueOf("1995-03-15")))
        o.join(l, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderkey", $"o_orderdate")
          .agg(round(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
            .cast("decimal(20,6)")).cast("double"), 2).as("revenue"))
          .select($"o_orderkey", $"revenue", $"o_orderdate")
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
      }),

    // TPC-H Q5 shape: revenue by nation — fact joins with broadcast
    // dimensions up the snowflake.
    QueryDef(
      "q_revenue_by_nation",
      Some("""
        SELECT n.n_name AS nation,
               round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY revenue DESC, nation
      """.trim),
      "TPC-H Q5 revenue rollup by customer nation")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "lineitem").as("l")
          .join(table(spark, dir, "orders").as("o"),
            $"l.l_orderkey" === $"o.o_orderkey")
          .join(broadcast(table(spark, dir, "customer")).as("c"),
            $"o.o_custkey" === $"c.c_custkey")
          .join(broadcast(table(spark, dir, "nation")).as("n"),
            $"c.c_nationkey" === $"n.n_nationkey")
          .groupBy($"n.n_name".as("nation"))
          .agg(round(sum(($"l.l_extendedprice" * (lit(1) - $"l.l_discount"))
            .cast("decimal(20,6)")).cast("double"), 2).as("revenue"))
          .orderBy($"revenue".desc, $"nation")
      }),

    // TPC-H Q6 shape (forecasting revenue change): tight scan-stage
    // predicate conjunction over one table, single global aggregate —
    // the plan must push every filter into the parquet scan and keep
    // the whole pipeline in one codegen stage.
    QueryDef(
      "q_forecast_revenue",
      Some("""
        SELECT count(*) AS n,
               round(CAST(sum(CAST(l_extendedprice * l_discount
                 AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.04 AND 0.08
          AND l_quantity < 24
      """.trim),
      "TPC-H Q6 scan-heavy predicate + single aggregate")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "lineitem")
          .filter($"l_shipdate" >= "1996-01-01" &&
            $"l_shipdate" < "1997-01-01" &&
            $"l_discount".between(0.04, 0.08) && $"l_quantity" < 24)
          .agg(count(lit(1)).as("n"),
            round(sum(($"l_extendedprice" * $"l_discount")
              .cast("decimal(20,6)")).cast("double"), 2).as("revenue"))
      }),

    // TPC-H Q18 shape (large-volume orders): HAVING over a grouped
    // sum seeds a semi-join back onto the fact tables. Quantities are
    // integral doubles, so their sums are exact in both engines with
    // no decimal detour.
    QueryDef(
      "q_large_orders",
      Some("""
        SELECT c.c_name, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               big.total_qty
        FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 300) big
        JOIN orders o ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY big.total_qty DESC, o.o_orderkey
      """.trim),
      "TPC-H Q18 large-volume orders (HAVING-seeded join)")(
      (spark, dir) => {
        import spark.implicits._
        val big = table(spark, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(sum($"l_quantity").as("total_qty"))
          .filter($"total_qty" > 300)
        big.join(table(spark, dir, "orders").as("o"),
            $"l_orderkey" === $"o.o_orderkey")
          .join(broadcast(table(spark, dir, "customer")).as("c"),
            $"o.o_custkey" === $"c.c_custkey")
          .select($"c.c_name", $"o.o_orderkey",
            date_format($"o.o_orderdate", "yyyy-MM-dd").as("order_date"),
            $"total_qty")
          .orderBy($"total_qty".desc, $"o_orderkey")
      }),

    // TPC-H Q8 shape (national market share): the 7-table snowflake —
    // lineitem against orders (fact-fact) with customer→nation→region
    // on the demand side and supplier→nation on the supply side, part
    // filtered by type. Every dimension broadcasts; lineitem shuffles
    // once (the orders join), then one conditional aggregate per
    // year. Money stays decimal until the final share division
    // (double, rounded) — the same exactness discipline as Q1/Q3/Q5.
    QueryDef(
      "q_market_share",
      Some("""
        WITH vol AS (
          SELECT year(o.o_orderdate) AS o_year,
                 CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(20,6)) AS volume,
                 sn.n_name AS supp_nation
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation cn ON c.c_nationkey = cn.n_nationkey
          JOIN region r ON cn.n_regionkey = r.r_regionkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation sn ON s.s_nationkey = sn.n_nationkey
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
            AND o.o_orderdate >= DATE '1995-01-01'
            AND o.o_orderdate < DATE '1997-01-01'
        )
        SELECT CAST(o_year AS BIGINT) AS o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_2'
                                   THEN volume ELSE CAST(0 AS DECIMAL(20,6))
                              END) AS DOUBLE) /
                     CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
               round(CAST(sum(volume) AS DOUBLE), 2) AS total_volume
        FROM vol
        GROUP BY o_year
        ORDER BY o_year
      """.trim),
      "TPC-H Q8 market share of NATION_2 in ASIA for PROMO parts")(
      (spark, dir) => {
        import spark.implicits._
        val vol = table(spark, dir, "lineitem").as("l")
          .join(table(spark, dir, "orders")
            .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1997-01-01").cast("timestamp")).as("o"),
            $"l.l_orderkey" === $"o.o_orderkey")
          .join(broadcast(table(spark, dir, "customer")).as("c"),
            $"o.o_custkey" === $"c.c_custkey")
          .join(broadcast(table(spark, dir, "nation")).as("cn"),
            $"c.c_nationkey" === $"cn.n_nationkey")
          .join(broadcast(table(spark, dir, "region")
              .filter($"r_name" === "ASIA")).as("r"),
            $"cn.n_regionkey" === $"r.r_regionkey")
          .join(broadcast(table(spark, dir, "supplier")).as("s"),
            $"l.l_suppkey" === $"s.s_suppkey")
          .join(broadcast(table(spark, dir, "nation")).as("sn"),
            $"s.s_nationkey" === $"sn.n_nationkey")
          .join(broadcast(table(spark, dir, "part")
              .filter($"p_type" === "PROMO")).as("p"),
            $"l.l_partkey" === $"p.p_partkey")
          .select(year($"o.o_orderdate").cast("long").as("o_year"),
            ($"l.l_extendedprice" * (lit(1) - $"l.l_discount"))
              .cast("decimal(20,6)").as("volume"),
            $"sn.n_name".as("supp_nation"))
        vol.groupBy($"o_year")
          .agg(
            round((sum(when($"supp_nation" === "NATION_2", $"volume")
                .otherwise(lit(0).cast("decimal(20,6)"))).cast("double") /
              sum($"volume").cast("double")), 6).as("mkt_share"),
            round(sum($"volume").cast("double"), 2).as("total_volume"))
          .orderBy($"o_year")
      }),

    // X370 — TPC-H Q10 shape: returned-item reporting — top-20
    // customers by revenue lost to returns in a quarter; the classic
    // fact-fact join + broadcast-dimension rollup + bounded top-k.
    QueryDef(
      "q_returned_items",
      Some("""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation,
               round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= DATE '1997-01-01'
          AND o.o_orderdate < DATE '1997-07-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
      """.trim),
      "TPC-H Q10 top-20 customers by returned revenue, 1997 H1")(
      (spark, dir) => {
        import spark.implicits._
        val o = table(spark, dir, "orders").filter(
          $"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-07-01").cast("timestamp"))
        val l = table(spark, dir, "lineitem")
          .filter($"l_returnflag" === "R")
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(table(spark, dir, "customer")),
            $"o_custkey" === $"c_custkey")
          .join(broadcast(table(spark, dir, "nation")),
            $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"n_name".as("nation"))
          .agg(round(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
            .cast("decimal(20,6)")).cast("double"), 2).as("revenue"))
          .select($"c_custkey", $"c_name", $"nation", $"revenue")
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
      }),

    // X371 — TPC-H Q12 shape: late-shipment priority split. The
    // fixture has no l_shipmode/commitdate, so the Q12 semantics
    // (group lines by a category, split counts by order priority,
    // gate on a date-arithmetic lateness predicate) run on
    // l_linestatus with lateness = shipped > 90 days after the
    // order date — same join + conditional-agg + calendar-diff plan.
    QueryDef(
      "q_late_lines",
      Some("""
        SELECT l.l_linestatus AS linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN
                 ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority IN
                 ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
                 AS low_line_count
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                CAST(l.l_shipdate AS DATE)) > 90
        GROUP BY 1
        ORDER BY 1
      """.trim),
      "TPC-H Q12 shape: late-line priority split by linestatus")(
      (spark, dir) => {
        import spark.implicits._
        val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
        table(spark, dir, "orders").as("o")
          .join(table(spark, dir, "lineitem").as("l"),
            $"l.l_orderkey" === $"o.o_orderkey")
          .filter(datediff(to_date($"l.l_shipdate"),
            to_date($"o.o_orderdate")) > 90)
          .groupBy($"l.l_linestatus".as("linestatus"))
          .agg(sum(when(hi, 1L).otherwise(0L)).cast("long")
              .as("high_line_count"),
            sum(when(hi, 0L).otherwise(1L)).cast("long")
              .as("low_line_count"))
          .orderBy($"linestatus")
      }),

    // X372 — TPC-H Q14 shape: promo revenue share for one ship
    // month — selective date-range scan + broadcast part join + a
    // conditional-over-total ratio on exact decimal sums.
    QueryDef(
      "q_promo_share",
      Some("""
        SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(20,6))
                 ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE)
               / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(20,6))) AS DOUBLE), 6) AS promo_share,
               round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(20,6))) AS DOUBLE), 2) AS total_revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= DATE '1997-09-01'
          AND l.l_shipdate < DATE '1997-10-01'
      """.trim),
      "TPC-H Q14 promo revenue share, September 1997")(
      (spark, dir) => {
        import spark.implicits._
        val rev = ($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(20,6)")
        table(spark, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1997-09-01").cast("timestamp")
            && $"l_shipdate" < lit("1997-10-01").cast("timestamp"))
          .join(broadcast(table(spark, dir, "part")),
            $"l_partkey" === $"p_partkey")
          .agg(
            round(sum(when($"p_type" === "PROMO", rev)
                .otherwise(lit(0).cast("decimal(20,6)"))).cast("double")
              * 100.0 / sum(rev).cast("double"), 6).as("promo_share"),
            round(sum(rev).cast("double"), 2).as("total_revenue"),
            count(lit(1)).cast("long").as("n_lines"))
      }),

    // X373 — TPC-H Q19 shape: disjunctive bracket predicates
    // (brand × size-band × quantity-band triples OR'd together) —
    // the planner-stressing filter that must stay INSIDE the
    // broadcast-join scan, not become three unioned scans.
    QueryDef(
      "q_bracket_revenue",
      Some("""
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 1 AND l.l_quantity <= 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity >= 10 AND l.l_quantity <= 30)
           OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity >= 20 AND l.l_quantity <= 45)
      """.trim),
      "TPC-H Q19 disjunctive bracket revenue")(
      (spark, dir) => {
        import spark.implicits._
        def bracket(brand: String, szLo: Int, szHi: Int,
            qLo: Double, qHi: Double) =
          $"p_brand" === brand &&
            $"p_size".between(szLo, szHi) &&
            $"l_quantity" >= qLo && $"l_quantity" <= qHi
        table(spark, dir, "lineitem")
          .join(broadcast(table(spark, dir, "part")),
            $"l_partkey" === $"p_partkey")
          .filter(bracket("Brand#1", 1, 15, 1, 20) ||
            bracket("Brand#2", 10, 30, 10, 30) ||
            bracket("Brand#9", 20, 50, 20, 45))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            round(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
              .cast("decimal(20,6)")).cast("double"), 2).as("revenue"))
      }),

    // X380 — TPC-H Q7 shape: volume shipping between two nations —
    // the two-sided symmetric join predicate ((s=N1 ∧ c=N2) ∨
    // (s=N2 ∧ c=N1)) across a five-table snowflake, by ship year.
    QueryDef(
      "q_volume_shipping",
      Some("""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l.l_shipdate >= DATE '1996-01-01'
          AND l.l_shipdate < DATE '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
      """.trim),
      "TPC-H Q7 volume shipping NATION_1<->NATION_2 by year")(
      (spark, dir) => {
        import spark.implicits._
        val j = table(spark, dir, "lineitem").as("l")
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp")
            && $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
          .join(table(spark, dir, "orders").as("o"),
            $"l.l_orderkey" === $"o.o_orderkey")
          .join(broadcast(table(spark, dir, "customer")).as("c"),
            $"o.o_custkey" === $"c.c_custkey")
          .join(broadcast(table(spark, dir, "nation")).as("cn"),
            $"c.c_nationkey" === $"cn.n_nationkey")
          .join(broadcast(table(spark, dir, "supplier")).as("s"),
            $"l.l_suppkey" === $"s.s_suppkey")
          .join(broadcast(table(spark, dir, "nation")).as("sn"),
            $"s.s_nationkey" === $"sn.n_nationkey")
        j.filter(($"sn.n_name" === "NATION_1" &&
            $"cn.n_name" === "NATION_2") ||
            ($"sn.n_name" === "NATION_2" && $"cn.n_name" === "NATION_1"))
          .groupBy($"sn.n_name".as("supp_nation"),
            $"cn.n_name".as("cust_nation"),
            year($"l.l_shipdate").cast("long").as("l_year"))
          .agg(round(sum(($"l.l_extendedprice" * (lit(1) - $"l.l_discount"))
            .cast("decimal(20,6)")).cast("double"), 2).as("revenue"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      }),

    // X381 — TPC-H Q15 shape: top supplier by quarterly revenue —
    // the aggregate-then-argmax-by-subquery pattern (revenue CTE
    // reused as both the join side and the max lookup; exact decimal
    // makes the max-equality safe in any engine).
    QueryDef(
      "q_top_supplier",
      Some("""
        WITH rev AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(20,6))) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= DATE '1998-01-01'
            AND l_shipdate < DATE '1998-04-01'
          GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name,
               round(CAST(r.total_rev AS DOUBLE), 2) AS total_rev
        FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
        ORDER BY s.s_suppkey
      """.trim),
      "TPC-H Q15 top supplier by 1998Q1 revenue")(
      (spark, dir) => {
        import spark.implicits._
        val rev = table(spark, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp")
            && $"l_shipdate" < lit("1998-04-01").cast("timestamp"))
          .groupBy($"l_suppkey")
          .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
            .cast("decimal(20,6)")).as("total_rev"))
        val best = rev.agg(max($"total_rev").as("__best"))
        rev.crossJoin(broadcast(best))
          .filter($"total_rev" === $"__best")
          .join(broadcast(table(spark, dir, "supplier")),
            $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey", $"s_name",
            round($"total_rev".cast("double"), 2).as("total_rev"))
          .orderBy($"s_suppkey")
      }),

    // X382 — TPC-H Q16 shape: supplier counts per part attribute
    // triple with a NOT IN anti-join blocklist; the partsupp stand-in
    // is the distinct (part, supplier) pairs observed in lineitem.
    QueryDef(
      "q_part_supplier_counts",
      Some("""
        WITH ps AS (
          SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        )
        SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT ps.l_suppkey) AS BIGINT)
                 AS supplier_cnt
        FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND ps.l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
      """.trim),
      "TPC-H Q16 supplier counts per attribute triple, blocklisted")(
      (spark, dir) => {
        import spark.implicits._
        val ps = table(spark, dir, "lineitem")
          .select($"l_partkey", $"l_suppkey").distinct()
        val blocked = table(spark, dir, "supplier")
          .filter($"s_name".endsWith("7")).select($"s_suppkey")
        ps.join(broadcast(blocked),
            $"l_suppkey" === $"s_suppkey", "left_anti")
          .join(broadcast(table(spark, dir, "part")
              .filter($"p_brand" =!= "Brand#5" &&
                $"p_size".isin(1, 9, 14, 19, 23, 36, 45, 49))),
            $"p_partkey" === $"l_partkey")
          .groupBy($"p_brand", $"p_type",
            $"p_size".cast("long").as("p_size"))
          .agg(countDistinct($"l_suppkey").cast("long")
            .as("supplier_cnt"))
          .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type",
            $"p_size")
      }),

    // X383 — TPC-H Q17 shape: small-quantity-order revenue — the
    // correlated per-part average subquery, decorrelated into a
    // grouped aggregate + join-back; the 0.2·avg comparison runs in
    // pure integers (5·q·count < sum) so no engine's avg() order
    // matters.
    QueryDef(
      "q_small_qty_revenue",
      Some("""
        WITH pq AS (
          SELECT l_partkey,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS c
          FROM lineitem GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               round(CAST(sum(CAST(l.l_extendedprice
                 AS DECIMAL(20,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN pq ON pq.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#9' AND p.p_type = 'PROMO'
          AND 5 * CAST(l.l_quantity AS BIGINT) * pq.c < pq.s
      """.trim),
      "TPC-H Q17 small-quantity revenue, Brand#9/PROMO")(
      (spark, dir) => {
        import spark.implicits._
        val li = table(spark, dir, "lineitem")
        val pq = li.groupBy($"l_partkey".as("__pk"))
          .agg(sum($"l_quantity".cast("long")).cast("long").as("__s"),
            count(lit(1)).cast("long").as("__c"))
        li.join(broadcast(table(spark, dir, "part")
              .filter($"p_brand" === "Brand#9" && $"p_type" === "PROMO")),
            $"p_partkey" === $"l_partkey")
          .join(pq, $"__pk" === $"l_partkey")
          .filter(lit(5L) * $"l_quantity".cast("long") * $"__c" < $"__s")
          .agg(count(lit(1)).cast("long").as("n_lines"),
            round(sum($"l_extendedprice".cast("decimal(20,6)"))
              .cast("double") / 7.0, 2).as("avg_yearly"))
      }),

    // X397 — TPC-H Q2 shape: min-cost supplier per part — the
    // argmin-by-group join-back over the partsupp stand-in (distinct
    // (part, supplier) pairs from lineitem), cost stand-in
    // s_acctbal, region-filtered through the nation snowflake. Ties
    // on the min keep every minimal supplier (Q2 semantics).
    QueryDef(
      "q_min_cost_supplier",
      Some("""
        WITH ps AS (
          SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ), eu AS (
          SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
          FROM supplier s
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'EUROPE'
        ), cand AS (
          SELECT p.p_partkey, p.p_name, eu.s_suppkey, eu.s_name,
                 eu.s_acctbal, eu.n_name
          FROM ps
          JOIN part p ON p.p_partkey = ps.l_partkey
          JOIN eu ON eu.s_suppkey = ps.l_suppkey
          WHERE p.p_size = 9 AND p.p_type = 'SMALL'
        ), best AS (
          SELECT p_partkey, min(s_acctbal) AS min_bal
          FROM cand GROUP BY 1
        )
        SELECT round(c.s_acctbal, 2) AS s_acctbal, c.s_name,
               c.n_name AS nation, c.p_partkey, c.p_name
        FROM cand c JOIN best b
          ON c.p_partkey = b.p_partkey AND c.s_acctbal = b.min_bal
        ORDER BY s_acctbal DESC, c.n_name, c.s_name, c.p_partkey
        LIMIT 100
      """.trim),
      "TPC-H Q2 min-cost EUROPE supplier per SMALL size-9 part")(
      (spark, dir) => {
        import spark.implicits._
        val ps = table(spark, dir, "lineitem")
          .select($"l_partkey", $"l_suppkey").distinct()
        val eu = table(spark, dir, "supplier")
          .join(broadcast(table(spark, dir, "nation")),
            $"s_nationkey" === $"n_nationkey")
          .join(broadcast(table(spark, dir, "region")
              .filter($"r_name" === "EUROPE")),
            $"n_regionkey" === $"r_regionkey")
          .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
        val cand = ps
          .join(broadcast(table(spark, dir, "part")
              .filter($"p_size" === 9 && $"p_type" === "SMALL")),
            $"p_partkey" === $"l_partkey")
          .join(broadcast(eu), $"s_suppkey" === $"l_suppkey")
          .select($"p_partkey", $"p_name", $"s_suppkey", $"s_name",
            $"s_acctbal", $"n_name")
        val best = cand.groupBy($"p_partkey".as("__pk"))
          .agg(min($"s_acctbal").as("__min_bal"))
        cand.join(best, $"p_partkey" === $"__pk" &&
            $"s_acctbal" === $"__min_bal")
          .select(round($"s_acctbal", 2).as("s_acctbal"), $"s_name",
            $"n_name".as("nation"), $"p_partkey", $"p_name")
          .orderBy($"s_acctbal".desc, $"nation", $"s_name",
            $"p_partkey")
          .limit(100)
      }),

    // X398 — TPC-H Q9 shape: product-type profit by supplier nation
    // and order year; cost stand-in 0.1·p_retailprice·l_quantity in
    // exact decimal so the profit sums hash across engines.
    QueryDef(
      "q_profit_by_nation",
      Some("""
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               round(CAST(sum(
                 CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(20,6))
                 - CAST(p.p_retailprice AS DECIMAL(20,6))
                   * CAST(l.l_quantity AS DECIMAL(20,6))
                   * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE), 2)
                 AS profit
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
      """.trim),
      "TPC-H Q9 profit on red parts by supplier nation and year")(
      (spark, dir) => {
        import spark.implicits._
        val profit =
          ($"l_extendedprice" * (lit(1) - $"l_discount"))
            .cast("decimal(20,6)") -
          $"p_retailprice".cast("decimal(20,6)") *
            $"l_quantity".cast("decimal(20,6)") *
            lit(0.1).cast("decimal(2,1)")
        table(spark, dir, "lineitem")
          .join(table(spark, dir, "orders"),
            $"o_orderkey" === $"l_orderkey")
          .join(broadcast(table(spark, dir, "part")
              .filter($"p_name".contains("red"))),
            $"p_partkey" === $"l_partkey")
          .join(broadcast(table(spark, dir, "supplier")),
            $"s_suppkey" === $"l_suppkey")
          .join(broadcast(table(spark, dir, "nation")),
            $"n_nationkey" === $"s_nationkey")
          .groupBy($"n_name".as("nation"),
            year($"o_orderdate").cast("long").as("o_year"))
          .agg(round(sum(profit).cast("double"), 2).as("profit"))
          .orderBy($"nation", $"o_year".desc)
      }),

    // X399 — TPC-H Q11 shape: per-part revenue share against a
    // scalar-subquery total with the fraction compare run in exact
    // decimal cross-multiplication (2000·value > total ⇔ share >
    // 0.05%), so no engine's division order matters.
    QueryDef(
      "q_partsupp_value",
      Some("""
        WITH v AS (
          SELECT l_partkey,
                 sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(20,6))) AS value
          FROM lineitem GROUP BY 1
        ), t AS (
          SELECT sum(value) AS total FROM v
        )
        SELECT v.l_partkey AS p_partkey,
               round(CAST(v.value AS DOUBLE), 2) AS value
        FROM v, t
        WHERE v.value * 2000 > t.total
        ORDER BY value DESC, p_partkey
      """.trim),
      "TPC-H Q11 parts above 0.05% of total revenue")(
      (spark, dir) => {
        import spark.implicits._
        val v = table(spark, dir, "lineitem")
          .groupBy($"l_partkey")
          .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
            .cast("decimal(20,6)")).as("value"))
        val t = v.agg(sum($"value").as("__total"))
        v.crossJoin(broadcast(t))
          .filter($"value" * 2000 > $"__total")
          .select($"l_partkey".as("p_partkey"),
            round($"value".cast("double"), 2).as("value"))
          .orderBy($"value".desc, $"p_partkey")
      }),

    // X400 — TPC-H Q20 shape: suppliers with excess share of a
    // filtered part's volume — the semi-join chain with the
    // correlated half-sum comparison decorrelated to pure integers
    // (5·own > total ⇔ own share > 20%).
    QueryDef(
      "q_excess_stock",
      Some("""
        WITH pq AS (
          SELECT l.l_partkey, l.l_suppkey,
                 CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                   AS own
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE 'small%'
          GROUP BY 1, 2
        ), tot AS (
          SELECT l_partkey, CAST(sum(own) AS BIGINT) AS total
          FROM pq GROUP BY 1
        ), excess AS (
          SELECT DISTINCT pq.l_suppkey
          FROM pq JOIN tot ON tot.l_partkey = pq.l_partkey
          WHERE 5 * pq.own > tot.total
        )
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN excess e ON e.l_suppkey = s.s_suppkey
        WHERE n.n_name = 'NATION_3'
        ORDER BY s.s_suppkey
      """.trim),
      "TPC-H Q20 NATION_3 suppliers with >20% of a small part's volume")(
      (spark, dir) => {
        import spark.implicits._
        val pq = table(spark, dir, "lineitem")
          .join(broadcast(table(spark, dir, "part")
              .filter($"p_name".startsWith("small"))),
            $"p_partkey" === $"l_partkey")
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(sum($"l_quantity".cast("long")).cast("long").as("own"))
        val tot = pq.groupBy($"l_partkey".as("__pk"))
          .agg(sum($"own").cast("long").as("total"))
        val excess = pq.join(tot, $"l_partkey" === $"__pk")
          .filter(lit(5L) * $"own" > $"total")
          .select($"l_suppkey").distinct()
        table(spark, dir, "supplier")
          .join(broadcast(table(spark, dir, "nation")
              .filter($"n_name" === "NATION_3")),
            $"n_nationkey" === $"s_nationkey")
          .join(broadcast(excess), $"l_suppkey" === $"s_suppkey",
            "left_semi")
          .select($"s_suppkey", $"s_name")
          .orderBy($"s_suppkey")
      }),

    // X401 — TPC-H Q21 shape: suppliers who alone held up a
    // multi-supplier order — the exists + not-exists double
    // correlation decorrelated into per-order supplier/late-supplier
    // counts; lateness is the Q12-shape calendar predicate.
    QueryDef(
      "q_waiting_suppliers",
      Some("""
        WITH sl AS (
          SELECT l.l_orderkey, l.l_suppkey,
                 max(CASE WHEN date_diff('day',
                   CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) > 90
                   THEN 1 ELSE 0 END) AS late
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          GROUP BY 1, 2
        ), per_order AS (
          SELECT l_orderkey,
                 CAST(count(*) AS BIGINT) AS n_supp,
                 CAST(sum(late) AS BIGINT) AS n_late
          FROM sl GROUP BY 1
        ), culprit AS (
          SELECT sl.l_suppkey, CAST(count(*) AS BIGINT) AS numwait
          FROM sl JOIN per_order p ON p.l_orderkey = sl.l_orderkey
          WHERE sl.late = 1 AND p.n_supp >= 2 AND p.n_late = 1
          GROUP BY 1
        )
        SELECT s.s_name, c.numwait
        FROM culprit c JOIN supplier s ON s.s_suppkey = c.l_suppkey
        ORDER BY c.numwait DESC, s.s_name
        LIMIT 100
      """.trim),
      "TPC-H Q21 suppliers who alone delayed multi-supplier orders")(
      (spark, dir) => {
        import spark.implicits._
        val late = when(datediff(to_date($"l_shipdate"),
          to_date($"o_orderdate")) > 90, 1).otherwise(0)
        val sl = table(spark, dir, "lineitem")
          .join(table(spark, dir, "orders"),
            $"o_orderkey" === $"l_orderkey")
          .groupBy($"l_orderkey", $"l_suppkey")
          .agg(max(late).as("late"))
        val perOrder = sl.groupBy($"l_orderkey".as("__ok"))
          .agg(count(lit(1)).cast("long").as("n_supp"),
            sum($"late").cast("long").as("n_late"))
        val culprit = sl.join(perOrder, $"l_orderkey" === $"__ok")
          .filter($"late" === 1 && $"n_supp" >= 2L && $"n_late" === 1L)
          .groupBy($"l_suppkey")
          .agg(count(lit(1)).cast("long").as("numwait"))
        culprit.join(broadcast(table(spark, dir, "supplier")),
            $"s_suppkey" === $"l_suppkey")
          .select($"s_name", $"numwait")
          .orderBy($"numwait".desc, $"s_name")
          .limit(100)
      }),
  )
}
