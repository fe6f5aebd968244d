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
  )
}
