package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Basket, Hypothesis, RankEval}
import QueryDef.table

/** r10 wave 11 (SURVEY §2.10 X223–X225): multiple-testing control
  * (Benjamini-Hochberg), ranking-change measurement (rank-biased
  * overlap), and market-basket association rules. Same determinism
  * contract as every other query file: exact integer tallies on the
  * hashed path, fixed-shape double formulas, round(6).
  */
object MiningQueries {

  val defs: Seq[QueryDef] = Seq(

    // X223: BH FDR over per-source length-band GOF p-values — 20
    // simultaneous drift tests, one controlled alert list. The
    // 3-band Pearson GOF has dof=2, whose survival function is the
    // CLOSED FORM exp(-chi2/2) — no erf on either engine.
    QueryDef(
      "q_bh_fdr",
      Some("""
        WITH b AS (
          SELECT source,
                 CASE WHEN n_chars < 150 THEN 0
                      WHEN n_chars < 350 THEN 1 ELSE 2 END AS band
          FROM documents
        ), c AS (
          SELECT source,
                 CAST(sum(CASE WHEN band = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS o0,
                 CAST(sum(CASE WHEN band = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS o1,
                 CAST(sum(CASE WHEN band = 2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS o2
          FROM b GROUP BY 1
        ), g AS (
          SELECT CAST(sum(o0) AS BIGINT) AS g0,
                 CAST(sum(o1) AS BIGINT) AS g1,
                 CAST(sum(o2) AS BIGINT) AS g2,
                 CAST(sum(o0 + o1 + o2) AS BIGINT) AS n
          FROM c
        ), x AS (
          SELECT source,
            (CAST(o0 AS DOUBLE)
              - CAST(o0 + o1 + o2 AS DOUBLE) * g0 / n)
            * (CAST(o0 AS DOUBLE)
              - CAST(o0 + o1 + o2 AS DOUBLE) * g0 / n)
            / (CAST(o0 + o1 + o2 AS DOUBLE) * g0 / n)
            + (CAST(o1 AS DOUBLE)
              - CAST(o0 + o1 + o2 AS DOUBLE) * g1 / n)
            * (CAST(o1 AS DOUBLE)
              - CAST(o0 + o1 + o2 AS DOUBLE) * g1 / n)
            / (CAST(o0 + o1 + o2 AS DOUBLE) * g1 / n)
            + (CAST(o2 AS DOUBLE)
              - CAST(o0 + o1 + o2 AS DOUBLE) * g2 / n)
            * (CAST(o2 AS DOUBLE)
              - CAST(o0 + o1 + o2 AS DOUBLE) * g2 / n)
            / (CAST(o0 + o1 + o2 AS DOUBLE) * g2 / n) AS chi2
          FROM c, g
        ), p AS (
          SELECT source, round(exp(-chi2 / 2.0), 9) AS pv FROM x
        ), r AS (
          SELECT source, pv,
                 CAST(row_number() OVER (ORDER BY pv, source)
                   AS BIGINT) AS rk,
                 CAST(count(*) OVER () AS BIGINT) AS m
          FROM p
        ), a AS (
          SELECT source, pv, rk,
                 least(1.0, min(pv * m / rk) OVER (
                   ORDER BY pv DESC, source DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   AS adj
          FROM r
        )
        SELECT source, round(pv, 6) AS p_value, rk AS p_rank,
               round(adj, 6) AS p_adj, adj <= 0.05 AS reject
        FROM a ORDER BY source
      """.trim),
      "X223 BH-adjusted length-band drift p-values per source")(
      (spark, dir) => {
        import spark.implicits._
        val band = when($"n_chars" < 150, 0)
          .when($"n_chars" < 350, 1).otherwise(2)
        val cells = table(spark, dir, "documents")
          .select($"source", band.as("band"))
          .groupBy($"source")
          .agg(
            sum(when($"band" === 0, 1L).otherwise(0L)).as("o0"),
            sum(when($"band" === 1, 1L).otherwise(0L)).as("o1"),
            sum(when($"band" === 2, 1L).otherwise(0L)).as("o2"))
        val glob = cells.agg(
          sum($"o0").cast("long").as("g0"),
          sum($"o1").cast("long").as("g1"),
          sum($"o2").cast("long").as("g2"),
          sum($"o0" + $"o1" + $"o2").cast("long").as("n"))
        val tot = ($"o0" + $"o1" + $"o2").cast("double")
        def term(o: String, g: String) = {
          val e = tot * col(g) / $"n"
          (col(o).cast("double") - e) * (col(o).cast("double") - e) / e
        }
        val chi2 = term("o0", "g0") + term("o1", "g1") + term("o2", "g2")
        val pv = cells.crossJoin(broadcast(glob))
          .select($"source", round(exp(-chi2 / 2.0), 9).as("pv"))
        Hypothesis.bhAdjust(pv, "source", "pv", alpha = 0.05)
          .select($"source", $"p_value", $"p_rank", $"p_adj", $"reject")
          .orderBy($"source")
      }),

    // X224: RBO between each nation's revenue-ranked and
    // quantity-ranked top-10 parts — did changing the metric change
    // the ranking, weighted toward the top.
    QueryDef(
      "q_rbo",
      Some("""
        WITH base AS (
          SELECT n_name, l_partkey,
                 CAST(round(l_extendedprice * (1 - l_discount)
                   * 10000) AS BIGINT) AS rev,
                 CAST(round(l_quantity) AS BIGINT) AS qty
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        ), agg AS (
          SELECT n_name, l_partkey, CAST(sum(rev) AS BIGINT) AS r,
                 CAST(sum(qty) AS BIGINT) AS q
          FROM base GROUP BY 1, 2
        ), ra AS (
          SELECT * FROM (
            SELECT n_name, l_partkey,
                   CAST(row_number() OVER (PARTITION BY n_name
                     ORDER BY r DESC, l_partkey) AS BIGINT) AS rk
            FROM agg) WHERE rk <= 10
        ), rb AS (
          SELECT * FROM (
            SELECT n_name, l_partkey,
                   CAST(row_number() OVER (PARTITION BY n_name
                     ORDER BY q DESC, l_partkey) AS BIGINT) AS rk
            FROM agg) WHERE rk <= 10
        ), wt AS (
          SELECT m, sum(pow(0.9, d - 1) / d) AS w
          FROM (SELECT t1.m AS m, t2.d AS d
                FROM unnest(range(1, 11)) AS t1(m)
                CROSS JOIN unnest(range(1, 11)) AS t2(d))
          WHERE d >= m GROUP BY m
        ), j AS (
          SELECT ra.n_name, greatest(ra.rk, rb.rk) AS mm
          FROM ra JOIN rb USING (n_name, l_partkey)
        ), s AS (
          SELECT n_name, CAST(count(*) AS BIGINT) AS overlap_at_k,
                 sum(w) AS mass
          FROM j JOIN wt ON wt.m = j.mm GROUP BY 1
        ), gs AS (
          SELECT DISTINCT n_name FROM ra
          UNION SELECT DISTINCT n_name FROM rb
        )
        SELECT gs.n_name,
               coalesce(overlap_at_k, 0) AS overlap_at_k,
               round(coalesce(mass, 0.0) * (1 - 0.9)
                 / (1 - pow(0.9, 10)), 6) AS rbo
        FROM gs LEFT JOIN s USING (n_name)
        ORDER BY gs.n_name
      """.trim),
      "X224 rank-biased overlap of revenue-vs-quantity top-10 per nation")(
      (spark, dir) => {
        import spark.implicits._
        val li = table(spark, dir, "lineitem")
        val sup = table(spark, dir, "supplier")
        val nat = table(spark, dir, "nation")
        val agg = li
          .join(sup, $"l_suppkey" === $"s_suppkey")
          .join(nat, $"s_nationkey" === $"n_nationkey")
          .groupBy($"n_name", $"l_partkey")
          .agg(
            sum(round($"l_extendedprice" * (lit(1) - $"l_discount")
              * 10000, 0).cast("long")).cast("long").as("r"),
            sum(round($"l_quantity", 0).cast("long")).cast("long")
              .as("q"))
        val wr = Window.partitionBy($"n_name")
          .orderBy($"r".desc, $"l_partkey")
        val wq = Window.partitionBy($"n_name")
          .orderBy($"q".desc, $"l_partkey")
        val ra = agg.select($"n_name", $"l_partkey",
          row_number().over(wr).cast("long").as("rk"))
          .filter($"rk" <= 10)
        val rb = agg.select($"n_name", $"l_partkey",
          row_number().over(wq).cast("long").as("rk"))
          .filter($"rk" <= 10)
        RankEval.rbo(ra, rb, "n_name", "l_partkey", "rk",
            k = 10, p = 0.9)
          .orderBy($"n_name")
      }),

    // X225: association rules over order baskets — part pairs that
    // co-occur in >= 2 orders, with support/confidence/lift.
    QueryDef(
      "q_basket_rules",
      Some("""
        WITH items AS (
          SELECT DISTINCT l_orderkey AS b, l_partkey AS i
          FROM lineitem
        ), supp AS (
          SELECT i, CAST(count(*) AS BIGINT) AS s
          FROM items GROUP BY 1
        ), nb AS (
          SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM items
        ), kept AS (
          SELECT b, i FROM items
          WHERE i IN (SELECT i FROM supp WHERE s >= 2)
        ), pairs AS (
          SELECT x.i AS item_a, y.i AS item_b,
                 CAST(count(*) AS BIGINT) AS pair_count
          FROM kept x JOIN kept y ON x.b = y.b AND x.i < y.i
          GROUP BY 1, 2 HAVING count(*) >= 2
        )
        SELECT item_a, item_b, pair_count,
               sa.s AS supp_a, sb.s AS supp_b,
               round(CAST(pair_count AS DOUBLE) / n, 6) AS support,
               round(CAST(pair_count AS DOUBLE) / sa.s, 6)
                 AS conf_a_b,
               round(CAST(pair_count AS DOUBLE) / sb.s, 6)
                 AS conf_b_a,
               round(CAST(pair_count AS DOUBLE) * n
                 / (CAST(sa.s AS DOUBLE) * sb.s), 6) AS lift
        FROM pairs
        JOIN supp sa ON sa.i = item_a
        JOIN supp sb ON sb.i = item_b, nb
        ORDER BY item_a, item_b
      """.trim),
      "X225 part-pair association rules over order baskets")(
      (spark, dir) => {
        import spark.implicits._
        Basket.pairRules(table(spark, dir, "lineitem"),
            "l_orderkey", "l_partkey", minSupport = 2L)
          .orderBy($"item_a", $"item_b")
      })
  )
}
