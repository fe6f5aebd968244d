package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Hypothesis, TimeSeries}
import graft.queries.QueryDef.{events, table}

/** Wave 53 — the exact-inference completions of the classical shelf:
  * small-cell exact tests (Fisher), scale/extremes rank tests
  * (Siegel-Tukey, Moses), the tail-weighted two-sample gate
  * (Anderson-Darling), the remaining FWER step procedure (Hochberg +
  * Šidák), doubly-robust causal estimation (AIPW) with its
  * sensitivity readout (E-value), the calibration-shelf MCC, and the
  * integer-state Holt linear trend. Every query carries a full
  * DuckDB hash oracle (exact integer / quantized-fold constructions).
  */
object InferenceQueries {

  val defs: Seq[QueryDef] = Seq(

    // X387: Hochberg step-up + Šidák over the SAME per-source
    // length-band GOF p-value family as q_holm/q_bh_fdr — the three
    // procedures on one alert table is exactly how they are used.
    QueryDef(
      "q_hochberg",
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
          SELECT source, pv, rk, m,
                 least(1.0, min(pv * (m - rk + 1)) OVER (
                   ORDER BY pv DESC, source DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   AS adj
          FROM r
        )
        SELECT source, round(pv, 6) AS p_value, rk AS p_rank,
               round(adj, 6) AS p_adj,
               round(1.0 - power(1.0 - pv, m), 6) AS p_sidak,
               adj <= 0.05 AS reject
        FROM a ORDER BY source
      """.trim),
      "X387 Hochberg+Sidak over per-source length-band GOF p-values")(
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
        val pv = cells.crossJoin(broadcast(glob))
          .select($"source",
            round(exp(-(term("o0", "g0") + term("o1", "g1") +
              term("o2", "g2")) / 2.0), 9).as("pv"))
        Hypothesis.hochbergAdjust(pv, "source", "pv")
          .withColumnRenamed("source", "source")
          .orderBy($"source")
      }),

    // X388: Fisher's exact 2×2 per source (exposure en, outcome
    // long doc) — the small-cell exact companion to q_odds_ratio's
    // asymptotics. The oracle enumerates the hypergeometric support
    // with HUGEINT factorials (per-source n = 25 at the oracle SF,
    // well under factorial(33)'s HUGEINT ceiling); Spark runs the
    // identical enumeration in BigInt, so any corpus size works.
    QueryDef(
      "q_fisher_exact",
      Some("""
        WITH cells AS (
          SELECT source,
            CAST(sum(CASE WHEN lang = 'en' AND n_chars >= 250
              THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(sum(CASE WHEN lang = 'en' AND n_chars < 250
              THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(sum(CASE WHEN lang <> 'en' AND n_chars >= 250
              THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN lang <> 'en' AND n_chars < 250
              THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM documents GROUP BY source
        ), m AS (
          SELECT source, a, b, c, d,
                 a + b AS r1, c + d AS r2, a + c AS c1,
                 a + b + c + d AS n
          FROM cells
        ), e AS (
          SELECT source, a, b, c, d, r1, r2, c1, n,
                 unnest(range(greatest(0, c1 - r2),
                   least(r1, c1) + 1)) AS k
          FROM m
        ), w AS (
          SELECT source, a, b, c, d, n, c1, k,
                 (factorial(CAST(r1 AS INTEGER))
                   // (factorial(CAST(k AS INTEGER))
                      * factorial(CAST(r1 - k AS INTEGER))))
                 * (factorial(CAST(r2 AS INTEGER))
                   // (factorial(CAST(c1 - k AS INTEGER))
                      * factorial(CAST(r2 - c1 + k AS INTEGER))))
                   AS wk,
                 (factorial(CAST(r1 AS INTEGER))
                   // (factorial(CAST(a AS INTEGER))
                      * factorial(CAST(r1 - a AS INTEGER))))
                 * (factorial(CAST(r2 AS INTEGER))
                   // (factorial(CAST(c1 - a AS INTEGER))
                      * factorial(CAST(r2 - c1 + a AS INTEGER))))
                   AS wobs
          FROM e
        ), s AS (
          SELECT source, a, b, c, d, n, c1,
                 sum(CASE WHEN wk <= wobs THEN wk
                     ELSE CAST(0 AS HUGEINT) END) AS num
          FROM w GROUP BY 1, 2, 3, 4, 5, 6, 7
        ), f AS (
          SELECT source, a, b, c, d, num,
                 factorial(CAST(n AS INTEGER))
                   // (factorial(CAST(c1 AS INTEGER))
                      * factorial(CAST(n - c1 AS INTEGER))) AS den
          FROM s
        )
        SELECT source, a, b, c, d,
               round(CAST((num * 2000000000 + den) // (den * 2)
                 AS DOUBLE) / 1e9, 9) AS p_two_sided
        FROM f ORDER BY source
      """.trim),
      "X388 Fisher exact 2x2 per source: en exposure, long outcome")(
      (spark, dir) => {
        import spark.implicits._
        Hypothesis.fisherExact(table(spark, dir, "documents"),
            "source", $"lang" === "en", $"n_chars" >= 250)
          .orderBy($"source")
      }),

    // X389: Siegel-Tukey scale test — purchase vs view event values;
    // the tie-broken (value, event_id) order is part of the
    // contract, both engines sort identically.
    QueryDef(
      "q_siegel_tukey",
      Some("""
        WITH b AS (
          SELECT CAST(round(value * 1000000.0) AS BIGINT) AS v,
                 event_id AS t,
                 event_type = 'purchase' AS is_a
          FROM events WHERE event_type IN ('purchase', 'view')
        ), r AS (
          SELECT is_a,
                 CAST(row_number() OVER (ORDER BY v, t) AS BIGINT) AS i,
                 CAST(count(*) OVER () AS BIGINT) AS n
          FROM b
        ), st AS (
          SELECT is_a,
                 CASE WHEN i <= n + 1 - i THEN
                   CASE WHEN i % 2 = 1 THEN 2 * i - 1 ELSE 2 * i END
                 ELSE
                   CASE WHEN (n + 1 - i) % 2 = 1 THEN 2 * (n + 1 - i)
                        ELSE 2 * (n + 1 - i) - 1 END
                 END AS rank_st
          FROM r
        ), agg AS (
          SELECT CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_b,
                 CAST(sum(CASE WHEN is_a THEN rank_st ELSE 0 END)
                   AS BIGINT) AS w_a
          FROM st
        )
        SELECT n_a, n_b, w_a,
               round(CAST(w_a AS DOUBLE)
                 - n_a * (n_a + 1.0) / 2.0, 6) AS u_stat,
               round((CAST(w_a AS DOUBLE) - n_a * (n_a + 1.0) / 2.0
                   - n_a * CAST(n_b AS DOUBLE) / 2.0)
                 / sqrt(n_a * CAST(n_b AS DOUBLE)
                   * (n_a + n_b + 1.0) / 12.0), 6) AS z_stat
        FROM agg
      """.trim),
      "X389 Siegel-Tukey scale test, purchase vs view values")(
      (spark, dir) => {
        import spark.implicits._
        Hypothesis.siegelTukey(
          events(spark, dir)
            .filter($"event_type".isin("purchase", "view")),
          "value", $"event_type" === "purchase", $"event_id")
      }),

    // X390: two-sample Anderson-Darling (tie-aware A²akN) on the
    // same pair — the tail-weighted gate beside q_ks_test.
    QueryDef(
      "q_ad_2sample",
      Some("""
        WITH b AS (
          SELECT CAST(round(value * 1000000.0) AS BIGINT) AS v,
                 event_type = 'purchase' AS is_a
          FROM events WHERE event_type IN ('purchase', 'view')
        ), per AS (
          SELECT v,
                 CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(count(*) AS BIGINT) AS h
          FROM b GROUP BY v
        ), tot AS (
          SELECT CAST(sum(ca) AS BIGINT) AS m,
                 CAST(sum(h - ca) AS BIGINT) AS nb,
                 CAST(sum(h) AS BIGINT) AS nn,
                 CAST(count(*) AS BIGINT) AS l
          FROM per
        ), cum AS (
          SELECT v, ca, h,
                 sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cca,
                 sum(h) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS ch
          FROM per
        ), terms AS (
          SELECT CASE WHEN CAST(m AS HUGEINT) * nb *
                   ((2 * ch - h) * (2 * CAST(nn AS HUGEINT)
                     - (2 * ch - h)) - CAST(nn AS HUGEINT) * h) > 0
                 THEN CAST(round(
                   CAST(CAST(h AS HUGEINT) * (
                     CAST(nb AS HUGEINT)
                       * (CAST(nn AS HUGEINT) * (2 * cca - ca)
                          - CAST(m AS HUGEINT) * (2 * ch - h))
                       * (CAST(nn AS HUGEINT) * (2 * cca - ca)
                          - CAST(m AS HUGEINT) * (2 * ch - h))
                     + CAST(m AS HUGEINT)
                       * (CAST(nn AS HUGEINT) * ((2 * ch - h)
                            - (2 * cca - ca))
                          - CAST(nb AS HUGEINT) * (2 * ch - h))
                       * (CAST(nn AS HUGEINT) * ((2 * ch - h)
                            - (2 * cca - ca))
                          - CAST(nb AS HUGEINT) * (2 * ch - h))
                   ) AS DOUBLE)
                   / CAST(CAST(m AS HUGEINT) * nb *
                     ((2 * ch - h) * (2 * CAST(nn AS HUGEINT)
                       - (2 * ch - h)) - CAST(nn AS HUGEINT) * h)
                     AS DOUBLE) * 1e9) AS BIGINT)
                 ELSE 0 END AS t
          FROM cum, tot
        )
        SELECT m AS n_a, nb AS n_b, l AS n_distinct,
               CASE WHEN m > 0 AND nb > 0 AND l > 1 THEN
                 round((CAST(nn AS DOUBLE) - 1.0)
                   / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
                   * CAST((SELECT sum(t) FROM terms) AS DOUBLE)
                   / 1e9, 6) END AS ad_stat
        FROM tot
      """.trim),
      "X390 two-sample Anderson-Darling A2akN, purchase vs view")(
      (spark, dir) => {
        import spark.implicits._
        Hypothesis.ad2Sample(
          events(spark, dir)
            .filter($"event_type".isin("purchase", "view")),
          "value", $"event_type" === "purchase")
      }),

    // X391: Moses extreme reactions — the span of the view group's
    // combined-order positions after trimming 2 from each side.
    QueryDef(
      "q_moses",
      Some("""
        WITH b AS (
          SELECT CAST(round(value * 1000000.0) AS BIGINT) AS v,
                 event_id AS t,
                 event_type = 'view' AS is_a
          FROM events WHERE event_type IN ('purchase', 'view')
        ), r AS (
          SELECT is_a,
                 CAST(row_number() OVER (ORDER BY v, t) AS BIGINT) - 1
                   AS pos
          FROM b
        ), a AS (
          SELECT pos,
                 CAST(row_number() OVER (ORDER BY pos) AS BIGINT) - 1
                   AS rk
          FROM r WHERE is_a
        ), counts AS (
          SELECT CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_b
          FROM r
        ), ends AS (
          SELECT min(CASE WHEN rk = 2 THEN pos END) AS lo,
                 min(CASE WHEN rk = (SELECT n_a FROM counts) - 3
                   THEN pos END) AS hi
          FROM a
        )
        SELECT n_a, n_b, CAST(2 AS BIGINT) AS trim,
               CASE WHEN n_a > 4 THEN hi - lo + 1 END AS span,
               CASE WHEN n_a > 4 THEN hi - lo + 1 - (n_a - 4) END
                 AS excess
        FROM counts, ends
      """.trim),
      "X391 Moses extreme-reactions span, view within purchase+view")(
      (spark, dir) => {
        import spark.implicits._
        Hypothesis.mosesSpan(
          events(spark, dir)
            .filter($"event_type".isin("purchase", "view")),
          "value", $"event_type" === "view", $"event_id", trim = 2)
      }),

    // X394: AIPW doubly-robust ATE — q_ipw's banded propensity plus
    // a per-source outcome model; the estimator that stays
    // consistent when EITHER leg is right.
    QueryDef(
      "q_aipw",
      Some("""
        WITH b AS (
          SELECT source, lang = 'en' AS t,
                 CAST(n_chars AS DOUBLE) AS y,
                 CAST(4 + 3 * (doc_id % 4) AS DOUBLE) / 20.0 AS e
          FROM documents
        ), om AS (
          SELECT source,
                 CAST(sum(CASE WHEN t THEN CAST(n_chars AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS sy1,
                 CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
                 CAST(sum(CASE WHEN t THEN 0
                   ELSE CAST(n_chars AS BIGINT) END) AS BIGINT) AS sy0,
                 CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT)
                   AS n0
          FROM (SELECT source, lang = 'en' AS t, n_chars
                FROM documents)
          GROUP BY source
        ), terms AS (
          SELECT b.t,
            CAST(round((CAST(om.sy1 AS DOUBLE) / om.n1
              + (CASE WHEN b.t THEN (b.y - CAST(om.sy1 AS DOUBLE)
                  / om.n1) / b.e ELSE 0.0 END)) * 1e9) AS BIGINT)
              AS t1,
            CAST(round((CAST(om.sy0 AS DOUBLE) / om.n0
              + (CASE WHEN b.t THEN 0.0
                 ELSE (b.y - CAST(om.sy0 AS DOUBLE) / om.n0)
                   / (1.0 - b.e) END)) * 1e9) AS BIGINT) AS t0
          FROM b JOIN om USING (source)
          WHERE om.n1 > 0 AND om.n0 > 0
        )
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_treated,
               round(CAST(sum(t1) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 1e9), 6) AS mu1,
               round(CAST(sum(t0) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 1e9), 6) AS mu0,
               round((CAST(sum(t1) AS DOUBLE) - CAST(sum(t0)
                   AS DOUBLE))
                 / (CAST(count(*) AS DOUBLE) * 1e9), 6) AS ate_aipw
        FROM terms
      """.trim),
      "X394 AIPW doubly-robust ATE of 'en' on length, source model")(
      (spark, dir) => {
        import spark.implicits._
        val docs = table(spark, dir, "documents")
        val t = $"lang" === "en"
        val om = docs.groupBy($"source")
          .agg(sum(when(t, $"n_chars".cast("long")).otherwise(0L))
              .cast("long").as("sy1"),
            sum(when(t, 1L).otherwise(0L)).cast("long").as("n1"),
            sum(when(t, 0L).otherwise($"n_chars".cast("long")))
              .cast("long").as("sy0"),
            sum(when(t, 0L).otherwise(1L)).cast("long").as("n0"))
        val e = (lit(4) + lit(3) * ($"doc_id" % 4)).cast("double") /
          20.0
        val m1 = $"sy1".cast("double") / $"n1"
        val m0 = $"sy0".cast("double") / $"n0"
        val y = $"n_chars".cast("double")
        val terms = docs.join(om, Seq("source"))
          .filter($"n1" > 0L && $"n0" > 0L)
          .select(t.as("t"),
            round((m1 + when(t, (y - m1) / e).otherwise(lit(0.0))) *
              1e9, 0).cast("long").as("t1"),
            round((m0 + when(t, lit(0.0))
              .otherwise((y - m0) / (lit(1.0) - e))) * 1e9, 0)
              .cast("long").as("t0"))
        terms.agg(count(lit(1)).cast("long").as("n"),
            sum(when($"t", 1L).otherwise(0L)).cast("long")
              .as("n_treated"),
            sum($"t1").cast("long").as("__s1"),
            sum($"t0").cast("long").as("__s0"))
          .select($"n", $"n_treated",
            round($"__s1".cast("double") /
              ($"n".cast("double") * 1e9), 6).as("mu1"),
            round($"__s0".cast("double") /
              ($"n".cast("double") * 1e9), 6).as("mu0"),
            round(($"__s1".cast("double") - $"__s0".cast("double")) /
              ($"n".cast("double") * 1e9), 6).as("ate_aipw"))
      }),

    // X395: E-value sensitivity per source — how strong an
    // unmeasured confounder must be to explain away the observed
    // risk ratio; the standard robustness readout next to
    // q_mantel_haenszel's adjusted effect.
    QueryDef(
      "q_evalue",
      Some("""
        WITH cells AS (
          SELECT source,
            CAST(sum(CASE WHEN lang = 'en' AND n_chars >= 250
              THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(sum(CASE WHEN lang = 'en' AND n_chars < 250
              THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(sum(CASE WHEN lang <> 'en' AND n_chars >= 250
              THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN lang <> 'en' AND n_chars < 250
              THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM documents GROUP BY source
        ), rr AS (
          SELECT source, a, b, c, d,
                 CASE WHEN a + b > 0 AND c + d > 0 AND a > 0 AND c > 0
                 THEN (CAST(a AS DOUBLE) / (a + b))
                   / (CAST(c AS DOUBLE) / (c + d)) END AS rr
          FROM cells
        )
        SELECT source, a, b, c, d, round(rr, 6) AS risk_ratio,
               CASE WHEN rr IS NULL THEN NULL
                    WHEN rr >= 1.0 THEN
                      round(rr + sqrt(rr * (rr - 1.0)), 6)
                    ELSE round(1.0 / rr
                      + sqrt((1.0 / rr) * (1.0 / rr - 1.0)), 6)
               END AS e_value
        FROM rr ORDER BY source
      """.trim),
      "X395 E-value for the per-source en->long-doc risk ratio")(
      (spark, dir) => {
        import spark.implicits._
        val cells = table(spark, dir, "documents")
          .groupBy($"source")
          .agg(
            sum(when($"lang" === "en" && $"n_chars" >= 250, 1L)
              .otherwise(0L)).cast("long").as("a"),
            sum(when($"lang" === "en" && $"n_chars" < 250, 1L)
              .otherwise(0L)).cast("long").as("b"),
            sum(when($"lang" =!= "en" && $"n_chars" >= 250, 1L)
              .otherwise(0L)).cast("long").as("c"),
            sum(when($"lang" =!= "en" && $"n_chars" < 250, 1L)
              .otherwise(0L)).cast("long").as("d"))
        val ok = $"a" + $"b" > 0L && $"c" + $"d" > 0L &&
          $"a" > 0L && $"c" > 0L
        val rr = ($"a".cast("double") / ($"a" + $"b")) /
          ($"c".cast("double") / ($"c" + $"d"))
        val rinv = lit(1.0) / $"rr"
        cells.select($"source", $"a", $"b", $"c", $"d",
            when(ok, rr).as("rr"))
          .select($"source", $"a", $"b", $"c", $"d",
            round($"rr", 6).as("risk_ratio"),
            when($"rr".isNull, lit(null).cast("double"))
              .when($"rr" >= 1.0,
                round($"rr" + sqrt($"rr" * ($"rr" - 1.0)), 6))
              .otherwise(round(rinv +
                sqrt(rinv * (rinv - 1.0)), 6)).as("e_value"))
          .orderBy($"source")
      }),

    // X396: Matthews correlation + balanced accuracy per source for
    // the length-as-en classifier — the chance-robust single numbers
    // the q_class_report precision/recall table lacks.
    QueryDef(
      "q_mcc",
      Some("""
        WITH c AS (
          SELECT source,
            CAST(sum(CASE WHEN n_chars >= 250 AND lang = 'en'
              THEN 1 ELSE 0 END) AS BIGINT) AS tp,
            CAST(sum(CASE WHEN n_chars >= 250 AND lang <> 'en'
              THEN 1 ELSE 0 END) AS BIGINT) AS fp,
            CAST(sum(CASE WHEN n_chars < 250 AND lang = 'en'
              THEN 1 ELSE 0 END) AS BIGINT) AS fn,
            CAST(sum(CASE WHEN n_chars < 250 AND lang <> 'en'
              THEN 1 ELSE 0 END) AS BIGINT) AS tn
          FROM documents GROUP BY source
        )
        SELECT source, tp, fp, fn, tn,
               CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
                      > 0 THEN
                 round((CAST(tp AS DOUBLE) * tn
                     - CAST(fp AS DOUBLE) * fn)
                   / sqrt(CAST((tp + fp) * (tp + fn) AS DOUBLE)
                     * CAST((tn + fp) * (tn + fn) AS DOUBLE)), 6)
               END AS mcc,
               CASE WHEN tp + fn > 0 AND tn + fp > 0 THEN
                 round((CAST(tp AS DOUBLE) / (tp + fn)
                   + CAST(tn AS DOUBLE) / (tn + fp)) / 2.0, 6)
               END AS balanced_acc
        FROM c ORDER BY source
      """.trim),
      "X396 MCC + balanced accuracy per source, length-as-en")(
      (spark, dir) => {
        import spark.implicits._
        val pred = $"n_chars" >= 250
        val lab = $"lang" === "en"
        val c = table(spark, dir, "documents")
          .groupBy($"source")
          .agg(
            sum(when(pred && lab, 1L).otherwise(0L)).cast("long")
              .as("tp"),
            sum(when(pred && !lab, 1L).otherwise(0L)).cast("long")
              .as("fp"),
            sum(when(!pred && lab, 1L).otherwise(0L)).cast("long")
              .as("fn"),
            sum(when(!pred && !lab, 1L).otherwise(0L)).cast("long")
              .as("tn"))
        val denomOk = ($"tp" + $"fp") * ($"tp" + $"fn") *
          ($"tn" + $"fp") * ($"tn" + $"fn") > 0L
        c.select($"source", $"tp", $"fp", $"fn", $"tn",
            when(denomOk, round(($"tp".cast("double") * $"tn" -
                $"fp".cast("double") * $"fn") /
              sqrt((($"tp" + $"fp") * ($"tp" + $"fn")).cast("double") *
                (($"tn" + $"fp") * ($"tn" + $"fn")).cast("double")),
              6)).as("mcc"),
            when($"tp" + $"fn" > 0L && $"tn" + $"fp" > 0L,
              round(($"tp".cast("double") / ($"tp" + $"fn") +
                $"tn".cast("double") / ($"tn" + $"fp")) / 2.0, 6))
              .as("balanced_acc"))
          .orderBy($"source")
      }),

    // X393: Holt linear trend on the daily event-count series —
    // integer-quantized state replayed by a recursive CTE, the
    // q_jump_shards convention.
    QueryDef(
      "q_holt_linear",
      Some("""
        WITH daily AS (
          SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
                 CAST(count(*) AS BIGINT) * 1000000 AS v,
                 CAST(row_number() OVER (ORDER BY CAST(ts AS DATE))
                   AS BIGINT) AS i
          FROM events GROUP BY CAST(ts AS DATE)
        ), seed AS (
          SELECT (SELECT v FROM daily WHERE i = 2)
            - (SELECT v FROM daily WHERE i = 1) AS b0
        ), rec AS (
          WITH RECURSIVE h(i, d, v, l, b, f) AS (
            SELECT daily.i, daily.d, daily.v, daily.v,
                   seed.b0, CAST(NULL AS BIGINT)
            FROM daily, seed WHERE daily.i = 1
            UNION ALL
            SELECT daily.i, daily.d, daily.v,
                   CAST(floor((daily.v + h.l + h.b) / 2.0) AS BIGINT),
                   CAST(floor((h.b
                     + CAST(floor((daily.v + h.l + h.b) / 2.0)
                       AS BIGINT) - h.l) / 2.0) AS BIGINT),
                   h.l + h.b
            FROM h JOIN daily ON daily.i = h.i + 1
          )
          SELECT * FROM h
        )
        SELECT d AS bucket, round(v / 1e6, 6) AS value,
               round(l / 1e6, 6) AS level, round(b / 1e6, 6) AS trend,
               round(f / 1e6, 6) AS forecast
        FROM rec ORDER BY i
      """.trim),
      "X393 Holt linear trend, integer state, daily event counts")(
      (spark, dir) => {
        import spark.implicits._
        val daily = events(spark, dir)
          .groupBy(to_date($"ts").cast("string").as("d"))
          .agg(count(lit(1)).cast("long").as("v"))
        TimeSeries.holtLinear(daily, "d", "v")
      }),
  )
}