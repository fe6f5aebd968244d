package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Calibrate, Constraints, Dedup, DistStats,
  GraphStats, Hypothesis, Privacy, Provenance, RankEval, RankStats,
  SetJoin, Similarity, Winnow}
import QueryDef.{events, table}

/** r10 wave 1 (SURVEY §2.10 X181–X187): rank statistics (Spearman,
  * binned Kendall tau-b, Borda aggregation) and distribution-shape
  * diagnostics (token Gini + top-p coverage, Benford first-digit QA,
  * Otsu auto-threshold, simple Good-Turing re-estimation). Same
  * determinism contract as every other query file: micro/exact
  * integer arithmetic on the hashed path, fixed-shape double
  * formulas, round(6).
  */
object StatsQueries {

  /** DuckDB twin of Dedup.tokens — whitespace split, empties out. */
  private val SqlToks =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

  /** Unrolled integer-PageRank oracle over the word co-occurrence
    * graph — the X101 iteration body verbatim (pr on the 1e9 grid,
    * damping 17/20) with a word-bigram edge head. Same reason as
    * CurationQueries.pagerankSql: the rank fold can't live in a
    * recursive CTE term.
    */
  private def textrankSql(iters: Int): String = {
    val head = s"""
      WITH toks AS (
        SELECT doc_id, $SqlToks AS w FROM documents
      ), e0 AS (
        SELECT DISTINCT w[i] AS src, w[i+1] AS dst
        FROM toks, unnest(range(1, len(w))) AS r(i)
        WHERE w[i] <> w[i+1]
      ), edges AS (
        SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
      ), deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        FROM edges GROUP BY 1
      ), nodes AS (
        SELECT DISTINCT src AS node FROM edges
      ), params AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
      ), pr0 AS (
        SELECT node,
               CAST(1000000000 // (SELECT n FROM params) AS BIGINT) AS r
        FROM nodes
      )"""
    val steps = (1 to iters).map { i =>
      s""", pr$i AS (
        SELECT n.node,
          CAST((SELECT CAST(3000000000 AS BIGINT) // (20 * n) FROM params)
            + ((17 * coalesce(c.s, 0)) // 20) AS BIGINT) AS r
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node, sum(p.r // d.deg) AS s
          FROM pr${i - 1} p
          JOIN edges e ON e.src = p.node
          JOIN deg d ON d.node = p.node
          GROUP BY e.dst) c ON n.node = c.node
      )"""
    }.mkString
    val tail = s"""
      SELECT node AS word, r AS "rank" FROM pr$iters
      ORDER BY "rank" DESC, word"""
    (head + steps + tail).trim
  }

  val defs: Seq[QueryDef] = Seq(

    // X181: Spearman rank correlation between doc length and token
    // count — average-tie ranks from the distinct-value tables.
    QueryDef(
      "q_spearman",
      Some(s"""
        WITH b AS (
          SELECT CAST(round(n_chars * 1e6) AS BIGINT) AS x,
                 CAST(round(len($SqlToks) * 1e6) AS BIGINT) AS y
          FROM documents
        ), rx AS (
          SELECT x AS v, 2 * (cum - c) + c + 1 AS r FROM (
            SELECT x, CAST(count(*) AS BIGINT) AS c,
                   CAST(sum(count(*)) OVER (ORDER BY x) AS BIGINT) AS cum
            FROM b GROUP BY x)
        ), ry AS (
          SELECT y AS v, 2 * (cum - c) + c + 1 AS r FROM (
            SELECT y, CAST(count(*) AS BIGINT) AS c,
                   CAST(sum(count(*)) OVER (ORDER BY y) AS BIGINT) AS cum
            FROM b GROUP BY y)
        ), j AS (
          SELECT rx.r AS xr, ry.r AS yr
          FROM b JOIN rx ON b.x = rx.v JOIN ry ON b.y = ry.v
        ), m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(xr AS HUGEINT)) AS sx,
                 sum(CAST(yr AS HUGEINT)) AS sy,
                 sum(CAST(xr AS HUGEINT) * yr) AS sxy,
                 sum(CAST(xr AS HUGEINT) * xr) AS sxx,
                 sum(CAST(yr AS HUGEINT) * yr) AS syy
          FROM j
        )
        SELECT n,
               CASE WHEN n > 1
                 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
                 AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
               THEN
                 round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               END AS spearman_rho
        FROM m
      """.trim),
      "X181 Spearman rank correlation of doc length vs token count")(
      (spark, dir) => {
        import spark.implicits._
        val d = table(spark, dir, "documents")
          .select($"n_chars", size(Dedup.tokens($"text")).as("n_tokens"))
        RankStats.spearman(d, "n_chars", "n_tokens")
      }),

    // X182: Kendall tau-b of the same pair on the 64-bin grid —
    // concordant/discordant mass from the bounded contingency table.
    QueryDef(
      "q_kendall_tau",
      Some(s"""
        WITH b AS (
          SELECT CAST(round(n_chars * 1e6) AS BIGINT) AS x,
                 CAST(round(len($SqlToks) * 1e6) AS BIGINT) AS y
          FROM documents
        ), ext AS (
          SELECT min(x) AS xlo, max(x) AS xhi,
                 min(y) AS ylo, max(y) AS yhi
          FROM b
        ), cells AS (
          SELECT ((x - xlo) * 64) // (xhi - xlo + 1) AS bx,
                 ((y - ylo) * 64) // (yhi - ylo + 1) AS by_,
                 CAST(count(*) AS BIGINT) AS c
          FROM b, ext GROUP BY 1, 2
        ), cc AS (
          SELECT coalesce(sum(CAST(a.c AS HUGEINT) * b2.c), 0) AS m
          FROM cells a JOIN cells b2
            ON b2.bx > a.bx AND b2.by_ > a.by_
        ), dd AS (
          SELECT coalesce(sum(CAST(a.c AS HUGEINT) * b2.c), 0) AS m
          FROM cells a JOIN cells b2
            ON b2.bx > a.bx AND b2.by_ < a.by_
        ), t1 AS (
          SELECT coalesce(sum(CAST(t AS HUGEINT) * (t - 1)), 0) AS v
          FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY bx)
        ), t2 AS (
          SELECT coalesce(sum(CAST(t AS HUGEINT) * (t - 1)), 0) AS v
          FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY by_)
        ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
        SELECT n,
               CASE WHEN n > 1 THEN
                 round(CAST(cc.m AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0),
                   6) END AS frac_concordant,
               CASE WHEN n > 1 THEN
                 round(CAST(dd.m AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0),
                   6) END AS frac_discordant,
               CASE WHEN n > 1
                 AND CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0
                     - CAST(t1.v AS DOUBLE) / 2.0 > 0.0
                 AND CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0
                     - CAST(t2.v AS DOUBLE) / 2.0 > 0.0
               THEN
                 round((CAST(cc.m AS DOUBLE) - CAST(dd.m AS DOUBLE))
                   / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                             / 2.0 - CAST(t1.v AS DOUBLE) / 2.0)
                        * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                             / 2.0 - CAST(t2.v AS DOUBLE) / 2.0)), 6)
               END AS tau_b
        FROM nn, cc, dd, t1, t2
      """.trim),
      "X182 Kendall tau-b of doc length vs token count (64-bin grid)")(
      (spark, dir) => {
        import spark.implicits._
        val d = table(spark, dir, "documents")
          .select($"n_chars", size(Dedup.tokens($"text")).as("n_tokens"))
        RankStats.kendallTauB(d, "n_chars", "n_tokens", bins = 64)
      }),

    // X183: Borda rank aggregation over three length/richness
    // signals — top 100 consensus docs, exact two-phase ranks.
    QueryDef(
      "q_borda",
      Some(s"""
        WITH t AS (
          SELECT doc_id, n_chars,
                 CAST(len($SqlToks) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct($SqlToks)) AS BIGINT) AS n_types
          FROM documents
        ), r AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                   AS BIGINT) AS rank_n_chars,
                 CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id)
                   AS BIGINT) AS rank_n_tokens,
                 CAST(row_number() OVER (ORDER BY n_types DESC, doc_id)
                   AS BIGINT) AS rank_n_types,
                 CAST(count(*) OVER () AS BIGINT) AS n
          FROM t
        ), s AS (
          SELECT doc_id, rank_n_chars, rank_n_tokens, rank_n_types,
                 (n - rank_n_chars) + (n - rank_n_tokens)
                   + (n - rank_n_types) AS borda_score
          FROM r
        )
        SELECT doc_id, rank_n_chars, rank_n_tokens, rank_n_types,
               borda_score,
               CAST(row_number() OVER (ORDER BY borda_score DESC, doc_id)
                 AS INTEGER) AS borda_rank
        FROM s
        ORDER BY borda_score DESC, doc_id
        LIMIT 100
      """.trim),
      "X183 Borda consensus top-100 over length/richness signals")(
      (spark, dir) => {
        import spark.implicits._
        val toks = Dedup.tokens($"text")
        val d = table(spark, dir, "documents")
          .select($"doc_id", $"n_chars",
            size(toks).cast("long").as("n_tokens"),
            size(array_distinct(toks)).cast("long").as("n_types"))
        RankStats.bordaTopK(d, "doc_id",
            Seq("n_chars", "n_tokens", "n_types"), k = 100)
          .orderBy($"borda_rank")
      }),

    // X184: token-frequency concentration — Gini coefficient of the
    // unigram distribution plus the type count covering 90% of the
    // token mass.
    QueryDef(
      "q_token_gini",
      Some(s"""
        WITH toks AS (SELECT unnest($SqlToks) AS t FROM documents),
        c AS (SELECT t, CAST(count(*) AS BIGINT) AS v FROM toks GROUP BY t),
        g AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM c GROUP BY v),
        tot AS (
          SELECT CAST(sum(m) AS BIGINT) AS n,
                 CAST(sum(v * m) AS BIGINT) AS w
          FROM g
        ), cum AS (
          SELECT v, m,
                 CAST(sum(m) OVER (ORDER BY v) AS BIGINT) AS cumup,
                 CAST(sum(m) OVER (ORDER BY v DESC) AS BIGINT) AS cumdnm,
                 CAST(sum(v * m) OVER (ORDER BY v DESC) AS BIGINT)
                   AS cumdnw
          FROM g
        ), gn AS (
          SELECT coalesce(sum(CAST(v AS HUGEINT) * m
                   * (2 * (cumup - m) + m - (SELECT n FROM tot))), 0)
                 AS gn
          FROM cum
        ), tgt AS (
          SELECT CAST((CAST(w AS HUGEINT) * 900000 + 999999) // 1000000
                   AS BIGINT) AS target
          FROM tot
        ), pick AS (
          SELECT min(cumdnw) AS pickw FROM cum, tgt WHERE cumdnw >= target
        ), sel AS (
          SELECT (cumdnm - m)
                   + (target - (cumdnw - v * m) + v - 1) // v
                 AS top_p_items
          FROM cum, tgt, pick WHERE cumdnw = pickw
        )
        SELECT n AS n_items, w AS total_weight,
               CASE WHEN n > 0 AND w > 0 THEN
                 round(CAST(gn AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(w AS DOUBLE)), 6)
               END AS gini,
               top_p_items
        FROM tot, gn, sel
      """.trim),
      "X184 unigram Gini concentration + types covering 90% of mass")(
      (spark, dir) => {
        import spark.implicits._
        val counts = table(spark, dir, "documents")
          .select(explode(Dedup.tokens($"text")).as("t"))
          .groupBy($"t").agg(count(lit(1)).as("cnt"))
        DistStats.giniConcentration(counts, "cnt", p = 0.9)
      }),

    // X185: Benford first-digit conformance of order totals — the
    // fabricated-numbers QA check, exact digit counts + χ² terms.
    QueryDef(
      "q_benford",
      Some("""
        WITH c AS (
          SELECT v FROM (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
            FROM orders) WHERE v > 0
        ), obs AS (
          SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER)
                   AS digit,
                 CAST(count(*) AS BIGINT) AS observed
          FROM c GROUP BY 1
        ), tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
        SELECT digit, observed,
               round(CAST(n AS DOUBLE)
                 * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)), 6)
                 AS expected,
               round((CAST(observed AS DOUBLE)
                      - CAST(n AS DOUBLE)
                        * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE))
                           / ln(10.0)))
                     * (CAST(observed AS DOUBLE)
                        - CAST(n AS DOUBLE)
                          * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE))
                             / ln(10.0)))
                     / (CAST(n AS DOUBLE)
                        * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE))
                           / ln(10.0))), 6) AS chi2_term
        FROM obs, tot
        ORDER BY digit
      """.trim),
      "X185 Benford first-digit test over order totals")(
      (spark, dir) =>
        DistStats.benford(table(spark, dir, "orders"), "o_totalprice")
          .orderBy("digit")),

    // X186: Otsu auto-threshold on the doc-length histogram — the
    // argmax of between-class variance over every distinct cut.
    QueryDef(
      "q_otsu_threshold",
      Some("""
        WITH g AS (
          SELECT CAST(round(n_chars * 1e6) AS BIGINT) AS v,
                 CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1
        ), cum AS (
          SELECT v, c,
                 CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS n0,
                 CAST(sum(CAST(v AS HUGEINT) * c) OVER (ORDER BY v)
                   AS HUGEINT) AS s0
          FROM g
        ), tot AS (
          SELECT CAST(sum(c) AS BIGINT) AS nn,
                 CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS ss
          FROM g
        ), sc AS (
          SELECT v, n0, nn,
                 CAST(s0 * nn - ss * n0 AS DOUBLE)
                   * CAST(s0 * nn - ss * n0 AS DOUBLE)
                 / (CAST(n0 AS DOUBLE) * CAST(nn - n0 AS DOUBLE)
                    * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) AS sb
          FROM cum, tot WHERE n0 > 0 AND n0 < nn
        ), best AS (SELECT max(sb) AS b FROM sc),
        pick AS (
          SELECT min(v) AS t, max(b) AS sbv, max(nn) AS nn2
          FROM sc, best WHERE sb = b
        )
        SELECT round(CAST(pick.t AS DOUBLE) / 1e6, 6) AS threshold,
               round(sbv / 1e12, 6) AS sigma_b,
               sc.n0 AS n_below,
               nn2 - sc.n0 AS n_above
        FROM pick JOIN sc ON sc.v = pick.t
      """.trim),
      "X186 Otsu between-class-variance threshold on doc length")(
      (spark, dir) =>
        DistStats.otsuThreshold(
          table(spark, dir, "documents"), "n_chars")),

    // X187: simple Good-Turing re-estimated counts r* for r ≤ 10
    // plus the unseen-mass r=0 row. Counts are trigram DOCUMENT
    // frequencies — the sparse end of this corpus (the templated
    // unigram vocabulary has no low-r support at all, which would
    // make the estimator vacuous).
    QueryDef(
      "q_good_turing",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, $SqlToks AS w FROM documents
        ), tri AS (
          SELECT DISTINCT doc_id,
                 w[i] || chr(1) || w[i+1] || chr(1) || w[i+2] AS g
          FROM toks, unnest(range(1, len(w) - 1)) AS r(i)
        ), c AS (
          SELECT g, CAST(count(*) AS BIGINT) AS v FROM tri GROUP BY g
        ), fof AS (
          SELECT v AS r, CAST(count(*) AS BIGINT) AS nr FROM c GROUP BY v
        ), tot AS (
          SELECT CAST(sum(CAST(r AS HUGEINT) * nr) AS HUGEINT) AS t
          FROM fof
        ), rws AS (
          SELECT f.r AS r, f.nr AS n_r,
                 round(CAST(f.r + 1 AS DOUBLE) * CAST(n2.nr AS DOUBLE)
                   / CAST(f.nr AS DOUBLE), 6) AS r_star,
                 round(CAST(f.r + 1 AS DOUBLE) * CAST(n2.nr AS DOUBLE)
                   / CAST(f.nr AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
                   AS p_gt
          FROM fof f LEFT JOIN fof n2 ON n2.r = f.r + 1, tot
          WHERE f.r <= 10
        ), unseen AS (
          SELECT CAST(0 AS BIGINT) AS r, nr AS n_r,
                 CAST(NULL AS DOUBLE) AS r_star,
                 round(CAST(nr AS DOUBLE) / CAST(t AS DOUBLE), 6) AS p_gt
          FROM fof, tot WHERE r = 1
        )
        SELECT * FROM unseen
        UNION ALL SELECT * FROM rws
        ORDER BY r
      """.trim),
      "X187 simple Good-Turing adjusted counts + unseen mass " +
        "(trigram document frequencies)")(
      (spark, dir) => {
        import spark.implicits._
        val counts = Dedup.explodedShingles(
            table(spark, dir, "documents"), "doc_id", "text", k = 3)
          .groupBy($"g").agg(count(lit(1)).as("v"))
        DistStats.goodTuring(counts, "v", maxR = 10).orderBy($"r")
      }),

    // X188: MOSS winnowing fingerprints (k=5 char-grams, window
    // w=4) — per doc the fingerprint count and an md5 digest of the
    // position-ordered (hash, pos) selection.
    QueryDef(
      "q_winnow",
      Some("""
        WITH d AS (
          SELECT doc_id,
                 regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
          FROM documents
        ), base AS (
          SELECT doc_id, s, len(s) AS l FROM d
          WHERE len(s) >= 8 AND len(s) <= 1048576
        ), kg AS (
          SELECT doc_id, l, i AS p,
                 ('0x' || substr(md5(substr(s, i + 1, 5)), 1, 8))::BIGINT
                   AS h
          FROM base, unnest(range(0, l - 5 + 1)) AS r(i)
        ), keyed AS (
          SELECT doc_id, l, p, h * 1048576 + (1048575 - p) AS kk
          FROM kg
        ), wm AS (
          SELECT doc_id, l, p,
                 min(kk) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
          FROM keyed
        ), sel AS (
          SELECT DISTINCT doc_id, wmin FROM wm WHERE p <= l - 5 - 3
        ), fp AS (
          SELECT doc_id, wmin // 1048576 AS h,
                 1048575 - (wmin % 1048576) AS pos
          FROM sel
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
               md5(string_agg(h::VARCHAR || ':' || pos::VARCHAR, ','
                 ORDER BY pos)) AS fp_md5
        FROM fp GROUP BY doc_id
        ORDER BY doc_id
      """.trim),
      "X188 winnowing fingerprint digests per doc (k=5, w=4)")(
      (spark, dir) =>
        Winnow.fingerprints(table(spark, dir, "documents"),
            "doc_id", "text", k = 5, w = 4)
          .orderBy("doc_id")),

    // X189: SPRT early-stopping replay per event_type — when could
    // the "values run high" hypothesis (p1=0.5 vs p0=0.3 of
    // value>50) have been decided, walking events in time order.
    QueryDef(
      "q_sprt",
      Some {
        val c1 = math.log(0.5 / 0.3)
        val c0 = math.log(0.5 / 0.7)
        val aB = math.log((1 - 0.2) / 0.05)
        val bB = math.log(0.2 / (1 - 0.05))
        s"""
        WITH tr AS (
          SELECT event_type, ts, event_id,
                 CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS x
          FROM events
        ), wk AS (
          SELECT event_type,
                 CAST(count(*) OVER win AS BIGINT) AS n,
                 CAST(sum(x) OVER win AS BIGINT) AS s
          FROM tr WINDOW win AS (PARTITION BY event_type
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), ll AS (
          SELECT event_type, n, s,
                 CAST(s AS DOUBLE) * ($c1)
                   + CAST(n - s AS DOUBLE) * ($c0) AS llr
          FROM wk
        ), cr AS (
          SELECT event_type, min(n) AS nc FROM ll
          WHERE llr >= $aB OR llr <= $bB GROUP BY 1
        ), at_ AS (
          SELECT l.event_type, l.n, l.s, l.llr
          FROM cr JOIN ll l
            ON l.event_type = cr.event_type AND l.n = cr.nc
        ), fin AS (
          SELECT l.event_type, l.n AS fn, l.s AS fs, l.llr AS fllr
          FROM (SELECT event_type, max(n) AS nt FROM ll GROUP BY 1) t
          JOIN ll l ON l.event_type = t.event_type AND l.n = t.nt
        )
        SELECT f.event_type,
               CASE WHEN a.n IS NULL THEN 'continue'
                    WHEN a.llr >= $aB THEN 'accept_h1'
                    ELSE 'accept_h0' END AS decision,
               coalesce(a.n, f.fn) AS n_trials,
               coalesce(a.s, f.fs) AS successes,
               round(coalesce(a.llr, f.fllr), 6) AS llr
        FROM fin f LEFT JOIN at_ a ON a.event_type = f.event_type
        ORDER BY f.event_type
        """.trim
      },
      "X189 SPRT first-crossing replay per event type")(
      (spark, dir) => {
        import spark.implicits._
        Hypothesis.sprt(events(spark, dir), "event_type",
            $"value" > 50.0, Seq($"ts", $"event_id"),
            p0 = 0.3, p1 = 0.5, alpha = 0.05, beta = 0.2)
          .orderBy($"event_type")
      }),

    // X190: triangle count + clustering coefficient of the part
    // co-purchase graph (parts sharing an order, first 3 lines).
    QueryDef(
      "q_triangles",
      Some("""
        WITH e AS (
          SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey
            AND x.l_partkey < y.l_partkey
          WHERE x.l_linenumber <= 3 AND y.l_linenumber <= 3
        ), ends AS (
          SELECT a AS v FROM e UNION ALL SELECT b FROM e
        ), nodes AS (
          SELECT CAST(count(DISTINCT v) AS BIGINT) AS n_nodes FROM ends
        ), ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
        deg AS (
          SELECT v, CAST(count(*) AS BIGINT) AS d FROM ends GROUP BY v
        ), w2 AS (
          SELECT coalesce(sum(CAST(d AS HUGEINT) * (d - 1)), 0) AS w2
          FROM deg
        ), tri AS (
          SELECT CAST(count(*) AS BIGINT) AS n_triangles
          FROM e e1 JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT n_nodes, n_edges, n_triangles,
               CAST(w2 // 2 AS BIGINT) AS n_wedges,
               CASE WHEN w2 > 0 THEN
                 round(6.0 * CAST(n_triangles AS DOUBLE)
                   / CAST(w2 AS DOUBLE), 6) END AS clustering_coeff
        FROM nodes, ne, tri, w2
      """.trim),
      "X190 triangles + transitivity of the part co-purchase graph")(
      (spark, dir) => {
        import spark.implicits._
        val l = table(spark, dir, "lineitem")
          .filter($"l_linenumber" <= 3)
          .select($"l_orderkey", $"l_partkey")
        val e = l.as("x").join(l.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("s1"),
            col("y.l_partkey").as("s2"))
          .distinct()
        GraphStats.triangleStats(e, "s1", "s2")
      }),

    // X191: quantile-normalize doc length across sources onto the
    // pooled distribution (1024-point grid) — "long for its source"
    // becomes comparable between sources.
    QueryDef(
      "q_quantile_norm",
      Some("""
        WITH base AS (
          SELECT source, doc_id,
                 CAST(round(n_chars * 1e6) AS BIGINT) AS v
          FROM documents
        ), ranked AS (
          SELECT source, doc_id, v,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY v, doc_id) AS BIGINT) AS r,
                 CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
                   AS ng
          FROM base
        ), tg AS (
          SELECT source, doc_id, v,
                 ((2 * r - 1) * 1024 + 2 * ng - 1) // (2 * ng) AS t
          FROM ranked
        ), cdf AS (
          SELECT v AS gv,
                 CAST(sum(count(*)) OVER (ORDER BY v) AS BIGINT) AS cum
          FROM base GROUP BY v
        ), tot AS (SELECT CAST(max(cum) AS BIGINT) AS nn FROM cdf),
        grid AS (
          SELECT i AS t, (i * nn + 1023) // 1024 AS target
          FROM tot, unnest(range(1, 1025)) AS r(i)
        ), stats AS (
          SELECT t, min(gv) AS stat
          FROM grid JOIN cdf ON cum >= target GROUP BY t
        )
        SELECT b.source, b.doc_id,
               round(CAST(b.v AS DOUBLE) / 1e6, 6) AS value,
               round(CAST(s.stat AS DOUBLE) / 1e6, 6) AS norm_value
        FROM tg b JOIN stats s ON s.t = b.t
        ORDER BY b.source, b.doc_id
      """.trim),
      "X191 cross-source quantile normalization of doc length")(
      (spark, dir) => {
        import spark.implicits._
        Calibrate.quantileNormalize(
            table(spark, dir, "documents"), "source", "n_chars",
            "doc_id", gridSize = 1024)
          .orderBy($"source", $"doc_id")
      }),

    // X192: isotonic calibration of the "lang = en" rate against
    // doc length on a 32-bin grid — PAV's exact minimax solution.
    QueryDef(
      "q_isotonic",
      Some("""
        WITH base AS (
          SELECT CAST(round(n_chars * 1e6) AS BIGINT) AS v,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents
        ), ext AS (SELECT min(v) AS lo, max(v) AS hi FROM base),
        b AS (
          SELECT ((v - lo) * 32) // (hi - lo + 1) AS bin,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS pos
          FROM base, ext GROUP BY 1
        ), cum AS (
          SELECT bin, n, pos,
                 CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
                 CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS ck
          FROM b
        ), iv AS (
          SELECT j.bin AS jb, k.bin AS kb,
                 CAST(k.ck - j.ck + j.pos AS DOUBLE)
                   / CAST(k.cn - j.cn + j.n AS DOUBLE) AS avg_
          FROM cum j JOIN cum k ON j.bin <= k.bin
        ), tri AS (
          SELECT b.bin, b.n, b.pos, iv.jb, iv.avg_
          FROM b JOIN iv ON iv.jb <= b.bin AND iv.kb >= b.bin
        ), inner_ AS (
          SELECT bin, n, pos, jb, min(avg_) AS mn
          FROM tri GROUP BY 1, 2, 3, 4
        )
        SELECT bin, n, pos,
               round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS raw_rate,
               round(max(mn), 6) AS fitted
        FROM inner_ GROUP BY bin, n, pos
        ORDER BY bin
      """.trim),
      "X192 isotonic calibration of en-rate vs doc length (32 bins)")(
      (spark, dir) => {
        import spark.implicits._
        Calibrate.isotonicFit(
            table(spark, dir, "documents")
              .select($"n_chars", ($"lang" === "en").as("is_en")),
            "n_chars", "is_en", bins = 32)
          .orderBy($"bin")
      }),

    // X193: TextRank keyword scores — integer PageRank (X101
    // machinery) over the symmetrized word-bigram co-occurrence
    // graph; bit-exact 10-iteration CTE replay.
    QueryDef(
      "q_textrank",
      Some(textrankSql(10)),
      "X193 TextRank keyword scores over the word bigram graph")(
      (spark, dir) => {
        import spark.implicits._
        val pairs = Dedup.explodedShingles(
            table(spark, dir, "documents"), "doc_id", "text", k = 2)
          .select(split($"g", Dedup.Sep).as("__p"))
          .select($"__p".getItem(0).as("src"),
            $"__p".getItem(1).as("dst"))
          .filter($"src" =!= $"dst")
          .distinct()
        val sym = pairs.union(
          pairs.select($"dst".as("src"), $"src".as("dst")))
        graft.operators.PageRank
          .run(sym, "src", "dst", iters = 10, symmetric = true)
          .select($"node".as("word"), $"rank")
          .orderBy($"rank".desc, $"word")
      }),

    // X194: session path mining — top 20 three-step event-type
    // journeys across per-user time-ordered streams.
    QueryDef(
      "q_session_paths",
      Some("""
        WITH w AS (
          SELECT event_type AS e1,
                 lead(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS e2,
                 lead(event_type, 2) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS e3
          FROM events
        ), p AS (
          SELECT e1 || '>' || e2 || '>' || e3 AS path,
                 CAST(count(*) AS BIGINT) AS n_paths
          FROM w WHERE e3 IS NOT NULL GROUP BY 1
        )
        SELECT path, n_paths FROM p
        ORDER BY n_paths DESC, path
        LIMIT 20
      """.trim),
      "X194 top-20 three-step user journeys")(
      (spark, dir) => {
        import spark.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        events(spark, dir)
          .select($"user_id", $"event_type", $"ts", $"event_id")
          .withColumn("e2", lead($"event_type", 1).over(w))
          .withColumn("e3", lead($"event_type", 2).over(w))
          .filter($"e3".isNotNull)
          .select(concat_ws(">", $"event_type", $"e2", $"e3")
            .as("path"))
          .groupBy($"path").agg(count(lit(1)).as("n_paths"))
          .orderBy($"n_paths".desc, $"path")
          .limit(20)
      }),

    // X195: RFM segmentation of customers from orders — exact
    // quintile scores, no ntile window.
    QueryDef(
      "q_rfm",
      Some("""
        WITH per AS (
          SELECT o_custkey,
                 max(CAST(o_orderdate AS DATE)) AS last_d,
                 CAST(count(*) AS BIGINT) AS frequency,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS monetary_cents
          FROM orders GROUP BY 1
        ), mx AS (SELECT max(last_d) AS mxd FROM per),
        base AS (
          SELECT o_custkey,
                 CAST(date_diff('day', last_d, mxd) AS BIGINT)
                   AS recency_days,
                 frequency, monetary_cents
          FROM per, mx
        ), n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM base),
        r AS (
          SELECT base.*,
                 CAST(row_number() OVER (ORDER BY recency_days,
                   o_custkey) AS BIGINT) - 1 AS rr,
                 CAST(row_number() OVER (ORDER BY frequency DESC,
                   o_custkey) AS BIGINT) - 1 AS rf,
                 CAST(row_number() OVER (ORDER BY monetary_cents DESC,
                   o_custkey) AS BIGINT) - 1 AS rm
          FROM base
        )
        SELECT o_custkey, recency_days, frequency, monetary_cents,
               6 - ((5 * rr) // nn + 1) AS r_score,
               6 - ((5 * rf) // nn + 1) AS f_score,
               6 - ((5 * rm) // nn + 1) AS m_score,
               (6 - ((5 * rr) // nn + 1)) * 100
                 + (6 - ((5 * rf) // nn + 1)) * 10
                 + (6 - ((5 * rm) // nn + 1)) AS rfm_code
        FROM r, n
        ORDER BY o_custkey
      """.trim),
      "X195 RFM quintile segmentation of customers")(
      (spark, dir) =>
        graft.operators.Funnel.rfm(table(spark, dir, "orders"),
            "o_custkey", "o_orderdate", "o_totalprice")
          .orderBy("o_custkey")),

    // X196: CUSUM changepoint per event type — reference 50, slack
    // 5, alarm at cumulative excess 800.
    QueryDef(
      "q_cusum",
      Some("""
        WITH base AS (
          SELECT event_type, ts, event_id,
                 CAST(round(value * 1e6) AS BIGINT) - 55000000 AS z
          FROM events
        ), walk AS (
          SELECT event_type,
                 CAST(count(*) OVER win AS BIGINT) AS n,
                 CAST(sum(z) OVER win AS BIGINT) AS p
          FROM base WINDOW win AS (PARTITION BY event_type
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), s AS (
          SELECT event_type, n,
                 p - least(0, min(p) OVER (PARTITION BY event_type
                   ORDER BY n
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 AS sn
          FROM walk
        ), al AS (
          SELECT event_type, min(n) AS an FROM s
          WHERE sn > 800000000 GROUP BY 1
        ), at_ AS (
          SELECT s.event_type, s.n, s.sn
          FROM al JOIN s ON s.event_type = al.event_type
            AND s.n = al.an
        ), tot AS (
          SELECT event_type, CAST(max(n) AS BIGINT) AS n_obs,
                 round(CAST(max(sn) AS DOUBLE) / 1e6, 6) AS s_max
          FROM s GROUP BY 1
        )
        SELECT t.event_type, t.n_obs, t.s_max,
               a.n AS alarm_n,
               round(CAST(a.sn AS DOUBLE) / 1e6, 6) AS s_at_alarm
        FROM tot t LEFT JOIN at_ a ON a.event_type = t.event_type
        ORDER BY t.event_type
      """.trim),
      "X196 CUSUM changepoint alarm per event type")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.TimeSeries.cusum(events(spark, dir),
            "event_type", "value", Seq($"ts", $"event_id"),
            target = 50.0, slack = 5.0, threshold = 800.0)
          .orderBy($"event_type")
      }),

    // X197: MinHash-LSH parameter planner S-curve — pure closed-form
    // grid, multiply-chain exact.
    QueryDef(
      "q_lsh_plan",
      Some("""
        WITH rg AS (SELECT i AS r FROM unnest(range(1, 9)) AS t(i)),
        bg AS (SELECT unnest([4, 8, 16, 32, 64]) AS b),
        sg AS (SELECT CAST(i AS DOUBLE) / 10.0 AS s
               FROM unnest(range(1, 10)) AS t(i)),
        g AS (
          SELECT CAST(r AS INTEGER) AS r, CAST(b AS INTEGER) AS b, s,
                 1.0 - (CASE r WHEN 1 THEN s WHEN 2 THEN s*s
                   WHEN 3 THEN s*s*s WHEN 4 THEN s*s*s*s
                   WHEN 5 THEN s*s*s*s*s WHEN 6 THEN s*s*s*s*s*s
                   WHEN 7 THEN s*s*s*s*s*s*s
                   ELSE s*s*s*s*s*s*s*s END) AS q
          FROM rg, bg, sg
        ), pw AS (
          SELECT r, b, s, q, q * q * q * q AS q4 FROM g
        ), pw2 AS (
          SELECT r, b, s, q4, q4 * q4 AS q8, (q4 * q4) * (q4 * q4)
                   AS q16,
                 ((q4 * q4) * (q4 * q4)) * ((q4 * q4) * (q4 * q4))
                   AS q32
          FROM pw
        )
        SELECT r, b, s,
               round(1.0 - (CASE b WHEN 4 THEN q4 WHEN 8 THEN q8
                 WHEN 16 THEN q16 WHEN 32 THEN q32
                 ELSE q32 * q32 END), 6) AS p_collision,
               round(exp(ln(1.0 / CAST(b AS DOUBLE))
                 / CAST(r AS DOUBLE)), 6) AS s_threshold
        FROM pw2
        ORDER BY r, b, s
      """.trim),
      "X197 LSH banding S-curve planner grid")(
      (spark, dir) =>
        Dedup.lshPlan(spark).orderBy("r", "b", "s")),

    // X199: winnowing near-dup candidate pairs — shared-fingerprint
    // join with the stop-fingerprint (maxDf) and minShared valves.
    QueryDef(
      "q_winnow_matches",
      Some("""
        WITH d AS (
          SELECT doc_id,
                 regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
          FROM documents
        ), base AS (
          SELECT doc_id, s, len(s) AS l FROM d
          WHERE len(s) >= 8 AND len(s) <= 1048576
        ), kg AS (
          SELECT doc_id, l, i AS p,
                 ('0x' || substr(md5(substr(s, i + 1, 5)), 1, 8))::BIGINT
                   AS h
          FROM base, unnest(range(0, l - 5 + 1)) AS r(i)
        ), keyed AS (
          SELECT doc_id, l, p, h * 1048576 + (1048575 - p) AS kk
          FROM kg
        ), wm AS (
          SELECT doc_id, l, p,
                 min(kk) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
          FROM keyed
        ), sel AS (
          SELECT DISTINCT doc_id, wmin FROM wm WHERE p <= l - 5 - 3
        ), fp AS (
          SELECT DISTINCT doc_id, wmin // 1048576 AS h FROM sel
        ), hdf AS (
          SELECT h FROM (SELECT h, count(*) AS m FROM fp GROUP BY h)
          WHERE m <= 20
        ), keep AS (
          SELECT fp.doc_id, fp.h FROM fp JOIN hdf USING (h)
        )
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM keep a JOIN keep b
          ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 3
        ORDER BY d1, d2
      """.trim),
      "X199 winnowing shared-fingerprint candidate pairs")(
      (spark, dir) =>
        Winnow.matches(table(spark, dir, "documents"), "doc_id",
            "text", k = 5, w = 4, maxDf = 20, minShared = 3)
          .orderBy("d1", "d2")),

    // X200: transition entropy — how predictable the next event is
    // from each state, over per-user time-ordered walks.
    QueryDef(
      "q_transition_entropy",
      Some("""
        WITH tr AS (
          SELECT event_type AS cur,
                 lead(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
          FROM events
        ), cells AS (
          SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c
          FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2
        ), rws AS (
          SELECT cur, CAST(sum(c) AS BIGINT) AS rt,
                 CAST(count(*) AS BIGINT) AS nn,
                 -sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sc
          FROM cells GROUP BY 1
        )
        SELECT cur AS cur_state, rt AS n_trans, nn AS n_next_states,
               round(ln(CAST(rt AS DOUBLE)) + sc / CAST(rt AS DOUBLE),
                 6) AS h_next
        FROM rws ORDER BY cur_state
      """.trim),
      "X200 per-state transition entropy of user event walks")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.Funnel.transitionEntropy(events(spark, dir),
            "user_id", "event_type", Seq($"ts", $"event_id"))
          .orderBy($"cur_state")
      }),

    // X201: PAA + equal-width SAX symbols of each event type's value
    // series (8 segments, 4-letter alphabet).
    QueryDef(
      "q_sax",
      Some("""
        WITH base AS (
          SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS v,
                 ts, event_id
          FROM events
        ), ranked AS (
          SELECT event_type, v,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY ts, event_id) AS BIGINT) AS r,
                 CAST(count(*) OVER (PARTITION BY event_type)
                   AS BIGINT) AS n
          FROM base
        ), seg AS (
          SELECT event_type, ((r - 1) * 8) // n AS segment,
                 CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(v) AS BIGINT) AS s
          FROM ranked GROUP BY 1, 2
        ), ext AS (
          SELECT event_type, min(v) AS lo, max(v) AS hi
          FROM base GROUP BY 1
        )
        SELECT g.event_type, g.segment, g.cnt AS n,
               round(CAST(g.s AS DOUBLE) / CAST(g.cnt AS DOUBLE) / 1e6,
                 6) AS seg_mean,
               chr(CAST(97 + (4 * (g.s - g.cnt * e.lo))
                 // (g.cnt * (e.hi - e.lo + 1)) AS INTEGER)) AS symbol
        FROM seg g JOIN ext e USING (event_type)
        ORDER BY g.event_type, g.segment
      """.trim),
      "X201 PAA + SAX word per event type (8 segments, abcd)")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.TimeSeries.saxSymbols(events(spark, dir),
            "event_type", "value", Seq($"ts", $"event_id"),
            segments = 8, alphabet = 4)
          .orderBy($"event_type", $"segment")
      }),

    // X202: exact set-similarity self-join (prefix filter) — every
    // doc pair with trigram-shingle Jaccard >= 1/2, exactly.
    QueryDef(
      "q_setjoin",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, $SqlToks AS w FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
                 w[i] || chr(1) || w[i+1] || chr(1) || w[i+2] AS g
          FROM toks, unnest(range(1, len(w) - 1)) AS r(i)
        ), dfr AS (
          SELECT g, CAST(count(*) AS BIGINT) AS dfc FROM sh GROUP BY g
        ), lens AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS len
          FROM sh GROUP BY doc_id
        ), rk AS (
          SELECT sh.doc_id, sh.g, l.len,
                 CAST(row_number() OVER (PARTITION BY sh.doc_id
                   ORDER BY dfr.dfc, sh.g) AS BIGINT) AS rk
          FROM sh JOIN dfr USING (g)
            JOIN lens l ON l.doc_id = sh.doc_id
        ), pre AS (
          SELECT doc_id, g, len FROM rk
          WHERE rk <= len - (1 * len + 2 - 1) // 2 + 1
        ), cands AS (
          SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                 a.len AS la, b.len AS lb
          FROM pre a JOIN pre b
            ON a.g = b.g AND a.doc_id < b.doc_id
        ), intr AS (
          SELECT c.d1, c.d2, c.la, c.lb,
                 CAST(count(*) AS BIGINT) AS inter
          FROM cands c JOIN sh s1 ON s1.doc_id = c.d1
            JOIN sh s2 ON s2.doc_id = c.d2 AND s2.g = s1.g
          GROUP BY 1, 2, 3, 4
        )
        SELECT d1, d2, inter, la + lb - inter AS union_size,
               round(CAST(inter AS DOUBLE)
                 / CAST(la + lb - inter AS DOUBLE), 6) AS jaccard
        FROM intr WHERE inter * 3 >= 1 * (la + lb)
        ORDER BY d1, d2
      """.trim),
      "X202 exact Jaccard>=0.5 self-join via prefix filtering")(
      (spark, dir) =>
        SetJoin.jaccardJoin(table(spark, dir, "documents"), "doc_id",
            "text", shingleK = 3, tNum = 1L, tDen = 2L)
          .orderBy("d1", "d2")),

    // X203: lead-lag cross-correlation of daily click vs purchase
    // volumes at shifts of -5..5 days.
    QueryDef(
      "q_leadlag",
      Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS d,
                 CAST(sum(CASE WHEN event_type = 'click' THEN 1
                   ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                   ELSE 0 END) AS BIGINT) AS y
          FROM events GROUP BY 1
        ), lagged AS (
          SELECT d, x, i AS lag, d + CAST(i AS INTEGER) AS dt
          FROM daily, unnest(range(-5, 6)) AS r(i)
        ), j AS (
          SELECT l.lag, l.x, y2.y
          FROM lagged l JOIN daily y2 ON y2.d = l.dt
        ), m AS (
          SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
                 sum(CAST(x AS HUGEINT)) AS sx,
                 sum(CAST(y AS HUGEINT)) AS sy,
                 sum(CAST(x AS HUGEINT) * y) AS sxy,
                 sum(CAST(x AS HUGEINT) * x) AS sxx,
                 sum(CAST(y AS HUGEINT) * y) AS syy
          FROM j GROUP BY 1
        )
        SELECT CAST(lag AS INTEGER) AS lag, n_days,
               CASE WHEN n_days > 1
                 AND CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
                 AND CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
               THEN
                 round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                   6)
               END AS corr
        FROM m ORDER BY lag
      """.trim),
      "X203 click-vs-purchase lead-lag correlation (-5..5 days)")(
      (spark, dir) => {
        import spark.implicits._
        val daily = events(spark, dir)
          .groupBy(to_date(date_trunc("day", $"ts")).as("day"))
          .agg(sum(when($"event_type" === "click", 1L).otherwise(0L))
            .as("x"),
            sum(when($"event_type" === "purchase", 1L).otherwise(0L))
              .as("y"))
        graft.operators.TimeSeries
          .leadLagCorr(daily, "day", "x", "y", maxLag = 5)
          .orderBy($"lag")
      }),

    // X204: calibration metrics (Brier + 10-bin ECE) for a length-
    // derived pseudo-probability of lang='en'.
    QueryDef(
      "q_calibration",
      Some("""
        WITH base AS (
          SELECT CAST(round(least(n_chars / 2000.0, 1.0) * 1e6)
                   AS BIGINT) AS p,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents
        ), brier AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(p - y * 1000000 AS HUGEINT)
                   * CAST(p - y * 1000000 AS HUGEINT)) AS se
          FROM base
        ), binned AS (
          SELECT least((p * 10) // 1000000, 9) AS b,
                 CAST(count(*) AS BIGINT) AS nb,
                 CAST(sum(p) AS BIGINT) AS sp,
                 CAST(sum(y) AS BIGINT) AS k
          FROM base GROUP BY 1
        ), ece AS (
          SELECT coalesce(sum(CAST(nb AS DOUBLE)
            * abs(CAST(sp AS DOUBLE) / (CAST(nb AS DOUBLE) * 1e6)
                  - CAST(k AS DOUBLE) / CAST(nb AS DOUBLE))), 0.0)
            AS enum_
          FROM binned
        )
        SELECT n,
               round(CAST(se AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12), 6)
                 AS brier,
               round(enum_ / CAST(n AS DOUBLE), 6) AS ece
        FROM brier, ece
      """.trim),
      "X204 Brier + ECE of a length-derived en-probability")(
      (spark, dir) => {
        import spark.implicits._
        Calibrate.calibrationMetrics(
          table(spark, dir, "documents")
            .select(least($"n_chars" / 2000.0, lit(1.0)).as("p"),
              ($"lang" === "en").as("y")),
          "p", "y", bins = 10)
      }),

    // X205: Merkle content roots per source + the corpus root.
    QueryDef(
      "q_merkle",
      Some("""
        WITH leaves AS (
          SELECT source AS grp, doc_id,
                 md5(CAST(doc_id AS VARCHAR) || ':' || md5(text))
                   AS leaf
          FROM documents
        ), groups AS (
          SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
                 md5(string_agg(leaf, ',' ORDER BY doc_id)) AS root
          FROM leaves GROUP BY grp
        ), corpus AS (
          SELECT '(corpus)' AS grp,
                 CAST(sum(n_docs) AS BIGINT) AS n_docs,
                 md5(string_agg(root, ',' ORDER BY grp)) AS root
          FROM groups
        )
        SELECT * FROM groups
        UNION ALL SELECT * FROM corpus
        ORDER BY grp
      """.trim),
      "X205 Merkle content address per source + corpus root")(
      (spark, dir) =>
        Provenance.merkleRoots(table(spark, dir, "documents"),
            "source", "doc_id", "text")
          .orderBy("grp")),

    // X206: 3-core of the part co-purchase graph after 8 peel
    // rounds, with the fixed-point flag.
    QueryDef(
      "q_kcore",
      Some(kcoreSql(k = 3, iters = 8)),
      "X206 3-core peel of the part co-purchase graph (8 rounds)")(
      (spark, dir) => {
        import spark.implicits._
        val l = table(spark, dir, "lineitem")
          .filter($"l_linenumber" <= 3)
          .select($"l_orderkey", $"l_partkey")
        val e = l.as("x").join(l.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("s1"),
            col("y.l_partkey").as("s2"))
          .distinct()
        GraphStats.kCore(e, "s1", "s2", k = 3, iters = 8)
      }),

    // X207: Fleiss' kappa across three deterministic raters — the
    // multi-rater reliability completion of X148/X152.
    QueryDef(
      "q_fleiss",
      Some("""
        WITH r AS (
          SELECT doc_id,
                 CAST(n_chars % 3 AS VARCHAR) AS r1,
                 CAST((n_chars + doc_id) % 3 AS VARCHAR) AS r2,
                 CAST((doc_id * 7) % 3 AS VARCHAR) AS r3
          FROM documents
        ), melt AS (
          SELECT doc_id AS i, r1 AS cat FROM r
          UNION ALL SELECT doc_id, r2 FROM r
          UNION ALL SELECT doc_id, r3 FROM r
        ), nij AS (
          SELECT i, cat, CAST(count(*) AS BIGINT) AS c
          FROM melt GROUP BY 1, 2
        ), per AS (
          SELECT i, CAST(sum(c * c) AS BIGINT) AS sq FROM nij GROUP BY 1
        ), a1 AS (
          SELECT CAST(count(*) AS BIGINT) AS n_items,
                 CAST(sum(sq) AS BIGINT) AS ssq
          FROM per
        ), catc AS (
          SELECT cat, CAST(sum(c) AS BIGINT) AS cj FROM nij GROUP BY 1
        ), a2 AS (
          SELECT CAST(count(*) AS BIGINT) AS n_categories,
                 sum(CAST(cj AS HUGEINT) * cj) AS scj
          FROM catc
        )
        SELECT n_items, CAST(3 AS BIGINT) AS n_raters, n_categories,
               round((CAST(ssq AS DOUBLE)
                      - CAST(n_items AS DOUBLE) * 3.0)
                 / (CAST(n_items AS DOUBLE) * 3.0 * (3.0 - 1.0)), 6)
                 AS p_bar,
               round(CAST(scj AS DOUBLE)
                 / (CAST(n_items AS DOUBLE) * 3.0
                    * CAST(n_items AS DOUBLE) * 3.0), 6) AS p_e,
               CASE WHEN CAST(scj AS DOUBLE)
                 / (CAST(n_items AS DOUBLE) * 3.0
                    * CAST(n_items AS DOUBLE) * 3.0) < 1.0 THEN
                 round(((CAST(ssq AS DOUBLE)
                         - CAST(n_items AS DOUBLE) * 3.0)
                   / (CAST(n_items AS DOUBLE) * 3.0 * (3.0 - 1.0))
                   - CAST(scj AS DOUBLE)
                   / (CAST(n_items AS DOUBLE) * 3.0
                      * CAST(n_items AS DOUBLE) * 3.0))
                 / (1.0 - CAST(scj AS DOUBLE)
                   / (CAST(n_items AS DOUBLE) * 3.0
                      * CAST(n_items AS DOUBLE) * 3.0)), 6)
               END AS kappa
        FROM a1, a2
      """.trim),
      "X207 Fleiss' kappa over three deterministic raters")(
      (spark, dir) => {
        import spark.implicits._
        RankEval.fleissKappa(
          table(spark, dir, "documents")
            .select($"doc_id",
              ($"n_chars" % 3).cast("string").as("r1"),
              (($"n_chars" + $"doc_id") % 3).cast("string").as("r2"),
              (($"doc_id" * 7) % 3).cast("string").as("r3")),
          "doc_id", Seq("r1", "r2", "r3"))
      }),

    // X208: functional-dependency scan over order columns — exact
    // violation rates per candidate pair.
    QueryDef(
      "q_fd_scan",
      Some("""
        WITH pair1 AS (
          SELECT 'o_orderkey' AS determinant, 'o_custkey' AS dependent,
                 CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(t) AS BIGINT) AS n,
                 CAST(sum(m) AS BIGINT) AS keep
          FROM (SELECT max(c) AS m, sum(c) AS t FROM (
            SELECT CAST(o_orderkey AS VARCHAR) AS a,
                   CAST(o_custkey AS VARCHAR) AS b,
                   count(*) AS c
            FROM orders GROUP BY 1, 2) GROUP BY a)
        ), pair2 AS (
          SELECT 'o_custkey', 'o_orderpriority',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(t) AS BIGINT), CAST(sum(m) AS BIGINT)
          FROM (SELECT max(c) AS m, sum(c) AS t FROM (
            SELECT CAST(o_custkey AS VARCHAR) AS a,
                   CAST(o_orderpriority AS VARCHAR) AS b,
                   count(*) AS c
            FROM orders GROUP BY 1, 2) GROUP BY a)
        ), pair3 AS (
          SELECT 'o_orderpriority', 'o_orderstatus',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(t) AS BIGINT), CAST(sum(m) AS BIGINT)
          FROM (SELECT max(c) AS m, sum(c) AS t FROM (
            SELECT CAST(o_orderpriority AS VARCHAR) AS a,
                   CAST(o_orderstatus AS VARCHAR) AS b,
                   count(*) AS c
            FROM orders GROUP BY 1, 2) GROUP BY a)
        ), u AS (
          SELECT * FROM pair1 UNION ALL SELECT * FROM pair2
          UNION ALL SELECT * FROM pair3
        )
        SELECT determinant, dependent, n_groups,
               CASE WHEN n > 0 THEN
                 round(CAST(n - keep AS DOUBLE) / n, 6)
               ELSE 0.0 END AS violation_rate,
               n = keep AS holds
        FROM u
        ORDER BY determinant, dependent
      """.trim),
      "X208 FD violation scan over order column pairs")(
      (spark, dir) =>
        Constraints.fdScan(table(spark, dir, "orders"),
            Seq("o_orderkey" -> "o_custkey",
              "o_custkey" -> "o_orderpriority",
              "o_orderpriority" -> "o_orderstatus"))
          .orderBy("determinant", "dependent")),

    // X209: mutual nearest neighbors over the stride-4 embedding
    // anchors — bidirectional top-1 cosine pairs.
    QueryDef(
      "q_mutual_nn",
      Some("""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id % 4 = 0
        ), scored AS (
          SELECT q.vec_id AS qa, c.vec_id AS nb,
                 list_dot_product(q.e, c.e) /
                 (sqrt(list_dot_product(q.e, q.e)) *
                  sqrt(list_dot_product(c.e, c.e))) AS cos
          FROM v q JOIN v c ON q.vec_id <> c.vec_id
        ), top1 AS (
          SELECT qa AS a, nb AS b, cos FROM (
            SELECT qa, nb, cos,
                   row_number() OVER (PARTITION BY qa
                     ORDER BY cos DESC, nb) AS rk
            FROM scored)
          WHERE rk = 1
        )
        SELECT x.a AS id1, x.b AS id2, round(x.cos, 6) AS cos
        FROM top1 x JOIN top1 y ON x.a = y.b AND x.b = y.a
        WHERE x.a < x.b
        ORDER BY id1
      """.trim),
      "X209 mutual top-1 cosine pairs over stride-4 anchors")(
      (spark, dir) => {
        import spark.implicits._
        Similarity.mutualNearest(
            table(spark, dir, "embeddings").filter($"vec_id" % 4 === 0),
            "vec_id", "embedding")
          .orderBy($"id1")
      }),

    // X210: hour-of-day + day-of-week seasonal profile per event
    // type (counts and mean values).
    QueryDef(
      "q_seasonal",
      Some("""
        WITH base AS (
          SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
                 CAST(dayofweek(ts) AS BIGINT) AS dow,
                 CAST(round(value * 1e6) AS BIGINT) AS v
          FROM events
        ), h AS (
          SELECT event_type, 'hour' AS grain, hr AS bucket,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS s
          FROM base GROUP BY 1, 3
        ), d AS (
          SELECT event_type, 'dow' AS grain, dow AS bucket,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS s
          FROM base GROUP BY 1, 3
        )
        SELECT event_type, grain, bucket, n,
               round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6, 6)
                 AS mean_value
        FROM (SELECT * FROM h UNION ALL SELECT * FROM d)
        ORDER BY event_type, grain, bucket
      """.trim),
      "X210 hour/day-of-week seasonal profile per event type")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.TimeSeries.seasonalProfile(events(spark, dir),
            "event_type", "ts", "value")
          .orderBy($"event_type", $"grain", $"bucket")
      }),

    // X211: randomized-response round-trip — Warner perturbation of
    // the lang column at p=0.75, then the unbiased count estimate.
    QueryDef(
      "q_rr_debias",
      Some("""
        WITH base AS (
          SELECT CAST(doc_id AS VARCHAR) AS id, lang AS cat
          FROM documents
        ), cats AS (
          SELECT cat,
                 CAST(row_number() OVER (ORDER BY cat) AS BIGINT) - 1
                   AS idx
          FROM (SELECT DISTINCT cat FROM base)
        ), kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM cats),
        pert0 AS (
          SELECT cat,
                 (('0x' || substr(md5('rr1:keep:' || id), 1, 8))::BIGINT
                   % 1000000) < 750000 AS keep,
                 ('0x' || substr(md5('rr1:repl:' || id), 1, 8))::BIGINT
                   AS rh
          FROM base
        ), pert AS (
          SELECT p.cat,
                 CASE WHEN p.keep THEN p.cat ELSE r.cat END AS obs
          FROM pert0 p CROSS JOIN kk
          JOIN cats r ON r.idx = p.rh % kk.k
        ), tc AS (
          SELECT cat AS category, CAST(count(*) AS BIGINT)
                   AS true_count
          FROM pert GROUP BY 1
        ), oc AS (
          SELECT obs AS category, CAST(count(*) AS BIGINT)
                   AS observed_count
          FROM pert GROUP BY 1
        ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base)
        SELECT coalesce(tc.category, oc.category) AS category,
               coalesce(true_count, 0) AS true_count,
               coalesce(observed_count, 0) AS observed_count,
               round((CAST(coalesce(observed_count, 0) AS DOUBLE)
                      - CAST(n.n AS DOUBLE) * (1.0 - 0.75)
                        / CAST(kk.k AS DOUBLE)) / 0.75, 6)
                 AS est_count
        FROM tc FULL OUTER JOIN oc ON tc.category = oc.category,
             n, kk
        ORDER BY category
      """.trim),
      "X211 randomized-response perturbation + unbiased counts")(
      (spark, dir) =>
        Privacy.rrDebias(table(spark, dir, "documents"), "doc_id",
            "lang", p = 0.75, salt = "rr1:")
          .orderBy("category")),

    // X212: split-conformal calibration threshold per source at
    // alpha = 0.1 — the finite-sample-valid release cutoff.
    QueryDef(
      "q_conformal",
      Some("""
        WITH base AS (
          SELECT source, CAST(round(n_chars * 1e6) AS BIGINT) AS s
          FROM documents
        ), r AS (
          SELECT source, s,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY s) AS BIGINT) AS r,
                 CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
                   AS n
          FROM base
        ), kk AS (
          SELECT source, s, r, n, (9 * (n + 1) + 9) // 10 AS k FROM r
        ), at_ AS (
          SELECT source, round(CAST(s AS DOUBLE) / 1e6, 6) AS thr
          FROM kk WHERE r = k
        ), g AS (
          SELECT source, max(n) AS n, max(k) AS k FROM kk GROUP BY 1
        )
        SELECT g.source, g.n, g.k, at_.thr AS threshold
        FROM g LEFT JOIN at_ ON at_.source = g.source
        ORDER BY g.source
      """.trim),
      "X212 split-conformal doc-length threshold per source")(
      (spark, dir) =>
        graft.operators.Quantiles.conformalThreshold(
            table(spark, dir, "documents"), "source", "n_chars",
            aNum = 1L, aDen = 10L)
          .orderBy("source")),

    // X213: Kaplan-Meier view→purchase conversion curve with
    // end-of-window censoring.
    QueryDef(
      "q_kaplan_meier",
      Some("""
        WITH u AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view'
                   THEN CAST(ts AS DATE) END) AS fv,
                 min(CASE WHEN event_type = 'purchase'
                   THEN CAST(ts AS DATE) END) AS fp
          FROM events GROUP BY 1
        ), mx AS (SELECT max(CAST(ts AS DATE)) AS mend FROM events),
        subj AS (
          SELECT CASE WHEN fp IS NOT NULL AND fp >= fv
                   THEN CAST(date_diff('day', fv, fp) AS BIGINT)
                   ELSE CAST(date_diff('day', fv, mend) AS BIGINT)
                 END AS dur,
                 (fp IS NOT NULL AND fp >= fv) AS ev
          FROM u, mx WHERE fv IS NOT NULL
        ), per AS (
          SELECT dur AS t,
                 CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT)
                   AS d,
                 CAST(sum(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT)
                   AS c
          FROM subj GROUP BY 1
        ), tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS nn FROM per),
        cum AS (
          SELECT t, d, c, nn,
                 CAST(sum(d + c) OVER (ORDER BY t) AS BIGINT) AS lft
          FROM per, tot
        ), rs AS (
          SELECT t, d, c, nn - (lft - d - c) AS nrisk FROM cum
        ), terms AS (
          SELECT t, d, c, nrisk,
                 CASE WHEN d = 0 THEN 0.0
                      WHEN d < nrisk THEN
                        ln(1.0 - CAST(d AS DOUBLE)
                          / CAST(nrisk AS DOUBLE))
                      ELSE 0.0 END AS lnterm,
                 CASE WHEN d = nrisk THEN 1 ELSE 0 END AS deadflag
          FROM rs
        ), walk AS (
          SELECT t, d, c, nrisk,
                 sum(lnterm) OVER (ORDER BY t) AS lnsum,
                 max(deadflag) OVER (ORDER BY t) AS dead
          FROM terms
        )
        SELECT t, nrisk AS n_risk, d, c AS censored_here,
               CASE WHEN dead = 1 THEN 0.0
                    ELSE round(exp(lnsum), 6) END AS survival
        FROM walk WHERE d > 0
        ORDER BY t
      """.trim),
      "X213 Kaplan-Meier view-to-purchase survival curve")(
      (spark, dir) => {
        import spark.implicits._
        val ev = events(spark, dir)
        val day = to_date(date_trunc("day", $"ts"))
        val u = ev.groupBy($"user_id").agg(
          min(when($"event_type" === "view", day)).as("fv"),
          min(when($"event_type" === "purchase", day)).as("fp"))
        val mx = ev.agg(max(day).as("mend"))
        val subj = u.crossJoin(broadcast(mx))
          .filter($"fv".isNotNull)
          .select(
            when($"fp".isNotNull && $"fp" >= $"fv",
              datediff($"fp", $"fv"))
              .otherwise(datediff($"mend", $"fv")).cast("long")
              .as("dur"),
            ($"fp".isNotNull && $"fp" >= $"fv").as("ev"))
        graft.operators.Funnel.kaplanMeier(subj, "dur", $"ev")
          .orderBy($"t")
      }),

    // X386: Aalen-Johansen cumulative incidence — view→purchase vs
    // view→error as COMPETING risks (1 − KM per cause overstates
    // both; this is the correct split). Same fixture family as
    // q_kaplan_meier; ties purchase-first.
    QueryDef(
      "q_cum_incidence",
      Some("""
        WITH u AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view'
                   THEN CAST(ts AS DATE) END) AS fv,
                 min(CASE WHEN event_type = 'purchase'
                   THEN CAST(ts AS DATE) END) AS fp0,
                 min(CASE WHEN event_type = 'error'
                   THEN CAST(ts AS DATE) END) AS fe0
          FROM events GROUP BY 1
        ), mx AS (SELECT max(CAST(ts AS DATE)) AS mend FROM events),
        subj AS (
          SELECT CASE WHEN k = 1
                   THEN CAST(date_diff('day', fv, fp) AS BIGINT)
                 WHEN k = 2
                   THEN CAST(date_diff('day', fv, fe) AS BIGINT)
                 ELSE CAST(date_diff('day', fv, mend) AS BIGINT)
                 END AS dur, k
          FROM (
            SELECT fv, fp, fe, mend,
              CASE WHEN fp IS NOT NULL AND (fe IS NULL OR fp <= fe)
                     THEN 1
                   WHEN fe IS NOT NULL THEN 2 ELSE 0 END AS k
            FROM (SELECT fv,
                    CASE WHEN fp0 IS NOT NULL AND fp0 >= fv
                      THEN fp0 END AS fp,
                    CASE WHEN fe0 IS NOT NULL AND fe0 >= fv
                      THEN fe0 END AS fe,
                    mend
                  FROM u, mx WHERE fv IS NOT NULL)
          )
        ), per AS (
          SELECT dur AS t,
            CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS d1,
            CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS d2,
            CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS c
          FROM subj GROUP BY 1
        ), tot AS (
          SELECT CAST(sum(d1 + d2 + c) AS BIGINT) AS nn FROM per
        ), cumt AS (
          SELECT t, d1, d2, c, nn,
                 CAST(sum(d1 + d2 + c) OVER (ORDER BY t) AS BIGINT)
                   AS lft
          FROM per, tot
        ), rs AS (
          SELECT t, d1, d2, c,
                 nn - (lft - d1 - d2 - c) AS nrisk
          FROM cumt
        ), terms AS (
          SELECT t, d1, d2, c, nrisk,
            CASE WHEN d1 + d2 = 0 THEN 0.0
                 WHEN d1 + d2 < nrisk THEN
                   ln(1.0 - CAST(d1 + d2 AS DOUBLE)
                     / CAST(nrisk AS DOUBLE))
                 ELSE 0.0 END AS lnterm,
            CASE WHEN d1 + d2 = nrisk THEN 1 ELSE 0 END AS deadflag
          FROM rs
        ), walk AS (
          SELECT t, d1, d2, c, nrisk,
            coalesce(sum(lnterm) OVER (ORDER BY t ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS lnprev,
            coalesce(max(deadflag) OVER (ORDER BY t ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS deadprev
          FROM terms
        ), incs AS (
          SELECT t, d1, d2, c, nrisk,
            CAST(round((CASE WHEN deadprev = 1 THEN 0.0
                ELSE exp(lnprev) END)
              * CAST(d1 AS DOUBLE) / CAST(nrisk AS DOUBLE) * 1e12)
              AS BIGINT) AS i1,
            CAST(round((CASE WHEN deadprev = 1 THEN 0.0
                ELSE exp(lnprev) END)
              * CAST(d2 AS DOUBLE) / CAST(nrisk AS DOUBLE) * 1e12)
              AS BIGINT) AS i2
          FROM walk
        ), fin AS (
          SELECT t, d1, d2, c, nrisk,
            CAST(sum(i1) OVER (ORDER BY t) AS BIGINT) AS ci1,
            CAST(sum(i2) OVER (ORDER BY t) AS BIGINT) AS ci2
          FROM incs
        )
        SELECT t, nrisk AS n_risk, d1, d2, c AS censored_here,
               round(CAST(ci1 AS DOUBLE) / 1e12, 6) AS cif1,
               round(CAST(ci2 AS DOUBLE) / 1e12, 6) AS cif2
        FROM fin WHERE d1 + d2 > 0
        ORDER BY t
      """.trim),
      "X386 Aalen-Johansen CIF: purchase vs error competing risks")(
      (spark, dir) => {
        import spark.implicits._
        val ev = events(spark, dir)
        val day = to_date(date_trunc("day", $"ts"))
        val u = ev.groupBy($"user_id").agg(
          min(when($"event_type" === "view", day)).as("fv"),
          min(when($"event_type" === "purchase", day)).as("fp0"),
          min(when($"event_type" === "error", day)).as("fe0"))
        val mx = ev.agg(max(day).as("mend"))
        val subj = u.crossJoin(broadcast(mx))
          .filter($"fv".isNotNull)
          .withColumn("fp",
            when($"fp0".isNotNull && $"fp0" >= $"fv", $"fp0"))
          .withColumn("fe",
            when($"fe0".isNotNull && $"fe0" >= $"fv", $"fe0"))
          .withColumn("k",
            when($"fp".isNotNull && ($"fe".isNull || $"fp" <= $"fe"),
              1).when($"fe".isNotNull, 2).otherwise(0))
          .select(
            when($"k" === 1, datediff($"fp", $"fv"))
              .when($"k" === 2, datediff($"fe", $"fv"))
              .otherwise(datediff($"mend", $"fv")).cast("long")
              .as("dur"),
            $"k")
        graft.operators.Funnel.aalenJohansen(subj, "dur", "k")
          .orderBy($"t")
      }),

    // X214: temporal coverage audit per event type — span, density,
    // and the largest silent gap.
    QueryDef(
      "q_coverage",
      Some("""
        WITH days AS (
          SELECT DISTINCT event_type, CAST(ts AS DATE) AS day
          FROM events
        ), g AS (
          SELECT event_type, day,
                 CASE WHEN lag(day) OVER (PARTITION BY event_type
                     ORDER BY day) IS NULL THEN 0
                   ELSE CAST(date_diff('day',
                     lag(day) OVER (PARTITION BY event_type
                       ORDER BY day), day) AS BIGINT) - 1
                 END AS gap
          FROM days
        )
        SELECT event_type, min(day) AS first_day, max(day) AS last_day,
               CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT)
                 AS span_days,
               CAST(count(*) AS BIGINT) AS days_present,
               round(CAST(count(*) AS DOUBLE)
                 / (CAST(date_diff('day', min(day), max(day))
                     AS DOUBLE) + 1.0), 6) AS coverage,
               CAST(max(gap) AS BIGINT) AS max_gap_days
        FROM g GROUP BY 1
        ORDER BY 1
      """.trim),
      "X214 per-type temporal coverage and largest gap")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.TimeSeries.coverageReport(events(spark, dir),
            "event_type", "ts")
          .orderBy($"event_type")
      }),

    // X215: winnow span anchors — for each matched pair, the
    // dominant diagonal (offset) and the span it bounds.
    QueryDef(
      "q_winnow_spans",
      Some("""
        WITH d AS (
          SELECT doc_id,
                 regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
          FROM documents
        ), base AS (
          SELECT doc_id, s, len(s) AS l FROM d
          WHERE len(s) >= 8 AND len(s) <= 1048576
        ), kg AS (
          SELECT doc_id, l, i AS p,
                 ('0x' || substr(md5(substr(s, i + 1, 5)), 1, 8))::BIGINT
                   AS h
          FROM base, unnest(range(0, l - 5 + 1)) AS r(i)
        ), keyed AS (
          SELECT doc_id, l, p, h * 1048576 + (1048575 - p) AS kk
          FROM kg
        ), wm AS (
          SELECT doc_id, l, p,
                 min(kk) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
          FROM keyed
        ), sel AS (
          SELECT DISTINCT doc_id, wmin FROM wm WHERE p <= l - 5 - 3
        ), fp AS (
          SELECT doc_id, wmin // 1048576 AS h,
                 1048575 - (wmin % 1048576) AS pos
          FROM sel
        ), hdf AS (
          SELECT h FROM (
            SELECT h, count(*) AS m FROM
              (SELECT DISTINCT doc_id, h FROM fp) GROUP BY h)
          WHERE m <= 20
        ), keep AS (
          SELECT fp.doc_id, fp.h, fp.pos FROM fp JOIN hdf USING (h)
        ), anch AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2,
                 a.pos AS p1, b.pos AS p2
          FROM keep a JOIN keep b
            ON a.h = b.h AND a.doc_id < b.doc_id
        ), tot AS (
          SELECT d1, d2, CAST(count(*) AS BIGINT) AS n_anchors
          FROM anch GROUP BY 1, 2 HAVING count(*) >= 3
        ), diag AS (
          SELECT d1, d2, p2 - p1 AS dg,
                 CAST(count(*) AS BIGINT) AS diag_votes,
                 CAST(min(p1) AS BIGINT) AS span1_lo,
                 CAST(max(p1) AS BIGINT) AS span1_hi
          FROM anch GROUP BY 1, 2, 3
        ), pick AS (
          SELECT d1, d2, dg, diag_votes, span1_lo, span1_hi FROM (
            SELECT *, row_number() OVER (PARTITION BY d1, d2
              ORDER BY diag_votes DESC, dg) AS rk
            FROM diag)
          WHERE rk = 1
        )
        SELECT t.d1, t.d2, t.n_anchors, CAST(p.dg AS BIGINT) AS diag,
               p.diag_votes, p.span1_lo, p.span1_hi
        FROM tot t JOIN pick p ON p.d1 = t.d1 AND p.d2 = t.d2
        ORDER BY t.d1, t.d2
      """.trim),
      "X215 dominant-diagonal span location for winnow-matched pairs")(
      (spark, dir) =>
        Winnow.spanAnchors(table(spark, dir, "documents"), "doc_id",
            "text", k = 5, w = 4, maxDf = 20, minShared = 3)
          .orderBy("d1", "d2")),

    // X217: index of dispersion of daily event volume per type —
    // Poisson-vs-bursty triage.
    QueryDef(
      "q_dispersion",
      Some("""
        WITH c AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ), m AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
                 CAST(sum(c) AS BIGINT) AS s,
                 sum(CAST(c AS HUGEINT) * c) AS ss
          FROM c GROUP BY 1
        )
        SELECT event_type, n_buckets,
               round(CAST(s AS DOUBLE) / CAST(n_buckets AS DOUBLE), 6)
                 AS mean_count,
               CASE WHEN n_buckets > 1 THEN
                 round((CAST(ss AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n_buckets AS DOUBLE))
                   / (CAST(n_buckets AS DOUBLE) - 1.0), 6)
               END AS var_count,
               CASE WHEN n_buckets > 1
                 AND CAST(s AS DOUBLE) / CAST(n_buckets AS DOUBLE) > 0.0
               THEN
                 round(((CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / CAST(n_buckets AS DOUBLE))
                    / (CAST(n_buckets AS DOUBLE) - 1.0))
                   / (CAST(s AS DOUBLE) / CAST(n_buckets AS DOUBLE)),
                   6)
               END AS dispersion
        FROM m ORDER BY event_type
      """.trim),
      "X217 variance-to-mean dispersion of daily volume per type")(
      (spark, dir) => {
        import spark.implicits._
        DistStats.dispersionIndex(
            events(spark, dir).select($"event_type",
              to_date(date_trunc("day", $"ts")).as("day")),
            "event_type", "day")
          .orderBy($"event_type")
      }),

    // X218: fill a 20k-token budget with the most type-rich docs —
    // fractional-knapsack greedy over quality-per-token.
    QueryDef(
      "q_budget_select",
      Some(s"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len($SqlToks) AS BIGINT) AS tok,
                 CAST(len(list_distinct($SqlToks)) AS BIGINT) AS q
          FROM documents
        ), base AS (
          SELECT doc_id, q, tok,
                 CAST(round(CAST(q AS DOUBLE) * 1e9
                   / CAST(tok AS DOUBLE)) AS BIGINT) AS ratio
          FROM t WHERE tok > 0
        ), r AS (
          SELECT doc_id, q, tok,
                 CAST(row_number() OVER (ORDER BY ratio DESC, doc_id)
                   AS BIGINT) AS rk
          FROM base
        ), c AS (
          SELECT doc_id, q, tok, rk,
                 CAST(sum(tok) OVER (ORDER BY rk) AS BIGINT) AS cum
          FROM r
        )
        SELECT doc_id, q AS quality, tok AS tokens, rk AS sel_rank,
               cum AS cum_tokens
        FROM c WHERE cum <= 20000
        ORDER BY sel_rank
      """.trim),
      "X218 greedy 20k-token budget fill by type richness per token")(
      (spark, dir) => {
        import spark.implicits._
        val toks = Dedup.tokens($"text")
        val t = table(spark, dir, "documents")
          .select($"doc_id",
            size(array_distinct(toks)).cast("long").as("quality"),
            size(toks).cast("long").as("n_toks"))
        graft.operators.CorpusOps.budgetSelect(t, "doc_id",
            "quality", "n_toks", budget = 20000L)
          .orderBy($"sel_rank")
      }),

    // X219: Hill tail-index of the doc-length distribution over the
    // top-100 order statistics.
    QueryDef(
      "q_hill",
      Some("""
        WITH g AS (
          SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS m
          FROM documents WHERE n_chars > 0 GROUP BY 1
        ), cum AS (
          SELECT v, m,
                 CAST(sum(m) OVER (ORDER BY v DESC) AS BIGINT) AS cum
          FROM g
        ), top_ AS (
          SELECT coalesce(sum(CAST(least(cum, 100) - (cum - m)
                   AS DOUBLE) * ln(CAST(v AS DOUBLE))), 0.0) AS lnsum,
                 CAST(sum(least(cum, 100) - (cum - m)) AS BIGINT)
                   AS kgot
          FROM cum WHERE cum - m < 100
        ), th AS (SELECT max(v) AS xk1 FROM cum WHERE cum >= 101)
        SELECT CAST(100 AS BIGINT) AS k, xk1 AS x_k_plus_1,
               CASE WHEN lnsum - 100.0 * ln(CAST(xk1 AS DOUBLE)) > 0.0
               THEN
                 round(100.0
                   / (lnsum - 100.0 * ln(CAST(xk1 AS DOUBLE))), 6)
               END AS alpha
        FROM top_, th WHERE kgot = 100 AND xk1 IS NOT NULL
      """.trim),
      "X219 Hill tail index of doc length (top-100)")(
      (spark, dir) =>
        DistStats.hillTailIndex(table(spark, dir, "documents"),
          "n_chars", k = 100)),

    // X220: Wilson score interval for the per-source en-rate.
    QueryDef(
      "q_wilson",
      Some("""
        WITH g AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS successes
          FROM documents GROUP BY 1
        )
        SELECT source, n, successes,
               round(CAST(successes AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS rate,
               round((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
                      + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
                   / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
                 - 1.96 * sqrt(CAST(successes AS DOUBLE)
                       / CAST(n AS DOUBLE)
                     * (1.0 - CAST(successes AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                     + (1.96 * 1.96)
                       / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6)
                 AS ci_lo,
               round((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
                      + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
                   / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
                 + 1.96 * sqrt(CAST(successes AS DOUBLE)
                       / CAST(n AS DOUBLE)
                     * (1.0 - CAST(successes AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                     + (1.96 * 1.96)
                       / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6)
                 AS ci_hi
        FROM g
        ORDER BY source
      """.trim),
      "X220 Wilson score CI of the en-rate per source")(
      (spark, dir) => {
        import spark.implicits._
        Hypothesis.wilsonInterval(table(spark, dir, "documents"),
            "source", $"lang" === "en", z = 1.96)
          .orderBy($"source")
      }),

    // X221: Mann-Kendall monotone-trend test of daily event volume
    // per type.
    QueryDef(
      "q_mann_kendall",
      Some("""
        WITH daily AS (
          SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01',
                   CAST(ts AS DATE)) AS BIGINT) AS o,
                 CAST(count(*) AS BIGINT) AS v
          FROM events GROUP BY 1, 2
        ), q AS (
          SELECT event_type, o, CAST(round(v * 1e6) AS BIGINT) AS vm
          FROM daily
        ), p AS (
          SELECT a.event_type,
                 CASE WHEN b.vm > a.vm THEN 1
                      WHEN b.vm < a.vm THEN -1 ELSE 0 END AS sg
          FROM q a JOIN q b
            ON a.event_type = b.event_type AND b.o > a.o
        ), sa AS (
          SELECT event_type, CAST(sum(CAST(sg AS BIGINT)) AS BIGINT)
                   AS s
          FROM p GROUP BY 1
        ), na AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n
          FROM q GROUP BY 1
        ), ta AS (
          SELECT event_type,
                 CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                   AS BIGINT) AS tt
          FROM (SELECT event_type, vm, CAST(count(*) AS BIGINT) AS t
                FROM q GROUP BY 1, 2)
          GROUP BY 1
        )
        SELECT na.event_type, na.n, sa.s AS s_stat,
               CASE WHEN (CAST(na.n AS DOUBLE)
                   * (CAST(na.n AS DOUBLE) - 1.0)
                   * (2.0 * CAST(na.n AS DOUBLE) + 5.0)
                   - CAST(tt AS DOUBLE)) / 18.0 > 0.0 THEN
                 round((CASE WHEN sa.s > 0
                          THEN CAST(sa.s AS DOUBLE) - 1.0
                        WHEN sa.s < 0
                          THEN CAST(sa.s AS DOUBLE) + 1.0
                        ELSE 0.0 END)
                   / sqrt((CAST(na.n AS DOUBLE)
                       * (CAST(na.n AS DOUBLE) - 1.0)
                       * (2.0 * CAST(na.n AS DOUBLE) + 5.0)
                       - CAST(tt AS DOUBLE)) / 18.0), 6)
               END AS z
        FROM na JOIN sa USING (event_type) JOIN ta USING (event_type)
        ORDER BY na.event_type
      """.trim),
      "X221 Mann-Kendall trend z of daily volume per type")(
      (spark, dir) => {
        import spark.implicits._
        val daily = events(spark, dir)
          .groupBy($"event_type",
            datediff(to_date(date_trunc("day", $"ts")),
              lit("1970-01-01")).cast("long").as("o"))
          .agg(count(lit(1)).cast("long").as("v"))
        graft.operators.TimeSeries
          .mannKendall(daily, "event_type", "o", "v")
          .orderBy($"event_type")
      }),

    // X222: Theil-Sen median slope of the same daily series — the
    // robust trend magnitude beside X221's significance.
    QueryDef(
      "q_theil_sen",
      Some("""
        WITH daily AS (
          SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01',
                   CAST(ts AS DATE)) AS BIGINT) AS o,
                 CAST(count(*) AS BIGINT) AS v
          FROM events GROUP BY 1, 2
        ), q AS (
          SELECT event_type, o, CAST(round(v * 1e6) AS BIGINT) AS vm
          FROM daily
        ), sl AS (
          SELECT a.event_type,
                 CAST(round(CAST(b.vm - a.vm AS DOUBLE)
                   / CAST(b.o - a.o AS DOUBLE)) AS BIGINT) AS slope
          FROM q a JOIN q b
            ON a.event_type = b.event_type AND b.o > a.o
        ), r AS (
          SELECT event_type, slope,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY slope) AS BIGINT) AS rk,
                 CAST(count(*) OVER (PARTITION BY event_type)
                   AS BIGINT) AS m
          FROM sl
        )
        SELECT event_type, m AS n_pairs,
               round(CAST(slope AS DOUBLE) / 1e6, 6) AS median_slope
        FROM r WHERE rk = (m + 1) // 2
        ORDER BY event_type
      """.trim),
      "X222 Theil-Sen median slope of daily volume per type")(
      (spark, dir) => {
        import spark.implicits._
        val daily = events(spark, dir)
          .groupBy($"event_type",
            datediff(to_date(date_trunc("day", $"ts")),
              lit("1970-01-01")).cast("long").as("o"))
          .agg(count(lit(1)).cast("long").as("v"))
        graft.operators.TimeSeries
          .theilSen(daily, "event_type", "o", "v")
          .orderBy($"event_type")
      })
  )

  /** Unrolled k-core peel oracle: e0..eN CTE chain (the X101
    * bounded-iteration convention) over the part co-purchase graph.
    */
  private def kcoreSql(k: Int, iters: Int): String = {
    // every step reads its predecessor three times (degree count,
    // two IN probes) — without MATERIALIZED, DuckDB inlines the CTE
    // chain into 3^iters scans of the base table
    val head = s"""
      WITH e0 AS MATERIALIZED (
        SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey
          AND x.l_partkey < y.l_partkey
        WHERE x.l_linenumber <= 3 AND y.l_linenumber <= 3
      )"""
    val steps = (1 to iters).map { i =>
      s""", k$i AS MATERIALIZED (
        SELECT v FROM (
          SELECT v, count(*) AS c FROM (
            SELECT a AS v FROM e${i - 1}
            UNION ALL SELECT b FROM e${i - 1})
          GROUP BY v)
        WHERE c >= $k
      ), e$i AS MATERIALIZED (
        SELECT a, b FROM e${i - 1}
        WHERE a IN (SELECT v FROM k$i) AND b IN (SELECT v FROM k$i)
      )"""
    }.mkString
    val tail = s"""
      , fdeg AS (
        SELECT v, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT a AS v FROM e$iters UNION ALL SELECT b FROM e$iters)
        GROUP BY v
      )
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM fdeg) AS n_nodes,
             (SELECT CAST(count(*) AS BIGINT) FROM e$iters) AS n_edges,
             (SELECT coalesce(sum(CASE WHEN c < $k THEN 1 ELSE 0 END),
                0) FROM fdeg) = 0 AS converged"""
    (head + steps + tail).trim
  }
}
