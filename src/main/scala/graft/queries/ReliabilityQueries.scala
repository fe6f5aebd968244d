package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{BloomStore, Cms, CorpusOps, Dedup, Linkage, LogHistogram}
import QueryDef.table

/** r9 waves 6–16 (SURVEY §2.10 X153–X174): percentile gating, record
  * linkage, composition diversity, the persisted Bloom membership
  * store, perceptual-hash image dedup, profile drift, coreset
  * selection, the log-linear quantile store, CMS join-size
  * estimation, language segmentation, robust scaling, phrase search,
  * near-dup image clusters, table-driven blocklists, the centroid
  * store, mojibake repair, HTML stripping, URL analytics, sentence
  * segmentation, and the pseudonymization/noisy-count release pair.
  * Same determinism contract as every other query file:
  * exact-integer or md5-derived arithmetic on the hashed path,
  * fixed-shape double formulas, round(6).
  */
object ReliabilityQueries {

  /** Bloom layout shared by the build and probe queries. */
  private val BloomBits = 4096
  private val BloomHashes = 3

  /** DuckDB twin of BloomStore.positions: md5Band(h ‖ ':' ‖ v, salt)
    * mod bits, three hash lanes from `range(3)`.
    */
  private def bloomPosSql(valueExpr: String): String =
    s"""(('0x' || substr(md5('bloom' || h.h::VARCHAR || ':' || $valueExpr), 1, 8))::BIGINT
       | % $BloomBits)""".stripMargin.replace("\n", "")

  /** DuckDB twin of the X157 pHash pipeline (r13 integer-DCT form):
    * re-derives each doc's synthetic image PIXELS from the q_phash
    * generator formula (the BMP container round-trip is pinned by
    * the codec specs, so the oracle skips it), nearest-neighbor
    * 32×32 resize by the same floor index math, integer luma
    * (299R+587G+114B), two DCT passes against the inlined
    * [[graft.multimodal.Multimodal.phashCos]] integer literals, and
    * the exact 63-coefficient median → a `bits(doc_id, i, bit)`
    * table. Hamming distances then fold per-bit (DuckDB raises on
    * 1<<63, so the 64-bit pack stays engine-side).
    */
  private def phashSql: String = s"""
        WITH RECURSIVE d AS (
          SELECT doc_id,
                 doc_id - doc_id % 2 AS base,
                 doc_id % 2 AS odd,
                 (doc_id - doc_id % 2) % 13 + 4 AS w,
                 (doc_id - doc_id % 2) % 7 + 3 AS h
          FROM documents
        ), ct(u, x, c) AS (
          SELECT * FROM (VALUES
            ${graft.multimodal.Multimodal.phashCosSqlValues}) t(u, x, c)
        ), px AS (
          SELECT doc_id, y, x,
                 299 * ((o * 17 + base * 31 + 3
                   + CASE WHEN odd = 1 AND o = 0 THEN 1 ELSE 0 END)
                   % 256)
               + 587 * (((o + 1) * 17 + base * 31 + 3) % 256)
               + 114 * (((o + 2) * 17 + base * 31 + 3) % 256) AS luma
          FROM (
            SELECT d.doc_id, gy.y AS y, gx.x AS x, d.base, d.odd,
                   ((gy.y * d.h) // 32 * d.w + (gx.x * d.w) // 32) * 3
                     AS o
            FROM d, range(32) gy(y), range(32) gx(x)
          )
        ), rowdct AS (
          SELECT px.doc_id, px.y, ct.u, sum(px.luma * ct.c) AS s
          FROM px JOIN ct ON ct.x = px.x
          GROUP BY 1, 2, 3
        ), coef AS (
          SELECT r.doc_id, CAST(ct.u * 8 + r.u AS BIGINT) AS i,
                 sum(r.s * ct.c) AS cf
          FROM rowdct r JOIN ct ON ct.x = r.y
          GROUP BY 1, 2
        ), med AS (
          SELECT doc_id, cf AS m
          FROM (SELECT doc_id, cf,
                       row_number() OVER (PARTITION BY doc_id
                         ORDER BY cf) AS rn
                FROM coef WHERE i > 0)
          WHERE rn = 32
        ), bits AS (
          SELECT coef.doc_id, coef.i, coef.cf > med.m AS bit
          FROM coef JOIN med USING (doc_id)
        )"""

  /** Unrolled stochastic-greedy coreset oracle (X159): per round r —
    * candidate draw by md5 order over the not-yet-picked set, every
    * candidate's marginal gain as an exact long sum of
    * nano-quantized cosine improvements, argmax pick (tie → smaller
    * id), coverage column update as a long max. The p{r} CTE chain
    * is the SQL twin of the operator's localCheckpoint loop.
    */
  private def coresetSql(k: Int, cands: Int, salt: String): String = {
    def cosq(pv: String, pn2: String, cv: String, cn2: String) =
      s"""CAST(round(1e9 * CAST(list_sum(list_transform(
           generate_series(1, len($pv)), t -> $pv[t] * $cv[t]))
           AS DOUBLE) / (sqrt(CAST($pn2 AS DOUBLE))
           * sqrt(CAST($cn2 AS DOUBLE)))) AS BIGINT)"""
    val head = """
      WITH q AS (
        SELECT vec_id AS id, list_transform(embedding,
          x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
          AS v
        FROM embeddings
      ), p0 AS MATERIALIZED (
        SELECT id, v, n2, CAST(0 AS BIGINT) AS cov FROM (
          SELECT id, v,
                 CAST(list_sum(list_transform(v, x -> x * x))
                   AS BIGINT) AS n2
          FROM q) WHERE n2 > 0
      )"""
    val steps = (1 to k).map { r =>
      val notPicked = if (r == 1) ""
        else "WHERE p.id NOT IN (" +
          (1 until r).map(i => s"SELECT id FROM pick$i")
            .mkString(" UNION ALL ") + ")"
      s""", cand$r AS MATERIALIZED (
        SELECT p.id, p.v, p.n2 FROM p${r - 1} p
        $notPicked
        ORDER BY CAST(('0x' || substr(md5('$salt' || '$r' || ':'
          || CAST(p.id AS VARCHAR)), 1, 8)) AS BIGINT), p.id
        LIMIT $cands
      ), g$r AS MATERIALIZED (
        SELECT c.id AS cand,
               CAST(sum(greatest(
                 ${cosq("p.v", "p.n2", "c.v", "c.n2")} - p.cov, 0))
                 AS BIGINT) AS gain
        FROM cand$r c, p${r - 1} p
        GROUP BY 1
      ), pick$r AS MATERIALIZED (
        SELECT cand AS id, gain FROM g$r ORDER BY gain DESC, cand
        LIMIT 1
      ), p$r AS MATERIALIZED (
        SELECT p.id, p.v, p.n2,
               greatest(p.cov,
                 ${cosq("p.v", "p.n2", "c.v", "c.n2")}) AS cov
        FROM p${r - 1} p,
             (SELECT c.* FROM cand$r c JOIN pick$r kk ON c.id = kk.id) c
      ), cov$r AS MATERIALIZED (
        SELECT CAST(sum(cov) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM p$r
      )"""
    }.mkString
    val rows = (1 to k).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS selection_rank, kk.id AS vec_id,
             round(CAST(kk.gain AS DOUBLE) / 1e9, 6) AS marginal_gain,
             round(CAST(c.s AS DOUBLE) / (CAST(c.n AS DOUBLE) * 1e9),
               6) AS mean_coverage
      FROM pick$r kk, cov$r c"""
    }.mkString("\n      UNION ALL\n      ")
    (head + steps + s"""
      SELECT * FROM (
      $rows
      ) ORDER BY selection_rank""").trim
  }

  /** Recursive-CTE replay of Lamping-Veach jump hash (X178): the
    * walk state (b, j, k) advances exactly like `ZOrder.jumpHash` —
    * k wraps mod 2⁶⁴ (HUGEINT % 18446744073709551616 = Java's
    * overflowing multiply on the unsigned view), k ⋙ 33 is integer
    * division, and j = trunc((b+1)·2³¹/((k⋙33)+1)) is one
    * fixed-shape double on exact ≤2³¹ integers. A row leaves the
    * recursion the moment j ≥ n; its b is the shard.
    */
  private def jumpShardsSql(n1: Int, n2: Int): String = {
    def walk(name: String, n: Int) =
      s"""$name AS (
        SELECT id, b, j, k FROM seed
        UNION ALL
        SELECT id, j AS b,
          CAST(trunc((j + 1) * 2147483648.0 /
            CAST(k2 // 8589934592 + 1 AS DOUBLE)) AS BIGINT) AS j,
          k2 AS k
        FROM (SELECT id, j,
                (k * 2862933555777941757 + 1)
                  % 18446744073709551616 AS k2
              FROM $name WHERE j < $n)
      )"""
    s"""
    WITH RECURSIVE u AS (
      SELECT DISTINCT user_id AS id FROM events
    ), seed AS (
      SELECT id, CAST(-1 AS BIGINT) AS b, CAST(0 AS BIGINT) AS j,
        CAST(CASE WHEN id < 0
          THEN CAST(id AS HUGEINT) + 18446744073709551616
          ELSE CAST(id AS HUGEINT) END AS HUGEINT) AS k
      FROM u
    ), ${walk("walk1", n1)},
    f1 AS (SELECT id, b AS s FROM walk1 WHERE j >= $n1),
    ${walk("walk2", n2)},
    f2 AS (SELECT id, b AS s FROM walk2 WHERE j >= $n2)
    SELECT CAST(a.s AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN b.s <> a.s THEN 1 ELSE 0 END)
             AS BIGINT) AS n_moved_to_new,
           CAST(sum(CASE WHEN b.s <> a.s AND b.s <> $n1 THEN 1
             ELSE 0 END) AS BIGINT) AS n_moved_elsewhere
    FROM f1 a JOIN f2 b USING (id)
    GROUP BY 1 ORDER BY shard
    """.trim
  }

  val defs: Seq[QueryDef] = Seq(

    // X153: top-30%-per-source length gate — exact two-phase rank,
    // no per-group window.
    QueryDef(
      "q_percentile_gate",
      Some("""
        WITH r AS (
          SELECT source, doc_id, n_chars,
                 CAST(row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id)
                   AS BIGINT) AS group_rank,
                 CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
                   AS group_size
          FROM documents
        )
        SELECT source, doc_id, n_chars, group_rank, group_size
        FROM r
        WHERE group_rank <= CAST(ceil(0.3 * group_size) AS BIGINT)
        ORDER BY source, group_rank
      """.trim),
      "X153 keep top 30% of each source by doc length (exact ranks)")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.percentileGate(
          table(spark, dir, "documents")
            .select($"source", $"doc_id", $"n_chars"),
          "source", "n_chars", "doc_id", keepFrac = 0.3)
          .select($"source", $"doc_id", $"n_chars", $"group_rank",
            $"group_size")
          .orderBy($"source", $"group_rank")
      }),

    // X154: Fellegi-Sunter match scoring over nation-blocked customer
    // pairs — three agreement fields, fixed-shape log2 weights; the
    // contract keeps the 'match' band.
    QueryDef(
      "q_linkage_score",
      Some("""
        WITH a AS (
          SELECT c_custkey AS k, c_nationkey AS n, c_mktsegment AS seg,
                 c_acctbal AS bal
          FROM customer
        ), pairs AS (
          SELECT x.k AS k1, y.k AS k2,
                 x.seg = y.seg AS seg_agree,
                 abs(x.bal - y.bal) < 100.0 AS bal_agree,
                 (x.bal >= 0) = (y.bal >= 0) AS sign_agree
          FROM a x JOIN a y ON x.n = y.n AND x.k < y.k
        ), scored AS (
          SELECT k1, k2, seg_agree, bal_agree, sign_agree,
                 round(
                   (CASE WHEN seg_agree THEN ln(0.9 / 0.25) / ln(2.0)
                         ELSE ln(0.1 / 0.75) / ln(2.0) END)
                 + (CASE WHEN bal_agree THEN ln(0.8 / 0.018) / ln(2.0)
                         ELSE ln(0.2 / 0.982) / ln(2.0) END)
                 + (CASE WHEN sign_agree THEN ln(0.85 / 0.5) / ln(2.0)
                         ELSE ln(0.15 / 0.5) / ln(2.0) END), 6) AS score
          FROM pairs
        )
        SELECT k1, k2, seg_agree, bal_agree, sign_agree, score,
               'match' AS decision
        FROM scored WHERE score >= 5.0
        ORDER BY k1, k2
      """.trim),
      "X154 Fellegi-Sunter linkage weights on nation-blocked customers")(
      (spark, dir) => {
        import spark.implicits._
        val c = table(spark, dir, "customer")
        val a = c.select($"c_custkey".as("k1"), $"c_nationkey".as("__n"),
          $"c_mktsegment".as("__seg1"), $"c_acctbal".as("__bal1"))
        val b = c.select($"c_custkey".as("k2"), $"c_nationkey".as("__n2"),
          $"c_mktsegment".as("__seg2"), $"c_acctbal".as("__bal2"))
        // r15 (guide §3.2: reduce the pair stream before scoring).
        // The kept band is decision = 'match', i.e. score >= 5.0; with
        // these m/u weights (log2 units) seg t/f = +1.848/−2.907,
        // bal t/f = +5.475/−2.296, sign t/f = +0.766/−1.737, so
        //   max score without seg_agree = 5.475+0.766−2.907 = 3.33 < 5
        //   max score without bal_agree = 1.848+0.766−2.296 = 0.32 < 5
        //   min score with seg ∧ bal    = 5.475+1.848−1.737 = 5.59 ≥ 5
        // ⇒ 'match' ⟺ seg_agree ∧ bal_agree, sign free. Blocking the
        // self-join on (nation, segment) and pre-filtering the ±100
        // balance window therefore produces EXACTLY the match band
        // (oracle re-proved at all three SFs) while generating ~5×
        // fewer join rows and filtering them before the score
        // projection instead of after. The score expression itself is
        // unchanged (same when() shape on the same booleans → the
        // same doubles).
        val pairs = a.join(b,
            $"__n" === $"__n2" && $"__seg1" === $"__seg2" &&
              $"k1" < $"k2")
          .filter(abs($"__bal1" - $"__bal2") < 100.0)
          .select($"k1", $"k2",
            ($"__seg1" === $"__seg2").as("seg_agree"),
            (abs($"__bal1" - $"__bal2") < 100.0).as("bal_agree"),
            (($"__bal1" >= 0) === ($"__bal2" >= 0)).as("sign_agree"))
        Linkage.score(pairs,
            Seq(("seg_agree", 0.9, 0.25), ("bal_agree", 0.8, 0.018),
              ("sign_agree", 0.85, 0.5)),
            upper = 5.0, lower = 1.0)
          .filter($"decision" === "match")
          .orderBy($"k1", $"k2")
      }),

    // X155: per-source language-diversity indices.
    QueryDef(
      "q_diversity",
      Some("""
        WITH counts AS (
          SELECT source AS grp, lang, CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1, 2
        ), tot AS (
          SELECT grp, CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(c * c) AS BIGINT) AS sq
          FROM counts GROUP BY 1
        )
        SELECT t.grp AS source, t.n, t.k AS n_categories,
               round(-sum((CAST(c.c AS DOUBLE) / t.n)
                 * log2(CAST(c.c AS DOUBLE) / t.n)), 6) AS shannon_bits,
               round(CAST(t.sq AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)), 6)
                 AS simpson,
               round(1.0 - CAST(t.sq AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)), 6)
                 AS gini_simpson,
               CASE WHEN t.k > 1 THEN
                 round(-sum((CAST(c.c AS DOUBLE) / t.n)
                   * log2(CAST(c.c AS DOUBLE) / t.n))
                   / log2(CAST(t.k AS DOUBLE)), 6)
               END AS evenness
        FROM counts c JOIN tot t USING (grp)
        GROUP BY t.grp, t.n, t.k, t.sq
        ORDER BY source
      """.trim),
      "X155 per-source language diversity (Shannon/Simpson/evenness)")(
      (spark, dir) =>
        CorpusOps.diversityIndices(table(spark, dir, "documents"),
            "source", "lang")
          .orderBy("source")),

    // X156a: per-source Bloom filters over distinct tokens — sparse
    // (key, word_idx, bits) scalar layout, md5 positions replayed
    // verbatim in SQL.
    QueryDef(
      "q_bloom_store",
      Some(s"""
        WITH vals AS (
          SELECT DISTINCT source AS key,
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                   t -> t <> '')) AS v
          FROM documents
        ), pos AS (
          SELECT key, ${bloomPosSql("v")} AS p
          FROM vals, range(${BloomHashes}) h(h)
        )
        SELECT key, CAST(p // 32 AS BIGINT) AS word_idx,
               bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
        FROM pos GROUP BY 1, 2
        ORDER BY key, word_idx
      """.trim),
      "X156a per-source token Bloom store (sparse 32-bit words)")(
      (spark, dir) => {
        import spark.implicits._
        BloomStore.build(
            table(spark, dir, "documents")
              .select($"source", explode(Dedup.tokens($"text")).as("tok")),
            "source", "tok", bits = BloomBits, hashes = BloomHashes)
          .orderBy($"key", $"word_idx")
      }),

    // X156b: probe src0's filter with src1's vocabulary — counts
    // with the no-false-negative cross-check folded in (tokens src1
    // shares with src0 MUST probe true, so missed_shared is 0 by
    // construction in BOTH engines).
    QueryDef(
      "q_bloom_probe",
      Some(s"""
        WITH v0 AS (
          SELECT DISTINCT
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                   t -> t <> '')) AS v
          FROM documents WHERE source = 'src0'
        ), store AS (
          SELECT CAST(p // 32 AS BIGINT) AS word_idx,
                 bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
          FROM (SELECT ${bloomPosSql("v")} AS p
                FROM v0, range(${BloomHashes}) h(h))
          GROUP BY 1
        ), v1 AS (
          SELECT DISTINCT
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                   t -> t <> '')) AS v
          FROM documents WHERE source = 'src1'
        ), probes AS (
          SELECT v1.v,
                 CAST(p // 32 AS BIGINT) AS word_idx,
                 1::BIGINT << CAST(p % 32 AS INT) AS mask
          FROM (SELECT v, ${bloomPosSql("v")} AS p
                FROM v1, range(${BloomHashes}) h(h)) v1
        ), verdicts AS (
          SELECT p.v,
                 bool_and(coalesce((s.bits & p.mask) = p.mask, false))
                   AS maybe
          FROM probes p LEFT JOIN store s USING (word_idx)
          GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_probes,
               CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_maybe,
               CAST(sum(CASE WHEN maybe THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_definitely_new,
               CAST(sum(CASE WHEN NOT maybe AND v IN (SELECT v FROM v0)
                 THEN 1 ELSE 0 END) AS BIGINT) AS missed_shared
        FROM verdicts
      """.trim),
      "X156b probe src1 vocab against src0's Bloom filter")(
      (spark, dir) => {
        import spark.implicits._
        val docs = table(spark, dir, "documents")
        def vocab(src: String) = docs.filter($"source" === src)
          .select(explode(Dedup.tokens($"text")).as("v")).distinct()
        val store = BloomStore.build(
          vocab("src0").select(lit("f").as("key"), $"v"),
          "key", "v", bits = BloomBits, hashes = BloomHashes)
        val verdicts = BloomStore.mightContain(store,
          vocab("src1").select(lit("f").as("key"), $"v"),
          "key", "v", bits = BloomBits, hashes = BloomHashes)
        val shared = vocab("src0").select($"v")
          .intersect(vocab("src1").select($"v"))
        verdicts.withColumnRenamed("value", "v")
          .join(shared.withColumn("__shared", lit(true)), Seq("v"), "left")
          .agg(count(lit(1)).as("n_probes"),
            sum(when($"might_contain", 1L).otherwise(0L)).as("n_maybe"),
            sum(when($"might_contain", 0L).otherwise(1L))
              .as("n_definitely_new"),
            sum(when(!$"might_contain" && $"__shared".isNotNull, 1L)
              .otherwise(0L)).as("missed_shared"))
      }),

    // X157: perceptual-hash image near-dup pairs — REAL BMP
    // containers through the production decoder (the q_image_features
    // assembly), planted near-dup pairs (docs 2k / 2k+1 share a base
    // pattern, the odd twin perturbs one pixel), pHash + pigeonhole-
    // banded Hamming join. r13: pHash is now EXACT-INTEGER (pinned
    // quantized-cos DCT basis, integer luma/median) so the oracle
    // replays the whole hash in SQL: pixel formula (skipping the BMP
    // container — decode∘encode = id is codec-spec-pinned), nearest-
    // neighbor resize, two integer DCT passes against the inlined
    // cos literals, exact median, then per-BIT Hamming distance on
    // all pairs (the banded join's pigeonhole-exact superset form).
    QueryDef(
      "q_phash_pairs",
      Some(phashSql + """
        SELECT d1, d2, dist FROM (
          SELECT x.doc_id AS d1, y.doc_id AS d2,
                 CAST(sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)
                   AS BIGINT) AS dist
          FROM bits x JOIN bits y
            ON x.i = y.i AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        )
        WHERE dist <= 3
        ORDER BY d1, d2
      """.trim),
      "X157 pHash near-dup image pairs (banded Hamming join)")(
      (spark, dir) => {
        import spark.implicits._
        val bmp = udf { (docId: Long, _nChars: Long) =>
          val base = docId - docId % 2
          val odd = docId % 2 == 1
          val w = (base % 13).toInt + 4
          val h = (base % 7).toInt + 3
          val rowBytes = (w * 3 + 3) / 4 * 4
          val out = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out.put('B'.toByte).put('M'.toByte)
            .putInt(54 + rowBytes * h).putInt(0).putInt(54)
          out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
            .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
            .putInt(0).putInt(0)
          def v(i: Int): Byte = {
            val b = (i * 17 + base * 31 + 3) % 256
            (if (odd && i == 0) (b + 1) % 256 else b).toByte
          }
          var y = h - 1
          while (y >= 0) {
            var x = 0
            while (x < w) {
              val o = (y * w + x) * 3
              out.put(v(o + 2)).put(v(o + 1)).put(v(o))
              x += 1
            }
            var p = w * 3
            while (p < rowBytes) { out.put(0.toByte); p += 1 }
            y -= 1
          }
          out.array()
        }
        val media = table(spark, dir, "documents")
          .select($"doc_id", lit("image").as("media_type"),
            bmp($"doc_id", coalesce($"n_chars", lit(0L))).as("content"))
          .as[graft.multimodal.Multimodal.MediaRow]
        val hashes = graft.multimodal.Multimodal.phashes(media,
          graft.multimodal.Multimodal.BinaryImageDecoder())
        Dedup.hammingPairs(hashes, "doc_id", "phash", maxDist = 3)
          .orderBy($"d1", $"d2")
      }),

    // X158: column-level snapshot drift on orders, pre-2000 baseline
    // vs the 2000+ snapshot — null rates, distincts, changed bounds.
    QueryDef(
      "q_profile_drift",
      Some("""
        WITH base AS (
          SELECT o_custkey, o_orderstatus, o_orderpriority,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
        ), cur AS (
          SELECT o_custkey, o_orderstatus, o_orderpriority,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        ), pb AS (
          SELECT * FROM (
            SELECT 'cents' AS col_name,
                   CAST((SELECT count(*) FROM base) AS BIGINT) AS rows_base,
                   CAST(count(cents) AS BIGINT) AS nonnull_base,
                   CAST(count(DISTINCT cents) AS BIGINT) AS distinct_base,
                   CAST(min(cents) AS VARCHAR) AS min_base,
                   CAST(max(cents) AS VARCHAR) AS max_base
            FROM base
            UNION ALL
            SELECT 'o_custkey', (SELECT count(*) FROM base),
                   count(o_custkey), count(DISTINCT o_custkey),
                   CAST(min(o_custkey) AS VARCHAR),
                   CAST(max(o_custkey) AS VARCHAR) FROM base
            UNION ALL
            SELECT 'o_orderpriority', (SELECT count(*) FROM base),
                   count(o_orderpriority), count(DISTINCT o_orderpriority),
                   CAST(min(o_orderpriority) AS VARCHAR),
                   CAST(max(o_orderpriority) AS VARCHAR) FROM base
            UNION ALL
            SELECT 'o_orderstatus', (SELECT count(*) FROM base),
                   count(o_orderstatus), count(DISTINCT o_orderstatus),
                   CAST(min(o_orderstatus) AS VARCHAR),
                   CAST(max(o_orderstatus) AS VARCHAR) FROM base
          )
        ), pc AS (
          SELECT * FROM (
            SELECT 'cents' AS col_name,
                   CAST((SELECT count(*) FROM cur) AS BIGINT) AS rows_cur,
                   CAST(count(cents) AS BIGINT) AS nonnull_cur,
                   CAST(count(DISTINCT cents) AS BIGINT) AS distinct_cur,
                   CAST(min(cents) AS VARCHAR) AS min_cur,
                   CAST(max(cents) AS VARCHAR) AS max_cur
            FROM cur
            UNION ALL
            SELECT 'o_custkey', (SELECT count(*) FROM cur),
                   count(o_custkey), count(DISTINCT o_custkey),
                   CAST(min(o_custkey) AS VARCHAR),
                   CAST(max(o_custkey) AS VARCHAR) FROM cur
            UNION ALL
            SELECT 'o_orderpriority', (SELECT count(*) FROM cur),
                   count(o_orderpriority), count(DISTINCT o_orderpriority),
                   CAST(min(o_orderpriority) AS VARCHAR),
                   CAST(max(o_orderpriority) AS VARCHAR) FROM cur
            UNION ALL
            SELECT 'o_orderstatus', (SELECT count(*) FROM cur),
                   count(o_orderstatus), count(DISTINCT o_orderstatus),
                   CAST(min(o_orderstatus) AS VARCHAR),
                   CAST(max(o_orderstatus) AS VARCHAR) FROM cur
          )
        )
        SELECT pb.col_name, nonnull_base, nonnull_cur,
               distinct_base, distinct_cur,
               round(1.0 - CAST(nonnull_base AS DOUBLE) / rows_base, 6)
                 AS null_rate_base,
               round(1.0 - CAST(nonnull_cur AS DOUBLE) / rows_cur, 6)
                 AS null_rate_cur,
               min_base <> min_cur AS min_changed,
               max_base <> max_cur AS max_changed
        FROM pb JOIN pc USING (col_name)
        ORDER BY col_name
      """.trim),
      "X158 column-profile drift, orders pre-2000 vs 2000+")(
      (spark, dir) => {
        import spark.implicits._
        val o = table(spark, dir, "orders")
          .select($"o_custkey", $"o_orderstatus", $"o_orderpriority",
            round($"o_totalprice" * 100).cast("long").as("cents"),
            $"o_orderdate")
        CorpusOps.profileDrift(
            o.filter($"o_orderdate" < lit("2000-01-01").cast("timestamp")),
            o.filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp")),
            Seq("cents", "o_custkey", "o_orderpriority", "o_orderstatus"))
          .orderBy($"col_name")
      }),

    // X160a: per-source log2-linear quantile store over doc lengths —
    // integer-only bucket arithmetic (no ln/pow), replayed verbatim.
    QueryDef(
      "q_loghist_store",
      Some("""
        WITH v AS (
          SELECT source AS key, n_chars AS val
          FROM documents WHERE n_chars >= 0
        )
        SELECT key,
               CASE WHEN val < 16 THEN val
                    ELSE (CAST(length(bin(val)) AS BIGINT) - 1 - 4 + 1) * 16
                         + ((val >> (length(bin(val)) - 1 - 4)) - 16)
               END AS bucket,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(4 AS INTEGER) AS sub_bits
        FROM v GROUP BY 1, 2
        ORDER BY key, bucket
      """.trim),
      "X160a per-source log2-linear quantile store (integer buckets)")(
      (spark, dir) => {
        import spark.implicits._
        LogHistogram.build(table(spark, dir, "documents"),
            "source", "n_chars", subBits = 4)
          .orderBy($"key", $"bucket")
      }),

    // X160b: p50/p90/p99 per source AND for the count-sum-merged
    // whole corpus (the merge law in the oracle: the ALL rows replay
    // as a fresh build over the unioned values).
    QueryDef(
      "q_loghist_quantiles",
      Some("""
        WITH v0 AS (
          SELECT source AS key, n_chars AS val
          FROM documents WHERE n_chars >= 0
        ), v AS (
          SELECT key, val FROM v0
          UNION ALL SELECT 'ALL', val FROM v0
        ), b AS (
          SELECT key,
                 CASE WHEN val < 16 THEN val
                      ELSE (CAST(length(bin(val)) AS BIGINT) - 1 - 4 + 1) * 16
                           + ((val >> (length(bin(val)) - 1 - 4)) - 16)
                 END AS bucket,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM v GROUP BY 1, 2
        ), tot AS (
          SELECT key, CAST(sum(cnt) AS BIGINT) AS n FROM b GROUP BY 1
        ), cum AS (
          SELECT key, bucket, cnt,
                 sum(cnt) OVER (PARTITION BY key ORDER BY bucket) AS cum
          FROM b
        ), probes AS (
          SELECT c.key, qq.q, t.n, c.bucket, c.cum,
                 CAST(floor(qq.q * CAST(t.n - 1 AS DOUBLE)) AS BIGINT) + 1
                   AS target
          FROM cum c JOIN tot t USING (key),
               (SELECT unnest([0.5, 0.9, 0.99]) AS q) qq
        ), picked AS (
          SELECT key, q, n, min(bucket) AS pb
          FROM probes WHERE cum >= target GROUP BY 1, 2, 3
        ), fin AS (
          SELECT key, q, n, pb,
                 CASE WHEN pb < 16 THEN pb
                      ELSE (16 + pb % 16) << CAST(pb // 16 - 1 AS INT)
                 END AS lo,
                 CASE WHEN pb < 16 THEN CAST(1 AS BIGINT)
                      ELSE 1::BIGINT << CAST(pb // 16 - 1 AS INT)
                 END AS width
          FROM picked
        )
        SELECT key, q, n,
               round((CAST(lo AS DOUBLE) + CAST(lo + width - 1 AS DOUBLE))
                 / 2.0, 6) AS estimate
        FROM fin ORDER BY key, q
      """.trim),
      "X160b store quantiles per source + merged ALL (merge law)")(
      (spark, dir) => {
        import spark.implicits._
        val store = LogHistogram.build(table(spark, dir, "documents"),
          "source", "n_chars", subBits = 4)
        val withAll = store.unionByName(
          LogHistogram.merge(store, lit("ALL")))
        LogHistogram.quantiles(withAll, Seq(0.5, 0.9, 0.99))
          .orderBy($"key", $"q")
      }),

    // X161: CMS inner-product join-size estimate for the events
    // user_id self-join, vs the exact sum-of-squares — the planner
    // statistic that picks broadcast/shuffle/salt before the join.
    QueryDef(
      "q_join_size_est",
      Some("""
        WITH cells AS (
          SELECT j,
                 ('0x' || substr(md5('cms' || j || ':'
                    || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 64
                   AS bucket,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events, unnest([0, 1, 2, 3]) AS u(j)
          GROUP BY 1, 2
        ), per AS (
          SELECT j, CAST(sum(cnt * cnt) AS BIGINT) AS p
          FROM cells GROUP BY 1
        ), est AS (
          SELECT CAST(min(p) AS BIGINT) AS est_join_size FROM per
        ), ex AS (
          SELECT CAST(sum(c * c) AS BIGINT) AS exact_size
          FROM (SELECT CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY user_id)
        )
        SELECT exact_size, est_join_size,
               round(CAST(est_join_size - exact_size AS DOUBLE)
                 / exact_size, 6) AS overestimate_frac
        FROM ex, est
      """.trim),
      "X161 CMS inner-product self-join size estimate vs exact")(
      (spark, dir) => {
        import spark.implicits._
        val ev = QueryDef.events(spark, dir).select($"user_id")
        val sk = Cms.sketch(ev, "user_id")
        val exact = ev.groupBy($"user_id")
          .agg(count(lit(1)).as("__c"))
          .agg(sum($"__c" * $"__c").cast("long").as("exact_size"))
        exact.crossJoin(Cms.innerProduct(sk, sk))
          .select($"exact_size", $"est_join_size",
            round(($"est_join_size" - $"exact_size").cast("double") /
              $"exact_size", 6).as("overestimate_frac"))
      }),

    // X162: per-line language segmentation over a constructed
    // multilingual corpus — 5 deterministic lines per doc (en en
    // de|fr de|fr es), stopword scoring + run merging replayed
    // verbatim.
    QueryDef(
      "q_lang_segments",
      Some("""
        WITH lines AS (
          SELECT doc_id, u.i AS line_idx,
                 CASE u.i
                   WHEN 0 THEN 'the of and to'
                   WHEN 1 THEN 'the to in is it'
                   WHEN 2 THEN CASE WHEN doc_id % 2 = 0
                     THEN 'der die und ist nicht'
                     ELSE 'le la et un est' END
                   WHEN 3 THEN CASE WHEN doc_id % 2 = 0
                     THEN 'das und nicht mit ein'
                     ELSE 'les et une est que' END
                   ELSE 'el los y una es'
                 END AS line
          FROM documents, unnest([0, 1, 2, 3, 4]) AS u(i)
        ), toks AS (
          SELECT doc_id, line_idx,
                 list_filter(string_split_regex(lower(line), '\s+'),
                   t -> t <> '') AS w
          FROM lines
        ), scored AS (
          SELECT doc_id, line_idx,
                 len(list_filter(w, t -> t IN ('the', 'a', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'for'))) AS s_en,
                 len(list_filter(w, t -> t IN ('der', 'die', 'das', 'und', 'ist', 'nicht', 'mit', 'ein', 'zu', 'den'))) AS s_de,
                 len(list_filter(w, t -> t IN ('le', 'la', 'les', 'et', 'un', 'une', 'est', 'que', 'pour', 'dans'))) AS s_fr,
                 len(list_filter(w, t -> t IN ('el', 'los', 'las', 'y', 'una', 'es', 'por', 'con', 'del', 'para'))) AS s_es
          FROM toks
        ), pred AS (
          SELECT doc_id, line_idx,
                 CASE
                   WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                   WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                   WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                   ELSE 'es'
                 END AS lang
          FROM scored
        ), runs AS (
          SELECT doc_id, line_idx, lang,
                 CASE WHEN lag(lang) OVER (PARTITION BY doc_id
                        ORDER BY line_idx) IS DISTINCT FROM lang
                      THEN 1 ELSE 0 END AS chg
          FROM pred
        ), seg AS (
          SELECT doc_id, line_idx, lang,
                 CAST(sum(chg) OVER (PARTITION BY doc_id
                   ORDER BY line_idx) AS BIGINT) AS segment_idx
          FROM runs
        )
        SELECT doc_id, segment_idx, lang AS lang_pred,
               CAST(min(line_idx) AS BIGINT) AS start_line,
               CAST(max(line_idx) AS BIGINT) AS end_line,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM seg GROUP BY doc_id, segment_idx, lang
        ORDER BY doc_id, segment_idx
      """.trim),
      "X162 per-line language segmentation with run merging")(
      (spark, dir) => {
        import spark.implicits._
        val langs = TextAnalysisQueries.Stopwords.filter(_._1 != "zh")
        val lines = table(spark, dir, "documents")
          .select($"doc_id", posexplode(array(
            lit("the of and to"),
            lit("the to in is it"),
            when($"doc_id" % 2 === 0, "der die und ist nicht")
              .otherwise("le la et un est"),
            when($"doc_id" % 2 === 0, "das und nicht mit ein")
              .otherwise("les et une est que"),
            lit("el los y una es"))).as(Seq("line_idx", "line")))
        CorpusOps.langSegments(lines, "doc_id", "line_idx", "line",
            langs)
          .orderBy($"doc_id", $"segment_idx")
      }),

    // X163: robust per-source score normalization of doc lengths —
    // exact grouped median/IQR broadcast back, (x-med)/IQR at 6 dp.
    QueryDef(
      "q_robust_scale",
      Some("""
        WITH t AS (SELECT source, doc_id, n_chars AS v FROM documents),
        tot AS (SELECT source, count(*) AS total FROM t GROUP BY source),
        o AS (
          SELECT source, v, sum(cnt) OVER (PARTITION BY source ORDER BY v)
                 AS cum
          FROM (SELECT source, v, count(*) AS cnt FROM t
                GROUP BY source, v)
        ), med AS (
          SELECT o.source, CAST(min(v) AS BIGINT) AS median
          FROM o JOIN tot USING (source)
          WHERE cum >= ceil(0.5 * total) GROUP BY o.source
        ), q1 AS (
          SELECT o.source, CAST(min(v) AS BIGINT) AS q1
          FROM o JOIN tot USING (source)
          WHERE cum >= ceil(0.25 * total) GROUP BY o.source
        ), q3 AS (
          SELECT o.source, CAST(min(v) AS BIGINT) AS q3
          FROM o JOIN tot USING (source)
          WHERE cum >= ceil(0.75 * total) GROUP BY o.source
        )
        SELECT t.source, t.doc_id, t.v AS n_chars, med.median,
               q3.q3 - q1.q1 AS iqr,
               CASE WHEN q3.q3 - q1.q1 > 0 THEN
                 round(CAST(t.v - med.median AS DOUBLE) / (q3.q3 - q1.q1), 6)
               END AS robust_z
        FROM t JOIN med USING (source) JOIN q1 USING (source)
             JOIN q3 USING (source)
        ORDER BY t.doc_id
      """.trim),
      "X163 robust per-source normalization (exact median/IQR)")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.robustScale(
            table(spark, dir, "documents")
              .select($"source", $"doc_id", $"n_chars"),
            "source", "n_chars")
          .orderBy($"doc_id")
      }),

    // X164: positional phrase search for an exact 3-word phrase —
    // postings pruned to the phrase terms in the scan, two selective
    // (doc, pos-offset) equi-joins, replayed verbatim.
    QueryDef(
      "q_phrase_search",
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                   t -> t <> '') AS w
          FROM documents
        ), p AS (
          SELECT doc_id, u.i AS pos, w[u.i + 1] AS t
          FROM toks, unnest(range(len(w))) AS u(i)
        ), m AS (
          SELECT a.doc_id, a.pos
          FROM p a
          JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          JOIN p c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
          WHERE a.t = 'part' AND b.t = 'filter' AND c.t = 'scan'
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
               CAST(min(pos) AS BIGINT) AS first_pos
        FROM m GROUP BY doc_id
        ORDER BY doc_id
      """.trim),
      "X164 positional phrase search ('part filter scan')")(
      (spark, dir) =>
        graft.operators.InvertedIndex.phraseSearch(
            table(spark, dir, "documents"), "doc_id", "text",
            Seq("part", "filter", "scan"))
          .orderBy("doc_id")),

    // X165: perceptual near-dup image CLUSTERS — the X157 banded
    // Hamming pairs resolved into connected components with the X1f
    // pointer-jumping machinery. r13: hash-oracled end to end — the
    // integer pHash CTEs feed the q_dedup_clusters recursive-
    // reachability pattern (tractable: near-dup components are tiny).
    QueryDef(
      "q_phash_clusters",
      Some(phashSql + """
        , pairs AS (
          SELECT d1, d2 FROM (
            SELECT x.doc_id AS d1, y.doc_id AS d2,
                   sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)
                     AS dist
            FROM bits x JOIN bits y
              ON x.i = y.i AND x.doc_id < y.doc_id
            GROUP BY 1, 2
          ) WHERE dist <= 3
        ), edges AS (
          SELECT d1 AS src, d2 AS dst FROM pairs
          UNION SELECT d2, d1 FROM pairs
        ), reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ), comp AS (
          SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
          FROM reach GROUP BY src
        )
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
               min(doc_id) AS min_doc_id
        FROM comp GROUP BY 1 HAVING count(*) >= 2
        ORDER BY cluster_id
      """.trim),
      "X165 pHash near-dup image clusters (pairs -> components)")(
      (spark, dir) => {
        import spark.implicits._
        val pairs = defs.find(_.name == "q_phash_pairs").get
          .build(spark, dir)
        Dedup.resolveClusters(pairs.select($"d1", $"d2"))
          .groupBy($"cluster_id")
          .agg(count(lit(1)).as("n_members"),
            min($"doc_id").as("min_doc_id"))
          .filter($"n_members" >= 2)
          .orderBy($"cluster_id")
      }),

    // X166: TABLE-driven blocklist matching — phrases as data
    // (broadcast join + token-slice verify), the 100k-entry scale
    // path past X142's plan-literal filter.
    QueryDef(
      "q_blocklist_join",
      Some("""
        WITH phrases AS (
          SELECT * FROM (VALUES
            (1, ['part', 'filter', 'scan']),
            (2, ['slow', 'hash', 'batch']),
            (3, ['row', 'column'])) AS t(phrase_id, pt)
        ), toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                   t -> t <> '') AS w
          FROM documents
        ), p AS (
          SELECT doc_id, u.i AS pos, w[u.i + 1] AS t, w
          FROM toks, unnest(range(len(w))) AS u(i)
        ), cands AS (
          SELECT p.doc_id, p.pos, ph.phrase_id, ph.pt, len(ph.pt) AS l,
                 p.w
          FROM p JOIN phrases ph ON p.t = ph.pt[1]
        )
        SELECT doc_id, CAST(phrase_id AS BIGINT) AS phrase_id,
               CAST(count(*) AS BIGINT) AS n_matches,
               CAST(min(pos) AS BIGINT) AS first_pos
        FROM cands
        WHERE w[pos + 1 : pos + l] = pt
        GROUP BY doc_id, phrase_id
        ORDER BY doc_id, phrase_id
      """.trim),
      "X166 table-driven blocklist phrase matching (broadcast+slice)")(
      (spark, dir) => {
        import spark.implicits._
        val phrases = Seq((1L, "part filter scan"),
          (2L, "slow hash batch"), (3L, "row column"))
          .toDF("phrase_id", "phrase")
        CorpusOps.blocklistJoin(table(spark, dir, "documents"),
            "doc_id", "text", phrases)
          .orderBy($"doc_id", $"phrase_id")
      }),

    // X167a: mergeable centroid store per (label, shard), shards
    // merged back into labels — the oracle replays build(union), so
    // the row equality IS the merge law on real data.
    QueryDef(
      "q_centroid_store",
      Some("""
        WITH e AS (
          SELECT CAST(label AS VARCHAR) AS key,
                 generate_subscripts(embedding, 1) - 1 AS dim,
                 unnest(CAST(embedding AS DOUBLE[])) AS x
          FROM embeddings
        )
        SELECT key, CAST(dim AS BIGINT) AS dim,
               CAST(sum(CAST(round(x * 1000000000.0) AS BIGINT))
                 AS BIGINT) AS sum_nano,
               CAST(count(*) AS BIGINT) AS n
        FROM e GROUP BY 1, 2
        ORDER BY key, dim
      """.trim),
      "X167a mergeable centroid store (shards merged into labels)")(
      (spark, dir) => {
        import spark.implicits._
        val sharded = graft.operators.CentroidStore.build(
          table(spark, dir, "embeddings")
            .select(concat($"label".cast("string"), lit("#"),
              ($"vec_id" % 4).cast("string")).as("k"), $"embedding"),
          "k", "embedding")
        graft.operators.CentroidStore.merge(sharded,
            split($"key", "#").getItem(0))
          .select($"key", $"dim", $"sum_nano".cast("long").as("sum_nano"),
            $"n".cast("long").as("n"))
          .orderBy($"key", $"dim")
      }),

    // X167b: centroid geometry between two labels read from the
    // store alone (no re-scan of the vectors).
    QueryDef(
      "q_centroid_compare",
      Some("""
        WITH e AS (
          SELECT CAST(label AS VARCHAR) AS key,
                 generate_subscripts(embedding, 1) - 1 AS dim,
                 unnest(CAST(embedding AS DOUBLE[])) AS x
          FROM embeddings WHERE label IN (0, 1)
        ), q AS (
          SELECT key, dim,
                 CAST(sum(CAST(round(x * 1000000000.0) AS BIGINT))
                   AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY 1, 2
        ), j AS (
          SELECT a.dim, a.s AS sa, a.n AS na, b.s AS sb, b.n AS nb
          FROM q a JOIN q b USING (dim)
          WHERE a.key = '0' AND b.key = '1'
        ), g AS (
          SELECT CAST(max(na) AS BIGINT) AS n_a,
                 CAST(max(nb) AS BIGINT) AS n_b,
                 sum(CAST(sa AS HUGEINT) * sb) AS ab,
                 sum(CAST(sa AS HUGEINT) * sa) AS aa,
                 sum(CAST(sb AS HUGEINT) * sb) AS bb,
                 sum((CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na)
                   * (CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na))
                   AS g2
          FROM j
        )
        SELECT n_a, n_b,
               CASE WHEN aa > 0 AND bb > 0 THEN
                 round(CAST(ab AS DOUBLE) /
                       (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))),
                       6) END AS centroid_cos,
               round(sqrt(CAST(g2 AS DOUBLE)) /
                     (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                      * 1000000000.0), 6) AS centroid_l2_gap
        FROM g
      """.trim),
      "X167b label-0 vs label-1 centroid geometry from the store")(
      (spark, dir) => {
        import spark.implicits._
        val store = graft.operators.CentroidStore.build(
          table(spark, dir, "embeddings")
            .filter($"label".isin(0, 1))
            .select($"label".cast("string").as("k"), $"embedding"),
          "k", "embedding")
        graft.operators.CentroidStore.compare(store, "0", "1")
      }),

    // X169: mojibake repair — deterministic damage injection (UTF-8-
    // as-Latin-1 sequences) then the fixed replace-chain repair; the
    // chain is generated from the SAME pair table on both sides.
    QueryDef(
      "q_mojibake_repair", {
        val chain = CorpusOps.MojibakePairs.foldLeft("broken") {
          case (acc, (bad, good)) =>
            s"replace($acc, '${bad.replace("'", "''")}', " +
              s"'${good.replace("'", "''")}')"
        }
        Some(s"""
        WITH damaged AS (
          SELECT doc_id,
                 CASE doc_id % 3
                   WHEN 0 THEN replace(text, 'e', 'Ã©')
                   WHEN 1 THEN replace(text, 'a', 'â€™')
                   ELSE text
                 END AS broken
          FROM documents
        ), fixed AS (
          SELECT doc_id, broken, $chain AS repaired FROM damaged
        )
        SELECT doc_id, broken <> repaired AS was_repaired,
               CAST(length(broken) AS BIGINT) AS n_before,
               CAST(length(repaired) AS BIGINT) AS n_after,
               md5(repaired) AS repaired_hash
        FROM fixed ORDER BY doc_id
      """.trim)
      },
      "X169 mojibake repair round-trip (fixed replace chain)")(
      (spark, dir) => {
        import spark.implicits._
        val damaged = table(spark, dir, "documents")
          .select($"doc_id",
            when($"doc_id" % 3 === 0, replace($"text", lit("e"), lit("Ã©")))
              .when($"doc_id" % 3 === 1,
                replace($"text", lit("a"), lit("â€™")))
              .otherwise($"text").as("broken"))
        damaged
          .withColumn("repaired", CorpusOps.repairMojibake($"broken"))
          .select($"doc_id", ($"broken" =!= $"repaired").as("was_repaired"),
            length($"broken").cast("long").as("n_before"),
            length($"repaired").cast("long").as("n_after"),
            md5($"repaired".cast("binary")).as("repaired_hash"))
          .orderBy($"doc_id")
      }),

    // X170: HTML strip + entity decode over a constructed page —
    // script/style removal, tag strip, ordered entity decode,
    // whitespace collapse; RE2-safe patterns replay in DuckDB.
    QueryDef(
      "q_html_strip",
      Some("""
        WITH pages AS (
          SELECT doc_id,
                 '<html><head><style>p {color: red}</style></head>'
                 || '<body><h1>Title &amp; ' || lang || '</h1><p>'
                 || text
                 || '</p><script>var x = 1 &lt; 2;</script></body></html>'
                   AS html
          FROM documents
        ), c AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   replace(replace(replace(replace(replace(replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(html,
                           '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                         '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                       '(?s)<[^>]+>', ' ', 'g'),
                     '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                     '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
                   '\s+', ' ', 'g')) AS clean
          FROM pages
        )
        SELECT doc_id, CAST(length(clean) AS BIGINT) AS clean_len,
               md5(clean) AS clean_hash
        FROM c ORDER BY doc_id
      """.trim),
      "X170 HTML strip + entity decode (boilerplate removal)")(
      (spark, dir) => {
        import spark.implicits._
        val pages = table(spark, dir, "documents")
          .select($"doc_id", concat(
            lit("<html><head><style>p {color: red}</style></head>" +
              "<body><h1>Title &amp; "), $"lang", lit("</h1><p>"),
            $"text",
            lit("</p><script>var x = 1 &lt; 2;</script></body></html>"))
            .as("html"))
        pages.select($"doc_id",
            CorpusOps.stripHtml($"html").as("clean"))
          .select($"doc_id", length($"clean").cast("long").as("clean_len"),
            md5($"clean".cast("binary")).as("clean_hash"))
          .orderBy($"doc_id")
      }),

    // X171: URL decomposition + per-domain reputation rollup over
    // deterministically constructed crawl URLs — RE2-safe extraction
    // replayed verbatim.
    QueryDef(
      "q_url_rollup",
      Some("""
        WITH urls AS (
          SELECT doc_id, n_chars,
                 'https://www.' || source || CAST(doc_id % 7 AS VARCHAR)
                 || CASE doc_id % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.org'
                    ELSE '.net' END
                 || '/p/' || CAST(doc_id AS VARCHAR) AS url
          FROM documents
        ), parts AS (
          SELECT doc_id, n_chars,
                 regexp_replace(lower(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
                   ':[0-9]+$', '') AS host
          FROM urls
        ), named AS (
          SELECT n_chars, host,
                 regexp_extract(host, '([^.]+\.[a-z]+)$', 1) AS d0,
                 regexp_extract(host, '(\.[a-z]+)$', 1) AS t0
          FROM parts
        )
        SELECT CASE WHEN d0 = '' THEN '(unparsed)' ELSE d0 END AS domain,
               CASE WHEN d0 = '' THEN '' ELSE t0 END AS tld,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
               round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6)
                 AS mean_score
        FROM named
        GROUP BY 1, 2
        ORDER BY domain
      """.trim),
      "X171 per-domain crawl rollup (host/domain/TLD extraction)")(
      (spark, dir) => {
        import spark.implicits._
        val urls = table(spark, dir, "documents")
          .select($"doc_id", $"n_chars", concat(
            lit("https://www."), $"source",
            ($"doc_id" % 7).cast("string"),
            when($"doc_id" % 3 === 0, ".com")
              .when($"doc_id" % 3 === 1, ".org").otherwise(".net"),
            lit("/p/"), $"doc_id".cast("string")).as("url"))
        CorpusOps.domainRollup(urls, "url", "n_chars")
          .orderBy($"domain")
      }),

    // X172: sentence segmentation — marker-rewrite split (RE2-safe,
    // no lookbehind), compact (len, md5) per sentence.
    QueryDef(
      "q_sentence_split",
      Some("""
        WITH pages AS (
          SELECT doc_id,
                 'First part. ' || text || '! Tail one? Yes.' AS t
          FROM documents
        ), marked AS (
          SELECT doc_id,
                 regexp_replace(t, '([.!?]+)\s+', '\1' || chr(1), 'g')
                   AS m
          FROM pages
        ), sents AS (
          SELECT doc_id, u.i AS sent_idx,
                 trim(parts[u.i + 1]) AS sentence
          FROM (SELECT doc_id, string_split(m, chr(1)) AS parts
                FROM marked),
               unnest(range(len(parts))) AS u(i)
          WHERE trim(parts[u.i + 1]) <> ''
        )
        SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx,
               CAST(length(sentence) AS BIGINT) AS sent_len,
               md5(sentence) AS sent_hash
        FROM sents
        ORDER BY doc_id, sent_idx
      """.trim),
      "X172 sentence segmentation (marker-rewrite split)")(
      (spark, dir) => {
        import spark.implicits._
        val pages = table(spark, dir, "documents")
          .select($"doc_id", concat(lit("First part. "), $"text",
            lit("! Tail one? Yes.")).as("t"))
        CorpusOps.sentenceSplit(pages, "doc_id", "t")
          .select($"doc_id", $"sent_idx",
            length($"sentence").cast("long").as("sent_len"),
            md5($"sentence".cast("binary")).as("sent_hash"))
          .orderBy($"doc_id", $"sent_idx")
      }),

    // X173: deterministic pseudonymization — salted md5 tokens over
    // events.user_id; per-token activity proves referential
    // stability (token counts == id counts).
    QueryDef(
      "q_pseudonymize",
      Some("""
        SELECT md5('rel2026:' || CAST(user_id AS VARCHAR)) AS user_token,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1
        ORDER BY user_token
      """.trim),
      "X173 salted-md5 pseudonymization of the event actor column")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.Privacy.pseudonymize(
            QueryDef.events(spark, dir).select($"user_id"),
            Seq("user_id"), salt = "rel2026")
          .groupBy($"user_id".as("user_token"))
          .agg(count(lit(1)).as("n_events"))
          .orderBy($"user_token")
      }),

    // X174: Laplace-calibrated reproducible noisy counts of the lang
    // distribution (epsilon 0.5, md5 inverse-CDF noise) — the
    // release table beside the k-anonymity/l-diversity audits.
    QueryDef(
      "q_noisy_counts",
      Some("""
        WITH c AS (
          SELECT lang AS category, CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY 1
        ), u AS (
          SELECT category, n,
                 (CAST(('0x' || substr(md5('dp1' || category), 1, 8))::BIGINT
                    AS DOUBLE) + 0.5) / 4294967296.0 - 0.5 AS ctr
          FROM c
        )
        SELECT category,
               round(n + (-(1.0 / 0.5) * sign(ctr)
                 * ln(1.0 - 2.0 * abs(ctr))), 6) AS noisy_count
        FROM u
        ORDER BY category
      """.trim),
      "X174 reproducible Laplace-calibrated noisy lang counts")(
      (spark, dir) =>
        graft.operators.Privacy.noisyCounts(
            table(spark, dir, "documents"), "lang",
            epsilon = 0.5, salt = "dp1")
          .orderBy("category")),

    // X176: mutual information source↔lang — dependence strength in
    // bits beside X126's chi2 significance; exact cells, ln fold.
    QueryDef(
      "q_mutual_info",
      Some("""
        WITH cells AS (
          SELECT source AS x, lang AS y, CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1, 2
        ), mx AS (
          SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY 1
        ), my AS (
          SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY 1
        ), tot AS (
          SELECT CAST(sum(c) AS BIGINT) AS n FROM cells
        ), j AS (
          SELECT c.c, mx.cx, my.cy, tot.n
          FROM cells c JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
        ), f AS (
          SELECT CAST(max(n) AS BIGINT) AS n,
                 sum((CAST(c AS DOUBLE) / n)
                   * ln(CAST(c AS DOUBLE) * n
                        / (CAST(cx AS DOUBLE) * cy))) AS mi,
                 -sum((CAST(c AS DOUBLE) / n)
                   * ln(CAST(cx AS DOUBLE) / n)) AS hx,
                 -sum((CAST(c AS DOUBLE) / n)
                   * ln(CAST(cy AS DOUBLE) / n)) AS hy
          FROM j
        )
        SELECT n, round(mi, 6) AS mi_nats,
               round(mi / ln(2.0), 6) AS mi_bits,
               CASE WHEN hx > 0.0 AND hy > 0.0 THEN
                 round(mi / sqrt(hx * hy), 6) END AS nmi
        FROM f
      """.trim),
      "X176 mutual information between source and lang")(
      (spark, dir) =>
        CorpusOps.mutualInformation(table(spark, dir, "documents"),
          "source", "lang")),

    // X177: candidate-pair precision/recall — blocked-key candidates
    // (same source, n_chars mod 64) scored against the exact truth
    // pairs (same source, n_chars); truth ⊆ predicted here, so
    // recall is 1 and precision measures the blocking's selectivity.
    QueryDef(
      "q_pair_eval",
      Some("""
        WITH t AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2
          FROM documents a JOIN documents b
            ON a.source = b.source AND a.n_chars = b.n_chars
           AND a.doc_id < b.doc_id
        ), p AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2
          FROM documents a JOIN documents b
            ON a.source = b.source AND a.n_chars % 64 = b.n_chars % 64
           AND a.doc_id < b.doc_id
        ), c AS (
          SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_predicted,
                 CAST((SELECT count(*) FROM t) AS BIGINT) AS n_truth,
                 CAST((SELECT count(*) FROM p JOIN t USING (d1, d2))
                   AS BIGINT) AS n_correct
        )
        SELECT n_predicted, n_truth, n_correct,
               CASE WHEN n_predicted > 0 THEN
                 round(CAST(n_correct AS DOUBLE) / n_predicted, 6)
               END AS precision,
               CASE WHEN n_truth > 0 THEN
                 round(CAST(n_correct AS DOUBLE) / n_truth, 6)
               END AS recall,
               CASE WHEN n_predicted > 0 AND n_truth > 0
                     AND n_correct > 0 THEN
                 round(2.0 * CAST(n_correct AS DOUBLE)
                       / (n_predicted + n_truth), 6)
               END AS f1
        FROM c
      """.trim),
      "X177 blocked-candidate precision/recall vs exact truth pairs")(
      (spark, dir) => {
        import spark.implicits._
        val d = table(spark, dir, "documents")
          .select($"doc_id", $"source", $"n_chars")
        def pairs(keyExpr: org.apache.spark.sql.Column) = {
          val a = d.select($"doc_id".as("d1"), $"source".as("__s"),
            keyExpr.as("__k"))
          val b = d.select($"doc_id".as("d2"), $"source".as("__s"),
            keyExpr.as("__k"))
          a.join(b, Seq("__s", "__k")).filter($"d1" < $"d2")
            .select($"d1", $"d2")
        }
        graft.operators.RankEval.pairSetEval(
          pairs($"n_chars" % 64), pairs($"n_chars"))
      }),

    // X178: jump-consistent-hash sharding — per-shard population at
    // 32 shards plus the 32→33 growth movement; moved_elsewhere is 0
    // BY THE ALGORITHM (minimal movement: leavers go only to the new
    // shard), so the column doubles as an in-output cross-check.
    // r12: the data-dependent LCG loop REPLAYS as a recursive CTE —
    // the wrapping 64-bit multiply becomes HUGEINT arithmetic mod
    // 2⁶⁴ (Java's overflow semantics made explicit), k >>> 33 is
    // integer division on the unsigned value, and the double mix
    // (b+1)·2³¹/(rand+1) is fixed-shape on exact small integers —
    // so the census is now a full hash oracle.
    QueryDef(
      "q_jump_shards",
      Some(jumpShardsSql(32, 33)),
      "X178 jump-hash shard census + minimal-movement growth check")(
      (spark, dir) => {
        import spark.implicits._
        val j32 = graft.operators.ZOrder.jumpHashUdf(32)
        val j33 = graft.operators.ZOrder.jumpHashUdf(33)
        QueryDef.events(spark, dir).select($"user_id").distinct()
          .select($"user_id", j32($"user_id").as("s32"),
            j33($"user_id").as("s33"))
          .groupBy($"s32".cast("long").as("shard"))
          .agg(count(lit(1)).as("n_users"),
            sum(when($"s33" =!= $"s32", 1L).otherwise(0L))
              .as("n_moved_to_new"),
            sum(when($"s33" =!= $"s32" && $"s33" =!= 32, 1L)
              .otherwise(0L)).as("n_moved_elsewhere"))
          .orderBy($"shard")
      }),

    // X179: exact per-source 10-90% trimmed mean of doc lengths.
    QueryDef(
      "q_trimmed_mean",
      Some("""
        WITH t AS (SELECT source, n_chars AS v FROM documents),
        tot AS (SELECT source, count(*) AS total FROM t GROUP BY source),
        o AS (
          SELECT source, v, sum(cnt) OVER (PARTITION BY source ORDER BY v)
                 AS cum
          FROM (SELECT source, v, count(*) AS cnt FROM t
                GROUP BY source, v)
        ), lo AS (
          SELECT o.source, CAST(min(v) AS BIGINT) AS trim_lo
          FROM o JOIN tot USING (source)
          WHERE cum >= ceil(0.1 * total) GROUP BY o.source
        ), hi AS (
          SELECT o.source, CAST(min(v) AS BIGINT) AS trim_hi
          FROM o JOIN tot USING (source)
          WHERE cum >= ceil(0.9 * total) GROUP BY o.source
        )
        SELECT t.source, lo.trim_lo, hi.trim_hi,
               CAST(count(*) AS BIGINT) AS n_kept,
               round(CAST(sum(t.v) AS DOUBLE) / count(*), 6)
                 AS trimmed_mean
        FROM t JOIN lo USING (source) JOIN hi USING (source)
        WHERE t.v >= lo.trim_lo AND t.v <= hi.trim_hi
        GROUP BY t.source, lo.trim_lo, hi.trim_hi
        ORDER BY t.source
      """.trim),
      "X179 exact per-source trimmed mean (10-90% order statistics)")(
      (spark, dir) =>
        CorpusOps.trimmedMean(
            table(spark, dir, "documents")
              .selectExpr("source", "n_chars"),
            "source", "n_chars")
          .orderBy("source")),

    // X180: two-sample KS statistic of doc length, lang='en' vs the
    // rest — exact CDF steps on the distinct-value table.
    QueryDef(
      "q_ks_test",
      Some("""
        WITH per AS (
          SELECT CAST(round(n_chars * 1e6) AS BIGINT) AS v,
                 CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                   AS BIGINT) AS cb
          FROM documents GROUP BY 1
        ), tot AS (
          SELECT CAST(sum(ca) AS BIGINT) AS na,
                 CAST(sum(cb) AS BIGINT) AS nb
          FROM per
        ), cum AS (
          SELECT sum(ca) OVER (ORDER BY v) AS cuma,
                 sum(cb) OVER (ORDER BY v) AS cumb
          FROM per
        )
        SELECT tot.na AS n_a, tot.nb AS n_b,
               CASE WHEN tot.na > 0 AND tot.nb > 0 THEN
                 round(max(abs(CAST(cuma AS DOUBLE) / tot.na
                   - CAST(cumb AS DOUBLE) / tot.nb)), 6) END AS ks_d
        FROM cum, tot
        GROUP BY tot.na, tot.nb
      """.trim),
      "X180 two-sample KS distance of doc length, lang=en vs rest")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.Hypothesis.ksTest(
          table(spark, dir, "documents"), "n_chars", $"lang" === "en")
      }),

    // X159: stochastic-greedy facility-location coreset — pick the 8
    // embeddings that best cover the corpus by max-cosine. r12: the
    // greedy state moved to exact integers (nano-quantized cosines,
    // long coverage maxima, long gain sums), so the selection replays
    // as an unrolled CTE chain — full hash oracle (the X272/X132
    // iterative-replay convention); exact-greedy parity and coverage
    // monotonicity stay spec-asserted (CoresetSpec).
    QueryDef(
      "q_coreset_select",
      Some(coresetSql(k = 8, cands = 16, salt = "coreset")),
      "X159 facility-location coreset selection (k=8, md5-candidates)")(
      (spark, dir) =>
        graft.operators.Similarity.coresetSelect(
            table(spark, dir, "embeddings"), "vec_id", "embedding",
            k = 8, candidatesPerRound = 16)
          .orderBy("selection_rank"))
  )
}
