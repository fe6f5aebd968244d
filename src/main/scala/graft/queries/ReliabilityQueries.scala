package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{BloomStore, CorpusOps, Dedup, Linkage}
import QueryDef.table

/** r9 wave 6 (SURVEY §2.10 X153–X156): percentile gating, record
  * linkage, composition diversity, and the persisted Bloom membership
  * store. Same determinism contract as every other query file:
  * exact-integer or md5-derived arithmetic on the hashed path, fixed-
  * shape double formulas, round(6).
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
        val b = c.select($"c_custkey".as("k2"), $"c_nationkey".as("__n"),
          $"c_mktsegment".as("__seg2"), $"c_acctbal".as("__bal2"))
        val pairs = a.join(b, Seq("__n"))
          .filter($"k1" < $"k2")
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
      })
  )
}
