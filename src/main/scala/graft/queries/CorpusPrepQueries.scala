package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Contamination, CorpusOps}
import graft.queries.QueryDef.table

/** Corpus-preparation contract queries (north star X33–X36): benchmark
  * decontamination, duplicate-span coverage, repetition quality
  * signals, and the deterministic training-order shuffle. Everything
  * is Column expressions + equi-joins with exact DuckDB oracles —
  * ratios divide exact integers, so doubles reproduce bit-identically.
  */
object CorpusPrepQueries {

  /** 5-gram overlap: on this small-vocabulary corpus 4-grams collide
    * coincidentally; at k=5 with threshold 0.1 exactly the planted
    * near-dups of benchmark docs flag (measured: 7/482 docs overlap
    * at all, 5 cross the threshold).
    */
  val ContamK = 5
  val ContamThreshold = 0.1
  /** Every 29th doc plays the held-out benchmark suite. */
  val BenchMod = 29

  val ShuffleShards = 8
  val ShuffleSalt = "epoch0"

  /** Shared DuckDB prelude: tokens per doc (identical to
    * `Dedup.tokens`), k-gram assembly as in DedupQueries.shingleSql.
    */
  private def gramExpr(k: Int, sep: String): String =
    (1 to k).map(j => s"w[i+$j]").mkString(s" || $sep || ")

  private val toksCte = """
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
      FROM documents
    )"""

  val defs: Seq[QueryDef] = Seq(

    // X33: benchmark decontamination — which corpus docs leak the
    // "benchmark" (every 29th doc) via shared 5-grams.
    QueryDef(
      "q_decontaminate",
      Some(s"""
        WITH $toksCte, grams AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(w) < $ContamK THEN []
                 ELSE list_transform(range(len(w) - ${ContamK - 1}),
                        i -> ${gramExpr(ContamK, "chr(1)")})
            END)) AS g
          FROM toks
        ), bench AS (
          SELECT DISTINCT g FROM grams WHERE doc_id % $BenchMod = 0
        ), counted AS (
          SELECT c.doc_id, count(*) AS n_grams, count(b.g) AS n_hit
          FROM (SELECT * FROM grams WHERE doc_id % $BenchMod <> 0) c
          LEFT JOIN bench b USING (g)
          GROUP BY 1
        )
        SELECT d.doc_id,
          coalesce(n_grams, 0) AS n_grams,
          coalesce(n_hit, 0) AS n_hit,
          CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
               ELSE n_hit * 1.0 / n_grams END AS contamination,
          CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
               ELSE n_hit * 1.0 / n_grams END >= $ContamThreshold AS flagged
        FROM (SELECT doc_id FROM documents WHERE doc_id % $BenchMod <> 0) d
        LEFT JOIN counted USING (doc_id)
        ORDER BY doc_id
      """.trim),
      "X33 train/test n-gram contamination flagging")(
      (spark, dir) => {
        import spark.implicits._
        val docs = table(spark, dir, "documents")
        Contamination.flagContaminated(
            docs.filter($"doc_id" % BenchMod =!= 0),
            docs.filter($"doc_id" % BenchMod === 0),
            "doc_id", "text", ContamK, ContamThreshold)
          .orderBy($"doc_id")
      }),

    // X34: duplicate-span coverage — fraction of each doc's 5-gram
    // slots repeated in some other doc (positional approximation of
    // exact substring dedup).
    QueryDef(
      "q_dup_span_coverage",
      Some(s"""
        WITH $toksCte, pg AS (
          SELECT doc_id, unnest(
            CASE WHEN len(w) < $ContamK THEN []
                 ELSE list_transform(range(len(w) - ${ContamK - 1}),
                        i -> ${gramExpr(ContamK, "chr(1)")})
            END) AS g
          FROM toks
        ), rep AS (
          SELECT g, 1 AS hit FROM (
            SELECT g, count(DISTINCT doc_id) AS df FROM pg GROUP BY 1)
          WHERE df > 1
        ), counted AS (
          SELECT pg.doc_id, count(*) AS n_pos, count(rep.hit) AS n_dup
          FROM pg LEFT JOIN rep USING (g)
          GROUP BY 1
        )
        SELECT d.doc_id,
          coalesce(n_pos, 0) AS n_pos,
          coalesce(n_dup, 0) AS n_dup,
          CASE WHEN coalesce(n_pos, 0) = 0 THEN 0.0
               ELSE n_dup * 1.0 / n_pos END AS coverage
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN counted USING (doc_id)
        ORDER BY doc_id
      """.trim),
      "X34 cross-doc duplicate n-gram span coverage")(
      (spark, dir) => {
        import spark.implicits._
        Contamination.duplicateSpanCoverage(
            table(spark, dir, "documents"), "doc_id", "text", ContamK)
          .orderBy($"doc_id")
      }),

    // X35: Gopher-style repetition signals — type-token ratio, top
    // token share, duplicate-bigram fraction.
    QueryDef(
      "q_repetition_stats",
      Some(s"""
        WITH $toksCte, tc AS (
          SELECT doc_id, unnest(w) AS t FROM toks
        ), uni AS (
          SELECT doc_id, sum(cnt) AS n_tokens, count(*) AS n_distinct,
                 max(cnt) AS top_cnt
          FROM (SELECT doc_id, t, count(*) AS cnt FROM tc GROUP BY 1, 2)
          GROUP BY 1
        ), bt AS (
          SELECT doc_id, unnest(
            CASE WHEN len(w) < 2 THEN []
                 ELSE list_transform(range(len(w) - 1),
                        i -> w[i+1] || ' ' || w[i+2])
            END) AS b
          FROM toks
        ), bi AS (
          SELECT doc_id, sum(cnt) AS n_bi, count(*) AS n_bi_d
          FROM (SELECT doc_id, b, count(*) AS cnt FROM bt GROUP BY 1, 2)
          GROUP BY 1
        )
        SELECT uni.doc_id, n_tokens, n_distinct,
          n_distinct * 1.0 / n_tokens AS ttr,
          top_cnt * 1.0 / n_tokens AS top_frac,
          coalesce(1.0 - n_bi_d * 1.0 / n_bi, 0.0) AS dup_bigram_frac
        FROM uni LEFT JOIN bi USING (doc_id)
        ORDER BY doc_id
      """.trim),
      "X35 repetition quality signals (ttr / top token / dup bigrams)")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.repetitionStats(
            table(spark, dir, "documents"), "doc_id", "text")
          .orderBy($"doc_id")
      }),

    // X36: deterministic training-order shuffle — md5 shard + in-
    // shard rank, reproduced verbatim by the oracle.
    QueryDef(
      "q_shuffle_shards",
      Some(s"""
        WITH h AS (
          SELECT doc_id,
            md5('$ShuffleSalt' || CAST(doc_id AS VARCHAR)) AS dg,
            CAST(('0x' || substr(md5('$ShuffleSalt' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % $ShuffleShards AS shard
          FROM documents
        )
        SELECT doc_id, shard,
          row_number() OVER (PARTITION BY shard
                             ORDER BY dg, CAST(doc_id AS VARCHAR)) AS pos
        FROM h
        ORDER BY doc_id
      """.trim),
      "X36 deterministic epoch shuffle: md5 shard + in-shard rank")(
      (spark, dir) => {
        import spark.implicits._
        val keyed = table(spark, dir, "documents")
          .select($"doc_id", $"doc_id".cast("string").as("k"))
        CorpusOps.deterministicShuffle(keyed, "k", ShuffleShards, ShuffleSalt)
          .select($"doc_id", $"shard", $"pos")
          .orderBy($"doc_id")
      }),
  )
}
