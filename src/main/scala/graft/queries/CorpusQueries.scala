package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps
import graft.queries.QueryDef.table

/** Corpus-preparation contract queries (training-data pipeline
  * operators beyond the reference surface): deterministic content
  * sampling and token-budget sharding over `documents`.
  */
object CorpusQueries {

  val SampleFraction = 0.2
  val SampleSalt = "s1"
  val ShardBudget = 2000L

  val defs: Seq[QueryDef] = Seq(

    // Deterministic md5 content sampling — reproducible, content-
    // stable, nested across fractions; the DuckDB oracle evaluates
    // the IDENTICAL predicate, proving cross-engine determinism.
    QueryDef(
      "q_hash_sample",
      Some(s"""
        SELECT doc_id, lang
        FROM documents
        WHERE CAST(('0x' || substr(md5('$SampleSalt' || text), 1, 8)) AS BIGINT)
              < ${math.round(SampleFraction * 4294967296.0)}
        ORDER BY doc_id
      """.trim),
      "Deterministic md5-hash corpus sampling (content-stable)")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.hashSample(table(spark, dir, "documents"),
            "text", SampleFraction, SampleSalt)
          .select($"doc_id", $"lang")
          .orderBy($"doc_id")
      }),

    // Stratified sampling — per-language keep fractions (downsample
    // high-resource, keep all low-resource, drop unlisted), same md5
    // determinism; the oracle evaluates the identical per-stratum
    // predicate.
    QueryDef(
      "q_stratified_sample",
      Some(s"""
        SELECT doc_id, lang
        FROM documents
        WHERE CAST(('0x' || substr(md5('$SampleSalt' || text), 1, 8)) AS BIGINT)
              < CASE lang
                  WHEN 'en' THEN ${math.round(0.1 * 4294967296.0)}
                  WHEN 'de' THEN ${math.round(0.5 * 4294967296.0)}
                  WHEN 'zh' THEN ${math.round(1.0 * 4294967296.0)}
                  ELSE 0 END
        ORDER BY doc_id
      """.trim),
      "Stratified deterministic sampling with per-language fractions")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.stratifiedSample(table(spark, dir, "documents"),
            "text", "lang",
            Map("en" -> 0.1, "de" -> 0.5, "zh" -> 1.0), SampleSalt)
          .select($"doc_id", $"lang")
          .orderBy($"doc_id")
      }),

    // Token-budget sharding: pack each language's documents (doc_id
    // order) into ~2000-token training shards — one window pass.
    QueryDef(
      "q_token_shards",
      Some(s"""
        WITH counted AS (
          SELECT doc_id, lang,
                 len(list_filter(string_split_regex(text, '\\s+'),
                     t -> t <> '')) AS n_tokens
          FROM documents
        )
        SELECT doc_id, lang, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
                 ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before,
               CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
                 ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) // $ShardBudget AS BIGINT) AS shard_id
        FROM counted
        ORDER BY doc_id
      """.trim),
      "Token-budget training-shard assignment per language")(
      (spark, dir) => {
        import spark.implicits._
        val counted = table(spark, dir, "documents")
          .select($"doc_id", $"lang",
            size(filter(split($"text", "\\s+"), t => t =!= ""))
              .cast("long").as("n_tokens"))
        CorpusOps.tokenShards(counted, "lang", "doc_id", "n_tokens",
            ShardBudget)
          .select($"doc_id", $"lang", $"n_tokens", $"tokens_before",
            $"shard_id")
          .orderBy($"doc_id")
      }),
  )
}
