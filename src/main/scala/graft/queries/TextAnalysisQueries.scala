package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef.table

/** Text-analysis contract queries (north star X3/X4) over `documents`
  * and `events`: language-ID, quality scoring, token counting,
  * fingerprinting, distinct-count surfaces.
  *
  * Everything here is a pure Column expression tree (no UDFs) with an
  * exact DuckDB oracle; per-doc work is embarrassingly parallel and
  * aggregations are partial-agg friendly, so all queries scale
  * linearly with document count.
  */
object TextAnalysisQueries {

  /** Tiny per-language stopword lists for the n-gram/stopword-hit
    * language-ID heuristic. Deliberately small and deterministic —
    * the operator contract is the scoring machinery, not lexicon
    * quality.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "est", "que", "pour", "dans"),
    "es" -> Seq("el", "los", "las", "y", "una", "es", "por", "con", "del", "para"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
  )

  private def toks(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  private def hits(text: Column, words: Seq[String]): Column =
    size(filter(toks(text), t => t.isin(words.map(lit): _*)))

  private[queries] def hitsSql(words: Seq[String]): String = {
    val set = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''), t -> t IN ($set)))"
  }

  /** "BPE-ish" token regex: letter runs, digit runs, single other
    * non-space chars — a cheap deterministic proxy for subword
    * tokenizer cost accounting.
    */
  val BpeRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  val FingerprintMod = 1000000007L

  val defs: Seq[QueryDef] = Seq(

    // X3a: language ID — stopword-hit scores per language, argmax
    // with a fixed preference order for ties.
    QueryDef(
      "q_lang_id", {
        val scores = Stopwords.map { case (l, ws) =>
          s"${hitsSql(ws)} AS s_$l"
        }.mkString(",\n            ")
        Some(s"""
        WITH scored AS (
          SELECT doc_id, lang,
            $scores
          FROM documents
        )
        SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh,
          CASE
            WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
            WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
            WHEN s_es >= s_zh THEN 'es'
            ELSE 'zh'
          END AS predicted
        FROM scored
        ORDER BY doc_id
      """.trim)
      },
      "X3 stopword-hit language identification")(
      (spark, dir) => {
        import spark.implicits._
        val scored = table(spark, dir, "documents")
          .select(Seq($"doc_id", $"lang") ++ Stopwords.map { case (l, ws) =>
            hits($"text", ws).as(s"s_$l")
          }: _*)
        val predicted =
          when($"s_en" >= $"s_de" && $"s_en" >= $"s_fr" &&
               $"s_en" >= $"s_es" && $"s_en" >= $"s_zh", "en")
          .when($"s_de" >= $"s_fr" && $"s_de" >= $"s_es" && $"s_de" >= $"s_zh", "de")
          .when($"s_fr" >= $"s_es" && $"s_fr" >= $"s_zh", "fr")
          .when($"s_es" >= $"s_zh", "es")
          .otherwise("zh")
        scored.withColumn("predicted", predicted).orderBy($"doc_id")
      }),

    // X3b: quality scoring — length, alpha ratio, stopword ratio,
    // mean token length, composite score. All ratios exact rationals
    // rounded at 6 digits on both sides.
    QueryDef(
      "q_quality_score",
      Some(s"""
        WITH t AS (
          SELECT doc_id,
            list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w,
            length(text) AS n_chars,
            length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_alnum,
            ${hitsSql(Stopwords.head._2)} AS stop_hits
          FROM documents
        )
        SELECT doc_id, len(w) AS n_tokens,
          round(list_sum(list_transform(w, x -> CAST(length(x) AS BIGINT))) * 1.0
                / len(w), 6) AS avg_token_len,
          round(n_alnum * 1.0 / n_chars, 6) AS alpha_ratio,
          round(stop_hits * 1.0 / len(w), 6) AS stopword_ratio,
          round(0.4 * least(len(w) / 100.0, 1.0)
                + 0.3 * (n_alnum * 1.0 / n_chars)
                + 0.3 * least(3 * stop_hits * 1.0 / len(w), 1.0), 6) AS quality
        FROM t
        ORDER BY doc_id
      """.trim),
      "X3 document quality scoring (length/alpha/stopword ratios)")(
      (spark, dir) => {
        import spark.implicits._
        val w = toks($"text")
        val nAlnum = length(regexp_replace($"text", "[^A-Za-z0-9]", ""))
        val stopHits = hits($"text", Stopwords.head._2)
        table(spark, dir, "documents")
          .select($"doc_id", w.as("w"), length($"text").as("n_chars"),
            nAlnum.as("n_alnum"), stopHits.as("stop_hits"))
          .select(
            $"doc_id",
            size($"w").as("n_tokens"),
            round(aggregate($"w", lit(0L), (acc, t) => acc + length(t))
              .cast("double") / size($"w"), 6).as("avg_token_len"),
            round($"n_alnum".cast("double") / $"n_chars", 6).as("alpha_ratio"),
            round($"stop_hits".cast("double") / size($"w"), 6)
              .as("stopword_ratio"),
            round(lit(0.4) * least(size($"w") / 100.0, lit(1.0))
              + lit(0.3) * ($"n_alnum".cast("double") / $"n_chars")
              + lit(0.3) * least(lit(3) * $"stop_hits".cast("double") / size($"w"),
                  lit(1.0)), 6).as("quality"))
          .orderBy($"doc_id")
      }),

    // X3c: token counting — whitespace tokens vs BPE-ish regex pieces
    // (letter runs / digit runs / single punctuation marks).
    QueryDef(
      "q_token_count",
      Some(s"""
        SELECT doc_id,
          len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS ws_tokens,
          len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
        FROM documents
        ORDER BY doc_id
      """.trim),
      "X3 whitespace + BPE-ish token counting")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "documents")
          .select($"doc_id",
            size(filter(split($"text", "\\s+"), t => t =!= "")).as("ws_tokens"),
            size(regexp_extract_all($"text", lit(BpeRegex), lit(0)))
              .as("bpe_tokens"))
          .orderBy($"doc_id")
      }),

    // X3d: document fingerprinting — order-sensitive polynomial
    // rolling hash (base 31, mod 1e9+7) over the canonicalized text's
    // codepoints. A sequential fold on both sides: Spark `aggregate`
    // with init 0 ≡ DuckDB `list_reduce` (first element as seed,
    // since (0*31 + c₁) = c₁).
    QueryDef(
      "q_fingerprint",
      Some(s"""
        WITH c AS (
          SELECT doc_id,
            list_transform(
              regexp_extract_all(regexp_replace(lower(text), '\\s+', ' ', 'g'), '.'),
              ch -> CAST(unicode(ch) AS BIGINT)) AS codes
          FROM documents
        )
        SELECT doc_id,
          CASE WHEN len(codes) = 0 THEN 0
               ELSE list_reduce(codes, (a, b) -> (a * 31 + b) % $FingerprintMod)
          END AS fingerprint
        FROM c
        ORDER BY doc_id
      """.trim),
      "X3 rolling-hash document fingerprint")(
      (spark, dir) => {
        import spark.implicits._
        val canon = regexp_replace(lower($"text"), "\\s+", " ")
        val codes = transform(
          filter(split(canon, ""), ch => ch =!= ""),
          ch => ascii(ch).cast("long"))
        table(spark, dir, "documents")
          .select($"doc_id",
            aggregate(codes, lit(0L),
              (acc, c) => (acc * 31 + c) % FingerprintMod).as("fingerprint"))
          .orderBy($"doc_id")
      }),

    // X3e: the composed cleaning stage (CorpusOps.cleanCorpus) —
    // exact-dup canonicalization + length gate + quality gate +
    // language allowlist in one pass, each doc annotated with its
    // first failing rule. Quality and lang-ID math is identical to
    // q_quality_score / q_lang_id (already hash-green), the dup
    // window groups by a content hash on both sides (different hash
    // functions, same partition of docs — output only consumes group
    // membership), so the whole stage oracles exactly.
    QueryDef(
      "q_corpus_clean", {
        val scores = Stopwords.map { case (l, ws) =>
          s"${hitsSql(ws)} AS s_$l"
        }.mkString(",\n            ")
        Some(s"""
        WITH t AS (
          SELECT doc_id, text,
            list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w,
            length(text) AS n_chars,
            length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_alnum,
            $scores
          FROM documents
        ), m AS (
          SELECT doc_id,
            len(w) AS n_tokens,
            0.4 * least(len(w) / 100.0, 1.0)
              + 0.3 * (n_alnum * 1.0 / n_chars)
              + 0.3 * least(3 * s_en * 1.0 / len(w), 1.0) AS quality,
            CASE
              WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
              WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
              WHEN s_es >= s_zh THEN 'es'
              ELSE 'zh'
            END AS predicted,
            doc_id = min(doc_id) OVER (PARTITION BY md5(lower(text)))
              AS is_canonical
          FROM t
        ), r AS (
          SELECT *,
            CASE WHEN NOT is_canonical THEN 'duplicate'
                 WHEN n_tokens < 25 THEN 'too_short'
                 WHEN quality < 0.5 THEN 'low_quality'
                 WHEN predicted NOT IN ('en', 'de', 'fr', 'es')
                   THEN 'language'
            END AS reject_reason
          FROM m
        )
        SELECT doc_id, n_tokens, round(quality, 6) AS quality, predicted,
          CAST(is_canonical AS INTEGER) AS is_canonical,
          coalesce(reject_reason, 'kept') AS verdict,
          CAST(reject_reason IS NULL AS INTEGER) AS kept
        FROM r
        ORDER BY doc_id
      """.trim)
      },
      "X3 composed corpus cleaning: dedup + length + quality + language")(
      (spark, dir) => {
        import spark.implicits._
        import graft.operators.CorpusOps
        CorpusOps.cleanCorpus(table(spark, dir, "documents"), "doc_id",
            "text", Stopwords, keepLangs = Seq("en", "de", "fr", "es"),
            minTokens = 25, minQuality = 0.5)
          .select($"doc_id", $"n_tokens",
            round($"quality", 6).as("quality"), $"predicted",
            $"is_canonical".cast("int").as("is_canonical"),
            coalesce($"reject_reason", lit("kept")).as("verdict"),
            $"kept".cast("int").as("kept"))
          .orderBy($"doc_id")
      }),

    // X4a: exact distinct users per event type (oracle-checked twin
    // of the HLL query below).
    QueryDef(
      "q_distinct_users",
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """.trim),
      "X4 exact distinct users per event_type")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.events(spark, dir)
          .groupBy($"event_type")
          .agg(countDistinct($"user_id").as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy($"event_type")
      }),

    // X4b: HyperLogLog distinct — the 100 TB path (constant memory
    // per group vs countDistinct's exact shuffle). Sketch values are
    // engine-specific → rows-only driver check; ApproxSpec bounds the
    // error against the exact twin.
    QueryDef(
      "q_approx_distinct_users",
      None,
      "X4 approx_count_distinct (HLL) users per event_type")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.events(spark, dir)
          .groupBy($"event_type")
          .agg(approx_count_distinct($"user_id", 0.01).as("n_users_approx"),
            count(lit(1)).as("n_events"))
          .orderBy($"event_type")
      }),

    // X83: the Gopher/MassiveText hard-threshold quality rules as one
    // codegen'd pass — hard booleans + conjunction `keep`, vs
    // q_quality_score's soft blend. Every metric is a ratio of exact
    // integers and every threshold comparison is in multiplied-out
    // integer×double form, identical in both engines.
    QueryDef(
      "q_gopher_rules",
      Some("""
        WITH t AS (
          SELECT doc_id,
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w,
            length(regexp_replace(text, '[^#]', '', 'g'))
              + len(regexp_extract_all(text, '\.\.\.|…')) AS symbols,
            string_split(text, chr(10)) AS l
          FROM documents
        ), m AS (
          SELECT doc_id,
            len(w) AS n_words,
            list_sum(list_transform(w, x -> CAST(length(x) AS BIGINT))) AS wchars,
            symbols,
            len(list_filter(l, x -> starts_with(trim(x), '•')
              OR starts_with(trim(x), '- ')
              OR starts_with(trim(x), '* '))) AS bullets,
            len(list_filter(l, x -> ends_with(x, '...')
              OR ends_with(x, '…'))) AS ellipses,
            len(l) AS nlines,
            len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS alpha,
            len(list_intersect(list_distinct(w),
              ['the','be','to','of','and','that','have','with','a','in']))
              AS stop_hits
          FROM t
        )
        SELECT doc_id, n_words,
          round(CAST(wchars AS DOUBLE) / n_words, 6) AS mean_word_len,
          round(CAST(symbols AS DOUBLE) / n_words, 6) AS symbol_ratio,
          round(CAST(bullets AS DOUBLE) / nlines, 6) AS bullet_ratio,
          round(CAST(ellipses AS DOUBLE) / nlines, 6) AS ellipsis_ratio,
          round(CAST(alpha AS DOUBLE) / n_words, 6) AS alpha_word_ratio,
          stop_hits,
          (n_words >= 50 AND n_words <= 100000) AS pass_words,
          (wchars >= n_words * 3.0 AND wchars <= n_words * 10.0)
            AS pass_word_len,
          (symbols <= n_words * 0.1) AS pass_symbols,
          (bullets <= nlines * 0.9 AND ellipses <= nlines * 0.3)
            AS pass_lines,
          (alpha >= n_words * 0.8) AS pass_alpha,
          (stop_hits >= 2) AS pass_stopwords,
          ((n_words >= 50 AND n_words <= 100000)
           AND (wchars >= n_words * 3.0 AND wchars <= n_words * 10.0)
           AND (symbols <= n_words * 0.1)
           AND (bullets <= nlines * 0.9 AND ellipses <= nlines * 0.3)
           AND (alpha >= n_words * 0.8)
           AND (stop_hits >= 2)) AS keep
        FROM m
        ORDER BY doc_id
      """.trim),
      "X83 Gopher hard-threshold quality rule suite")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.CorpusOps.gopherRules(
            table(spark, dir, "documents"), "doc_id", "text")
          .orderBy($"doc_id")
      }),
  )
}
