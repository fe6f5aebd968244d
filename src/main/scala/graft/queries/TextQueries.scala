package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NumToWords, TextFunctions => TF}
import graft.queries.QueryDef.table

/** Text-pipeline contract queries over the `documents` table: the
  * reference's tokenize / normalize / word-coverage operators
  * (SURVEY.md §2 P1, P2, P3, P5, A1/W5).
  */
object TextQueries {

  val defs: Seq[QueryDef] = Seq(

    // A1+W5: word-frequency coverage, whitespace tokens lowercased FIRST
    // (batch_processor.py:28 `text.lower().split()` — NOT the P1 regex),
    // ordered by (count asc, word asc) (batch_processor.py:34–35).
    QueryDef(
      "q_word_coverage",
      Some("""
        SELECT word, count(*) AS cnt
        FROM (
          SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
          FROM documents
        )
        WHERE word <> ''
        GROUP BY word
        ORDER BY cnt, word
      """.trim),
      "A1/W5 word coverage (batch_processor.py:17–37)")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "documents")
          .select(explode(split(lower($"text"), "\\s+")).as("word"))
          .filter($"word" =!= "")
          .groupBy($"word").agg(count(lit(1)).as("cnt"))
          .orderBy($"cnt", $"word")
      }),

    // P1: regex tokenizer [A-Za-z0-9'-]+ (claude_research_optimal.py:30,82).
    QueryDef(
      "q_tokenize",
      Some("""
        SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9''-]+')) AS token
        FROM documents
        ORDER BY doc_id, token
      """.trim),
      "P1 tokenize_text_to_words (claude_research_optimal.py:82–83)")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "documents")
          .select($"doc_id", explode(TF.tokenizeCol($"text")).as("token"))
          .orderBy($"doc_id", $"token")
      }),

    // P2 (sans digit branch): normalize_word chain, NULL when empty.
    QueryDef(
      "q_normalize",
      Some("""
        SELECT doc_id, token,
               nullif(replace(replace(regexp_replace(lower(trim(token)),
                 '[^a-z0-9''-]', '', 'g'), '''', ''), '-', ''), '') AS norm
        FROM (
          SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9''-]+')) AS token
          FROM documents
        )
        ORDER BY doc_id, token
      """.trim),
      "P2 normalize_word sans numbers_to_words (claude_research_optimal.py:66–80)")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "documents")
          .select($"doc_id", explode(TF.tokenizeCol($"text")).as("token"))
          .select($"doc_id", $"token", TF.normalizeCol($"token").as("norm"))
          .orderBy($"doc_id", $"token")
      }),

    // P3: integer → English words, as a native codegen Expression
    // registered through SparkSessionExtensions (beats a Scala UDF:
    // no serialization, stays in whole-stage codegen, folds
    // constants). r8: upgraded from rows-only to a FULL hash oracle —
    // the DuckDB twin reconstructs the reference algorithm
    // independently (chunk decomposition + word-list lookups +
    // separator-free concatenation, the normalize_word quirk), so the
    // codegen Expression verifies end-to-end. trunc() before the
    // BIGINT cast mirrors Spark's truncate-toward-zero double→long.
    QueryDef(
      "q_num_to_words",
      Some("""
        WITH nums AS (
          SELECT DISTINCT n FROM (
            SELECT p_partkey AS n FROM part
            UNION ALL
            SELECT CAST(trunc(o_totalprice) AS BIGINT) FROM orders
          )
        ), chunks AS (
          SELECT n, i, CAST((abs(n) // p) % 1000 AS INTEGER) AS c
          FROM nums, (VALUES (0, CAST(1 AS BIGINT)),
                             (1, CAST(1000 AS BIGINT)),
                             (2, CAST(1000000 AS BIGINT)),
                             (3, CAST(1000000000 AS BIGINT))) AS u(i, p)
        ), segs AS (
          SELECT n, i,
            (CASE WHEN c >= 100 THEN
              ['zero','one','two','three','four','five','six','seven',
               'eight','nine','ten','eleven','twelve','thirteen',
               'fourteen','fifteen','sixteen','seventeen','eighteen',
               'nineteen'][c // 100 + 1] || 'hundred' ELSE '' END)
            || (CASE WHEN c % 100 >= 20 THEN
                  ['','','twenty','thirty','forty','fifty','sixty',
                   'seventy','eighty','ninety'][(c % 100) // 10 + 1] ||
                  (CASE WHEN c % 10 > 0 THEN
                    ['zero','one','two','three','four','five','six',
                     'seven','eight','nine','ten','eleven','twelve',
                     'thirteen','fourteen','fifteen','sixteen',
                     'seventeen','eighteen','nineteen'][c % 10 + 1]
                   ELSE '' END)
                 WHEN c % 100 > 0 THEN
                  ['zero','one','two','three','four','five','six',
                   'seven','eight','nine','ten','eleven','twelve',
                   'thirteen','fourteen','fifteen','sixteen',
                   'seventeen','eighteen','nineteen'][c % 100 + 1]
                 ELSE '' END)
            || (['','thousand','million','billion'][i + 1]) AS seg
          FROM chunks WHERE c <> 0
        ), agg AS (
          SELECT n, string_agg(seg, '' ORDER BY i DESC) AS w
          FROM segs GROUP BY n
        )
        SELECT nums.n AS n,
               CASE WHEN nums.n = 0 THEN 'zero'
                    WHEN nums.n < 0 THEN 'minus' || coalesce(a.w, '')
                    ELSE coalesce(a.w, '') END AS words
        FROM nums LEFT JOIN agg a ON nums.n = a.n
        ORDER BY nums.n
      """.trim),
      "P3 _num_to_words as codegen Expression (claude_research_optimal.py:37–64)")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "part")
          .select($"p_partkey".as("n")).distinct()
          .union(table(spark, dir, "orders").select($"o_totalprice".cast("long").as("n")).distinct())
          .distinct()
          .select($"n", call_function("num_to_words", $"n").as("words"))
          .orderBy($"n")
      }),

    // P5: phoneme-aware tail extension over distinct document tokens.
    QueryDef(
      "q_phoneme_ext",
      Some("""
        SELECT token,
          CASE
            WHEN length(token) < 3 THEN 0
            WHEN right(token, 3) = 'ing' THEN 60
            WHEN right(token, 1) IN ('s','z','x','f','v') THEN 50
            WHEN right(token, 1) IN ('t','d','k','p','n','m','g') THEN 40
            WHEN right(token, 2) IN ('ce','se','ze','ge','ch','sh','th','ng') THEN 50
            ELSE 0
          END AS ext_ms
        FROM (
          SELECT DISTINCT lower(unnest(regexp_extract_all(text, '[A-Za-z0-9''-]+'))) AS token
          FROM documents
        )
        ORDER BY token
      """.trim),
      "P5 phoneme tail extension, live branches (claude_research_optimal.py:557–582)")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "documents")
          .select(explode(TF.tokenizeCol($"text")).as("t0"))
          .select(lower($"t0").as("token")).distinct()
          .select($"token", TF.phonemeExtensionCol($"token").as("ext_ms"))
          .orderBy($"token")
      }),

    // P4: confidence-adaptive guard; synthetic confidence derived
    // deterministically from event_id so the oracle can reproduce it.
    QueryDef(
      "q_adaptive_guard",
      Some("""
        SELECT event_id, conf,
          CASE
            WHEN conf > 0.75 THEN CAST(floor(35 * 0.7) AS BIGINT)
            WHEN conf < 0.6  THEN CAST(floor(35 * 1.3) AS BIGINT)
            ELSE 35
          END AS guard_ms
        FROM (
          SELECT event_id, CAST(event_id % 100 AS DOUBLE) / 100.0 AS conf
          FROM events
        )
        ORDER BY event_id
      """.trim),
      "P4 compute_adaptive_guard (claude_research_optimal.py:374–386)")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.events(spark, dir)
          .select($"event_id",
            (($"event_id" % 100).cast("double") / 100.0).as("conf"))
          .select($"event_id", $"conf",
            TF.adaptiveGuardCol($"conf", lit(35)).as("guard_ms"))
          .orderBy($"event_id")
      }),

    // P6: float-seconds → int-millis with banker's rounding
    // (Python round ≡ Spark bround ≡ DuckDB round_even).
    QueryDef(
      "q_sec_to_ms",
      Some("""
        SELECT event_id, CAST(round_even(value * 1000, 0) AS BIGINT) AS ms
        FROM events
        ORDER BY event_id
      """.trim),
      "P6 int(round(x*1000)) HALF_EVEN (claude_research_optimal.py:318 etc.)")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.events(spark, dir)
          .select($"event_id", TF.secToMsCol($"value").as("ms"))
          .orderBy($"event_id")
      }),
  )
}
