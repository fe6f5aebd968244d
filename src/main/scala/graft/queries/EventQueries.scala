package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.Sessionize

/** Window / sessionization / aggregation contract queries over the
  * `events` table, modeling the reference's ordered-stream operators
  * (SURVEY.md §2.4–2.6): per-user event streams stand in for per-doc
  * word streams. Synthetic confidences are derived deterministically
  * from event_id so DuckDB oracles can reproduce them.
  */
object EventQueries {

  /** conf ∈ [0,1): deterministic stand-in for ASR word confidence. */
  private def confCol = (col("event_id") % 100).cast("double") / 100.0
  private val confSql = "CAST(event_id % 100 AS DOUBLE) / 100.0"

  val defs: Seq[QueryDef] = Seq(

    // W2: gap-bridging session merge — dual predicate (sequence gap AND
    // time gap) exactly as merge_with_small_gaps: stay in the session
    // while id-gap<=20 AND time-gap<=3600s; boundary otherwise
    // (claude_research_optimal.py:298-301). Lag → flag → running sum;
    // the streaming analog is session_window (graft.streaming).
    QueryDef(
      "q_session_merge",
      Some("""
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
            CASE WHEN lag(event_id) OVER w IS NULL THEN 1
                 WHEN event_id - lag(event_id) OVER w > 20
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                 THEN 1 ELSE 0 END AS boundary
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts, event_id, value,
            CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM flagged
        )
        SELECT user_id, session_id, count(*) AS n_events,
               min(event_id) AS first_event, max(event_id) AS last_event,
               round(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE), 3) AS sum_value
        FROM sessions
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
      """.trim),
      "W2 merge_with_small_gaps dual-predicate sessionization (claude_research_optimal.py:291-305)")(
      (spark, dir) => {
        import spark.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val gapN = $"event_id" - lag($"event_id", 1).over(w)
        val gapT = unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))
        val boundary = lag($"event_id", 1).over(w).isNull ||
          gapN > 20 || gapT > 3600000000L
        QueryDef.events(spark, dir)
          .withColumn("session_id",
            Sessionize.sessionId(Seq($"user_id"), Seq($"ts", $"event_id"), boundary))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"),
            min($"event_id").as("first_event"),
            max($"event_id").as("last_event"),
            // Decimal sum: Spark's unordered partial aggregation and DuckDB
            // sum doubles in different orders; decimal is order-independent.
            round(sum($"value".cast("decimal(20,6)")).cast("double"), 3)
              .as("sum_value"))
          .orderBy($"user_id", $"session_id")
      }),

    // W2 reference-exact mergeWithSmallGaps over an EqualRun-shaped
    // derivation of `events`: each user's events are a word stream
    // (idx = rank by ts, start/end from the timestamp/value); "kept"
    // events (value >= 50, the reference's aligned words) form
    // maximal consecutive-index runs, and the operator bridges runs
    // while BOTH the word gap (<= 3 dropped words) and the time gap
    // (asr[next.ai0].start - asr[prev.ai1-1].end <= 3 days) are small
    // — the dual predicate of claude_research_optimal.py:298-301,
    // with boundary times fetched from the full word stream exactly
    // like the operator's two equi-joins.
    QueryDef(
      "q_run_merge",
      Some("""
        WITH indexed AS (
          SELECT user_id, value,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
            epoch_us(ts) / 1000000.0 AS s
          FROM events
        ), kept AS (
          SELECT user_id, i, s, s + value / 1000.0 AS e,
            i - (row_number() OVER (PARTITION BY user_id ORDER BY i) - 1) AS island
          FROM indexed WHERE value >= 50.0
        ), runs AS (
          SELECT user_id, min(i) AS ai0, max(i) + 1 AS ai1,
                 arg_min(s, i) AS start_time, arg_max(e, i) AS end_time
          FROM kept GROUP BY user_id, island
        ), flagged AS (
          SELECT user_id, ai0, ai1, start_time, end_time,
            CASE WHEN lag(ai1) OVER w IS NULL
                 OR ai0 - lag(ai1) OVER w > 3
                 OR start_time - lag(end_time) OVER w > 259200.0
            THEN 1 ELSE 0 END AS boundary
          FROM runs
          WINDOW w AS (PARTITION BY user_id ORDER BY ai0)
        )
        SELECT user_id AS doc_id,
          CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ai0
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
            AS group_id,
          ai0 AS bi0, ai1 AS bi1, ai0, ai1,
          round(start_time, 6) AS start_time, round(end_time, 6) AS end_time
        FROM flagged
        ORDER BY doc_id, ai0
      """.trim),
      "W2 reference-exact run merge w/ boundary-word times (claude_research_optimal.py:291-305)")(
      (spark, dir) => {
        import spark.implicits._
        import graft.core.{AsrWord, EqualRun}
        val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val indexed = QueryDef.events(spark, dir)
          .select($"user_id", $"ts", $"event_id", $"value")
          .withColumn("i", (row_number().over(wOrd) - 1).cast("long"))
          .withColumn("s", unix_micros($"ts") / 1000000.0)
          .withColumn("e", $"s" + $"value" / 1000.0)
        val asr = indexed.select($"user_id".as("doc_id"), $"i".as("idx"),
          lit("w").as("text"), lit("w").as("norm"),
          $"s".as("start"), $"e".as("end"),
          lit(0.9).as("confidence")).as[AsrWord]
        val wKept = Window.partitionBy($"user_id").orderBy($"i")
        val runs = indexed.filter($"value" >= 50.0)
          .withColumn("island",
            $"i" - (row_number().over(wKept) - 1).cast("long"))
          .groupBy($"user_id", $"island")
          .agg(min($"i").as("ai0"), (max($"i") + 1L).as("ai1"))
          .select($"user_id".as("doc_id"), $"ai0".as("bi0"),
            $"ai1".as("bi1"), $"ai0", $"ai1").as[EqualRun]
        Sessionize.mergeWithSmallGaps(runs, asr,
            maxGapWords = 3, maxGapTime = 259200.0)
          .toDF()
          .select($"doc_id", $"group_id", $"bi0", $"bi1", $"ai0", $"ai1",
            round($"start_time", 6).as("start_time"),
            round($"end_time", 6).as("end_time"))
          .orderBy($"doc_id", $"ai0")
      }),

    // W3+P4+P5+P6+P7 composite: full boundary math over a per-user
    // ordered stream — start pads + prev-word guard, end pads + adaptive
    // next-word clamp + phoneme extension + e<=s clamp, replicating the
    // reference order of operations (claude_research_optimal.py:525-585).
    QueryDef(
      "q_boundaries",
      Some(s"""
        WITH words AS (
          SELECT event_id, user_id, ts, event_type,
            epoch_us(ts) / 1000 AS start_ms0,
            epoch_us(ts) / 1000 + CAST(round_even(value * 10, 0) AS BIGINT) AS end_ms0,
            $confSql AS conf
          FROM events
        ), guarded AS (
          SELECT event_id, user_id, event_type, conf, start_ms0, end_ms0,
            lag(end_ms0) OVER w AS prev_end_ms,
            lead(start_ms0) OVER w AS next_start_ms
          FROM words
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), bounds AS (
          SELECT event_id, user_id,
            CASE WHEN prev_end_ms IS NULL THEN greatest(start_ms0 - 150, 0)
                 ELSE greatest(greatest(start_ms0 - 150, 0), prev_end_ms + 10)
            END AS s_ms,
            CASE WHEN next_start_ms IS NULL THEN end_ms0 + 100 + 50
                 ELSE least(end_ms0 + 100 + 50,
                   next_start_ms - (CASE WHEN conf > 0.75 THEN CAST(floor(35*0.7) AS BIGINT)
                                         WHEN conf < 0.6 THEN CAST(floor(35*1.3) AS BIGINT)
                                         ELSE 35 END))
            END
            + (CASE
                 WHEN length(event_type) < 3 THEN 0
                 WHEN right(event_type, 3) = 'ing' THEN 60
                 WHEN right(event_type, 1) IN ('s','z','x','f','v') THEN 50
                 WHEN right(event_type, 1) IN ('t','d','k','p','n','m','g') THEN 40
                 WHEN right(event_type, 2) IN ('ce','se','ze','ge','ch','sh','th','ng') THEN 50
                 ELSE 0
               END) AS e_ms
          FROM guarded
        )
        SELECT event_id, user_id, s_ms,
               CASE WHEN e_ms <= s_ms THEN s_ms + 1 ELSE e_ms END AS e_ms
        FROM bounds
        ORDER BY event_id
      """.trim),
      "W3/P4-P7 boundary guards + phoneme extension (claude_research_optimal.py:525-585)")(
      (spark, dir) => {
        import spark.implicits._
        val startMs0 = (unix_micros($"ts") / 1000L).as("start_ms0")
        // Duration ms = secToMs(value/100 s), algebraically bround(value*10).
        // Use the *same* IEEE expression order as the oracle's
        // round_even(value * 10, 0): (value/100)*1000 differs by an ulp for
        // some inputs, flipping HALF_EVEN at exact-.5 ties.
        val endMs0 = (unix_micros($"ts") / 1000L +
          bround($"value" * 10, 0).cast("long")).as("end_ms0")
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val withWords = QueryDef.events(spark, dir)
          .select($"event_id", $"user_id", $"ts", $"event_type",
            startMs0, endMs0, confCol.as("conf"))
          .withColumn("prev_end_ms", lag($"end_ms0", 1).over(w))
          .withColumn("next_start_ms", lead($"start_ms0", 1).over(w))
        val sMs = when($"prev_end_ms".isNull, greatest($"start_ms0" - 150, lit(0L)))
          .otherwise(greatest(greatest($"start_ms0" - 150, lit(0L)),
            $"prev_end_ms" + 10))
        val eClamped = when($"next_start_ms".isNull, $"end_ms0" + 100 + 50)
          .otherwise(least($"end_ms0" + 100 + 50,
            $"next_start_ms" - TF.adaptiveGuardCol($"conf", lit(35))))
        val eMs = eClamped + TF.phonemeExtensionCol($"event_type")
        withWords
          .withColumn("s_ms", sMs)
          .withColumn("e_ms0", eMs)
          .select($"event_id", $"user_id", $"s_ms",
            when($"e_ms0" <= $"s_ms", $"s_ms" + 1).otherwise($"e_ms0").as("e_ms"))
          .orderBy($"event_id")
      }),

    // W6: deterministic sequential segment numbering of "kept" rows
    // (claude_research_optimal.py:661 `segment_{kept:04d}`).
    QueryDef(
      "q_segment_numbering",
      Some("""
        SELECT event_id, user_id,
               printf('segment_%04d', CAST(row_number() OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT)) AS segment
        FROM events
        WHERE value >= 50.0
        ORDER BY event_id
      """.trim),
      "W6 segment numbering in kept order (claude_research_optimal.py:661)")(
      (spark, dir) => {
        import spark.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        QueryDef.events(spark, dir)
          .filter($"value" >= 50.0)
          .withColumn("segment",
            format_string("segment_%04d", row_number().over(w) - 1))
          .select($"event_id", $"user_id", $"segment")
          .orderBy($"event_id")
      }),

    // A4: argmax longest span with first-in-order tie-breaking
    // (claude_research_optimal.py:504-508) — row_number, NOT max_by,
    // so ties resolve deterministically to the earliest row.
    QueryDef(
      "q_longest_span",
      Some("""
        SELECT user_id, event_id, value
        FROM (
          SELECT user_id, event_id, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY value DESC, ts, event_id) AS rn
          FROM events
        )
        WHERE rn = 1
        ORDER BY user_id
      """.trim),
      "A4 argmax longest span, ties -> first (claude_research_optimal.py:504-508)")(
      (spark, dir) => {
        import spark.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"value".desc, $"ts", $"event_id")
        QueryDef.events(spark, dir)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_id", $"value")
          .orderBy($"user_id")
      }),

    // J3: first-match confidence lookup join — left join on norm +
    // arg_min(ord) replicates the reference's first-match linear scan
    // (claude_research_optimal.py:515-524) in O(n) instead of O(n²).
    QueryDef(
      "q_conf_join",
      Some("""
        WITH lhs AS (
          SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS norm
          FROM documents WHERE doc_id % 2 = 0
        ), rhs AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS norm,
                 doc_id * 100000 + unnest(range(len(regexp_extract_all(lower(text), '[a-z0-9]+')))) AS ord
          FROM documents WHERE doc_id % 2 = 1
        ), rhs_conf AS (
          SELECT norm, ord, CAST(ord % 100 AS DOUBLE) / 100.0 AS conf FROM rhs
        )
        SELECT l.norm, arg_min(r.conf, r.ord) AS conf, count(r.norm) AS n_matches
        FROM lhs l LEFT JOIN rhs_conf r ON l.norm = r.norm
        GROUP BY l.norm
        ORDER BY l.norm
      """.trim),
      "J3 first-match-by-norm confidence join (claude_research_optimal.py:515-524)")(
      (spark, dir) => {
        import spark.implicits._
        val docs = QueryDef.table(spark, dir, "documents")
        val lhs = docs.filter($"doc_id" % 2 === 0)
          .select(explode(regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("norm"))
          .distinct()
        val rhs = docs.filter($"doc_id" % 2 === 1)
          .select($"doc_id", posexplode(regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))))
          .select($"col".as("norm"), ($"doc_id" * 100000 + $"pos").as("ord"))
          .withColumn("conf", ($"ord" % 100).cast("double") / 100.0)
        lhs.join(rhs, Seq("norm"), "left")
          .groupBy(lhs("norm"))
          .agg(min_by($"conf", $"ord").as("conf"),
            count(rhs("norm")).as("n_matches"))
          .orderBy($"norm")
      }),

    // A2+A3: mean confidence, empty group -> 1.0
    // (claude_research_optimal.py:446, 524).
    QueryDef(
      "q_avg_conf",
      Some(s"""
        SELECT user_id,
          round(coalesce(
            CAST(sum(CASE WHEN value > 300
                     THEN CAST($confSql AS DECIMAL(20,6)) END) AS DOUBLE)
              / count(CASE WHEN value > 300 THEN 1 END), 1.0), 6)
            AS span_conf,
          round(CAST(sum(CAST($confSql AS DECIMAL(20,6))) AS DOUBLE)
              / count(*), 6) AS corpus_conf
        FROM events
        GROUP BY user_id
        ORDER BY user_id
      """.trim),
      "A2/A3 mean confidence with empty->1.0 (claude_research_optimal.py:446,524)")(
      (spark, dir) => {
        import spark.implicits._
        // Mean as decimal-sum / count, not avg(double): partial
        // aggregation sums doubles in a different order than DuckDB
        // and the ulp drift flips round-to-6 on large groups (first
        // seen at sf0.1 — sf0.01 passed by luck).
        val confDec = confCol.cast("decimal(20,6)")
        QueryDef.events(spark, dir)
          .groupBy($"user_id")
          .agg(
            round(coalesce(
              sum(when($"value" > 300, confDec)).cast("double")
                / count(when($"value" > 300, lit(1))), lit(1.0)), 6)
              .as("span_conf"),
            round(sum(confDec).cast("double") / count(lit(1)), 6)
              .as("corpus_conf"))
          .orderBy($"user_id")
      }),

    // A5: run summary stats — kept/rejected counts + rejection rate at
    // 2 decimals (claude_research_optimal.py:684-694).
    QueryDef(
      "q_summary_stats",
      Some("""
        SELECT
          CAST(sum(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS exported,
          CAST(sum(CASE WHEN value < 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS rejected,
          round(CAST(CAST(sum(CASE WHEN value < 100.0 THEN 1 ELSE 0 END) AS DECIMAL(20,6))
                     * 100 / count(*) AS DOUBLE), 2)
            AS rejection_rate_pct,
          count(DISTINCT event_type) AS event_types,
          count(DISTINCT user_id) AS users
        FROM events
      """.trim),
      "A5 summary.json stats (claude_research_optimal.py:684-694)")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.events(spark, dir).agg(
          sum(when($"value" >= 100.0, 1).otherwise(0)).as("exported"),
          sum(when($"value" < 100.0, 1).otherwise(0)).as("rejected"),
          // Rate computed in decimal on both sides: integer÷integer in double
          // is not bit-identical across engines at 2-decimal rounding edges.
          round((sum(when($"value" < 100.0, 1).otherwise(0)).cast("decimal(20,6)")
            * 100 / count(lit(1))).cast("double"), 2)
            .as("rejection_rate_pct"),
          countDistinct($"event_type").as("event_types"),
          countDistinct($"user_id").as("users"))
      }),

    // A6/F7: batch roll-up by status (batch_processor.py:142-174).
    QueryDef(
      "q_batch_rollup",
      Some("""
        SELECT o_orderstatus AS status, count(*) AS n,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) / count(*), 4) AS avg_price,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE), 2) AS total_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
      """.trim),
      "A6 batch summary roll-up (batch_processor.py:142-174)")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.table(spark, dir, "orders")
          .groupBy($"o_orderstatus".as("status"))
          .agg(count(lit(1)).as("n"),
            round(sum($"o_totalprice".cast("decimal(20,6)")).cast("double")
              / count(lit(1)), 4).as("avg_price"),
            round(sum($"o_totalprice".cast("decimal(20,6)")).cast("double"), 2)
              .as("total_price"))
          .orderBy($"status")
      }),

    // P10+P11: 2-of-3 threshold vote (claude_research_optimal.py:204-226).
    QueryDef(
      "q_leak_vote",
      Some("""
        SELECT event_id,
               value > 40.0 AS energy_leak,
               (event_id % 7) < 3 AS mfcc_leak,
               (user_id % 2) = 0 AS flux_leak,
               (CAST(value > 40.0 AS INT) + CAST((event_id % 7) < 3 AS INT)
                + CAST((user_id % 2) = 0 AS INT)) >= 2 AS has_leakage
        FROM events
        ORDER BY event_id
      """.trim),
      "P10/P11 2-of-3 leak vote (claude_research_optimal.py:204-226)")(
      (spark, dir) => {
        import spark.implicits._
        val b1 = ($"value" > 40.0).as("energy_leak")
        val b2 = (($"event_id" % 7) < 3).as("mfcc_leak")
        val b3 = (($"user_id" % 2) === 0).as("flux_leak")
        QueryDef.events(spark, dir)
          .select($"event_id", b1, b2, b3,
            TF.majorityVoteCol($"value" > 40.0, ($"event_id" % 7) < 3,
              ($"user_id" % 2) === 0).as("has_leakage"))
          .orderBy($"event_id")
      }),
  )
}
