package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps
import graft.queries.QueryDef.table
import graft.sources.Sources

/** Corpus-preparation contract queries (training-data pipeline
  * operators beyond the reference surface): deterministic content
  * sampling, token-budget sharding, and the declarative data-quality
  * constraint suite over `documents`.
  */
object CorpusQueries {

  val SampleFraction = 0.2
  val SampleSalt = "s1"
  val ShardBudget = 2000L

  val defs: Seq[QueryDef] = Seq(

    // X77: declarative data-quality constraint suite (the Deequ
    // shape) — uniqueness/completeness/range/allowlist expectations
    // in one shared scan, verdicts on the rounded metric so both
    // engines agree bit-for-bit.
    QueryDef(
      "q_constraints",
      Some("""
        WITH s AS (
          SELECT count(*) AS n,
                 count(DISTINCT doc_id) AS u_doc,
                 count(text) AS c_text,
                 count(CASE WHEN n_chars BETWEEN 10 AND 5000
                            THEN 1 END) AS c_range,
                 count(CASE WHEN lang IN ('en','de','es','fr','zh')
                            THEN 1 END) AS c_lang
          FROM documents
        )
        SELECT * FROM (
          SELECT 'doc_id_unique' AS check_name,
                 round(CAST(u_doc AS DOUBLE) / n, 6) AS metric,
                 1.0 AS threshold,
                 round(CAST(u_doc AS DOUBLE) / n, 6) >= 1.0 AS passed
          FROM s
          UNION ALL
          SELECT 'text_complete', round(CAST(c_text AS DOUBLE) / n, 6),
                 1.0, round(CAST(c_text AS DOUBLE) / n, 6) >= 1.0 FROM s
          UNION ALL
          SELECT 'n_chars_range', round(CAST(c_range AS DOUBLE) / n, 6),
                 0.99, round(CAST(c_range AS DOUBLE) / n, 6) >= 0.99 FROM s
          UNION ALL
          SELECT 'lang_allowed', round(CAST(c_lang AS DOUBLE) / n, 6),
                 1.0, round(CAST(c_lang AS DOUBLE) / n, 6) >= 1.0 FROM s
        )
        ORDER BY check_name
      """.trim),
      "X77 Deequ-style constraint suite over documents, one scan")(
      (spark, dir) => {
        import spark.implicits._
        import graft.operators.Constraints
        import graft.operators.Constraints.{Complete, Satisfies, Unique}
        Constraints.check(table(spark, dir, "documents"), Seq(
            Unique("doc_id_unique", "doc_id"),
            Complete("text_complete", "text"),
            Satisfies("n_chars_range",
              $"n_chars".between(10, 5000), 0.99),
            Satisfies("lang_allowed",
              $"lang".isin("en", "de", "es", "fr", "zh"), 1.0)))
          .orderBy($"check_name")
      }),

    // Multimodal audio path with an EXACT oracle: per doc, synthesize
    // a 24-bit STEREO wav container holding the deterministic signal
    // v(i) = (i·31+7) mod 201 − 100 (n_chars samples, both channels
    // equal), push it through the production decoder
    // (Sources.decodeWav: 24-bit → >>8, stereo → average downmix ⇒
    // v(i) back exactly), and aggregate sum-of-squares — an INTEGER,
    // so the engine's container round-trip is value-exact against a
    // DuckDB oracle that never sees a byte of audio. rms derives in
    // one double op chain from exact ints on both sides.
    QueryDef(
      "q_audio_rms",
      Some("""
        WITH s AS (
          SELECT doc_id, greatest(n_chars, 1) AS n FROM documents
        ), e AS (
          SELECT doc_id, n, unnest(range(n)) AS i FROM s
        )
        SELECT doc_id, n AS n_samples,
               CAST(sum(CAST(((i * 31 + 7) % 201 - 100)
                 * ((i * 31 + 7) % 201 - 100) AS BIGINT)) AS BIGINT)
                 AS sum_sq,
               round(sqrt(CAST(sum(CAST(((i * 31 + 7) % 201 - 100)
                 * ((i * 31 + 7) % 201 - 100) AS BIGINT)) AS DOUBLE)
                 / n), 6) AS rms
        FROM e GROUP BY doc_id, n
        ORDER BY doc_id
      """.trim),
      "Audio decode round-trip (24-bit stereo wav) + exact RMS oracle")(
      (spark, dir) => {
        import spark.implicits._
        import java.nio.{ByteBuffer, ByteOrder}
        val roundTrip = udf { nChars: Long =>
          val n = math.max(nChars, 1L).toInt
          // 24-bit stereo container: sample v in both channels,
          // stored as v<<8 (decoder: >>8 then channel average)
          val data = ByteBuffer.allocate(n * 6).order(ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < n) {
            val v = (i * 31 + 7) % 201 - 100
            val s24 = v << 8
            var c = 0
            while (c < 2) {
              data.put((s24 & 0xFF).toByte)
                .put(((s24 >> 8) & 0xFF).toByte)
                .put(((s24 >> 16) & 0xFF).toByte)
              c += 1
            }
            i += 1
          }
          val header = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
          header.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 6)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(2).putInt(8000).putInt(8000 * 6)
            .putShort(6).putShort(24)
            .put("data".getBytes("US-ASCII")).putInt(n * 6)
          val wav = header.array() ++ data.array()
          val pcm = Sources.decodeWav(wav).toOption.get
          var ss = 0L
          pcm.samples.foreach(v => ss += v.toLong * v)
          (pcm.nSamples.toLong, ss)
        }
        table(spark, dir, "documents")
          .select($"doc_id", roundTrip(greatest($"n_chars", lit(1L))).as("r"))
          .select($"doc_id", $"r._1".as("n_samples"), $"r._2".as("sum_sq"))
          .withColumn("rms",
            round(sqrt($"sum_sq".cast("double") / $"n_samples"), 6))
          .orderBy($"doc_id")
      }),

    // X402: crest factor + peak per clip — the dynamics gate beside
    // q_audio_zcr (a clipped-but-quiet clip shows low RMS with a
    // pinned peak; a compressed/limited one shows crest near 1).
    // Same synthesized-container convention as q_audio_rms: 16-bit
    // mono, deterministic signal v(i) = (i·53+29) mod 4001 − 2000
    // through the production decoder; peak and sum-of-squares are
    // exact integers on both sides.
    QueryDef(
      "q_audio_crest",
      Some("""
        WITH s AS (
          SELECT doc_id, greatest(n_chars, 1) AS n FROM documents
        ), e AS (
          SELECT doc_id, n,
                 (unnest(range(n)) * 53 + 29) % 4001 - 2000 AS v
          FROM s
        ), agg AS (
          SELECT doc_id, n AS n_samples,
                 CAST(max(abs(v)) AS BIGINT) AS peak,
                 CAST(sum(CAST(v * v AS BIGINT)) AS BIGINT) AS sum_sq
          FROM e GROUP BY doc_id, n
        )
        SELECT doc_id, n_samples, peak, sum_sq,
               CASE WHEN sum_sq > 0 THEN
                 round(CAST(peak AS DOUBLE)
                   / sqrt(CAST(sum_sq AS DOUBLE) / n_samples), 6)
               END AS crest,
               CASE WHEN sum_sq > 0 AND peak > 0 THEN
                 round(20.0 * log10(CAST(peak AS DOUBLE)
                   / sqrt(CAST(sum_sq AS DOUBLE) / n_samples)), 6)
               END AS crest_db
        FROM agg ORDER BY doc_id
      """.trim),
      "X402 crest factor per clip (16-bit mono wav round-trip)")(
      (spark, dir) => {
        import spark.implicits._
        import java.nio.{ByteBuffer, ByteOrder}
        val roundTrip = udf { nChars: Long =>
          val n = math.max(nChars, 1L).toInt
          val data = ByteBuffer.allocate(n * 2)
            .order(ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < n) {
            val v = (i * 53 + 29) % 4001 - 2000
            data.putShort(v.toShort)
            i += 1
          }
          val header = ByteBuffer.allocate(44)
            .order(ByteOrder.LITTLE_ENDIAN)
          header.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1).putInt(8000).putInt(8000 * 2)
            .putShort(2).putShort(16)
            .put("data".getBytes("US-ASCII")).putInt(n * 2)
          val wav = header.array() ++ data.array()
          val pcm = Sources.decodeWav(wav).toOption.get
          var peak = 0L
          var ss = 0L
          pcm.samples.foreach { v =>
            if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
            ss += v.toLong * v
          }
          (pcm.nSamples.toLong, peak, ss)
        }
        table(spark, dir, "documents")
          .select($"doc_id",
            roundTrip(greatest($"n_chars", lit(1L))).as("r"))
          .select($"doc_id", $"r._1".as("n_samples"),
            $"r._2".as("peak"), $"r._3".as("sum_sq"))
          .select($"doc_id", $"n_samples", $"peak", $"sum_sq",
            when($"sum_sq" > 0L,
              round($"peak".cast("double") /
                sqrt($"sum_sq".cast("double") / $"n_samples"), 6))
              .as("crest"),
            when($"sum_sq" > 0L && $"peak" > 0L,
              round(lit(20.0) * log10(
                $"peak".cast("double") /
                  sqrt($"sum_sq".cast("double") / $"n_samples")), 6))
              .as("crest_db"))
          .orderBy($"doc_id")
      }),

    // X135: the pure-JVM COMPRESSED-audio leg under an exact oracle —
    // G.711 mu-law and A-law (wave fmt 7/6, telephony 2:1 log
    // compression) decode with no external binary, and the ITU bit
    // arithmetic replays verbatim in SQL: u-law u=255-b,
    // t=((u%16)*8+132)<<seg, sign from bit 7; A-law a=b^0x55 with the
    // seg-0/1/n piecewise form. Same synthesized-container pattern as
    // q_audio_rms: deterministic byte stream per doc, wrapped in a
    // real RIFF container, decoded through the production decodeWav.
    QueryDef(
      "q_audio_g711",
      Some("""
        WITH s AS (
          SELECT doc_id, greatest(n_chars, 1) AS n FROM documents
        ), e AS (
          SELECT doc_id, n, (unnest(range(n)) * 37 + 11) % 256 AS b
          FROM s
        ), d AS (
          SELECT doc_id, n, b,
                 255 - b AS u,
                 xor(b, 85) AS a
          FROM e
        ), v AS (
          SELECT doc_id, n,
                 CASE WHEN u >= 128
                      THEN 132 - (((u % 16) * 8 + 132) << ((u // 16) % 8))
                      ELSE (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132
                 END AS vu,
                 CASE WHEN a >= 128 THEN 1 ELSE -1 END *
                 CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
                      WHEN (a // 16) % 8 = 1 THEN (a % 16) * 16 + 264
                      ELSE ((a % 16) * 16 + 264) << ((a // 16) % 8 - 1)
                 END AS va
          FROM d
        )
        SELECT doc_id, n AS n_samples,
               CAST(sum(CAST(vu * vu AS BIGINT)) AS BIGINT) AS sum_sq_ulaw,
               CAST(sum(CAST(va * va AS BIGINT)) AS BIGINT) AS sum_sq_alaw,
               round(sqrt(CAST(sum(CAST(vu * vu AS BIGINT)) AS DOUBLE)
                 / n), 6) AS rms_ulaw
        FROM v GROUP BY doc_id, n
        ORDER BY doc_id
      """.trim),
      "X135 G.711 mu/A-law compressed-audio decode + exact RMS oracle")(
      (spark, dir) => {
        import spark.implicits._
        import java.nio.{ByteBuffer, ByteOrder}
        val roundTrip = udf { nChars: Long =>
          val n = math.max(nChars, 1L).toInt
          val payload = Array.tabulate(n)(i => ((i * 37 + 11) % 256).toByte)
          def wav(fmt: Int): Array[Byte] = {
            val header = ByteBuffer.allocate(44)
              .order(ByteOrder.LITTLE_ENDIAN)
            header.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
              .put("WAVE".getBytes("US-ASCII"))
              .put("fmt ".getBytes("US-ASCII")).putInt(16)
              .putShort(fmt.toShort).putShort(1).putInt(8000).putInt(8000)
              .putShort(1).putShort(8)
              .put("data".getBytes("US-ASCII")).putInt(n)
            header.array() ++ payload
          }
          def sumSq(fmt: Int): Long = {
            val pcm = Sources.decodeWav(wav(fmt)).toOption.get
            var ss = 0L
            pcm.samples.foreach(v => ss += v.toLong * v)
            ss
          }
          (n.toLong, sumSq(7), sumSq(6))
        }
        table(spark, dir, "documents")
          .select($"doc_id", roundTrip(greatest($"n_chars", lit(1L))).as("r"))
          .select($"doc_id", $"r._1".as("n_samples"),
            $"r._2".as("sum_sq_ulaw"), $"r._3".as("sum_sq_alaw"))
          .withColumn("rms_ulaw",
            round(sqrt($"sum_sq_ulaw".cast("double") / $"n_samples"), 6))
          .orderBy($"doc_id")
      }),

    // The resampler under an EXACT oracle: same deterministic signal
    // v(i) as q_audio_rms at 8 kHz, resampled 8k→12k through the
    // production kernel (Augment.resampleLinear), integer
    // sum-of-squares after. The 3/2 ratio exercises frac ∈ {0, ⅓, ⅔}
    // — exact copies AND both interpolation weights. The oracle
    // replays the kernel arithmetic in SQL: identical int→double ops
    // give identical doubles, and floor(x+0.5) is EXACTLY Java
    // math.round (DuckDB's round() half-away-from-zero would diverge
    // on negative .5 midpoints).
    QueryDef(
      "q_resample_rms",
      Some("""
        WITH s AS (
          SELECT doc_id, greatest(n_chars, 1) AS n FROM documents
        ), e AS (
          SELECT doc_id, n, (n * 12000) // 8000 AS n_out,
                 unnest(range((n * 12000) // 8000)) AS j
          FROM s
        ), r AS (
          SELECT doc_id, n_out,
            CAST(floor(
              ((j*8000 // 12000) * 31 + 7) % 201 - 100
              + ((((least(j*8000 // 12000 + 1, n - 1)) * 31 + 7) % 201 - 100)
                 - (((j*8000 // 12000) * 31 + 7) % 201 - 100))
                * (((j*8000) % 12000) * 1.0 / 12000)
              + 0.5) AS BIGINT) AS v
          FROM e
        )
        SELECT doc_id, n_out,
               CAST(sum(v * v) AS BIGINT) AS sum_sq,
               round(sqrt(CAST(sum(v * v) AS DOUBLE) / n_out), 6) AS rms
        FROM r GROUP BY doc_id, n_out
        ORDER BY doc_id
      """.trim),
      "Linear resampler (8k→12k) round-trip + exact RMS oracle")(
      (spark, dir) => {
        import spark.implicits._
        val resampled = udf { nChars: Long =>
          val n = math.max(nChars, 1L).toInt
          val pcm = graft.audio.Pcm.fromSamples(
            Array.tabulate(n)(i => (i * 31 + 7) % 201 - 100), 8000)
          val out = graft.audio.Augment.resampleLinear(pcm, 12000)
          var ss = 0L
          out.samples.foreach(v => ss += v.toLong * v)
          (out.nSamples.toLong, ss)
        }
        table(spark, dir, "documents")
          .select($"doc_id", resampled(greatest($"n_chars", lit(1L))).as("r"))
          .select($"doc_id", $"r._1".as("n_out"), $"r._2".as("sum_sq"))
          .withColumn("rms",
            round(sqrt($"sum_sq".cast("double") / $"n_out"), 6))
          .orderBy($"doc_id")
      }),

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

    // VAD segmentation under an EXACT oracle: a deterministic signal
    // (frame j of doc d alternates ±a, a = (13j+7d) mod 10, so frame
    // RMS is exactly the integer a) runs through the production
    // energy-VAD kernel (audio/Vad.segments: RMS ≥ 3 gate, ≥2-frame
    // min duration); the oracle replays the gate per frame and
    // rebuilds segments with gaps-and-islands SQL. This is the
    // "split audio at silence boundaries" primitive, decision-exact
    // across engines.
    QueryDef(
      "q_vad_segments",
      Some("""
        WITH d AS (
          SELECT doc_id, (greatest(n_chars, 1) % 50) + 10 AS nf
          FROM documents
        ), f AS (
          SELECT doc_id, unnest(range(nf)) AS j FROM d
        ), act AS (
          SELECT doc_id, j FROM f WHERE (j*13 + doc_id*7) % 10 >= 3
        ), g AS (
          SELECT doc_id, j,
                 j - row_number() OVER (PARTITION BY doc_id ORDER BY j)
                   AS grp
          FROM act
        ), seg AS (
          SELECT doc_id, min(j) AS start_frame, max(j) + 1 AS end_frame
          FROM g GROUP BY doc_id, grp HAVING count(*) >= 2
        )
        SELECT doc_id,
               CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY start_frame) - 1 AS BIGINT) AS seg,
               start_frame, end_frame
        FROM seg
        ORDER BY doc_id, seg
      """.trim),
      "energy-VAD voice segments through the production kernel")(
      (spark, dir) => {
        import spark.implicits._
        import graft.audio.Vad
        val frame = 160
        val vad = udf { (docId: Long, nChars: Long) =>
          val nf = ((math.max(nChars, 1L) % 50) + 10).toInt
          val samples = Array.tabulate(nf * frame) { i =>
            val a = (((i / frame) * 13 + docId * 7) % 10).toInt
            if (i % 2 == 0) a else -a
          }
          Vad.segments(samples, frame, rmsThreshold = 3.0, minFrames = 2)
        }
        table(spark, dir, "documents")
          .select($"doc_id", posexplode(vad($"doc_id", $"n_chars")))
          .select($"doc_id", $"pos".cast("long").as("seg"),
            $"col._1".cast("long").as("start_frame"),
            $"col._2".cast("long").as("end_frame"))
          .orderBy($"doc_id", $"seg")
      }),

    // Quality-weighted deterministic sampling: keep probability ∝
    // a per-row weight (here a length-based quality proxy) — the
    // CCNet-style "sample better data harder" knob, still one
    // scan-stage md5 predicate, no RNG, engine-reproducible.
    QueryDef(
      "q_weighted_sample",
      Some(s"""
        SELECT doc_id, lang
        FROM documents
        WHERE CAST(('0x' || substr(md5('$SampleSalt' || text), 1, 8)) AS BIGINT)
              < round(least(greatest(n_chars / 2000.0, 0.0), 1.0)
                      * 4294967296.0)
        ORDER BY doc_id
      """.trim),
      "md5 sampling with per-doc keep probability n_chars/2000")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.weightedSample(
            table(spark, dir, "documents")
              .withColumn("w", $"n_chars" / 2000.0),
            "text", "w", SampleSalt)
          .select($"doc_id", $"lang")
          .orderBy($"doc_id")
      }),

    // Fixed-count per-stratum sample: exactly 20 docs per language
    // (or the whole stratum if smaller), membership decided by md5
    // rank — reproducible in any engine, no RNG.
    QueryDef(
      "q_sample_n_per_group",
      Some(s"""
        SELECT doc_id, lang
        FROM (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5('$SampleSalt' || text), text, doc_id) AS rk
          FROM documents
        )
        WHERE rk <= 20
        ORDER BY doc_id
      """.trim),
      "exactly 20 docs per language by deterministic md5 rank")(
      (spark, dir) => {
        import spark.implicits._
        // doc_id tiebreak: the corpus contains exact duplicate texts,
        // which tie on (md5, text) — the unique id keeps the rank-20
        // boundary engine-deterministic
        CorpusOps.sampleNPerGroup(table(spark, dir, "documents"),
            "text", "lang", n = 20, SampleSalt, tiebreak = Seq($"doc_id"))
          .select($"doc_id", $"lang")
          .orderBy($"doc_id")
      }),

    // Snapshot diff: audit verdicts between corpus v1 (documents) and
    // a deterministically derived v2 (every 7th doc dropped, every
    // 5th doc's text revised, every 11th doc re-added under a new
    // id) — the promote/rollback check before a training snapshot
    // ships. Hashes, not texts, cross the join.
    QueryDef(
      "q_snapshot_diff",
      Some("""
        WITH v2 AS (
          SELECT doc_id, text || ' (rev 2)' AS text
          FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
          UNION ALL
          SELECT doc_id, text
          FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 5 <> 0
          UNION ALL
          SELECT doc_id + 1000000, text
          FROM documents WHERE doc_id % 11 = 0
        )
        SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'removed'
                    WHEN md5(a.text) <> md5(b.text) THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM documents a
        FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
        ORDER BY doc_id
      """.trim),
      "corpus snapshot diff: added/removed/changed/unchanged per doc")(
      (spark, dir) => {
        import spark.implicits._
        val v1 = table(spark, dir, "documents")
        val v2 = v1.filter($"doc_id" % 7 =!= 0)
          .withColumn("text", when($"doc_id" % 5 === 0,
            concat($"text", lit(" (rev 2)"))).otherwise($"text"))
          .unionByName(v1.filter($"doc_id" % 11 === 0)
            .withColumn("doc_id", $"doc_id" + 1000000L))
        CorpusOps.snapshotDiff(v1, v2, "doc_id", "text")
          .orderBy($"doc_id")
      }),
  )
}
