package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.AsrPipeline
import graft.asr.AmplitudeRecognizer
import graft.multimodal.Multimodal
import graft.operators.Align
import graft.queries.QueryDef.table

/** Contract queries exercising the non-relational operator kernels —
  * LCS alignment (J1), the full ASR pipeline, session_window, and
  * multimodal plumbing — over the driver tables. LCS and the
  * pipeline are not SQL-expressible (rows-only driver check; parity
  * is golden-tested in LcsSpec/AsrPipelineSpec); the frame-count and
  * session_window queries carry exact oracles.
  */
object PipelineQueries {

  /** The q_wer-family deterministic corruption of a token array —
    * drop every 7th word, substitute every 11th (both 1-based,
    * ORIGINAL positions) with "zzz" — rebuilt PER ROW with an
    * index-aware transform/filter instead of the old posexplode →
    * groupBy → collect_list → join round trip, so each of the five
    * eval queries sharing it loses one shuffle plus one join
    * (optimization guide §2.4: remove shuffles outright). Values are
    * identical to the old path: the %7 drop is checked FIRST (so
    * positions divisible by both 7 and 11 drop, exactly like the old
    * filter-before-substitute order), substitution keys on the
    * ORIGINAL position, element order is preserved, and null/empty
    * token arrays yield "" (the old left-join + coalesce('') result).
    */
  private[queries] def corruptedHyp(toks: Column): Column =
    coalesce(array_join(filter(transform(toks, (t, i0) =>
      when((i0 + 1) % 7 === 0, lit(null))
        .when((i0 + 1) % 11 === 0, lit("zzz"))
        .otherwise(t)), x => x.isNotNull), " "), lit(""))

  val defs: Seq[QueryDef] = Seq(

    // X74: word error rate — the reference domain's evaluation
    // metric. The hypothesis is synthesized deterministically from
    // the reference text (drop every 7th word, substitute every 11th
    // with 'zzz' — both engines build the identical pair), the Spark
    // side runs the GENERAL word-level Levenshtein DP kernel, and the
    // oracle reproduces the distance declaratively: each distinct
    // word maps to one character by dense rank (identical ORDER BY
    // in both engines), utterances collapse to strings, DuckDB's
    // built-in levenshtein equals word-level edit distance. VALID
    // because this corpus's vocabulary (31 words + 'zzz') keeps every
    // code inside single-byte ASCII (33..126) — DuckDB's levenshtein
    // counts BYTES, so a vocabulary past 94 words would need the DP
    // path on both sides (see Wer.charMappedWer's hard cap). The
    // DP == char-mapped equivalence is additionally spec-asserted
    // on random corpora (WerSpec).
    QueryDef(
      "q_wer",
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS w
          FROM documents
        ), refx AS (
          SELECT doc_id, i AS pos, w[i] AS word
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
        ), hypx AS (
          SELECT doc_id, i AS pos,
                 CASE WHEN i % 11 = 0 THEN 'zzz' ELSE w[i] END AS word
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
          WHERE i % 7 <> 0
        ), vocab AS (
          SELECT word, row_number() OVER (ORDER BY word) + 32 AS code
          FROM (SELECT word FROM refx UNION SELECT word FROM hypx)
        ), rs AS (
          SELECT r.doc_id, string_agg(chr(CAST(v.code AS INTEGER)), '' ORDER BY r.pos) AS s,
                 count(*) AS n
          FROM refx r JOIN vocab v USING (word) GROUP BY r.doc_id
        ), hs AS (
          SELECT h.doc_id, string_agg(chr(CAST(v.code AS INTEGER)), '' ORDER BY h.pos) AS s
          FROM hypx h JOIN vocab v USING (word) GROUP BY h.doc_id
        )
        SELECT t.doc_id,
               CAST(coalesce(rs.n, 0) AS BIGINT) AS n_ref,
               CAST(levenshtein(coalesce(rs.s, ''), coalesce(hs.s, ''))
                    AS BIGINT) AS dist,
               round(CAST(levenshtein(coalesce(rs.s, ''), coalesce(hs.s, ''))
                     AS DOUBLE) / greatest(coalesce(rs.n, 0), 1), 6) AS wer
        FROM toks t
        LEFT JOIN rs ON t.doc_id = rs.doc_id
        LEFT JOIN hs ON t.doc_id = hs.doc_id
        ORDER BY t.doc_id
      """.trim),
      "X74 per-doc WER vs a deterministic corruption (drop 7th, sub 11th)")(
      (spark, dir) => {
        import spark.implicits._
        import graft.operators.{Dedup, Wer}
        val docs = table(spark, dir, "documents")
        // r15: hyp rebuilt per row (see corruptedHyp) — no shuffle,
        // no join; identical values
        val pairs = docs.select($"doc_id", $"text".as("ref"),
          corruptedHyp(Dedup.tokens($"text")).as("hyp"))
        Wer.wordErrorRate(pairs, "doc_id", "ref", "hyp")
          .orderBy($"doc_id")
      }),

    // X74b: character error rate — WER's sibling metric (ASR reports
    // both). Ref vs the SAME deterministic corruption as q_wer,
    // scored by the built-in levenshtein on the raw strings. VALID
    // cross-engine because this corpus is pure ASCII (byte distance
    // == character distance in DuckDB's byte-based levenshtein); a
    // non-ASCII corpus needs a codepoint-consistent kernel on both
    // sides, as with Wer.charMappedWer's cap.
    QueryDef(
      "q_cer",
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS w
          FROM documents
        ), hyp AS (
          SELECT doc_id,
                 coalesce(string_agg(
                   CASE WHEN i % 11 = 0 THEN 'zzz' ELSE w[i] END,
                   ' ' ORDER BY i) FILTER (WHERE i % 7 <> 0), '') AS h
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
          GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(length(array_to_string(t.w, ' ')) AS BIGINT)
                 AS n_ref_chars,
               CAST(levenshtein(array_to_string(t.w, ' '),
                                coalesce(h.h, '')) AS BIGINT) AS dist,
               round(CAST(levenshtein(array_to_string(t.w, ' '),
                     coalesce(h.h, '')) AS DOUBLE) /
                     greatest(length(array_to_string(t.w, ' ')), 1), 6)
                 AS cer
        FROM toks t LEFT JOIN hyp h ON t.doc_id = h.doc_id
        ORDER BY t.doc_id
      """.trim),
      "X74b per-doc CER vs the q_wer corruption (built-in levenshtein)")(
      (spark, dir) => {
        import spark.implicits._
        import graft.operators.Dedup
        val docs = table(spark, dir, "documents")
        // r14: the kernel is Myers bit-parallel (EditDistance) — the
        // identical integer as the built-in levenshtein (property-
        // spec'd), ~64 DP columns per machine word on these
        // hundreds-of-chars documents; hash and floor unchanged
        // (rule 3). r15: hyp rebuilt per row (corruptedHyp) — no
        // shuffle, no join; identical values
        docs.select($"doc_id", Dedup.tokens($"text").as("w"))
          .select($"doc_id",
            length(array_join($"w", " ")).cast("long").as("n_ref_chars"),
            graft.functions.EditDistance.levenshteinFastCol(
              array_join($"w", " "), corruptedHyp($"w"))
              .cast("long").as("dist"))
          .withColumn("cer",
            round($"dist" / greatest($"n_ref_chars", lit(1L)), 6))
          .orderBy($"doc_id")
      }),

    // X97: ROUGE-L vs the SAME corruption as q_wer/q_cer — the
    // LCS-based eval metric completing the WER/CER/BLEU family. The
    // engine runs the TRUE two-row LCS DP (Rouge.lcsLength); the
    // oracle knows the answer in closed form BY CONSTRUCTION of the
    // corruption: the hyp is ref with every 7th token dropped and
    // every 11th survivor replaced by 'zzz' (out-of-vocabulary — the
    // corpus's 31-token vocabulary never contains it, asserted by the
    // WER family's fixtures), so the kept unsubstituted tokens are a
    // common subsequence and nothing longer exists:
    // LCS = n_hyp − n_substituted. A DP bug (off-by-one, crossing
    // matches, boundary rows) breaks the per-doc integers.
    QueryDef(
      "q_rouge_l",
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS w
          FROM documents
        ), kept AS (
          SELECT doc_id, count(*) AS n_hyp,
                 CAST(count(*) FILTER (WHERE i % 11 = 0) AS BIGINT) AS n_sub
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
          WHERE i % 7 <> 0
          GROUP BY doc_id
        ), m AS (
          SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_ref,
                 CAST(coalesce(k.n_hyp, 0) AS BIGINT) AS n_hyp,
                 CAST(coalesce(k.n_hyp, 0) - coalesce(k.n_sub, 0)
                   AS BIGINT) AS lcs
          FROM toks t LEFT JOIN kept k USING (doc_id)
        ), pr AS (
          SELECT doc_id, n_ref, n_hyp, lcs,
                 CASE WHEN n_hyp > 0 THEN CAST(lcs AS DOUBLE) / n_hyp
                      ELSE 0.0 END AS p,
                 CASE WHEN n_ref > 0 THEN CAST(lcs AS DOUBLE) / n_ref
                      ELSE 0.0 END AS rc
          FROM m
        )
        SELECT doc_id, n_ref, n_hyp, lcs,
               round(p, 6) AS "precision", round(rc, 6) AS recall,
               round(CASE WHEN p + rc > 0
                     THEN 2.0 * p * rc / (p + rc) ELSE 0.0 END, 6) AS f1
        FROM pr ORDER BY doc_id
      """.trim),
      "X97 ROUGE-L (true LCS DP) vs the q_wer corruption")(
      (spark, dir) => {
        import spark.implicits._
        import graft.operators.{Dedup, Rouge}
        val docs = table(spark, dir, "documents")
        // r15: hyp rebuilt per row (corruptedHyp) — no shuffle, no
        // join; identical values
        val pairs = docs.select($"doc_id", Dedup.tokens($"text").as("w"))
          .select($"doc_id", array_join($"w", " ").as("ref_text"),
            corruptedHyp($"w").as("hyp_text"))
        Rouge.rougeL(pairs, "doc_id", "ref_text", "hyp_text")
          .orderBy($"doc_id")
      }),

    // X117: chrF2 vs the SAME corruption as q_wer/q_rouge_l/q_bleu —
    // the tokenization-free character n-gram F completing the eval
    // family. Integer clipped counts + closed-form totals; the
    // 6-order mean rounds at 6 dp.
    QueryDef(
      "q_chrf",
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS w
          FROM documents
        ), hypx AS (
          SELECT doc_id,
                 array_to_string(list(CASE WHEN i % 11 = 0 THEN 'zzz'
                                           ELSE w[i] END
                      ORDER BY i) FILTER (WHERE i % 7 <> 0), '') AS h
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
          GROUP BY doc_id
        ), p AS (
          SELECT t.doc_id, array_to_string(t.w, '') AS r,
                 coalesce(h.h, '') AS h
          FROM toks t LEFT JOIN hypx h USING (doc_id)
        ), grams AS (
          SELECT doc_id, n, substring(r, i, n) AS g, 'r' AS side
          FROM p, unnest([1,2,3,4,5,6]) AS nn(n),
               unnest(range(1, length(r) - n + 2)) AS u(i)
          UNION ALL
          SELECT doc_id, n, substring(h, i, n) AS g, 'h' AS side
          FROM p, unnest([1,2,3,4,5,6]) AS nn(n),
               unnest(range(1, length(h) - n + 2)) AS u(i)
        ), cnt AS (
          SELECT doc_id, n, g,
                 CAST(count(*) FILTER (WHERE side = 'h') AS BIGINT) AS ch,
                 CAST(count(*) FILTER (WHERE side = 'r') AS BIGINT) AS cr
          FROM grams GROUP BY 1, 2, 3
        ), ov AS (
          SELECT doc_id, n, CAST(sum(least(ch, cr)) AS BIGINT) AS m
          FROM cnt WHERE ch > 0 AND cr > 0 GROUP BY 1, 2
        ), spine AS (
          SELECT doc_id, CAST(length(r) AS BIGINT) AS ref_chars,
                 CAST(length(h) AS BIGINT) AS hyp_chars, n
          FROM p, unnest([1,2,3,4,5,6]) AS nn(n)
        ), ff AS (
          SELECT s.doc_id, s.ref_chars, s.hyp_chars, s.n,
                 CASE WHEN s.hyp_chars - s.n + 1 > 0
                      THEN CAST(coalesce(o.m, 0) AS DOUBLE)
                           / (s.hyp_chars - s.n + 1)
                      ELSE 0.0 END AS pp,
                 CASE WHEN s.ref_chars - s.n + 1 > 0
                      THEN CAST(coalesce(o.m, 0) AS DOUBLE)
                           / (s.ref_chars - s.n + 1)
                      ELSE 0.0 END AS rr
          FROM spine s LEFT JOIN ov o
            ON o.doc_id = s.doc_id AND o.n = s.n
        )
        SELECT doc_id, ref_chars, hyp_chars,
               -- effective order (sacrebleu): average only over n with
               -- a nonzero hyp-or-ref gram total
               round(sum(CASE WHEN pp + rr > 0.0
                              THEN 5.0 * pp * rr / (4.0 * pp + rr)
                              ELSE 0.0 END)
                     / greatest(CAST(sum(CASE WHEN hyp_chars - n + 1 > 0
                                   OR ref_chars - n + 1 > 0
                              THEN 1 ELSE 0 END) AS BIGINT), 1), 6) AS chrf
        FROM ff
        GROUP BY 1, 2, 3
        ORDER BY doc_id
      """.trim),
      "X117 chrF2 character n-gram F vs the q_wer corruption")(
      (spark, dir) => {
        import spark.implicits._
        import graft.operators.{Bleu, Dedup}
        val docs = table(spark, dir, "documents")
        // r15: hyp rebuilt per row (corruptedHyp) — no shuffle, no
        // join; identical values
        val pairs = docs.select($"doc_id", Dedup.tokens($"text").as("w"))
          .select($"doc_id", array_join($"w", " ").as("ref_text"),
            corruptedHyp($"w").as("hyp_text"))
        Bleu.chrF(pairs, "doc_id", "ref_text", "hyp_text")
          .orderBy($"doc_id")
      }),

    // X86: sentence BLEU-4 vs the SAME corruption as q_wer/q_cer —
    // the n-gram-overlap eval metric completing the WER/CER family.
    // Clipped counts are exact integers; ln/exp evaluate the same
    // fixed-shape expression on identical doubles; round(6) absorbs
    // libm ulp drift, the q_doc_perplexity convention.
    QueryDef(
      "q_bleu",
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS w
          FROM documents
        ), hypx AS (
          SELECT doc_id,
                 list(CASE WHEN i % 11 = 0 THEN 'zzz' ELSE w[i] END
                      ORDER BY i) FILTER (WHERE i % 7 <> 0) AS h
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
          GROUP BY doc_id
        ), sides AS (
          SELECT t.doc_id, t.w AS r, coalesce(h.h, []) AS h
          FROM toks t LEFT JOIN hypx h USING (doc_id)
        ), ns AS (
          SELECT unnest([1, 2, 3, 4]) AS n
        ), hg AS (
          SELECT s.doc_id, ns.n,
                 array_to_string(s.h[i : i + ns.n - 1], chr(1)) AS g,
                 count(*) AS c
          FROM sides s, ns, unnest(range(1, len(s.h) - ns.n + 2)) AS u(i)
          GROUP BY 1, 2, 3
        ), rg AS (
          SELECT s.doc_id, ns.n,
                 array_to_string(s.r[i : i + ns.n - 1], chr(1)) AS g,
                 count(*) AS c
          FROM sides s, ns, unnest(range(1, len(s.r) - ns.n + 2)) AS u(i)
          GROUP BY 1, 2, 3
        ), m AS (
          SELECT hg.doc_id, hg.n,
                 CAST(sum(least(hg.c, rg.c)) AS BIGINT) AS m
          FROM hg JOIN rg ON hg.doc_id = rg.doc_id AND hg.n = rg.n
                         AND hg.g = rg.g
          GROUP BY 1, 2
        ), wide AS (
          SELECT s.doc_id,
                 CAST(len(s.r) AS BIGINT) AS ref_len,
                 CAST(len(s.h) AS BIGINT) AS hyp_len,
                 coalesce(max(CASE WHEN m.n = 1 THEN m.m END), 0) AS m1,
                 coalesce(max(CASE WHEN m.n = 2 THEN m.m END), 0) AS m2,
                 coalesce(max(CASE WHEN m.n = 3 THEN m.m END), 0) AS m3,
                 coalesce(max(CASE WHEN m.n = 4 THEN m.m END), 0) AS m4
          FROM sides s LEFT JOIN m ON s.doc_id = m.doc_id
          GROUP BY 1, 2, 3
        ), scored AS (
          SELECT doc_id, ref_len, hyp_len,
            CASE WHEN greatest(hyp_len, 0) > 0
                 THEN CAST(m1 AS DOUBLE) / greatest(hyp_len, 0)
                 ELSE 0.0 END AS p1,
            CASE WHEN greatest(hyp_len - 1, 0) > 0
                 THEN CAST(m2 AS DOUBLE) / greatest(hyp_len - 1, 0)
                 ELSE 0.0 END AS p2,
            CASE WHEN greatest(hyp_len - 2, 0) > 0
                 THEN CAST(m3 AS DOUBLE) / greatest(hyp_len - 2, 0)
                 ELSE 0.0 END AS p3,
            CASE WHEN greatest(hyp_len - 3, 0) > 0
                 THEN CAST(m4 AS DOUBLE) / greatest(hyp_len - 3, 0)
                 ELSE 0.0 END AS p4,
            CASE WHEN hyp_len >= ref_len THEN 1.0
                 WHEN hyp_len = 0 THEN 0.0
                 ELSE exp(1.0 - CAST(ref_len AS DOUBLE) / hyp_len)
            END AS bp
          FROM wide
        )
        SELECT doc_id, ref_len, hyp_len,
               round(p1, 6) AS p_1, round(p2, 6) AS p_2,
               round(p3, 6) AS p_3, round(p4, 6) AS p_4,
               round(bp, 6) AS bp,
               round(CASE WHEN p1 > 0 AND p2 > 0 AND p3 > 0 AND p4 > 0
                     THEN bp * exp((ln(p1) + ln(p2) + ln(p3) + ln(p4)) / 4)
                     ELSE 0.0 END, 6) AS bleu
        FROM scored
        ORDER BY doc_id
      """.trim),
      "X86 sentence BLEU-4 vs the q_wer corruption")(
      (spark, dir) => {
        import spark.implicits._
        import graft.operators.Dedup
        val docs = table(spark, dir, "documents")
        // r15: hyp rebuilt per row (corruptedHyp) — no shuffle, no
        // join; identical values
        val pairs = docs.select($"doc_id", Dedup.tokens($"text").as("w"))
          .select($"doc_id", array_join($"w", " ").as("ref_text"),
            corruptedHyp($"w").as("hyp_text"))
        graft.operators.Bleu.sentenceBleu(pairs, "doc_id",
            "ref_text", "hyp_text", maxN = 4)
          .orderBy($"doc_id")
      }),

    // X88: Self-BLEU-2 — each doc as hypothesis vs ALL OTHER docs as
    // references (corpus diversity). Multi-ref clipping via the
    // per-gram top-2 (count, witness) table; brevity penalty via the
    // NLTK closest-other-length rule (adjacent in value order).
    QueryDef(
      "q_self_bleu",
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS w
          FROM documents
        ), lens AS (
          SELECT doc_id, CAST(len(w) AS BIGINT) AS hyp_len FROM toks
        ), closest AS (
          SELECT doc_id, hyp_len,
            CASE WHEN prv IS NULL THEN nxt
                 WHEN nxt IS NULL THEN prv
                 WHEN abs(prv - hyp_len) <= abs(nxt - hyp_len) THEN prv
                 ELSE nxt END AS ref_len
          FROM (SELECT doc_id, hyp_len,
                  lag(hyp_len) OVER (ORDER BY hyp_len, doc_id) AS prv,
                  lead(hyp_len) OVER (ORDER BY hyp_len, doc_id) AS nxt
                FROM lens)
        ), gc AS (
          SELECT doc_id, n, g, count(*) AS c FROM (
            SELECT doc_id, 1 AS n, unnest(
              CASE WHEN len(w) < 1 THEN []
                   ELSE list_transform(range(len(w)), i -> w[i+1]) END) AS g
            FROM toks
            UNION ALL
            SELECT doc_id, 2 AS n, unnest(
              CASE WHEN len(w) < 2 THEN []
                   ELSE list_transform(range(len(w) - 1),
                          i -> w[i+1] || chr(1) || w[i+2]) END) AS g
            FROM toks
          ) GROUP BY 1, 2, 3
        ), top2 AS (
          SELECT n, g,
            max(CASE WHEN rk = 1 THEN c END) AS c1,
            max(CASE WHEN rk = 1 THEN doc_id END) AS d1,
            max(CASE WHEN rk = 2 THEN c END) AS c2
          FROM (SELECT gc.*, row_number() OVER (PARTITION BY n, g
                  ORDER BY c DESC, doc_id) AS rk FROM gc)
          WHERE rk <= 2
          GROUP BY 1, 2
        ), m AS (
          SELECT gc.doc_id, gc.n,
            CAST(sum(least(gc.c,
              CASE WHEN t.d1 <> gc.doc_id THEN t.c1
                   ELSE coalesce(t.c2, 0) END)) AS BIGINT) AS m
          FROM gc JOIN top2 t USING (n, g)
          GROUP BY 1, 2
        ), wide AS (
          SELECT c.doc_id, c.hyp_len, c.ref_len,
            coalesce(max(CASE WHEN m.n = 1 THEN m.m END), 0) AS m1,
            coalesce(max(CASE WHEN m.n = 2 THEN m.m END), 0) AS m2
          FROM closest c LEFT JOIN m ON c.doc_id = m.doc_id
          GROUP BY 1, 2, 3
        ), scored AS (
          SELECT doc_id, hyp_len, ref_len,
            CASE WHEN hyp_len > 0
                 THEN CAST(m1 AS DOUBLE) / hyp_len ELSE 0.0 END AS p1,
            CASE WHEN hyp_len - 1 > 0
                 THEN CAST(m2 AS DOUBLE) / (hyp_len - 1) ELSE 0.0 END AS p2,
            CASE WHEN hyp_len >= ref_len THEN 1.0
                 WHEN hyp_len = 0 THEN 0.0
                 ELSE exp(1.0 - CAST(ref_len AS DOUBLE) / hyp_len)
            END AS bp
          FROM wide
        )
        SELECT doc_id, hyp_len, ref_len,
               round(p1, 6) AS p_1, round(p2, 6) AS p_2,
               round(bp, 6) AS bp,
               round(CASE WHEN p1 > 0 AND p2 > 0
                     THEN bp * exp((ln(p1) + ln(p2)) / 2)
                     ELSE 0.0 END, 6) AS self_bleu
        FROM scored
        ORDER BY doc_id
      """.trim),
      "X88 Self-BLEU-2 corpus diversity (each doc vs all others)")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.Bleu.selfBleu(
            table(spark, dir, "documents"), "doc_id", "text", maxN = 2)
          .orderBy($"doc_id")
      }),

    // J1: LCS equal-run alignment of each doc's token stream against
    // a deterministic perturbation of itself (every 7th token
    // dropped) — the difflib-parity kernel under mapGroups, one
    // shuffle per side keyed by doc.
    QueryDef(
      "q_lcs_align",
      None,
      "J1 LCS equal runs, doc tokens vs every-7th-dropped self")(
      (spark, dir) => {
        import spark.implicits._
        import graft.core.{AsrWord, BookWord}
        val toks = table(spark, dir, "documents")
          .select($"doc_id", posexplode(split(lower($"text"), "\\s+")))
          .filter($"col" =!= "")
          .select($"doc_id", $"pos", $"col".as("norm"))
        val book = toks.select($"doc_id", $"pos", $"norm".as("token"), $"norm")
          .as[BookWord]
        val asr = toks.filter($"pos" % 7 =!= 6)
          .withColumn("idx",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy($"doc_id").orderBy($"pos")) - 1)
          .select($"doc_id", $"idx", $"norm".as("text"), $"norm",
            ($"pos" * 0.5).as("start"), ($"pos" * 0.5 + 0.4).as("end"),
            lit(0.9).as("confidence"))
          .as[AsrWord]
        Align.lcsEqualRuns(book, asr, minRun = 4).toDF()
          .orderBy($"doc_id", $"bi0")
      }),

    // Flagship: the COMPLETE reference dataflow on deterministic
    // synthetic audio derived from every 20th document — word
    // timeline at 0.5s spacing with every 13th word missing from the
    // "recording", amplitude-encoded so the fake recognizer
    // re-transcribes clips for real. Rows-only (AsrPipelineSpec
    // golden-checks the math); the driver smoke-checks shape.
    QueryDef(
      "q_asr_pipeline",
      None,
      "E2E ASR clip pipeline on synthesized audio (SURVEY.md §3.1)")(
      (spark, dir) => {
        import spark.implicits._
        val sr = 8000
        // a sub-MB parquet scans as ONE partition; repartition so the
        // heavy per-doc work (audio synthesis + two inference passes)
        // uses every core — documents are the unit of parallelism
        val docs = table(spark, dir, "documents")
          .filter($"doc_id" % 20 === 0)
          .select($"doc_id", $"text")
          .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
        // The recognizer is content-driven (the waveform itself
        // encodes each word's characters), so synthesis is a pure
        // per-doc map — no vocabulary table, no driver-side collect.
        val rec = AmplitudeRecognizer()
        val inputs = docs.as[(Long, String)].map { case (docId, text) =>
          val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
          val timeline = words.iterator.zipWithIndex
            .filter { case (_, i) => i % 13 != 12 } // ASR "misses" these
            .map { case (w, i) => (w, i * 0.5, i * 0.5 + 0.4) }
            .toSeq
          AsrPipeline.DocInput(docId, text,
            AmplitudeRecognizer.synthesize(timeline, sr).bytes, sr)
        }
        val result = AsrPipeline.run(inputs, rec, rec,
          AsrPipeline.Config(enableAcousticValidation = false))
        result.segments.toDF()
          .select($"doc_id", $"segment", $"text", $"words", $"pieces",
            round($"duration_s", 3).as("duration_s"),
            round($"avg_conf", 3).as("avg_conf"))
          .orderBy($"doc_id", $"segment")
      }),

    // W2 streaming-analog surface, run in batch: session_window by
    // 1-hour time gap. Oracle replicates gap-sessionization with
    // lag + running sum (session_window(gap) ≡ close when
    // ts − prev_ts > gap).
    QueryDef(
      "q_session_window",
      Some("""
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                 THEN 1 ELSE 0 END AS boundary
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, event_id, value,
            sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged
        )
        SELECT user_id, count(*) AS n_events,
               min(event_id) AS first_event, max(event_id) AS last_event,
               round(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE), 3)
                 AS sum_value
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, first_event
      """.trim),
      "W2 session_window (time-gap) in batch mode")(
      (spark, dir) => {
        import spark.implicits._
        QueryDef.events(spark, dir)
          .groupBy($"user_id", session_window($"ts", "1 hour"))
          .agg(count(lit(1)).as("n_events"),
            min($"event_id").as("first_event"),
            max($"event_id").as("last_event"),
            // decimal sum: order-independent across engines (same
            // hardening as q_session_merge — double sums round-flip)
            round(sum($"value".cast("decimal(20,6)")).cast("double"), 3)
              .as("sum_value"))
          .select($"user_id", $"n_events", $"first_event", $"last_event",
            $"sum_value")
          .orderBy($"user_id", $"first_event")
      }),

    // Video path with an EXACT oracle (r8 upgrade from the fake-codec
    // shape check, mirroring r7's q_image_features BMP work): per doc,
    // hand-assemble a REAL Y4M (YUV4MPEG2) stream — ASCII header,
    // per-frame FRAME marker lines, planar C444 data, frame f's byte i
    // holding (i*7 + f*11 + 3) mod 256 — push it through the
    // production container walk (Multimodal.Y4mCodec via
    // BinaryImageDecoder: a header-grammar, frame-stride or
    // plane-order bug breaks the sums), sample every 3rd frame, and
    // aggregate exact per-plane integer sums that DuckDB reproduces
    // from the same closed-form pattern.
    QueryDef(
      "q_frame_sample",
      Some("""
        WITH d AS (
          SELECT doc_id,
                 (coalesce(n_chars, 0) % 13) + 4 AS w,
                 (coalesce(n_chars, 0) % 7) + 3 AS h,
                 (coalesce(n_chars, 0) % 5) + 2 AS nf
          FROM documents
        ), f AS (
          SELECT doc_id, w, h, nf, unnest(range(0, nf, 3)) AS fr FROM d
        ), px AS (
          SELECT doc_id, nf, fr, w * h AS n,
                 unnest(range(w * h * 3)) AS i FROM f
        ), s AS (
          SELECT doc_id, any_value(nf) AS nf,
                 count(DISTINCT fr) AS n_sampled,
                 sum((i * 7 + fr * 11 + 3) % 256)
                   FILTER (WHERE i < n) AS sum_y,
                 sum((i * 7 + fr * 11 + 3) % 256)
                   FILTER (WHERE i >= n AND i < 2 * n) AS sum_u,
                 sum((i * 7 + fr * 11 + 3) % 256)
                   FILTER (WHERE i >= 2 * n) AS sum_v
          FROM px GROUP BY doc_id
        )
        SELECT doc_id, CAST(nf AS INT) AS n_frames,
               CAST(n_sampled AS INT) AS n_sampled,
               CAST(sum_y AS BIGINT) AS sum_y,
               CAST(sum_u AS BIGINT) AS sum_u,
               CAST(sum_v AS BIGINT) AS sum_v
        FROM s
        ORDER BY doc_id
      """.trim),
      "Real Y4M container walk + exact per-plane frame-sum oracle")(
      (spark, dir) => {
        import spark.implicits._
        val y4m = udf { (nChars: Long) =>
          val w = (nChars % 13).toInt + 4
          val h = (nChars % 7).toInt + 3
          val nf = (nChars % 5).toInt + 2
          // hand-assembled stream (NOT Y4mCodec.encode — a symmetric
          // codec bug must not cancel out): header with rate/interlace/
          // aspect params the parser must skip, planar C444 frames
          val fb = w * h * 3
          val out = new java.io.ByteArrayOutputStream()
          out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n"
            .getBytes("US-ASCII"))
          var f = 0
          while (f < nf) {
            out.write("FRAME\n".getBytes("US-ASCII"))
            var i = 0
            while (i < fb) {
              out.write((i * 7 + f * 11 + 3) % 256)
              i += 1
            }
            f += 1
          }
          out.toByteArray
        }
        val media = table(spark, dir, "documents")
          .select($"doc_id", lit("video").as("media_type"),
            y4m(coalesce($"n_chars", lit(0L))).as("content"))
          .as[Multimodal.MediaRow]
        Multimodal.frameStats(media, Multimodal.BinaryImageDecoder(),
            everyK = 3)
          .toDF()
          .select($"doc_id", $"n_frames", $"n_sampled",
            $"sum_y", $"sum_u", $"sum_v")
          .orderBy($"doc_id")
      }),

    // Image path with an EXACT oracle (r7 upgrade from the fake-codec
    // rows-only check, mirroring q_audio_rms): per doc, hand-assemble
    // a REAL 24-bit BMP container (bottom-up rows, BGR, 4-byte row
    // padding — widths 4..16 exercise every padding residue) holding
    // the deterministic pixel pattern v(i) = (i·17+3) mod 256 in RGB
    // raster order, push it through the production decoder
    // (Multimodal.ImageCodec.decodeBmp — a channel swap, row-order or
    // padding bug breaks the integer sums), and aggregate exact
    // per-channel sums; mean_luma derives from the sums in one double
    // op chain on both sides.
    QueryDef(
      "q_image_features",
      Some("""
        WITH d AS (
          SELECT doc_id,
                 (coalesce(n_chars, 0) % 13) + 4 AS w,
                 (coalesce(n_chars, 0) % 7) + 3 AS h
          FROM documents
        ), px AS (
          SELECT doc_id, w, h, unnest(range(w * h * 3)) AS i FROM d
        ), s AS (
          SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
                 sum((i * 17 + 3) % 256) FILTER (WHERE i % 3 = 0) AS sum_r,
                 sum((i * 17 + 3) % 256) FILTER (WHERE i % 3 = 1) AS sum_g,
                 sum((i * 17 + 3) % 256) FILTER (WHERE i % 3 = 2) AS sum_b
          FROM px GROUP BY doc_id
        )
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(3 AS INT) AS channels,
               CAST(sum_r AS BIGINT) AS sum_r,
               CAST(sum_g AS BIGINT) AS sum_g,
               CAST(sum_b AS BIGINT) AS sum_b,
               round((0.299 * sum_r + 0.587 * sum_g + 0.114 * sum_b)
                 / (w * h), 6) AS mean_luma
        FROM s
        ORDER BY doc_id
      """.trim),
      "Real BMP container round-trip + exact channel-sum oracle")(
      (spark, dir) => {
        import spark.implicits._
        val bmp = udf { (docId: Long, nChars: Long) =>
          val w = (nChars % 13).toInt + 4
          val h = (nChars % 7).toInt + 3
          // hand-assembled container (NOT encodeBmp — a symmetric
          // codec bug must not cancel out): bottom-up BGR rows padded
          // to 4 bytes, pattern indexed in top-down RGB raster order
          val rowBytes = (w * 3 + 3) / 4 * 4
          val out = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out.put('B'.toByte).put('M'.toByte)
            .putInt(54 + rowBytes * h).putInt(0).putInt(54)
          out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
            .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
            .putInt(0).putInt(0)
          def v(i: Int): Byte = ((i * 17 + 3) % 256).toByte
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
          .as[Multimodal.MediaRow]
        Multimodal.imageStats(media, Multimodal.BinaryImageDecoder())
          .toDF()
          .select($"doc_id", $"width", $"height", $"channels",
            $"sum_r", $"sum_g", $"sum_b", $"mean_luma")
          .orderBy($"doc_id")
      }),
  )
}
