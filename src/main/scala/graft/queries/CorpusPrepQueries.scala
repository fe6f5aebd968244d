package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Contamination, CorpusOps, Unigram}
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

  /** Aligned slot width for duplicate-span removal (X62). */
  val SpanLen = 8

  /** Gram width for arbitrary-offset exact-substring removal (X79). */
  val AnyOffsetK = 8

  /** Shared DuckDB prelude: tokens per doc (identical to
    * `Dedup.tokens`), k-gram assembly as in DedupQueries.shingleSql.
    */
  private def gramExpr(k: Int, sep: String): String =
    (1 to k).map(j => s"w[i+$j]").mkString(s" || $sep || ")

  // ------------------------------------------------------------------
  // X118 integer-unigram oracle (r14): the DuckDB CTE chain replaying
  // [[graft.operators.Unigram.trainOnWordTableL]] bit-exactly — the
  // duckKmeansCtes convention applied to EM. The fit's only non-
  // rational step, log2, is the exact FIXED-POINT INTEGER recurrence
  // [[Unigram.ilog2fp]], which unrolls here as a 16-step recursive
  // CTE per sweep (squaring a Q30 mantissa — pure BIGINT shifts, no
  // libm). Each Viterbi sweep is a recursive DP over word positions
  // carrying (best, count, back-len) lists, candidates packed into
  // ONE BIGINT key ((−score)·2¹⁰+count)·2⁶+len so `least()` picks
  // the (score desc, count asc, len asc) winner — valid for words
  // up to 1023 chars / pieces up to 63 long, far past the fixture's
  // max-8-char tokens. M-step = HUGEINT count·10¹² // total (the
  // integer-Lloyd truncated-mean convention); prunes rank by
  // (p12 desc, piece asc). Every multi-referenced CTE is MATERIALIZED
  // (DuckDB inlines plain CTEs — exponential expansion otherwise).
  // Scope caveat (same class as q_cer's documented ASCII assumption):
  // the hash equivalence holds for BMP text only. The engine
  // enumerates pieces over UTF-16 code units (String.substring/
  // length) and tie-breaks pieces in code-unit order, while DuckDB's
  // substr/length count CODE POINTS and ORDER BY compares UTF-8
  // bytes — identical on the BMP (and on the fixture's ASCII
  // tokens), divergent for supplementary-plane characters, where
  // piece windows and prune/keep tie-break order both shift.
  // ------------------------------------------------------------------

  private val UniV = 44      // vocabSize — chosen so the FIXTURE exercises
  // a real final cut (24 chars + 36 surviving multi -> keepMulti = 20):
  // the oracle's post-cut sweep then proves the pruned-scores semantics
  // on every driver round, not just on synthetic spec corpora
  private val UniSeed = 256  // seedSize
  private val UniMpl = 4     // maxPieceLen
  private val UniEmi = 1     // emIters
  private val UniR = 4       // rounds

  /** msb(x) for x ≤ 10¹² < 2⁴⁰ as a threshold CASE chain (a double
    * log2 could mis-floor at powers of two; this cannot).
    */
  private def uniMsbCase(col: String): String = {
    val whens = (39 to 1 by -1)
      .map(k => s"WHEN $col >= ${1L << k} THEN $k").mkString(" ")
    s"(CASE $whens ELSE 0 END)"
  }

  /** sc{t}(piece, p12, s): integer log2 scores of vocab `vin` via the
    * 16-step Q30 repeated-squaring recursion.
    */
  private def uniIlogCtes(t: Int, vin: String): String =
    s"""il$t AS (
      SELECT piece, p12, m,
             CAST(CASE WHEN m <= 30 THEN p12 * (1::BIGINT << CAST(30 - m AS INT))
                       ELSE p12 // (1::BIGINT << CAST(m - 30 AS INT)) END AS BIGINT) AS y,
             0 AS k, CAST(0 AS BIGINT) AS frac
      FROM (SELECT piece, p12, CAST(${uniMsbCase("p12")} AS BIGINT) AS m FROM $vin)
      UNION ALL
      SELECT piece, p12, m,
             CASE WHEN ((y*y) >> 30) >= 2147483648 THEN ((y*y) >> 30) >> 1 ELSE (y*y) >> 30 END,
             k + 1,
             CASE WHEN ((y*y) >> 30) >= 2147483648 THEN frac * 2 + 1 ELSE frac * 2 END
      FROM il$t WHERE k < 16
    ), sc$t AS MATERIALIZED (
      SELECT piece, p12, (m * 65536 + frac) - ${graft.operators.Unigram.ScoreOne} AS s
      FROM il$t WHERE k = 16
    )"""

  /** One packed Viterbi candidate (piece length `ln` ending at
    * position i+1); NULL when out of range or the piece is unknown.
    */
  private def uniCand(ln: Int): String = {
    val start = s"v.i + 2 - $ln"
    s"""CASE WHEN v.i + 1 >= $ln AND s$ln.s IS NOT NULL THEN
       (((-(v.bs[$start] + s$ln.s)) * 1024 + v.bc[$start] + 1) * 64 + $ln) END"""
  }

  /** vt{t}: the per-word Viterbi DP (recursive over positions) under
    * sc{t}; bk{t}: the backtrack emitting one row per piece instance
    * with its 0-based start `pos` (word order = pos ascending).
    */
  private def uniVitCtes(t: Int): String = {
    val joins = (1 to UniMpl).map(ln =>
      s"LEFT JOIN sc$t s$ln ON v.i + 1 >= $ln AND s$ln.piece = substring(v.w, v.i + 2 - $ln, $ln)")
      .mkString("\n        ")
    val cands = (1 to UniMpl).map(uniCand).mkString(", ")
    s"""vt$t AS (
      SELECT w, n, len, 0 AS i,
             [CAST(0 AS BIGINT)] AS bs, [CAST(0 AS BIGINT)] AS bc, [CAST(0 AS BIGINT)] AS bl
      FROM wl
      UNION ALL
      SELECT w, n, len, i + 1,
             list_append(bs, -(win // 65536)),
             list_append(bc, (win // 64) % 1024),
             list_append(bl, win % 64)
      FROM (
        SELECT v.w, v.n, v.len, v.i, v.bs, v.bc, v.bl,
               least($cands) AS win
        FROM vt$t v
        $joins
        WHERE v.i < v.len
      )
    ), bk$t AS (
      SELECT w, n, len AS pos, bl, CAST(NULL AS VARCHAR) AS piece
      FROM vt$t WHERE i = len
      UNION ALL
      SELECT w, n, pos - CAST(bl[pos + 1] AS INT), bl,
             substring(w, pos - CAST(bl[pos + 1] AS INT) + 1, CAST(bl[pos + 1] AS INT))
      FROM bk$t WHERE pos > 0
    )"""
  }

  /** ct{t}/u{t}: exact integer counts from bk{t} and the truncated-
    * division M-step (chars floored at 1 grid ulp; multi with a
    * zero-truncated probability drop out).
    */
  private def uniMstepCtes(t: Int, vin: String): String =
    s"""ct$t AS MATERIALIZED (
      SELECT piece, CAST(sum(n) AS HUGEINT) AS c FROM bk$t WHERE piece IS NOT NULL GROUP BY piece
    ), tt$t AS (SELECT sum(c) AS tot FROM ct$t),
    u$t AS MATERIALIZED (
      SELECT piece, p12 FROM (
        SELECT v.piece,
               CAST(CASE WHEN length(v.piece) = 1
                    THEN greatest(1, COALESCE(c.c, 0) * 1000000000000 // t.tot)
                    ELSE COALESCE(c.c, 0) * 1000000000000 // t.tot END AS BIGINT) AS p12,
               length(v.piece) AS pl
        FROM $vin v LEFT JOIN ct$t c USING (piece) CROSS JOIN tt$t t
      ) WHERE pl = 1 OR p12 > 0
    )"""

  /** Prune `ut` to max(keepMulti, ⌊3m/4⌋) multi pieces by
    * (p12 desc, piece asc) — or to exactly keepMulti for the final
    * cut. Chars always survive.
    */
  private def uniPruneCte(name: String, ut: String, finalCut: Boolean): String = {
    val km = s"greatest($UniV - (SELECT count(*) FROM chs), 0)"
    val tgt =
      if (finalCut) km
      else s"greatest($km, (SELECT count(*) FROM $ut WHERE length(piece) > 1) * 3 // 4)"
    s"""$name AS MATERIALIZED (
      SELECT piece, p12 FROM $ut WHERE length(piece) = 1
      UNION ALL
      SELECT piece, p12 FROM (
        SELECT piece, p12, row_number() OVER (ORDER BY p12 DESC, piece) AS rn
        FROM $ut WHERE length(piece) > 1
      ) WHERE rn <= $tgt
    )"""
  }

  /** The full fit chain: seed CTEs + UniR rounds of (sweep, prune) +
    * final cut + final sweep. Returns (ctes, finalVocabCte, sweeps).
    */
  private def uniChain(): (String, String, Int) = {
    val head = s"""wt AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
        FROM documents) GROUP BY w
    ), wl AS MATERIALIZED (SELECT w, n, CAST(length(w) AS INT) AS len FROM wt),
    chs AS MATERIALIZED (
      SELECT DISTINCT substring(w, CAST(i AS INT), 1) AS piece
      FROM wl, unnest(range(1, len + 1)) AS r(i)
    ), sub AS MATERIALIZED (
      SELECT substring(w, CAST(i AS INT), CAST(l AS INT)) AS piece, CAST(sum(n) AS BIGINT) AS c
      FROM wl, unnest(range(1, len + 1)) AS r(i), unnest(range(2, $UniMpl + 1)) AS q(l)
      WHERE i + l - 1 <= len
      GROUP BY 1
    ), mseed AS MATERIALIZED (
      SELECT piece FROM (
        SELECT piece, row_number() OVER (ORDER BY c * length(piece) DESC, piece) AS rn
        FROM sub
      ) WHERE rn <= $UniSeed - (SELECT count(*) FROM chs)
    ), seed AS MATERIALIZED (
      SELECT piece FROM chs UNION ALL SELECT piece FROM mseed
    ), v0 AS MATERIALIZED (
      SELECT piece, CAST(1000000000000 // (SELECT count(*) FROM seed) AS BIGINT) AS p12 FROM seed
    )"""
    val parts = scala.collection.mutable.ArrayBuffer(head)
    var vin = "v0"
    var t = 0
    (1 to UniR).foreach { r =>
      (1 to UniEmi).foreach { _ =>
        t += 1
        parts += uniIlogCtes(t, vin); parts += uniVitCtes(t)
        parts += uniMstepCtes(t, vin)
        vin = s"u$t"
      }
      parts += uniPruneCte(s"p$r", vin, finalCut = false)
      vin = s"p$r"
    }
    parts += uniPruneCte("fcut", vin, finalCut = true)
    vin = "fcut"
    (1 to UniEmi).foreach { _ =>
      t += 1
      parts += uniIlogCtes(t, vin); parts += uniVitCtes(t)
      parts += uniMstepCtes(t, vin)
      vin = s"u$t"
    }
    (parts.mkString(",\n    "), vin, t)
  }

  private def unigramVocabSql: String = {
    val (ctes, vfin, _) = uniChain()
    s"WITH RECURSIVE $ctes\n  SELECT piece, p12 AS p_q12 FROM $vfin ORDER BY piece"
  }

  private def unigramEncodeSql: String = {
    val (ctes, vfin, tfin) = uniChain()
    val te = tfin + 1
    s"""WITH RECURSIVE $ctes,
    ${uniIlogCtes(te, vfin)},
    ${uniVitCtes(te)},
    wenc AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS np,
             string_agg(piece, ' ' ORDER BY pos) AS enc
      FROM bk$te WHERE piece IS NOT NULL GROUP BY w
    ),
    toks2 AS (
      SELECT doc_id, i, wlist[CAST(i AS INT)] AS w
      FROM (SELECT doc_id,
              list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS wlist
            FROM documents),
           unnest(range(1, len(wlist) + 1)) AS u(i)
    ),
    agg AS (
      SELECT t.doc_id, CAST(sum(e.np) AS BIGINT) AS n_pieces,
             string_agg(e.enc, ' ' ORDER BY i) AS enc_text
      FROM toks2 t JOIN wenc e USING (w)
      GROUP BY t.doc_id
    )
    SELECT d.doc_id, coalesce(a.n_pieces, 0) AS n_pieces,
           coalesce(a.enc_text, '') AS enc_text
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    ORDER BY d.doc_id"""
  }

  private val toksCte = """
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
      FROM documents
    )"""

  val ChunkSize = 40
  val ChunkStride = 30

  /** Packed training-sequence length for X81. */
  val PackSeqLen = 64
  val BatchBuckets = 4
  val BatchSize = 16

  /** Shared DuckDB BPE trainer (X73/X78): a recursive CTE carries the
    * word-frequency symbol table across merge ranks. Each recursive
    * step (a) picks the best pair — weighted count desc, then (left,
    * right) lexicographic, exactly `Bpe.trainMerges`' tie-break, with
    * the same count>=2 stop — via an aggregate + ORDER BY/LIMIT in
    * the recursive term, and (b) applies it to every word with a
    * nested recursive left-to-right scan (leftmost occurrence,
    * skip-after-merge), the same single-pass semantics as
    * `Bpe.trainOnWordTable` (no new (l,r) pair can be created by a
    * merge, so single-pass == exhaustive).
    */
  private val bpeStateCte = """
        WITH RECURSIVE
        vocab AS (
          SELECT w, count(*) AS n FROM (
            SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '')) AS w
            FROM documents
          ) GROUP BY w
        ),
        state(rank, w, n, syms) AS (
          SELECT 0, w, n, string_split(w, '') FROM vocab
          UNION ALL
          (
            WITH cur AS (SELECT * FROM state WHERE rank < 20),
            best AS (
              SELECT syms[i] AS bl, syms[i+1] AS br
              FROM cur, unnest(range(1, len(syms))) AS u(i)
              GROUP BY 1, 2
              HAVING sum(n) >= 2
              ORDER BY sum(n) DESC, 1, 2
              LIMIT 1
            )
            SELECT cur.rank + 1, cur.w, cur.n,
              (WITH RECURSIVE m(s, i) AS (
                 SELECT CAST([] AS VARCHAR[]), 1
                 UNION ALL
                 SELECT CASE WHEN i < len(cur.syms) AND cur.syms[i] = b.bl
                                  AND cur.syms[i+1] = b.br
                             THEN list_append(s, b.bl || b.br)
                             ELSE list_append(s, cur.syms[i]) END,
                        CASE WHEN i < len(cur.syms) AND cur.syms[i] = b.bl
                                  AND cur.syms[i+1] = b.br
                             THEN i + 2 ELSE i + 1 END
                 FROM m WHERE i <= len(cur.syms)
               ) SELECT s FROM m ORDER BY i DESC LIMIT 1)
            FROM cur, best b
          )
        )"""
  /** Per-source token budgets (budget × mix weight, precomputed so
    * both engines evaluate one division); unlisted sources drop.
    */
  val MixTargets: Seq[(String, Double)] = Seq(
    "src0" -> 1200.0, "src1" -> 900.0, "src2" -> 600.0, "src3" -> 300.0)
  val MixSalt = "mix"

  /** Overall keep rate for X85 temperature mixing (α pinned at 0.5). */
  val TempTargetFraction = 0.25

  /** X87 memorization scan: gram width + candidate modulus. */
  val MemK = 8
  val MemMod = 17

  val defs: Seq[QueryDef] = Seq(

    // X37: context-window chunking — overlapping token windows per
    // doc, the sequence-assembly step before tokenizer packing.
    QueryDef(
      "q_chunk_docs",
      Some(s"""
        WITH $toksCte, c AS (
          SELECT doc_id, w, len(w) AS n FROM toks
        ), idx AS (
          SELECT doc_id, w, unnest(range(
            CASE WHEN n = 0 THEN 0
                 ELSE 1 + CASE WHEN n <= $ChunkSize THEN 0
                          ELSE (n - $ChunkSize + $ChunkStride - 1) // $ChunkStride END
            END)) AS chunk_id
          FROM c
        )
        SELECT doc_id, chunk_id,
          len(w[chunk_id*$ChunkStride+1 : chunk_id*$ChunkStride+$ChunkSize])
            AS n_chunk_tokens,
          array_to_string(
            w[chunk_id*$ChunkStride+1 : chunk_id*$ChunkStride+$ChunkSize], ' ')
            AS chunk_text
        FROM idx
        ORDER BY doc_id, chunk_id
      """.trim),
      "X37 overlapping context-window chunking")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.chunkDocs(table(spark, dir, "documents"),
            "doc_id", "text", ChunkSize, ChunkStride)
          .orderBy($"doc_id", $"chunk_id")
      }),

    // X38: length-bucketed batch assembly — quantile buckets +
    // per-bucket packing for padding-efficient training batches.
    QueryDef(
      "q_length_batches",
      Some(s"""
        WITH $toksCte, t AS (
          SELECT doc_id, len(w) AS n_tokens FROM toks
        ), b AS (
          SELECT quantile_cont(n_tokens, 0.25) AS b0,
                 quantile_cont(n_tokens, 0.5) AS b1,
                 quantile_cont(n_tokens, 0.75) AS b2
          FROM t
        ), r AS (
          SELECT doc_id, n_tokens,
            1 + (n_tokens > b0)::INT + (n_tokens > b1)::INT
              + (n_tokens > b2)::INT AS bucket
          FROM t, b
        ), rn AS (
          SELECT doc_id, n_tokens, bucket,
            row_number() OVER (PARTITION BY bucket
                               ORDER BY n_tokens, doc_id) AS k
          FROM r
        )
        SELECT doc_id, n_tokens, bucket,
          (k - 1) // $BatchSize AS batch_id,
          (k - 1) % $BatchSize AS pos_in_batch
        FROM rn
        ORDER BY doc_id
      """.trim),
      "X38 length-bucketed padding-efficient batch packing")(
      (spark, dir) => {
        import spark.implicits._
        val counted = table(spark, dir, "documents")
          .select($"doc_id",
            size(graft.operators.Dedup.tokens($"text")).as("n_tokens"))
        CorpusOps.assembleBatches(counted, "doc_id", "n_tokens",
            BatchBuckets, BatchSize)
          .select($"doc_id", $"n_tokens", $"bucket", $"batch_id",
            $"pos_in_batch")
          .orderBy($"doc_id")
      }),

    // X379: padding-waste report over the X38 batch assembly — per
    // bucket: how many pad tokens the fixed right-pad-to-batch-max
    // layout burns (waste = 1 − Σtokens/Σ(rows·batch_max)) — the
    // number that justifies length bucketing in the first place and
    // the regression gate on any change to the batching policy.
    QueryDef(
      "q_padding_waste",
      Some(s"""
        WITH $toksCte, t AS (
          SELECT doc_id, len(w) AS n_tokens FROM toks
        ), b AS (
          SELECT quantile_cont(n_tokens, 0.25) AS b0,
                 quantile_cont(n_tokens, 0.5) AS b1,
                 quantile_cont(n_tokens, 0.75) AS b2
          FROM t
        ), r AS (
          SELECT doc_id, n_tokens,
            1 + (n_tokens > b0)::INT + (n_tokens > b1)::INT
              + (n_tokens > b2)::INT AS bucket
          FROM t, b
        ), rn AS (
          SELECT doc_id, n_tokens, bucket,
            row_number() OVER (PARTITION BY bucket
                               ORDER BY n_tokens, doc_id) AS k
          FROM r
        ), batches AS (
          SELECT bucket, (k - 1) // $BatchSize AS batch_id,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(n_tokens) AS BIGINT) AS token_sum,
                 CAST(max(n_tokens) AS BIGINT) AS max_len
          FROM rn GROUP BY 1, 2
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_batches,
               CAST(sum(n_rows) AS BIGINT) AS n_docs,
               CAST(sum(token_sum) AS BIGINT) AS token_sum,
               CAST(sum(n_rows * max_len) AS BIGINT) AS padded_sum,
               CASE WHEN sum(n_rows * max_len) > 0 THEN
                 round(1.0 - CAST(sum(token_sum) AS DOUBLE)
                   / CAST(sum(n_rows * max_len) AS DOUBLE), 6)
               END AS padding_waste
        FROM batches GROUP BY bucket ORDER BY bucket
      """.trim),
      "X379 per-bucket padding waste of the batch assembly")(
      (spark, dir) => {
        import spark.implicits._
        val counted = table(spark, dir, "documents")
          .select($"doc_id",
            size(graft.operators.Dedup.tokens($"text")).as("n_tokens"))
        CorpusOps.assembleBatches(counted, "doc_id", "n_tokens",
            BatchBuckets, BatchSize)
          .groupBy($"bucket", $"batch_id")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            sum($"n_tokens").cast("long").as("token_sum"),
            max($"n_tokens").cast("long").as("max_len"))
          .groupBy($"bucket".cast("long").as("bucket"))
          .agg(count(lit(1)).cast("long").as("n_batches"),
            sum($"n_rows").cast("long").as("n_docs"),
            sum($"token_sum").cast("long").as("token_sum"),
            sum($"n_rows" * $"max_len").cast("long").as("padded_sum"))
          .select($"bucket", $"n_batches", $"n_docs", $"token_sum",
            $"padded_sum",
            when($"padded_sum" > 0L,
              round(lit(1.0) - $"token_sum".cast("double") /
                $"padded_sum".cast("double"), 6)).as("padding_waste"))
          .orderBy($"bucket")
      }),

    // X39: token-budget corpus mixing — per-source deterministic
    // down-sampling to target token shares.
    QueryDef(
      "q_mix_corpus", {
        val caseArms = MixTargets.map { case (s, t) =>
          s"WHEN '$s' THEN $t"
        }.mkString(" ")
        Some(s"""
        WITH t AS (
          SELECT doc_id, text, source,
            len(list_filter(string_split_regex(lower(text), '\\s+'),
                x -> x <> '')) AS n_tokens
          FROM documents
        ), totals AS (
          SELECT source, CAST(sum(n_tokens) AS BIGINT) AS source_tokens
          FROM t GROUP BY 1
        ), f AS (
          -- least() ignores NULLs in DuckDB too: the IS NULL branch
          -- must come first or unlisted sources would keep frac 1.0
          SELECT t.doc_id, t.text, t.source, source_tokens,
            CASE WHEN (CASE t.source $caseArms END) IS NULL THEN 0.0
                 ELSE least(1.0,
                   CASE t.source $caseArms END / source_tokens) END
              AS keep_frac
          FROM t JOIN totals USING (source)
        )
        SELECT doc_id, source, source_tokens, keep_frac
        FROM f
        WHERE CAST(('0x' || substr(md5('$MixSalt' || text), 1, 8)) AS BIGINT)
              < CAST(floor(keep_frac * 4294967296.0) AS BIGINT)
        ORDER BY doc_id
      """.trim)
      },
      "X39 token-budget corpus mixing (per-source deterministic sample)")(
      (spark, dir) => {
        import spark.implicits._
        val counted = table(spark, dir, "documents")
          .select($"doc_id", $"text", $"source",
            size(graft.operators.Dedup.tokens($"text")).as("n_tokens"))
        CorpusOps.mixCorpus(counted, "text", "source", "n_tokens",
            MixTargets.toMap, MixSalt)
          .select($"doc_id", $"source", $"source_tokens", $"keep_frac")
          .orderBy($"doc_id")
      }),

    // X87: verbatim-memorization scan — per candidate doc (every
    // 17th), the fraction of its positional 8-gram slots occurring in
    // some OTHER corpus doc. Self-exclusion via the (distinct-doc
    // count, witness doc) pair per gram; exact integer ratios.
    QueryDef(
      "q_memorization",
      Some(s"""
        WITH $toksCte, pg AS (
          SELECT doc_id, unnest(
            CASE WHEN len(w) < $MemK THEN []
                 ELSE list_transform(range(len(w) - ${MemK - 1}),
                        i -> ${gramExpr(MemK, "chr(1)")})
            END) AS g
          FROM toks
        ), gd AS (
          SELECT g, count(DISTINCT doc_id) AS nd, min(doc_id) AS d0
          FROM pg GROUP BY g
        ), probe AS (
          SELECT c.doc_id, count(*) AS n_slots,
                 CAST(sum(CASE WHEN gd.nd > 1
                           OR (gd.nd = 1 AND gd.d0 <> c.doc_id)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_memorized
          FROM (SELECT * FROM pg WHERE doc_id % $MemMod = 0) c
          JOIN gd USING (g)
          GROUP BY c.doc_id
        )
        SELECT d.doc_id,
          coalesce(n_slots, 0) AS n_slots,
          coalesce(n_memorized, 0) AS n_memorized,
          CASE WHEN coalesce(n_slots, 0) = 0 THEN 0.0
               ELSE round(CAST(n_memorized AS DOUBLE) / n_slots, 6)
          END AS memorization
        FROM (SELECT doc_id FROM documents WHERE doc_id % $MemMod = 0) d
        LEFT JOIN probe USING (doc_id)
        ORDER BY d.doc_id
      """.trim),
      "X87 verbatim 8-gram memorization of candidates vs rest of corpus")(
      (spark, dir) => {
        import spark.implicits._
        val docs = table(spark, dir, "documents")
        Contamination.memorizationScan(docs,
            docs.filter($"doc_id" % MemMod === 0), "doc_id", "text", MemK)
          .orderBy($"doc_id")
      }),

    // X85: temperature-based mixing (mT5/Pile rule) — stratum share
    // of the output ∝ n^α, rates DERIVED from the corpus's own counts
    // (vs X39's externally given token targets). α pinned to 0.5 in
    // the contract: sqrt is IEEE-correctly-rounded in both engines,
    // and the weight quantization (×10⁶ → BIGINT) makes the Σ exact,
    // so thresholds agree bit-for-bit.
    QueryDef(
      "q_temperature_mix",
      Some(s"""
        WITH sizes AS (
          SELECT source, count(*) AS n,
                 CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * 1e6)
                      AS BIGINT) AS w
          FROM documents GROUP BY source
        ), tot AS (
          SELECT CAST(sum(n) AS BIGINT) AS tn,
                 CAST(sum(w) AS BIGINT) AS tw
          FROM sizes
        ), rates AS (
          SELECT s.source,
                 least(1.0, $TempTargetFraction * CAST(t.tn AS DOUBLE)
                       * s.w / (CAST(t.tw AS DOUBLE) * s.n)) AS rate
          FROM sizes s, tot t
        )
        SELECT d.doc_id, d.source, round(r.rate, 6) AS mix_rate
        FROM documents d JOIN rates r USING (source)
        WHERE CAST(('0x' || substr(md5('$MixSalt'
                || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              < CAST(round(r.rate * 4294967296.0) AS BIGINT)
        ORDER BY d.doc_id
      """.trim),
      "X85 temperature-based corpus mixing (rates from corpus counts)")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.temperatureMix(table(spark, dir, "documents"),
            "doc_id", "source", alpha = 0.5,
            targetFraction = TempTargetFraction, salt = MixSalt)
          .select($"doc_id", $"source", round($"mix_rate", 6).as("mix_rate"))
          .orderBy($"doc_id")
      }),

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
          SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
                 count(*) AS n_distinct,
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

    // X41: corpus-relative token typicality — the frequency-based
    // CCNet-style quality signal; integer mass/count aggregates make
    // it hash-exact (the ln-based unigramNll twin is spec-verified).
    QueryDef(
      "q_typicality",
      Some(s"""
        WITH $toksCte, tc AS (
          SELECT doc_id, t, count(*) AS tf
          FROM (SELECT doc_id, unnest(w) AS t FROM toks)
          GROUP BY 1, 2
        ), g AS (
          SELECT t, CAST(sum(tf) AS BIGINT) AS cnt FROM tc GROUP BY 1
        )
        SELECT doc_id,
          CAST(sum(tf) AS BIGINT) AS n_tokens,
          CAST(sum(tf * cnt) AS BIGINT) AS mass,
          round(CAST(sum(tf * cnt) AS DOUBLE) / CAST(sum(tf) AS BIGINT), 6)
            AS typicality
        FROM tc JOIN g USING (t)
        GROUP BY doc_id
        ORDER BY doc_id
      """.trim),
      "X41 corpus-relative token typicality (integer-exact CCNet proxy)")(
      (spark, dir) => {
        import spark.implicits._
        val tc = graft.operators.InvertedIndex.termCounts(
          table(spark, dir, "documents"), "doc_id", "text")
        graft.operators.InvertedIndex.tokenTypicality(tc, "doc_id")
          .orderBy($"doc_id")
      }),

    // X75: CCNet-style corpus banding — every doc lands in a
    // low/mid/high typicality tercile (ntile over the exact integer
    // typicality ratio, ties on doc_id), the split CCNet makes on LM
    // perplexity before choosing which band trains. Pure composition
    // of X41's integer-exact signal + one deterministic window.
    QueryDef(
      "q_typicality_bands",
      Some(s"""
        WITH $toksCte, tc AS (
          SELECT doc_id, t, count(*) AS tf
          FROM (SELECT doc_id, unnest(w) AS t FROM toks)
          GROUP BY 1, 2
        ), g AS (
          SELECT t, CAST(sum(tf) AS BIGINT) AS cnt FROM tc GROUP BY 1
        ), ty AS (
          SELECT doc_id,
            CAST(sum(tf) AS BIGINT) AS n_tokens,
            CAST(sum(tf * cnt) AS BIGINT) AS mass
          FROM tc JOIN g USING (t)
          GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, mass,
               CASE ntile(3) OVER (ORDER BY CAST(mass AS DOUBLE) / n_tokens,
                                   doc_id)
                    WHEN 1 THEN 'low' WHEN 2 THEN 'mid'
                    ELSE 'high' END AS band
        FROM ty
        ORDER BY doc_id
      """.trim),
      "X75 typicality terciles (the CCNet head/middle/tail split)")(
      (spark, dir) => {
        import spark.implicits._
        // ntile(3) WITHOUT a global window: the two-phase distributed
        // rank (X108's globalRank — range-partitioned sort + partition
        // subtotal offsets) plus one broadcast count reproduces
        // ntile's tile arithmetic exactly (first n%k tiles get one
        // extra row), so no single-partition exchange at any scale.
        val tc = graft.operators.InvertedIndex.termCounts(
          table(spark, dir, "documents"), "doc_id", "text")
        val ty = graft.operators.InvertedIndex.tokenTypicality(tc, "doc_id")
          .withColumn("__ratio", $"mass".cast("double") / $"n_tokens")
        val ranked = graft.operators.CorpusOps.globalRank(
          ty, Seq(col("__ratio"), col("doc_id")))
        val n = ranked.agg(count(lit(1)).as("__n"))
        // tile i (1-based, k=3) holds n/3 rows, +1 for the first n%3
        val base = floor(col("__n") / 3).cast("long")
        val c1 = base + when(col("__n") % 3 >= 1, 1L).otherwise(0L)
        val c2 = base * 2 + least(col("__n") % 3, lit(2L))
        ranked.crossJoin(broadcast(n))
          .withColumn("band",
            when(col("__rank") + 1 <= c1, "low")
              .when(col("__rank") + 1 <= c2, "mid").otherwise("high"))
          .select($"doc_id", $"n_tokens", $"mass", $"band")
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

    // X62: duplicate-span REMOVAL (the cleaning step q_dup_span_coverage
    // only measures): cut every 8-token aligned slot whose exact text
    // occurs in ≥ 2 distinct docs, reassemble the survivors, report
    // the md5 of the cleaned text. Slot assembly, the repeated-span
    // table, and the cut are all equi-joins on exact strings —
    // verbatim reproducible in SQL.
    QueryDef(
      "q_span_clean",
      Some(s"""
        WITH $toksCte, spans AS (
          SELECT doc_id, (i - 1) // $SpanLen AS slot,
                 string_agg(w[i], ' ' ORDER BY i) AS span
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
          GROUP BY doc_id, (i - 1) // $SpanLen
        ), rep AS (
          SELECT span FROM (SELECT DISTINCT doc_id, span FROM spans)
          GROUP BY span HAVING count(*) > 1
        ), flagged AS (
          SELECT s.doc_id, s.slot, s.span, r.span IS NOT NULL AS dup
          FROM spans s LEFT JOIN rep r ON s.span = r.span
        )
        SELECT doc_id, count(*) AS n_slots,
               count(*) FILTER (WHERE dup) AS n_dropped,
               md5(coalesce(string_agg(span, ' ' ORDER BY slot)
                              FILTER (WHERE NOT dup), '')) AS clean_md5
        FROM flagged
        GROUP BY doc_id
        ORDER BY doc_id
      """.trim),
      "X62 cross-doc duplicate-span removal, md5 of cleaned text")(
      (spark, dir) => {
        import spark.implicits._
        Contamination.removeDuplicateSpans(
            table(spark, dir, "documents"), "doc_id", "text", SpanLen)
          .orderBy($"doc_id")
      }),

    // X79: ARBITRARY-OFFSET exact-substring removal (Lee et al. 2021
    // semantics) — the true form of the dedup X62 approximates with
    // aligned slots: every overlapping 8-gram with its start
    // position; grams in ≥ 2 distinct docs mark duplicated starts; a
    // token is cut iff a duplicated gram covers it (range window, no
    // explode); survivors reassemble. A passage duplicated mid-slot
    // — invisible to X62 — disappears here at any offset.
    QueryDef(
      "q_span_clean_anyoffset",
      Some(s"""
        WITH $toksCte, grams AS (
          SELECT doc_id, i - 1 AS s,
                 array_to_string(w[i:i+${AnyOffsetK - 1}], ' ') AS g
          FROM toks, unnest(range(1, len(w) - $AnyOffsetK + 2)) AS r(i)
          WHERE len(w) >= $AnyOffsetK
        ), dupg AS (
          SELECT g FROM (SELECT DISTINCT doc_id, g FROM grams)
          GROUP BY g HAVING count(*) > 1
        ), ds AS (
          SELECT grams.doc_id, grams.s FROM grams JOIN dupg USING (g)
        ), pos AS (
          SELECT doc_id, i - 1 AS p, w[i] AS t
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
        ), cov AS (
          SELECT pos.doc_id, pos.p, pos.t,
                 max(CASE WHEN ds.s IS NOT NULL THEN 1 END)
                   OVER (PARTITION BY pos.doc_id ORDER BY pos.p
                         RANGE BETWEEN ${AnyOffsetK - 1} PRECEDING
                           AND CURRENT ROW) AS c
          FROM pos LEFT JOIN ds
            ON pos.doc_id = ds.doc_id AND pos.p = ds.s
        ), agg AS (
          SELECT doc_id, count(*) AS n_tokens,
                 count(c) AS n_removed,
                 md5(coalesce(string_agg(t, ' ' ORDER BY p)
                                FILTER (WHERE c IS NULL), '')) AS clean_md5
          FROM cov GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_removed, 0) AS n_removed,
               coalesce(a.clean_md5, md5('')) AS clean_md5
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id
      """.trim),
      "X79 arbitrary-offset exact-substring removal, md5 of cleaned text")(
      (spark, dir) => {
        import spark.implicits._
        Contamination.removeDuplicateSpansAnyOffset(
            table(spark, dir, "documents"), "doc_id", "text", AnyOffsetK)
          .orderBy($"doc_id")
      }),

    // X63: top-V vocabulary coverage per language — the tokenizer
    // sizing query. Vocabulary = the corpus's 10 most frequent tokens
    // (count desc, token asc: the boundary tie resolves identically
    // in both engines); per-language token totals, covered counts,
    // and OOV rate (exact-integer division, one rounded double).
    QueryDef(
      "q_vocab_coverage",
      Some("""
        WITH t AS (
          SELECT lang,
                 unnest(list_filter(string_split_regex(lower(text), '\s+'),
                        x -> x <> '')) AS token
          FROM documents
        ), vocab AS (
          SELECT token FROM (
            SELECT token, count(*) AS n FROM t GROUP BY token
            ORDER BY n DESC, token LIMIT 10)
        ), probe AS (
          SELECT t.lang, t.token, v.token IS NOT NULL AS hit
          FROM t LEFT JOIN vocab v ON t.token = v.token
        )
        SELECT lang, count(*) AS n_tokens,
               count(*) FILTER (WHERE hit) AS n_covered,
               round(1.0 - CAST(count(*) FILTER (WHERE hit) AS DOUBLE)
                       / count(*), 6) AS oov_rate
        FROM probe
        GROUP BY lang
        ORDER BY lang
      """.trim),
      "X63 top-10 vocab coverage and OOV rate per language")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.vocabCoverage(
            table(spark, dir, "documents"), "text", "lang", vocabSize = 10)
          .orderBy($"lang")
      }),

    // X73: learned BPE merge table — the corpus collapses to its
    // word-frequency table (one distributed aggregate), the
    // inherently sequential merge loop runs driver-side over that
    // vocabulary-sized table (the standard trainer shape). The
    // oracle replays the trainer EXACTLY in DuckDB: a recursive CTE
    // carries the per-word symbol table across ranks, an aggregate +
    // argmax in the recursive term picks each rank's pair (count
    // desc, pair lexicographic — the Scala tie-break), and a nested
    // recursive scan applies the merge left-to-right per word.
    QueryDef(
      "q_bpe_merges",
      Some(bpeStateCte + """
        SELECT rank, bl AS "left", br AS "right", c AS "count" FROM (
          SELECT rank, syms[i] AS bl, syms[i+1] AS br,
                 CAST(sum(n) AS BIGINT) AS c,
                 row_number() OVER (PARTITION BY rank
                   ORDER BY sum(n) DESC, syms[i], syms[i+1]) AS rn
          FROM state, unnest(range(1, len(syms))) AS u(i)
          WHERE rank < 20
          GROUP BY rank, 2, 3
        ) WHERE rn = 1 AND c >= 2
        ORDER BY rank
      """.trim),
      "X73 first 20 learned BPE merges over the corpus word table")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.Bpe.trainMerges(
            table(spark, dir, "documents"), "text", numMerges = 20)
          .toDF()
          .select($"rank", $"left", $"right", $"count")
          .orderBy($"rank")
      }),

    // X78: corpus-scale BPE ENCODE — apply the trained merge table to
    // every document (the actual tokenize-the-corpus step after X73).
    // Spark side is a pure scan: the merge table rides the closure,
    // no shuffle anywhere. The oracle trains the same table via the
    // recursive-CTE trainer, takes each word's FINAL symbol split,
    // and reassembles documents by token position.
    QueryDef(
      "q_bpe_encode",
      Some(bpeStateCte + """,
        final AS (
          SELECT w, syms FROM (
            SELECT w, syms,
                   row_number() OVER (PARTITION BY w ORDER BY rank DESC) AS rn
            FROM state
          ) WHERE rn = 1
        ),
        toks AS (
          SELECT doc_id, i, w[i] AS w
          FROM (SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '') AS w
                FROM documents),
               unnest(range(1, len(w) + 1)) AS u(i)
        ),
        enc AS (
          SELECT t.doc_id, t.i, array_to_string(f.syms, ' ') AS e,
                 len(f.syms) AS k
          FROM toks t JOIN final f ON t.w = f.w
        ),
        agg AS (
          SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
                 string_agg(e, ' ' ORDER BY i) AS enc_text
          FROM enc GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.enc_text, '') AS enc_text
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id
      """.trim),
      "X78 corpus BPE encode with the X73-trained merge table")(
      (spark, dir) => {
        import spark.implicits._
        val docs = table(spark, dir, "documents")
        val merges = graft.operators.Bpe.trainMerges(
          docs, "text", numMerges = 20)
        graft.operators.Bpe.encodeDocs(docs, "doc_id", "text", merges)
          .orderBy($"doc_id")
      }),

    // X110: BPE decode round-trip — encode with the Sennrich `</w>`
    // end-of-word marker, decode with pure column math, and check the
    // decode reproduces the whitespace-normalized text. The oracle
    // replays the marked token count and the decoded length
    // independently (normalized text from `documents`), and asserts
    // `round_trip_ok` — the engine side only matches if its
    // encode∘decode really is the identity on every document.
    QueryDef(
      "q_bpe_roundtrip",
      Some(bpeStateCte + """,
        final AS (
          SELECT w, syms FROM (
            SELECT w, syms,
                   row_number() OVER (PARTITION BY w ORDER BY rank DESC) AS rn
            FROM state
          ) WHERE rn = 1
        ),
        toks AS (
          SELECT doc_id, w[i] AS w
          FROM (SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '') AS w
                FROM documents),
               unnest(range(1, len(w) + 1)) AS u(i)
        ),
        wc AS (
          SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(len(f.syms)) AS BIGINT) AS n_syms
          FROM toks t JOIN final f ON t.w = f.w
          GROUP BY t.doc_id
        ),
        norm AS (
          SELECT doc_id,
                 array_to_string(list_filter(
                   string_split_regex(lower(text), '\s+'),
                   x -> x <> ''), ' ') AS nt
          FROM documents
        )
        SELECT d.doc_id,
               coalesce(wc.n_syms + wc.n_words, 0) AS n_tokens,
               CAST(length(n.nt) AS BIGINT) AS n_dec_chars,
               true AS round_trip_ok
        FROM documents d
        JOIN norm n USING (doc_id)
        LEFT JOIN wc USING (doc_id)
        ORDER BY d.doc_id
      """.trim),
      "X110 BPE </w>-marked encode→decode round-trip check")(
      (spark, dir) => {
        import spark.implicits._
        val docs = table(spark, dir, "documents")
        val merges = graft.operators.Bpe.trainMerges(
          docs, "text", numMerges = 20)
        val enc = graft.operators.Bpe.encodeDocs(
          docs, "doc_id", "text", merges, marker = Some("</w>"))
        val dec = graft.operators.Bpe.decodeBpe($"enc_text", "</w>")
        enc.join(docs.select($"doc_id",
            concat_ws(" ", graft.operators.Dedup.tokens($"text")).as("__nt")),
            Seq("doc_id"))
          .select($"doc_id", $"n_tokens",
            length(dec).cast("long").as("n_dec_chars"),
            (dec === $"__nt").as("round_trip_ok"))
          .orderBy($"doc_id")
      }),

    // X134: tokenizer vocab-size sweep — tokens/word under the first
    // {5, 10, 20} merges. The oracle reads the per-rank state table
    // directly (a k-merge vocabulary is the rank-k state), so all
    // three sweep points replay exactly.
    QueryDef(
      "q_vocab_sweep",
      Some(bpeStateCte + """,
        picked AS (
          SELECT k, n, syms FROM (
            SELECT s.n, s.syms, u.k,
                   row_number() OVER (PARTITION BY u.k, s.w
                     ORDER BY s.rank DESC) AS rn
            FROM state s, unnest([5, 10, 20]) AS u(k)
            WHERE s.rank <= u.k
          ) WHERE rn = 1
        ),
        sweep AS (
          SELECT k, CAST(sum(n) AS BIGINT) AS total_words,
                 CAST(sum(n * len(syms)) AS BIGINT) AS total_tokens
          FROM picked GROUP BY k
        )
        SELECT CAST(k AS INTEGER) AS n_merges, total_words, total_tokens,
               round(CAST(total_tokens AS DOUBLE) / total_words, 6)
                 AS tokens_per_word
        FROM sweep
        ORDER BY n_merges
      """.trim),
      "X134 tokenizer vocab-size sweep (tokens/word at 5/10/20 merges)")(
      (spark, dir) => {
        import spark.implicits._
        graft.operators.Bpe.vocabSweep(
            table(spark, dir, "documents"), "text", Seq(5, 10, 20))
          .orderBy($"n_merges")
      }),

    // X121: WordPiece greedy encode over the X73-induced vocabulary —
    // the BERT matching rule with ## continuations and whole-word
    // [UNK] on greedy dead-ends. The oracle replays vocab derivation
    // AND the greedy walk (longest-prefix table + recursive position
    // walk), so the third tokenizer family is hash-exact.
    QueryDef(
      "q_wordpiece_encode",
      Some(bpeStateCte + """,
        final AS (
          SELECT w, syms FROM (
            SELECT w, syms,
                   row_number() OVER (PARTITION BY w ORDER BY rank DESC) AS rn
            FROM state
          ) WHERE rn = 1
        ),
        wpvocab AS (
          SELECT DISTINCT unnest(syms) AS p FROM final
        ),
        wpwords AS (SELECT w FROM final),
        lp AS (
          SELECT wd.w, u.pos,
                 (array_agg(v.p ORDER BY length(v.p) DESC, v.p))[1] AS p
          FROM wpwords wd
          CROSS JOIN unnest(range(1, length(wd.w) + 1)) AS u(pos)
          JOIN wpvocab v ON substring(wd.w, CAST(u.pos AS INT),
                                    length(v.p)) = v.p
          GROUP BY wd.w, u.pos
        ),
        seg AS (
          SELECT w, CAST(1 AS BIGINT) AS pos, CAST('' AS VARCHAR) AS acc,
                 CAST(0 AS BIGINT) AS np
          FROM wpwords
          UNION ALL
          SELECT s.w, s.pos + length(l.p),
                 CASE WHEN s.pos = 1 THEN l.p
                      ELSE s.acc || ' ##' || l.p END,
                 s.np + 1
          FROM seg s JOIN lp l ON l.w = s.w AND l.pos = s.pos
          WHERE s.pos <= length(s.w)
        ),
        done AS (
          SELECT w, acc, np FROM seg WHERE pos = length(w) + 1
        ),
        wenc AS (
          SELECT wd.w, coalesce(d.acc, '[UNK]') AS enc,
                 coalesce(d.np, 1) AS np
          FROM wpwords wd LEFT JOIN done d USING (w)
        ),
        toks2 AS (
          SELECT doc_id, i, w[i] AS w
          FROM (SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '') AS w
                FROM documents),
               unnest(range(1, len(w) + 1)) AS u(i)
        ),
        agg AS (
          SELECT t.doc_id, CAST(sum(e.np) AS BIGINT) AS n_pieces,
                 string_agg(e.enc, ' ' ORDER BY i) AS enc_text
          FROM toks2 t JOIN wenc e USING (w)
          GROUP BY t.doc_id
        )
        SELECT d.doc_id, coalesce(a.n_pieces, 0) AS n_pieces,
               coalesce(a.enc_text, '') AS enc_text
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id
      """.trim),
      "X121 WordPiece greedy encode (## continuations, [UNK] dead-ends)")(
      (spark, dir) => {
        import spark.implicits._
        val docs = table(spark, dir, "documents")
        val merges = graft.operators.Bpe.trainMerges(
          docs, "text", numMerges = 20)
        graft.operators.Bpe.wordpieceEncodeDocs(docs, "doc_id", "text",
            merges)
          .orderBy($"doc_id")
      }),

    // X118: unigram-LM tokenizer (SentencePiece model), r14: the
    // INTEGER-STATE fit (hard-EM / Viterbi training on the Q12
    // probability grid, scored by the exact fixed-point integer
    // log2) — every step order-free integer arithmetic, so the
    // DuckDB oracle replays the ENTIRE fit (seeding, each sweep's
    // Viterbi DP, every prune) and the queries carry full hash
    // oracles. The soft-EM float trainer remains as Unigram.train
    // (spec-asserted); algorithmic guarantees for both live in
    // UnigramSpec.
    QueryDef(
      "q_unigram_vocab",
      Some(unigramVocabSql),
      "X118 unigram-LM fitted piece vocabulary (integer hard-EM)")(
      (spark, dir) => {
        import spark.implicits._
        Unigram.trainL(table(spark, dir, "documents"), "text",
            vocabSize = UniV, seedSize = UniSeed, maxPieceLen = UniMpl,
            emIters = UniEmi, rounds = UniR)
          .toDF()
          .select($"piece", $"pQ12".as("p_q12"))
          .orderBy($"piece")
      }),

    QueryDef(
      "q_unigram_encode",
      Some(unigramEncodeSql),
      "X118 corpus Viterbi encode under the fitted unigram vocabulary")(
      (spark, dir) => {
        import spark.implicits._
        val docs = table(spark, dir, "documents")
        val vocab = Unigram.trainL(docs, "text", vocabSize = UniV,
          seedSize = UniSeed, maxPieceLen = UniMpl, emIters = UniEmi,
          rounds = UniR)
        Unigram.encodeDocsL(docs, "doc_id", "text", vocab, UniMpl)
          .orderBy($"doc_id")
      }),

    // X64: within-word adjacent character-pair counts — the BPE seed
    // statistic (the tokenizer's first merge is the top pair). Pure
    // integer counts over exact substrings; top-30 with ties on the
    // pair text.
    QueryDef(
      "q_bpe_pairs",
      Some("""
        WITH words AS (
          SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                        x -> x <> '')) AS w
          FROM documents
        ), pairs AS (
          SELECT substring(w, i, 2) AS pair
          FROM words, unnest(range(1, length(w))) AS r(i)
          WHERE length(w) >= 2
        )
        SELECT pair, count(*) AS n
        FROM pairs
        GROUP BY pair
        ORDER BY n DESC, pair
        LIMIT 30
      """.trim),
      "X64 top-30 within-word character pairs (BPE seed statistic)")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.charPairCounts(
            table(spark, dir, "documents"), "text", k = 30)
          .orderBy($"n".desc, $"pair")
      }),

    // X81: concat-and-split sequence packing — all docs' tokens in
    // doc_id order form one stream; sequence s owns tokens
    // [s·L, (s+1)·L). Pure integer positions; the oracle replays the
    // identical global prefix sum.
    QueryDef(
      "q_pack_sequences",
      Some(s"""
        WITH $toksCte, offs AS (
          SELECT doc_id, w, len(w) AS n,
            coalesce(sum(len(w)) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
          FROM toks
        ), tok AS (
          SELECT st + i - 1 AS gpos, w[i] AS t
          FROM offs, unnest(range(1, n + 1)) AS u(i)
        )
        SELECT CAST(gpos // $PackSeqLen AS BIGINT) AS seq_id,
               count(*) AS n_tokens,
               string_agg(t, ' ' ORDER BY gpos) AS seq_text
        FROM tok
        GROUP BY 1
        ORDER BY seq_id
      """.trim),
      "X81 GPT-style concat-and-split packing into fixed-length sequences")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.packSequences(
            table(spark, dir, "documents"), "doc_id", "text", PackSeqLen)
          .orderBy($"seq_id")
      }),

    // X100: packed-sequence attention boundaries — the (sequence,
    // document) span map block-diagonal attention masking needs after
    // X81 packing. Pure integer interval arithmetic on the skinny
    // prefix-summed table; the oracle replays it from the same
    // window prefix as q_pack_sequences.
    QueryDef(
      "q_pack_boundaries",
      Some(s"""
        WITH $toksCte, offs AS (
          SELECT doc_id, len(w) AS n,
            coalesce(sum(len(w)) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
          FROM toks
        ), spans AS (
          SELECT doc_id, n, st,
                 unnest(range(CAST(st // $PackSeqLen AS BIGINT),
                              CAST((st + n - 1) // $PackSeqLen + 1
                                   AS BIGINT))) AS s
          FROM offs WHERE n > 0
        )
        SELECT CAST(s AS BIGINT) AS seq_id, doc_id,
               CAST(greatest(st - s * $PackSeqLen, 0) AS BIGINT)
                 AS start_in_seq,
               CAST(greatest(s * $PackSeqLen - st, 0) AS BIGINT)
                 AS start_in_doc,
               CAST(least(st + n, (s + 1) * $PackSeqLen)
                 - greatest(st, s * $PackSeqLen) AS BIGINT) AS len
        FROM spans
        ORDER BY seq_id, start_in_seq
      """.trim),
      "X100 packed-sequence doc-span map for block-diagonal attention")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.packBoundaries(
            table(spark, dir, "documents"), "doc_id", "text", PackSeqLen)
          .orderBy($"seq_id", $"start_in_seq")
      }),

    // X84: tokenizer fertility — tokens-per-word and chars-per-token
    // of the X73-trained BPE, by source. THE go/no-go diagnostic for
    // a tokenizer over a new corpus mix; integer sums, exact ratios.
    QueryDef(
      "q_bpe_fertility",
      Some(bpeStateCte + s""",
        final AS (
          SELECT w, syms FROM (
            SELECT w, syms,
                   row_number() OVER (PARTITION BY w ORDER BY rank DESC) AS rn
            FROM state
          ) WHERE rn = 1
        ),
        toks AS (
          SELECT doc_id, i, w[i] AS w
          FROM (SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\\s+'),
                    x -> x <> '') AS w
                FROM documents),
               unnest(range(1, len(w) + 1)) AS u(i)
        ),
        per_doc AS (
          SELECT t.doc_id,
                 CAST(sum(len(f.syms)) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(length(t.w)) AS BIGINT) AS n_chars
          FROM toks t JOIN final f ON t.w = f.w
          GROUP BY t.doc_id
        )
        SELECT d.source,
               count(*) AS n_docs,
               CAST(coalesce(sum(p.n_tokens), 0) AS BIGINT) AS total_tokens,
               CAST(coalesce(sum(p.n_words), 0) AS BIGINT) AS total_words,
               CAST(coalesce(sum(p.n_chars), 0) AS BIGINT) AS total_chars,
               -- NULL (not NaN/div-by-zero) for a source with no words
               -- at all, matching the Spark side's when() guard
               round(CASE WHEN coalesce(sum(p.n_words), 0) = 0 THEN NULL
                     ELSE CAST(sum(p.n_tokens) AS DOUBLE) / sum(p.n_words)
                     END, 6) AS fertility,
               round(CASE WHEN coalesce(sum(p.n_tokens), 0) = 0 THEN NULL
                     ELSE CAST(sum(p.n_chars) AS DOUBLE) / sum(p.n_tokens)
                     END, 6) AS chars_per_token
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        GROUP BY d.source
        ORDER BY d.source
      """.trim),
      "X84 BPE tokenizer fertility and compression by source")(
      (spark, dir) => {
        import spark.implicits._
        import graft.operators.{Bpe, Dedup}
        val docs = table(spark, dir, "documents")
        val merges = Bpe.trainMerges(docs, "text", numMerges = 20)
        val enc = Bpe.encodeDocs(docs, "doc_id", "text", merges)
        val stats = docs
          .select($"doc_id", $"source", Dedup.tokens($"text").as("__w"))
          .select($"doc_id", $"source",
            size($"__w").cast("long").as("__nw"),
            aggregate($"__w", lit(0L), (a, x) => a + length(x)).as("__nc"))
        enc.join(stats, Seq("doc_id"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("total_tokens"),
            sum($"__nw").as("total_words"),
            sum($"__nc").as("total_chars"))
          .select($"source", $"n_docs", $"total_tokens", $"total_words",
            $"total_chars",
            round(when($"total_words" === 0, lit(null))
              .otherwise($"total_tokens".cast("double") / $"total_words"), 6)
              .as("fertility"),
            round(when($"total_tokens" === 0, lit(null))
              .otherwise($"total_chars".cast("double") / $"total_tokens"), 6)
              .as("chars_per_token"))
          .orderBy($"source")
      }),

    // X93: DSIR importance weights (hashed unigram+bigram bag models,
    // add-one smoothing) — "how Wikipedia-like is each raw doc",
    // with src0-src2 standing in as the target corpus. Bucket hash is
    // the repo's one md5 band (mod 1024); every count exact; each
    // bucket log-ratio a fixed-shape double expression; per-doc sums
    // round(6).
    QueryDef(
      "q_dsir_weights",
      Some("""
        WITH toks AS (
          SELECT doc_id, source,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS w
          FROM documents
        ), grams AS (
          SELECT doc_id, source, w[i] AS g
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
          UNION ALL
          SELECT doc_id, source, w[i] || chr(1) || w[i+1] AS g
          FROM toks, unnest(range(1, len(w))) AS r(i)
        ), b AS (
          SELECT doc_id, source IN ('src0', 'src1', 'src2') AS t,
                 CAST(('0x' || substr(md5('dsir' || g), 1, 8)) AS BIGINT)
                   % 1024 AS b
          FROM grams
        ), bc AS (
          SELECT b, count(*) AS cr,
                 CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ct
          FROM b GROUP BY b
        ), tot AS (
          SELECT CAST(sum(cr) AS BIGINT) AS tr,
                 CAST(sum(ct) AS BIGINT) AS tt
          FROM bc
        ), lr AS (
          SELECT b, ln(CAST(ct + 1 AS DOUBLE) / (tt + 1024))
                    - ln(CAST(cr + 1 AS DOUBLE) / (tr + 1024)) AS lr
          FROM bc, tot
        )
        SELECT x.doc_id, count(*) AS n_grams,
               round(sum(l.lr), 6) AS log_weight
        FROM b x JOIN lr l USING (b)
        GROUP BY x.doc_id
        ORDER BY x.doc_id
      """.trim),
      "X93 DSIR hashed-ngram importance weights vs a target slice")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.dsirWeights(table(spark, dir, "documents"),
            "doc_id", "text",
            isTarget = $"source".isin("src0", "src1", "src2"))
          .orderBy($"doc_id")
      }),

    // X95: UniMax budget allocation — waterfill a 95%-of-corpus token
    // budget across sources with a 1-epoch cap (sources under the
    // waterline keep everything, big sources subsample toward the
    // common level). The entire waterfill runs on the |sources|-row
    // table; prefix sums accumulate in the SAME sorted order in both
    // engines, so the level is bit-identical before round(6).
    QueryDef(
      "q_unimax_alloc",
      Some("""
        WITH t AS (
          SELECT source,
                 CAST(sum(len(list_filter(
                   string_split_regex(lower(text), '\s+'),
                   x -> x <> ''))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ), r AS (
          SELECT source, n_tokens,
                 CAST(n_tokens AS DOUBLE) * CAST(1.0 AS DOUBLE) AS capacity,
                 row_number() OVER (
                   ORDER BY CAST(n_tokens AS DOUBLE) * CAST(1.0 AS DOUBLE),
                            source) AS i,
                 count(*) OVER () AS k,
                 CAST(sum(n_tokens) OVER () AS BIGINT) AS tot,
                 coalesce(sum(CAST(n_tokens AS DOUBLE) * CAST(1.0 AS DOUBLE))
                   OVER (ORDER BY CAST(n_tokens AS DOUBLE) * CAST(1.0 AS DOUBLE),
                         source
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   CAST(0.0 AS DOUBLE)) AS pre
          FROM t
        ), tent AS (
          SELECT *, (CAST(tot AS DOUBLE) * CAST(0.95 AS DOUBLE) - pre)
                      / CAST(k - i + 1 AS DOUBLE) AS tentv
          FROM r
        ), lvl AS (
          SELECT min_by(tentv, i) AS level FROM tent WHERE tentv <= capacity
        )
        SELECT source, n_tokens,
               round(capacity, 6) AS capacity,
               round(CASE WHEN level IS NULL THEN capacity
                     ELSE least(capacity, level) END, 6) AS allocation,
               round(CASE WHEN level IS NULL THEN capacity
                     ELSE least(capacity, level) END
                     / CAST(n_tokens AS DOUBLE), 6) AS epochs
        FROM tent, lvl
        ORDER BY source
      """.trim),
      "X95 UniMax waterfill allocation (95% budget, 1-epoch cap)")(
      (spark, dir) => {
        import spark.implicits._
        val counted = table(spark, dir, "documents")
          .select($"source",
            size(graft.operators.Dedup.tokens($"text")).as("n_tokens"))
        CorpusOps.unimaxAllocation(counted, "source", "n_tokens",
            budgetFraction = 0.95, maxEpochs = 1.0)
          .orderBy($"source")
      }),

    // X99: T5 span corruption (15% density, mean span 3 — the
    // published defaults via blockSize=20, spanLen=3) with
    // deterministic md5 span placement. The oracle replays block
    // arithmetic, offsets, sentinel numbering, and both reassemblies
    // independently; string_agg and array_join both skip the
    // non-emitted (NULL) slots.
    QueryDef(
      "q_span_corruption",
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS w
          FROM documents
        ), tk AS (
          SELECT doc_id, i - 1 AS pos, w[i] AS t, (i - 1) // 20 AS blk
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
        ), o AS (
          SELECT DISTINCT doc_id, blk,
            CAST(('0x' || substr(md5('span' || CAST(doc_id AS VARCHAR)
              || '#' || CAST(blk AS VARCHAR)), 1, 8)) AS BIGINT) % 18 AS o
          FROM tk
        ), m AS (
          SELECT tk.doc_id, tk.pos, tk.t, tk.blk,
                 (tk.pos % 20 >= o.o AND tk.pos % 20 < o.o + 3) AS corr
          FROM tk JOIN o USING (doc_id, blk)
        ), fc AS (
          SELECT doc_id, blk, min(CASE WHEN corr THEN pos END) AS fcpos
          FROM m GROUP BY 1, 2
        ), ks AS (
          SELECT doc_id, blk,
                 row_number() OVER (PARTITION BY doc_id ORDER BY blk) - 1
                   AS k
          FROM (SELECT DISTINCT doc_id, blk FROM m WHERE corr)
        ), agg AS (
          SELECT m.doc_id,
            count(*) AS n_tokens,
            CAST(sum(CASE WHEN corr THEN 1 ELSE 0 END) AS BIGINT)
              AS n_corrupted,
            max(k.k) + 1 AS nspans,
            string_agg(CASE WHEN NOT corr THEN t
                            WHEN pos = f.fcpos
                              THEN '<extra_id_' || k.k || '>'
                       END, ' ' ORDER BY pos) AS input_text,
            string_agg(CASE WHEN corr AND pos = f.fcpos
                              THEN '<extra_id_' || k.k || '>' || ' ' || t
                            WHEN corr THEN t
                       END, ' ' ORDER BY pos) AS tgt
          FROM m
          LEFT JOIN fc f USING (doc_id, blk)
          LEFT JOIN ks k USING (doc_id, blk)
          GROUP BY m.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(a.n_corrupted, 0) AS BIGINT) AS n_corrupted,
               coalesce(a.input_text, '') AS input_text,
               CASE WHEN a.nspans IS NULL THEN ''
                    ELSE a.tgt || ' <extra_id_' || a.nspans || '>'
               END AS target_text
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id
      """.trim),
      "X99 T5 span corruption (deterministic md5 placement, 15%/3)")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.spanCorruption(
            table(spark, dir, "documents"), "doc_id", "text",
            blockSize = 20, spanLen = 3, salt = "span")
          .orderBy($"doc_id")
      }),

    // X113: contrastive span-pair prep — two deterministic md5 crops
    // per doc (DeCLUTR views) with the interval-overlap report. Fully
    // integer/slice arithmetic, so views, offsets, and overlaps
    // replay exactly.
    QueryDef(
      "q_contrastive_pairs",
      Some(s"""
        WITH $toksCte, t AS (
          SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tokens
          FROM toks WHERE len(w) >= 4
        ), p AS (
          SELECT doc_id, w, n_tokens,
                 CAST(ceil(n_tokens * 0.6) AS BIGINT) AS l,
                 CAST(('0x' || substr(md5('contrast'
                     || CAST(doc_id AS VARCHAR) || 'a'), 1, 8)) AS BIGINT)
                   % (n_tokens - CAST(ceil(n_tokens * 0.6) AS BIGINT) + 1)
                   AS sa,
                 CAST(('0x' || substr(md5('contrast'
                     || CAST(doc_id AS VARCHAR) || 'b'), 1, 8)) AS BIGINT)
                   % (n_tokens - CAST(ceil(n_tokens * 0.6) AS BIGINT) + 1)
                   AS sb
          FROM t
        )
        SELECT doc_id, n_tokens, sa AS start_a, sb AS start_b,
               l AS crop_len,
               array_to_string(w[sa+1 : sa+l], ' ') AS view_a,
               array_to_string(w[sb+1 : sb+l], ' ') AS view_b,
               greatest(CAST(0 AS BIGINT),
                 least(sa + l, sb + l) - greatest(sa, sb))
                 AS overlap_tokens
        FROM p
        ORDER BY doc_id
      """.trim),
      "X113 contrastive span-pair views (DeCLUTR crops, md5 placement)")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.contrastivePairs(table(spark, dir, "documents"),
            "doc_id", "text", cropFraction = 0.6, minTokens = 4,
            salt = "contrast")
          .orderBy($"doc_id")
      }),

    // X111: content-defined chunking — FastCDC-style boundaries from
    // a trailing-window polynomial hash; per-chunk md5 + corpus-wide
    // copy counts. Pure integer boundary math, so every chunk offset,
    // length, hash, and copy count replays exactly.
    QueryDef(
      "q_cdc_chunks",
      Some("""
        WITH c AS (
          SELECT doc_id, text,
                 list_transform(regexp_extract_all(text, '.'),
                   ch -> CAST(unicode(ch) AS BIGINT)) AS codes
          FROM documents
        ), b AS (
          SELECT doc_id, text, codes, len(codes) AS n
          FROM c WHERE len(codes) > 0
        ), k AS (
          SELECT doc_id, text, n,
            list_concat(list_concat([CAST(0 AS BIGINT)],
              list_filter(range(8, n + 1), p ->
                (codes[p] + codes[p-1]*31 + codes[p-2]*961
                 + codes[p-3]*29791 + codes[p-4]*923521
                 + codes[p-5]*28629151 + codes[p-6]*887503681
                 + codes[p-7]*27512614111) % 2147483648 % 64 = 0
                AND p < n)),
              [CAST(n AS BIGINT)]) AS cuts
          FROM b
        ), seg AS (
          SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_idx,
                 CAST(cuts[i] AS BIGINT) AS start_pos,
                 CAST(cuts[i+1] - cuts[i] AS BIGINT) AS chunk_len,
                 md5(substring(text, CAST(cuts[i] + 1 AS INT),
                               CAST(cuts[i+1] - cuts[i] AS INT)))
                   AS chunk_hash
          FROM k, unnest(range(1, len(cuts))) AS u(i)
        )
        SELECT doc_id, chunk_idx, start_pos, chunk_len, chunk_hash,
               CAST(count(*) OVER (PARTITION BY chunk_hash) AS BIGINT)
                 AS n_copies
        FROM seg
        ORDER BY doc_id, chunk_idx
      """.trim),
      "X111 content-defined chunking with corpus-wide copy counts")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.cdcChunks(table(spark, dir, "documents"),
            "doc_id", "text", window = 8, mask = 64)
          .orderBy($"doc_id", $"chunk_idx")
      }),

    // X109: hashed linear quality classifier — fastText-shape
    // inference with md5-derived fixed weights; integer scorer, so
    // per-doc score/keep replay exactly.
    QueryDef(
      "q_quality_classifier",
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS w
          FROM documents
        ), grams AS (
          SELECT doc_id, w[i] AS g
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
          UNION ALL
          SELECT doc_id, w[i] || chr(1) || w[i+1] AS g
          FROM toks, unnest(range(1, len(w))) AS r(i)
        ), wq AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5('qclfw' || CAST(
                     CAST(('0x' || substr(md5('qclf' || g), 1, 8)) AS BIGINT)
                       % 1024 AS VARCHAR)), 1, 8)) AS BIGINT)
                   - 2147483648 AS q
          FROM grams
        ), s AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(q) AS BIGINT) AS sq
          FROM wq GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(s.n_grams, 0) AS n_grams,
               round(CAST(s.sq AS DOUBLE) / (s.n_grams * 2147483648.0), 6)
                 AS score,
               coalesce(s.sq >= 0, false) AS keep
        FROM documents d LEFT JOIN s USING (doc_id)
        ORDER BY d.doc_id
      """.trim),
      "X109 hashed linear (fastText-shape) quality classifier")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.qualityClassifier(
            table(spark, dir, "documents"), "doc_id", "text",
            buckets = 1024, salt = "qclf")
          .orderBy($"doc_id")
      }),

    // X119: Poisson-bootstrap CI for mean tokens/doc — md5 inverse-CDF
    // Poisson(1) weights on fixed integer thresholds, so replicate
    // means (and the percentile band over them) replay exactly.
    QueryDef(
      "q_bootstrap_ci",
      Some(s"""
        WITH $toksCte, t AS (
          -- micro-unit quantization (round(v*1e6) as BIGINT): v is
          -- integral here so this is exact ×10⁶, but it mirrors the
          -- engine's fixed-point path for fractional statistics
          SELECT doc_id, CAST(round(len(w) * 1000000.0) AS BIGINT) AS v
          FROM toks
        ), sp AS (
          SELECT doc_id, v, r,
                 CAST(('0x' || substr(md5('boot'
                   || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(r AS VARCHAR)), 1, 8)) AS BIGINT) AS b
          FROM t, unnest(range(0, 64)) AS u(r)
        ), wts AS (
          SELECT v, r,
                 CAST(CASE WHEN b < 1580030168 THEN 0
                      WHEN b < 3160060337 THEN 1
                      WHEN b < 3950075421 THEN 2
                      WHEN b < 4213413783 THEN 3
                      WHEN b < 4279248373 THEN 4
                      WHEN b < 4292415291 THEN 5
                      WHEN b < 4294609777 THEN 6
                      ELSE 7 END AS BIGINT) AS w
          FROM sp
        ), rep AS (
          SELECT r,
                 CAST(CAST(sum(w * v) AS BIGINT) AS DOUBLE)
                   / CAST(sum(w) AS BIGINT) / 1000000.0 AS m
          FROM wts GROUP BY r
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(v) AS BIGINT) AS s
          FROM t
        )
        SELECT f.n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM rep) AS n_replicates,
               round(CAST(f.s AS DOUBLE) / f.n_rows / 1000000.0, 6)
                 AS point_mean,
               round((SELECT quantile_cont(m, 0.025) FROM rep), 6) AS ci_lo,
               round((SELECT quantile_cont(m, 0.975) FROM rep), 6) AS ci_hi
        FROM tot f
      """.trim),
      "X119 Poisson-bootstrap CI for mean tokens per document")(
      (spark, dir) => {
        import spark.implicits._
        val counted = table(spark, dir, "documents")
          .select($"doc_id",
            size(graft.operators.Dedup.tokens($"text")).as("n_tokens"))
        CorpusOps.bootstrapCI(counted, "doc_id", "n_tokens",
          replicates = 64, salt = "boot")
      }),

    // X115: per-source score calibration — X109's classifier scores
    // z-normalized and rank-percentiled WITHIN each source (the CCNet
    // per-group thresholding shape). Micro-unit integer moments, so
    // z and pct replay exactly.
    QueryDef(
      "q_score_calibration",
      Some("""
        WITH toks AS (
          SELECT doc_id, source,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS w
          FROM documents
        ), grams AS (
          SELECT doc_id, source, w[i] AS g
          FROM toks, unnest(range(1, len(w) + 1)) AS r(i)
          UNION ALL
          SELECT doc_id, source, w[i] || chr(1) || w[i+1] AS g
          FROM toks, unnest(range(1, len(w))) AS r(i)
        ), wq AS (
          SELECT doc_id, source,
                 CAST(('0x' || substr(md5('qclfw' || CAST(
                     CAST(('0x' || substr(md5('qclf' || g), 1, 8)) AS BIGINT)
                       % 1024 AS VARCHAR)), 1, 8)) AS BIGINT)
                   - 2147483648 AS q
          FROM grams
        ), s AS (
          SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(q) AS BIGINT) AS sq
          FROM wq GROUP BY doc_id, source
        ), sc AS (
          SELECT doc_id, source,
                 round(CAST(sq AS DOUBLE) / (n_grams * 2147483648.0), 6)
                   AS score
          FROM s
        ), qz AS (
          SELECT doc_id, source, score,
                 CAST(round(score * 1e6, 0) AS BIGINT) AS qv
          FROM sc
        ), m AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(qv) AS BIGINT) AS s1,
                 CAST(sum(qv * qv) AS BIGINT) AS s2
          FROM qz GROUP BY source
        ), r AS (
          SELECT qz.doc_id, qz.source, qz.score, qz.qv, m.n, m.s1, m.s2,
                 row_number() OVER (PARTITION BY qz.source
                   ORDER BY qv, doc_id) AS rk
          FROM qz JOIN m USING (source)
        )
        SELECT doc_id, source, score,
               CASE WHEN n >= 2 AND
                         CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n > 0
                    THEN round((qv - CAST(s1 AS DOUBLE) / n)
                      / sqrt((CAST(s2 AS DOUBLE)
                              - CAST(s1 AS DOUBLE) * s1 / n) / n), 6)
               END AS z_in_group,
               round(CASE WHEN n > 1
                          THEN CAST(rk - 1 AS DOUBLE) / (n - 1)
                          ELSE 0.0 END, 6) AS pct_in_group
        FROM r
        ORDER BY doc_id
      """.trim),
      "X115 per-source calibration (z + percentile) of X109 scores")(
      (spark, dir) => {
        import spark.implicits._
        val docs = table(spark, dir, "documents")
        val scored = CorpusOps.qualityClassifier(docs, "doc_id", "text")
          .join(docs.select($"doc_id", $"source"), "doc_id")
        CorpusOps.calibrateScores(scored, "source", "doc_id", "score")
          .select($"doc_id", $"source", $"score", $"z_in_group",
            $"pct_in_group")
          .orderBy($"doc_id")
      }),

    // X108: competence-based curriculum schedule — rarity difficulty
    // in integer nano-log units, 4 equal-population stages, md5
    // within-stage shuffle. The oracle replays the full integer
    // pipeline, so a drift anywhere (word counts, quantized logs,
    // boundary comparisons, the two-phase rank) breaks doc-level
    // integers.
    QueryDef(
      "q_curriculum",
      Some(s"""
        WITH $toksCte, tok AS (
          SELECT doc_id, unnest(w) AS t FROM toks
        ), wf AS (
          SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1
        ), total AS (
          SELECT CAST(round(ln(CAST(sum(c) AS BIGINT)) * 1e9, 0) AS BIGINT)
            AS lnn
          FROM wf
        ), per AS (
          SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(CAST(round(ln(c) * 1e9, 0) AS BIGINT)) AS BIGINT)
                   AS slc
          FROM tok JOIN wf USING (t) GROUP BY 1
        ), d AS (
          SELECT doc_id,
                 coalesce(n_tokens, 0) AS n_tokens,
                 coalesce(n_tokens, 0) * (SELECT lnn FROM total)
                   - coalesce(slc, 0) AS dq
          FROM documents LEFT JOIN per USING (doc_id)
        ), b AS (
          SELECT quantile_cont(dq, 0.25) AS b0,
                 quantile_cont(dq, 0.5) AS b1,
                 quantile_cont(dq, 0.75) AS b2
          FROM d
        ), st AS (
          SELECT doc_id, n_tokens, dq,
                 1 + (dq > b0)::INT + (dq > b1)::INT + (dq > b2)::INT
                   AS stage,
                 CAST(('0x' || substr(md5('curriculum'
                   || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS k
          FROM d, b
        )
        SELECT doc_id, n_tokens, round(dq / 1e9, 6) AS difficulty, stage,
               CAST(row_number() OVER (PARTITION BY stage
                 ORDER BY k, doc_id) - 1 AS BIGINT) AS pos_in_stage
        FROM st
        ORDER BY doc_id
      """.trim),
      "X108 competence-based curriculum schedule (rarity, 4 stages)")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.curriculumSchedule(
            table(spark, dir, "documents"), "doc_id", "text",
            nStages = 4)
          .orderBy($"doc_id")
      }),

    // X136: CCNet line-level boilerplate dedup — the corpus has no
    // newlines, so both sides build deterministic 6-token "lines"
    // from the token array in pure array arithmetic, then run the
    // real operator: normalized line keys (lower/trim/digit-strip),
    // keys in >= 2 distinct docs cut everywhere, per-doc md5 of the
    // surviving text. Hash-exact.
    QueryDef(
      "q_line_dedup",
      Some(s"""
        WITH $toksCte, ln AS (
          SELECT doc_id, i AS li,
                 array_to_string(w[(i*6+1):(i*6+6)], ' ') AS line
          FROM toks, unnest(range(0, greatest((len(w)+5)//6, 0))) AS r(i)
          WHERE len(w) > 0
        ), keyed AS (
          SELECT doc_id, li, line,
                 md5(regexp_replace(lower(trim(line)), '[0-9]', '', 'g'))
                   AS k
          FROM ln
        ), boiler AS (
          SELECT k FROM (
            SELECT DISTINCT doc_id, k FROM keyed WHERE trim(line) <> '')
          GROUP BY k HAVING count(*) >= 2
        ), marked AS (
          SELECT doc_id, li, line,
                 (k NOT IN (SELECT k FROM boiler) OR trim(line) = '')
                   AS keep
          FROM keyed
        ), agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
                 CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
                 md5(array_to_string(
                   list(line ORDER BY li) FILTER (WHERE keep), chr(10)))
                   AS clean_md5
          FROM marked GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(a.n_lines, 0) AS n_lines,
               coalesce(a.n_kept, 0) AS n_kept,
               round(CASE WHEN coalesce(a.n_lines, 0) = 0 THEN 0.0
                     ELSE CAST(a.n_lines - a.n_kept AS DOUBLE) / a.n_lines
                     END, 6) AS removed_ratio,
               coalesce(a.clean_md5, md5('')) AS clean_md5
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id
      """.trim),
      "X136 CCNet line-level boilerplate removal (6-token lines)")(
      (spark, dir) => {
        import spark.implicits._
        val lined = table(spark, dir, "documents")
          .select($"doc_id",
            graft.operators.Dedup.tokens($"text").as("__w"))
          .select($"doc_id",
            when(size($"__w") === 0, array().cast("array<string>"))
              .otherwise(transform(
                sequence(lit(0), floor((size($"__w") - 1) / 6).cast("int")),
                i => array_join(slice($"__w", i * 6 + 1, lit(6)), " ")))
              .as("lines"))
        CorpusOps.lineDedup(lined, "doc_id", "lines", minDocs = 2)
          .orderBy($"doc_id")
      }),

    // X137: fill-in-the-middle transform — apply decision and both
    // cut points are md5 draws, so the PSM re-ordering replays
    // verbatim: the oracle rebuilds <PRE> prefix <SUF> suffix <MID>
    // middle per doc and hashes it. Hash-exact.
    QueryDef(
      "q_fim_transform",
      Some(s"""
        WITH $toksCte, d AS (
          SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
                 CAST(('0x' || substr(md5('fim' ||
                   CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   < 3865470566 AND len(w) > 0 AS applied,
                 CAST(('0x' || substr(md5('fim:1' ||
                   CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % (len(w) + 1) AS d1,
                 CAST(('0x' || substr(md5('fim:2' ||
                   CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % (len(w) + 1) AS d2
          FROM toks
        ), c AS (
          SELECT doc_id, w, n, applied,
                 least(d1, d2) AS lo, greatest(d1, d2) AS hi
          FROM d
        )
        SELECT doc_id, n AS n_tokens, applied AS fim_applied,
               CASE WHEN applied THEN lo END AS cut_lo,
               CASE WHEN applied THEN hi END AS cut_hi,
               md5(CASE WHEN applied THEN
                 array_to_string(
                   ['<PRE>'] || w[1:lo] || ['<SUF>'] || w[(hi+1):n]
                     || ['<MID>'] || w[(lo+1):hi], ' ')
                 ELSE array_to_string(w, ' ') END) AS out_md5
        FROM c
        ORDER BY doc_id
      """.trim),
      "X137 fill-in-the-middle PSM transform (md5-deterministic)")(
      (spark, dir) => {
        import spark.implicits._
        CorpusOps.fimTransform(table(spark, dir, "documents"),
            "doc_id", "text", fimRate = 0.9)
          .orderBy($"doc_id")
      }),
  )
}
