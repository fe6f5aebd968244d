package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.asr.{RecWord, WordRecognizer}
import graft.audio.{Dsp, Pcm}
import graft.core._
import graft.functions.TextFunctions
import graft.operators.{Align, SequenceMatcher, Sessionize}

/** The reference's end-to-end dataflow (claude_research_optimal.py
  * main(), :389–696) as one lazily-built Spark DAG — SURVEY.md §3.1's
  * target shape. The per-document sequential loop becomes
  * set-at-a-time operators keyed by (doc_id, group_id); the only
  * shuffles are the doc-keyed cogroups/joins and the final
  * segment-numbering window.
  *
  * Scale design: documents are the unit of parallelism; audio bytes
  * cross the shuffle exactly once (the plan⋈audio join); every
  * per-group stage after assembly is a narrow map. No driver-side
  * state anywhere — kept/rejected accumulators are replaced by the
  * W6 running-count window.
  */
object AsrPipeline {

  /** Reference CLI defaults (claude_research_optimal.py:395–419). */
  final case class Config(
      minRun: Int = 4,
      maxGapWords: Int = 2,
      maxGapTime: Double = 0.5,
      minDur: Double = 1.5,
      fadeMs: Int = 20,
      startPadMs: Int = 150,
      endPadMs: Int = 140,
      tailSafetyMs: Int = 80,
      baseEndGuardMs: Int = 35,
      startGuardMs: Int = 30,
      seamSilenceMs: Int = 120,
      fullGapMs: Int = 500,
      silenceThresholdDb: Double = -40.0,
      enableAcousticValidation: Boolean = true,
      numbersToWords: Boolean = false,
      minValidWords: Int = 2,
      /** Cap on the O(n·m) per-doc LCS: longer streams align via
        * anchor-chunked stitching (ChunkedMatcher). MaxValue = direct.
        */
      lcsMaxChunk: Int = Int.MaxValue)

  /** One input document: transcript text + decoded PCM audio. */
  final case class DocInput(doc_id: Long, text: String,
      pcm: Array[Byte], sample_rate: Int)

  /** Per-(doc,group) assembled base clip (W4 output). */
  final case class AssembledClip(doc_id: Long, group_id: Long,
      clip: Array[Byte], sample_rate: Int, n_runs: Int,
      used: Seq[UsedWord])

  final case class UsedWord(text: String, norm: String,
      start: Double, end: Double, confidence: Double)

  /** Per-doc slicing plan: pure metadata, tiny vs the audio bytes. */
  final case class DocPlan(doc_id: Long,
      groups: Seq[(Long, Seq[(Long, Long)])],
      words: Seq[UsedWord])

  /** Per-group outcome before numbering: kept payload or rejection. */
  final case class ClipOutcome(doc_id: Long, group_id: Long,
      kept: Boolean, reason: String, // "" when kept
      text: String, pcm: Array[Byte], sample_rate: Int,
      duration_s: Double, words: Int, pieces: Int, avg_conf: Double,
      acoustic_quality: String, duration_ms: Long)

  /** ClipOutcome + its W6 segment label, as produced by the fused
    * assemble→judge→number pass (numbering needs only within-doc
    * group order, so it never costs a shuffle).
    */
  final case class NumberedOutcome(doc_id: Long, group_id: Long,
      kept: Boolean, reason: String, segment: String,
      text: String, pcm: Array[Byte], sample_rate: Int,
      duration_s: Double, words: Int, pieces: Int, avg_conf: Double,
      acoustic_quality: String, duration_ms: Long)

  final case class SegmentRow(doc_id: Long, group_id: Long,
      segment: String, text: String, pcm: Array[Byte], sample_rate: Int,
      duration_s: Double, words: Int, pieces: Int, avg_conf: Double,
      acoustic_quality: String)

  final case class RejectionRow(doc_id: Long, group_id: Long,
      segment: String, reason: String, duration_ms: Long,
      confidence: Double)

  final case class Result(segments: Dataset[SegmentRow],
      rejections: Dataset[RejectionRow], summary: DataFrame,
      clipsTsv: DataFrame)

  // ------------------------------------------------------------ stages

  /** Book scan + normalize (claude_research_optimal.py:434–438):
    * P1 tokenize → P2 normalize → drop empties, position-indexed.
    */
  def bookWords(docs: Dataset[(Long, String)], numbersToWords: Boolean)
      : Dataset[BookWord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { case (docId, text) =>
      TextFunctions.tokenizeScala(text)
        .flatMap(t => TextFunctions.normalizeScala(t, numbersToWords)
          .map(n => (t, n)))
        .zipWithIndex
        .map { case ((t, n), i) => BookWord(docId, i.toLong, t, n) }
    }
  }

  /** S3 — base ASR inference + normalization + empty-drop
    * (claude_research_optimal.py:254–277): one recognizer call per
    * doc inside mapPartitions (model handle amortized per partition).
    */
  def asrWords(audio: Dataset[DocInput], recognizer: WordRecognizer,
      numbersToWords: Boolean): Dataset[AsrWord] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions { it =>
      it.flatMap { d =>
        val recognized = recognizer.transcribe(s"doc:${d.doc_id}",
          Pcm(d.pcm, d.sample_rate))
        recognized.iterator
          .map(w => (w, w.text.trim))
          .filter(_._2.nonEmpty)
          .flatMap { case (w, t) =>
            TextFunctions.normalizeScala(t, numbersToWords)
              .map(n => (t, n, w.start, w.end, w.confidence))
          }
          .zipWithIndex
          .map { case ((t, n, s, e, c), i) =>
            AsrWord(d.doc_id, i.toLong, t, n, s, e, c)
          }
      }
    }
  }

  /** W4 — per-doc slicing plan + assembly. The cogroup(asr, runs)
    * emits pure-metadata slice plans; audio bytes join in once per
    * doc and a narrow flatMap does the byte work.
    */
  def assembleClips(asr: Dataset[AsrWord], groups: Dataset[GroupedRun],
      audio: Dataset[DocInput], cfg: Config): Dataset[AssembledClip] = {
    val spark = asr.sparkSession
    import spark.implicits._
    val plans = planClips(asr, groups)
    plans.joinWith(audio, plans("doc_id") === audio("doc_id"))
      .flatMap { case (plan, doc) => clipsForDoc(plan, doc, cfg) }
  }

  /** The metadata half of W4: cogroup(asr, runs) into per-doc slice
    * plans (tiny rows — no audio bytes).
    */
  private[graft] def planClips(asr: Dataset[AsrWord],
      groups: Dataset[GroupedRun]): Dataset[DocPlan] = {
    val spark = asr.sparkSession
    import spark.implicits._
    asr.groupByKey(_.doc_id)
      .cogroup(groups.groupByKey(_.doc_id)) { (docId, ws, gs) =>
        val words = ws.toArray.sortBy(_.idx)
        val byGroup = gs.toArray.sortBy(r => (r.group_id, r.ai0))
          .groupBy(_.group_id).toSeq.sortBy(_._1)
          .map { case (g, rs) => (g, rs.map(r => (r.ai0, r.ai1)).toSeq) }
        if (words.isEmpty || byGroup.isEmpty) Iterator.empty
        else Iterator.single(DocPlan(docId, byGroup,
          words.map(w => UsedWord(w.text, w.norm, w.start, w.end,
            w.confidence)).toSeq))
      }
  }

  /** The byte half of W4: execute one doc's slice plan against its
    * audio. Groups come out in ascending group_id order (the plan is
    * built sorted), which the fused numbering pass relies on.
    */
  private[graft] def clipsForDoc(plan: DocPlan, doc: DocInput,
      cfg: Config): Iterator[AssembledClip] = {
    val pcm = Pcm(doc.pcm, doc.sample_rate)
    val words = plan.words.toIndexedSeq
    plan.groups.iterator.map { case (gid, runs) =>
      val pieces = Seq.newBuilder[Pcm]
      val used = Seq.newBuilder[UsedWord]
      runs.zipWithIndex.foreach { case ((ai0, ai1), k) =>
        val w0 = words(ai0.toInt); val w1 = words(ai1.toInt - 1)
        var sMs = TextFunctions.secToMsScala(w0.start)
        if (k == 0 && cfg.startPadMs > 0)
          sMs = math.max(0L, sMs - cfg.startPadMs)
        var eMs = TextFunctions.secToMsScala(w1.end)
        if (k == runs.length - 1 && cfg.endPadMs > 0)
          eMs += cfg.endPadMs
        if (eMs <= sMs) eMs = sMs + 1
        var seg = Pcm.sliceMs(pcm, sMs, eMs)
        if (cfg.fadeMs > 0) {
          val len = seg.lengthMs
          val fIn = math.min(math.max(5, cfg.fadeMs / 3), len / 4)
          val fOut = math.min(cfg.fadeMs.toLong, len / 4)
          if (fIn > 0) seg = Pcm.fadeIn(seg, fIn)
          if (fOut > 0) seg = Pcm.fadeOut(seg, fOut)
        }
        pieces += seg
        used ++= (ai0.toInt until ai1.toInt).map(words)
        if (k != runs.length - 1 && cfg.seamSilenceMs > 0)
          pieces += Pcm.silence(cfg.seamSilenceMs, doc.sample_rate)
      }
      val clip = Pcm.concat(pieces.result(), doc.sample_rate)
      AssembledClip(plan.doc_id, gid, clip.bytes, doc.sample_rate,
        runs.length, used.result())
    }
  }

  /** Stages 7–14 of the reference loop, per assembled clip (narrow
    * map, no shuffle): validator re-transcription (S4) → LCS
    * consensus (J2) → longest span (A4) + min-valid-words (F4) →
    * first-match confidence (J3+A3) → boundary math (P4–P7, W3) →
    * min-duration (F5) → slice + fades (D6/D4) → acoustic gate with
    * one retry (F6/D3). Faithful to the reference's quirks: the
    * adaptive guard reads the VALIDATOR word's confidence (always
    * 1.0 → 70% branch), and the leakage-retry slice skips re-fading.
    */
  def judgeClips(clips: Dataset[AssembledClip], validator: WordRecognizer,
      cfg: Config): Dataset[ClipOutcome] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.mapPartitions { it =>
      it.flatMap { c => judgeOne(c, validator, cfg).iterator }
    }
  }

  private[graft] def judgeOne(c: AssembledClip, validator: WordRecognizer,
      cfg: Config): Option[ClipOutcome] = {
    val baseClip = Pcm(c.clip, c.sample_rate)
    if (baseClip.durationSeconds <= 0) return None
    def reject(reason: String, durationMs: Long, conf: Double) =
      Some(ClipOutcome(c.doc_id, c.group_id, kept = false, reason,
        "", Array.emptyByteArray, c.sample_rate, 0.0, 0, c.n_runs, conf,
        "", durationMs))

    // S4 validator words (clip-relative), normalized, conf 1.0
    val vwords = validator
      .transcribe(s"clip:${c.doc_id}:${c.group_id}", baseClip)
      .iterator.map(w => (w, w.text.trim)).filter(_._2.nonEmpty)
      .flatMap { case (w, t) =>
        TextFunctions.normalizeScala(t, cfg.numbersToWords)
          .map(n => VWord(c.doc_id, c.group_id, 0L, t, n, w.start, w.end, 1.0))
      }.toIndexedSeq
    if (vwords.isEmpty) return None

    // J2 consensus
    val a = c.used.map(_.norm).toIndexedSeq
    val b = vwords.map(_.norm)
    val eq = new SequenceMatcher(a, b).equalRuns(1)
    if (eq.isEmpty) return None

    // A4 longest validator span (strict >, ties → first)
    var best: (Int, Int) = null; var bestLen = 0
    eq.foreach { case (_, _, bi0, bi1) =>
      if (bi1 - bi0 > bestLen) { best = (bi0, bi1); bestLen = bi1 - bi0 }
    }
    if (bestLen < cfg.minValidWords) return None
    val (bi0, bi1) = best
    val keep = vwords.slice(bi0, bi1)

    // J3+A3 first-match confidence (reference's O(n²) scan semantics)
    val spanConf = keep.flatMap(kw => c.used.find(_.norm == kw.norm)
      .map(_.confidence))
    val avgConf = if (spanConf.nonEmpty) spanConf.sum / spanConf.size else 1.0

    // boundary math (clip-relative ms)
    var sMs = TextFunctions.secToMsScala(keep.head.start)
    if (cfg.startPadMs > 0) sMs = math.max(0L, sMs - cfg.startPadMs)
    if (bi0 > 0)
      sMs = math.max(sMs,
        TextFunctions.secToMsScala(vwords(bi0 - 1).end) + cfg.startGuardMs)
    var eMs = TextFunctions.secToMsScala(keep.last.end)
    eMs += cfg.endPadMs + cfg.tailSafetyMs
    if (bi1 < vwords.length) {
      val nextStart = TextFunctions.secToMsScala(vwords(bi1).start)
      val guard = TextFunctions.adaptiveGuardScala(keep.last.confidence,
        cfg.baseEndGuardMs)
      eMs = math.min(eMs, nextStart - guard)
    }
    val ext = TextFunctions.phonemeExtensionScala(keep.last.text)
    if (keep.last.text.nonEmpty && keep.last.text.length >= 3 && ext > 0)
      eMs += ext
    if (eMs <= sMs) eMs = sMs + 1

    // F5 min duration
    val minDurMs = (cfg.minDur * 1000).toLong
    if (eMs - sMs < minDurMs)
      return reject("too_short", eMs - sMs, avgConf)

    var piece = Pcm.sliceMs(baseClip, sMs, eMs)
    if (cfg.fadeMs > 0) {
      val len = piece.lengthMs
      val fIn = math.min(math.max(5, cfg.fadeMs / 3), len / 4)
      val fOut = math.min(cfg.fadeMs.toLong, len / 4)
      if (fIn > 0) piece = Pcm.fadeIn(piece, fIn)
      if (fOut > 0) piece = Pcm.fadeOut(piece, fOut)
    }

    // F6/D3 acoustic gate, one bounded retry (retry slice unfaded —
    // reference quirk, claude_research_optimal.py:624–635)
    var quality = "not_checked"
    if (cfg.enableAcousticValidation) {
      val checkPos = math.max(0L, piece.lengthMs - 50)
      val (leak, _) = Dsp.checkBoundaryLeakage(piece, checkPos,
        cfg.silenceThresholdDb)
      quality = if (leak) "leakage" else "clean"
      if (leak) {
        val eRetry = eMs - 30
        if (eRetry > sMs + minDurMs) {
          val pieceRetry = Pcm.sliceMs(baseClip, sMs, eRetry)
          val (leakRetry, _) = Dsp.checkBoundaryLeakage(pieceRetry,
            pieceRetry.lengthMs, cfg.silenceThresholdDb)
          if (!leakRetry) {
            eMs = eRetry; piece = pieceRetry; quality = "fixed"
          } else return reject("acoustic_leakage", eMs - sMs, avgConf)
        } else return reject("acoustic_leakage_unfixable", eMs - sMs, avgConf)
      }
    }

    val segText = keep.map(_.text).mkString(" ")
    Some(ClipOutcome(c.doc_id, c.group_id, kept = true, "",
      segText, piece.bytes, c.sample_rate, piece.durationSeconds,
      keep.length, c.n_runs, avgConf, quality, eMs - sMs))
  }

  /** W6 — segment numbering: `segment_{kept:04d}` in group order per
    * doc; a rejected group logs the id of the NEXT kept segment
    * (reference quirk, claude_research_optimal.py:591 vs 661).
    * One window = one count of kept rows strictly before the row.
    */
  def numberOutcomes(outcomes: Dataset[ClipOutcome])
      : (Dataset[SegmentRow], Dataset[RejectionRow]) = {
    val spark = outcomes.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"group_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val numbered = outcomes.toDF()
      .withColumn("kept_before",
        coalesce(sum(when($"kept", 1L).otherwise(0L)).over(w), lit(0L)))
      .withColumn("segment", format_string("segment_%04d", $"kept_before"))
    val segments = numbered.filter($"kept")
      .select($"doc_id", $"group_id", $"segment", $"text", $"pcm",
        $"sample_rate", $"duration_s", $"words", $"pieces", $"avg_conf",
        $"acoustic_quality")
      .as[SegmentRow]
    val rejections = numbered.filter(!$"kept")
      .select($"doc_id", $"group_id", $"segment",
        $"reason", $"duration_ms", $"avg_conf".as("confidence"))
      .as[RejectionRow]
    (segments, rejections)
  }

  /** Full pipeline: sources → align → sessionize → assemble → judge →
    * number → summary/TSV frames (sinks are separate, graft.Sinks).
    */
  def run(docs: Dataset[DocInput], base: WordRecognizer,
      validator: WordRecognizer, cfg: Config = Config()): Result = {
    val spark = docs.sparkSession
    import spark.implicits._

    // `docs` (audio + text) and `asr` fan out to several downstream
    // branches (alignment, sessionization joins, assembly, audio
    // join) — cache both or the source synthesis/inference re-runs
    // once per branch. On a cluster these would be persisted
    // MEMORY_AND_DISK after the (expensive) inference stage.
    val docsC = docs.cache()
    val books = bookWords(docsC.map(d => (d.doc_id, d.text)),
      cfg.numbersToWords)
    val asr = asrWords(docsC, base, cfg.numbersToWords).cache()
    val runs = Align.lcsEqualRuns(books, asr, cfg.minRun, cfg.lcsMaxChunk)
    val groups = Sessionize.mergeWithSmallGaps(runs, asr,
      cfg.maxGapWords, cfg.maxGapTime)
    // Fused W4→F6→W6: assemble, judge, and number each doc's clips in
    // ONE narrow pass after the single audio join. The staged
    // equivalents (assembleClips → judgeClips → numberOutcomes) remain
    // the inspectable public API and are spec-checked equal; fusing
    // keeps clip bytes out of the numbering window's exchange — audio
    // crosses the network exactly once (the plan⋈audio join).
    val plans = planClips(asr, groups)
    val numbered: Dataset[NumberedOutcome] =
      plans.joinWith(docsC, plans("doc_id") === docsC("doc_id"))
        .flatMap { case (plan, doc) =>
          // clipsForDoc emits ascending group_id, so the W6 window
          // (count of kept rows strictly before, in group order) is a
          // running counter; a rejected group labels the NEXT kept
          // segment's id — same formula, reference quirk preserved.
          var keptBefore = 0L
          clipsForDoc(plan, doc, cfg)
            .flatMap(c => judgeOne(c, validator, cfg))
            .map { o =>
              val seg = "segment_%04d".format(keptBefore)
              if (o.kept) keptBefore += 1
              NumberedOutcome(o.doc_id, o.group_id, o.kept, o.reason,
                seg, o.text, o.pcm, o.sample_rate, o.duration_s,
                o.words, o.pieces, o.avg_conf, o.acoustic_quality,
                o.duration_ms)
            }
        }
    val segments = numbered.filter($"kept")
      .select($"doc_id", $"group_id", $"segment", $"text", $"pcm",
        $"sample_rate", $"duration_s", $"words", $"pieces", $"avg_conf",
        $"acoustic_quality")
      .as[SegmentRow]
    val rejections = numbered.filter(!$"kept")
      .select($"doc_id", $"group_id", $"segment",
        $"reason", $"duration_ms", $"avg_conf".as("confidence"))
      .as[RejectionRow]

    // A5 summary (claude_research_optimal.py:684–694) + run counts
    val runCounts = runs.groupBy($"doc_id")
      .agg(count(lit(1)).as("equal_runs"))
    val groupCounts = groups.select($"doc_id", $"group_id").distinct()
      .groupBy($"doc_id").agg(count(lit(1)).as("bridged_groups"))
    val outcomeCounts = numbered.groupBy($"doc_id").agg(
      sum(when($"kept", 1L).otherwise(0L)).as("exported"),
      sum(when($"kept", 0L).otherwise(1L)).as("rejected"))
    val summary = outcomeCounts
      .join(runCounts, Seq("doc_id"), "left")
      .join(groupCounts, Seq("doc_id"), "left")
      .withColumn("rejection_rate_pct",
        when($"exported" + $"rejected" > 0,
          round($"rejected" * 100.0 / ($"exported" + $"rejected"), 2))
          .otherwise(0.0))
      // F7 — batch success gating (batch_processor.py:88–98): a doc
      // "fails" when it exports zero segments
      .withColumn("status",
        when($"exported" > 0, "success").otherwise("failed"))

    // K2 clips.tsv shape (claude_research_optimal.py:477, 666)
    val clipsTsv = segments.toDF().select(
      concat(lit("clips/"), $"segment", lit(".wav")).as("path"),
      format_string("%.3f", lit(0.0)).as("start"),
      format_string("%.3f", $"duration_s").as("end"),
      format_string("%.3f", $"duration_s").as("duration_s"),
      $"words", $"pieces",
      format_string("%.3f", $"avg_conf").as("avg_conf"),
      $"acoustic_quality", $"doc_id", $"group_id")

    Result(segments, rejections, summary, clipsTsv)
  }
}
