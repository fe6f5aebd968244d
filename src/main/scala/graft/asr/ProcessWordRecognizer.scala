package graft.asr

import java.io.{BufferedReader, DataOutputStream, InputStreamReader}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

import graft.Sinks
import graft.audio.Pcm

/** S3/S4 real-inference adapter — bridges [[WordRecognizer]] to an
  * external ASR worker process (the reference's WhisperX transcribe +
  * wav2vec2 alignment, claude_research_optimal.py:235–280, and its
  * faster-whisper validator, :344–363, both live behind exactly this
  * boundary: audio in, word dicts out).
  *
  * Engine-side shape (what makes this the right Spark wiring):
  *  - ONE worker process per executor JVM per command line, started
  *    lazily on first use and reused across rows and partitions —
  *    the model loads once per executor, mirroring the per-partition
  *    model handle `AsrPipeline` assumes for `mapPartitions`;
  *  - audio crosses as in-memory WAV bytes over stdin (no temp
  *    files — the reference's per-clip wav handoff,
  *    claude_research_optimal.py:346–349, eliminated);
  *  - words come back as one JSON line per request, the exact
  *    word-dict fields WhisperX emits (`word`/`start`/`end`/`score`).
  *
  * Request protocol (worker side shown in
  * `docs/asr_worker_fasterwhisper.py`):
  * {{{
  *   -> {"key": "<id>", "bytes": N}\n   # JSON header line
  *   -> N raw WAV bytes                 # 16-bit mono PCM container
  *   <- {"words":[{"word":"…","start":s,"end":e,"score":c},…]}\n
  * }}}
  *
  * Like [[graft.sources.FfmpegDecoder]], construction is gated:
  * [[ProcessWordRecognizer.ifAvailable]] returns None when the worker
  * command does not resolve, so pipelines degrade to their configured
  * fake in environments (like this sandbox) with no model runtime.
  * The subprocess PLUMBING itself is spec-tested against a stub
  * worker speaking the same protocol.
  */
final class ProcessWordRecognizer(cmd: Seq[String])
    extends WordRecognizer {
  require(cmd.nonEmpty, "empty worker command")

  def transcribe(key: String, audio: Pcm): Seq[RecWord] = {
    val h = ProcessWordRecognizer.handle(cmd)
    // one in-flight request per worker: the worker is stateful
    // (model context) and the protocol is strictly sequential.
    // Any failure mid-request (broken pipe, closed stdout, malformed
    // reply) leaves the stream desynchronized — evict the handle so
    // the NEXT call relaunches a fresh worker instead of failing
    // forever against a dead process.
    try h.synchronized { request(h, key, audio) }
    catch { case e: Throwable =>
      ProcessWordRecognizer.evict(cmd, h)
      throw e
    }
  }

  private def request(h: ProcessWordRecognizer.Handle, key: String,
      audio: Pcm): Seq[RecWord] = {
    {
      val wav = Sinks.wavBytes(audio)
      val header = ProcessWordRecognizer.mapper.writeValueAsString(
        java.util.Map.of("key", key, "bytes",
          Integer.valueOf(wav.length)))
      h.out.write(header.getBytes(StandardCharsets.UTF_8))
      h.out.write('\n')
      h.out.write(wav)
      h.out.flush()
      val line = h.in.readLine()
      require(line != null, s"asr worker closed the pipe (cmd=$cmd)")
      val root = ProcessWordRecognizer.mapper.readTree(line)
      val words = root.get("words")
      require(words != null && words.isArray,
        s"asr worker reply missing words array: $line")
      val out = Seq.newBuilder[RecWord]
      words.forEach { w =>
        out += RecWord(
          text = w.get("word").asText(),
          start = w.get("start").asDouble(),
          end = w.get("end").asDouble(),
          confidence =
            if (w.has("score")) w.get("score").asDouble() else 1.0)
      }
      out.result()
    }
  }
}

object ProcessWordRecognizer {
  private val mapper = new ObjectMapper()

  private final class Handle(val proc: Process) {
    val out = new DataOutputStream(proc.getOutputStream)
    val in = new BufferedReader(
      new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))
  }

  // one live worker per distinct command line per executor JVM —
  // the "model loads once per executor" contract
  private val handles =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Handle]()

  private def handle(cmd: Seq[String]): Handle =
    handles.computeIfAbsent(cmd, { c =>
      val pb = new ProcessBuilder(c: _*)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      new Handle(pb.start())
    })

  /** Drop a dead/desynchronized worker so the next call relaunches.
    * Guarded remove: only evicts if the map still holds THIS handle
    * (a racing transcribe may already have installed a fresh one).
    */
  private def evict(cmd: Seq[String], h: Handle): Unit = {
    handles.remove(cmd, h)
    try h.proc.destroy() catch { case _: Throwable => () }
  }

  /** Tear down cached workers (tests; executor shutdown hooks). */
  def shutdownAll(): Unit = {
    handles.values.forEach(h => h.proc.destroy())
    handles.clear()
  }

  /** The worker command, if configured and runnable: `GRAFT_ASR_CMD`
    * (shell-split on spaces) with an executable first element —
    * e.g. `GRAFT_ASR_CMD="python3 /opt/asr/asr_worker_fasterwhisper.py
    * --model large-v3"`. None keeps the inference gate closed (this
    * sandbox), exactly like `FfmpegDecoder.ifAvailable`.
    */
  def locate(): Option[Seq[String]] =
    sys.env.get("GRAFT_ASR_CMD").map(_.trim.split("\\s+").toSeq)
      .filter(_.nonEmpty)
      .filter { c =>
        val f = new java.io.File(c.head)
        f.canExecute || sys.env.getOrElse("PATH", "").split(":")
          .exists(p => new java.io.File(p, c.head).canExecute)
      }

  /** The gated constructor: Some(recognizer) iff a worker resolves. */
  def ifAvailable(): Option[WordRecognizer] =
    locate().map(new ProcessWordRecognizer(_))
}
