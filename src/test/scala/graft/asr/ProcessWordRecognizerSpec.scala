package graft.asr

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.audio.Pcm

/** The real-inference adapter's subprocess plumbing, proven in-sandbox
  * against a stub worker speaking the exact protocol
  * `docs/asr_worker_fasterwhisper.py` implements — process reuse,
  * framing, the WhisperX word-dict field mapping, and the missing-
  * score default. The production worker needs a model runtime and is
  * exercised only by its gate (`ifAvailable` → None here).
  */
class ProcessWordRecognizerSpec extends AnyFunSuite {

  private def python3: Option[String] =
    Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => new java.io.File(p).canExecute)

  // replies derive from the request (key echoed, byte count read in
  // full) so the assertions prove framing, not canned output
  private val stub =
    """import sys, json
      |stdin = sys.stdin.buffer
      |stdout = sys.stdout.buffer
      |served = 0
      |while True:
      |    h = stdin.readline()
      |    if not h:
      |        break
      |    d = json.loads(h)
      |    b = stdin.read(d["bytes"])
      |    served += 1
      |    words = [
      |        {"word": d["key"], "start": 0.0, "end": 0.5, "score": 0.9},
      |        {"word": "%d:%d" % (len(b), served), "start": 0.5, "end": 1.0},
      |    ]
      |    stdout.write((json.dumps({"words": words}) + "\n").encode())
      |    stdout.flush()
      |""".stripMargin

  test("protocol round-trip: framing, field mapping, score default, " +
    "and one reused process across requests") {
    assume(python3.isDefined, "no python3 in this environment")
    val f = Files.createTempFile("asr_stub", ".py")
    Files.write(f, stub.getBytes("UTF-8"))
    try {
      val rec = new ProcessWordRecognizer(Seq(python3.get, f.toString))
      val pcm = Pcm.fromSamples(Array(100, -100, 50), 8000)
      val wavLen = graft.Sinks.wavBytes(pcm).length
      val w1 = rec.transcribe("clip_a", pcm)
      assert(w1.map(_.text) == Seq("clip_a", s"$wavLen:1"))
      assert(w1.head == RecWord("clip_a", 0.0, 0.5, 0.9))
      assert(w1(1).confidence == 1.0) // missing score -> default
      // second request rides the SAME worker (served counter is 2)
      val w2 = rec.transcribe("clip_b", pcm)
      assert(w2.map(_.text) == Seq("clip_b", s"$wavLen:2"))
    } finally {
      ProcessWordRecognizer.shutdownAll()
      Files.deleteIfExists(f)
    }
  }

  test("gate stays closed without GRAFT_ASR_CMD") {
    assume(!sys.env.contains("GRAFT_ASR_CMD"))
    assert(ProcessWordRecognizer.ifAvailable().isEmpty)
  }

  test("worker words drive the pipeline recognizer boundary") {
    assume(python3.isDefined, "no python3 in this environment")
    val f = Files.createTempFile("asr_stub2", ".py")
    Files.write(f, stub.getBytes("UTF-8"))
    try {
      // the adapter IS a WordRecognizer: anything AsrPipeline accepts
      // (fixtures, amplitude fake) this slots into unchanged
      val rec: WordRecognizer =
        new ProcessWordRecognizer(Seq(python3.get, f.toString))
      val words = rec.transcribe("doc1",
        Pcm.fromSamples(Array(10, 20, 30), 16000))
      assert(words.nonEmpty && words.head.text == "doc1")
    } finally {
      ProcessWordRecognizer.shutdownAll()
      Files.deleteIfExists(f)
    }
  }
}
