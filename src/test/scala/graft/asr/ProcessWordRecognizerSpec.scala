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
  // full) so the assertions prove framing, not canned output. Keys
  // starting "bad"/"die" trigger the two failure modes the adapter
  // must survive: a malformed reply line and a worker that dies
  // mid-service. The served counter exposes WHICH process replied —
  // a relaunched worker restarts at 1.
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
      |    if d["key"].startswith("bad"):
      |        stdout.write(b"this is not json\n")
      |        stdout.flush()
      |        continue
      |    if d["key"].startswith("die"):
      |        sys.exit(1)
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

  test("malformed reply evicts the worker; the next call rides a " +
    "FRESH process") {
    assume(python3.isDefined, "no python3 in this environment")
    val f = Files.createTempFile("asr_stub_bad", ".py")
    Files.write(f, stub.getBytes("UTF-8"))
    try {
      val rec = new ProcessWordRecognizer(Seq(python3.get, f.toString))
      val pcm = Pcm.fromSamples(Array(1, 2, 3), 8000)
      val wavLen = graft.Sinks.wavBytes(pcm).length
      // a garbage reply line must surface as a loud failure...
      intercept[Exception] { rec.transcribe("bad_clip", pcm) }
      // ...and evict the (desynchronized) worker: without eviction
      // the old process would still be alive and reply served=2;
      // the relaunched worker's counter restarts at 1
      val w = rec.transcribe("clip_ok", pcm)
      assert(w.map(_.text) == Seq("clip_ok", s"$wavLen:1"))
    } finally {
      ProcessWordRecognizer.shutdownAll()
      Files.deleteIfExists(f)
    }
  }

  test("worker death mid-service evicts the handle; the next call " +
    "relaunches instead of failing forever") {
    assume(python3.isDefined, "no python3 in this environment")
    val f = Files.createTempFile("asr_stub_die", ".py")
    Files.write(f, stub.getBytes("UTF-8"))
    try {
      val rec = new ProcessWordRecognizer(Seq(python3.get, f.toString))
      val pcm = Pcm.fromSamples(Array(4, 5, 6), 8000)
      val wavLen = graft.Sinks.wavBytes(pcm).length
      // worker exits with status 1 WITHOUT replying -> closed pipe
      intercept[Exception] { rec.transcribe("die_now", pcm) }
      // pre-eviction behavior was permanent failure on this executor
      // (every later call hit the dead process); now it relaunches
      val w = rec.transcribe("clip_after_death", pcm)
      assert(w.map(_.text) == Seq("clip_after_death", s"$wavLen:1"))
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
