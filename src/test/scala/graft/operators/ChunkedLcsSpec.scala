package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** ChunkedMatcher must reproduce the direct SequenceMatcher's equal
  * runs on ASR-shaped streams (local perturbations over a shared
  * backbone) while chunking — the equivalence the pipeline relies on
  * when maxChunk caps per-document alignment cost.
  */
class ChunkedLcsSpec extends AnyFunSuite {

  /** Book-like token stream: zipf-ish mix of a small function-word
    * vocabulary and a long tail of content words, so k-grams are
    * mostly unique (like real text) but repeats exist.
    */
  private def stream(n: Int, rnd: Random): IndexedSeq[String] = {
    val function = Vector("the", "of", "and", "to", "a", "in", "is")
    IndexedSeq.tabulate(n) { _ =>
      if (rnd.nextInt(100) < 30) function(rnd.nextInt(function.length))
      else s"w${rnd.nextInt(5000)}"
    }
  }

  private def perturb(a: IndexedSeq[String], rnd: Random,
      dropPct: Int, subPct: Int, insPct: Int): IndexedSeq[String] =
    a.flatMap { t =>
      val r = rnd.nextInt(100)
      val base =
        if (r < dropPct) Seq.empty
        else if (r < dropPct + subPct) Seq(s"sub${rnd.nextInt(1000)}")
        else Seq(t)
      if (rnd.nextInt(100) < insPct) base :+ s"ins${rnd.nextInt(1000)}"
      else base
    }

  private def direct(a: IndexedSeq[String], b: IndexedSeq[String],
      minRun: Int) = new SequenceMatcher(a, b).equalRuns(minRun)

  test("chunked == direct across perturbation classes and seeds") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val a = stream(2500, rnd)
      val cases = Seq(
        perturb(a, new Random(seed * 31), 8, 0, 0), // drops only
        perturb(a, new Random(seed * 37), 0, 6, 0), // substitutions only
        perturb(a, new Random(seed * 41), 5, 5, 3), // mixed
        a) // identical
      for ((b, ci) <- cases.zipWithIndex; minRun <- Seq(1, 4)) {
        val want = direct(a, b, minRun)
        val got = ChunkedMatcher.equalRuns(a, b, minRun, maxChunk = 400)
        assert(got == want, s"seed=$seed case=$ci minRun=$minRun")
      }
    }
  }

  test("falls back to direct when no anchors exist") {
    // all-identical tokens: every k-gram repeats, zero unique anchors
    val a = IndexedSeq.fill(1200)("x")
    val b = IndexedSeq.fill(900)("x")
    assert(ChunkedMatcher.equalRuns(a, b, 1, maxChunk = 300) ==
      direct(a, b, 1))
  }

  test("under the chunk threshold it IS the direct matcher") {
    val rnd = new Random(7)
    val a = stream(300, rnd)
    val b = perturb(a, new Random(9), 10, 5, 2)
    assert(ChunkedMatcher.equalRuns(a, b, 4, maxChunk = 2000) ==
      direct(a, b, 4))
  }

  test("disjoint streams produce no runs") {
    val a = IndexedSeq.tabulate(1500)(i => s"a$i")
    val b = IndexedSeq.tabulate(1500)(i => s"b$i")
    assert(ChunkedMatcher.equalRuns(a, b, 1, maxChunk = 200).isEmpty)
  }

  test("chunked alignment of a 60k-token stream stays fast") {
    val rnd = new Random(11)
    val a = stream(60000, rnd)
    val b = perturb(a, new Random(13), 5, 3, 2)
    val t0 = System.nanoTime()
    val runs = ChunkedMatcher.equalRuns(a, b, 4, maxChunk = 2000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(runs.nonEmpty)
    // direct would be ~3.6e9 cell updates; chunked must stay well under
    assert(secs < 30.0, s"took $secs s")
    // sanity: runs tile consistently (increasing, non-overlapping)
    runs.sliding(2).foreach {
      case Vector((_, i2, _, j2), (i1b, _, j1b, _)) =>
        assert(i2 <= i1b && j2 <= j1b)
      case _ => ()
    }
  }
}
