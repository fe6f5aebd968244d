package graft.operators

import scala.collection.mutable

/** Anchor-chunked LCS alignment — the scale path for pathological
  * single-document sizes (SURVEY.md §4.2): `SequenceMatcher` is
  * O(|a|·|b|) per document, so one 1M-word transcript is a straggler
  * task no matter how many executors exist. This matcher:
  *
  *   1. finds anchor k-grams that occur EXACTLY ONCE in both streams
  *      (unambiguous correspondence points),
  *   2. keeps the longest subsequence of anchors consistent in both
  *      streams (strictly increasing on both sides — patience LIS),
  *   3. thins them to cut points ~maxChunk/2 tokens apart,
  *   4. aligns each inter-cut chunk independently with the exact
  *      difflib kernel, and
  *   5. stitches: offsets chunk-local runs, merges runs that touch
  *      across a cut, then applies the minRun filter.
  *
  * Cost drops to O(Σ chunkᵢ·chunkᵢ') ≈ O(n·maxChunk). On streams
  * whose differences are local (the ASR case: drops, substitutions,
  * insertions against a mostly-shared backbone) the stitched output
  * equals the direct matcher's — property-tested in ChunkedLcsSpec
  * across perturbation classes; with no usable anchors it falls back
  * to the direct matcher.
  */
object ChunkedMatcher {

  private val Sep = "\u0001"

  /** Positions of k-grams occurring exactly once in `s`. */
  private def uniqueGrams(s: IndexedSeq[String], k: Int)
      : mutable.HashMap[String, Int] = {
    val pos = mutable.HashMap.empty[String, Int]
    var i = 0
    while (i + k <= s.length) {
      val g = s.slice(i, i + k).mkString(Sep)
      pos.get(g) match {
        case None => pos(g) = i
        case Some(p) if p >= 0 => pos(g) = -1 // duplicate → unusable
        case _ => ()
      }
      i += 1
    }
    pos.filterInPlace((_, p) => p >= 0)
  }

  /** Longest strictly-increasing subsequence (on ._2) of pairs already
    * sorted by ._1 — patience sorting with predecessor links.
    */
  private def lis(pairs: IndexedSeq[(Int, Int)]): IndexedSeq[(Int, Int)] = {
    if (pairs.isEmpty) return IndexedSeq.empty
    val tailIdx = mutable.ArrayBuffer.empty[Int] // index of smallest tail
    val prev = new Array[Int](pairs.length)
    var i = 0
    while (i < pairs.length) {
      val v = pairs(i)._2
      // binary search: first pile whose tail ≥ v
      var lo = 0
      var hi = tailIdx.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (pairs(tailIdx(mid))._2 < v) lo = mid + 1 else hi = mid
      }
      prev(i) = if (lo > 0) tailIdx(lo - 1) else -1
      if (lo == tailIdx.length) tailIdx += i else tailIdx(lo) = i
      i += 1
    }
    val out = mutable.ArrayBuffer.empty[(Int, Int)]
    var at = tailIdx.last
    while (at >= 0) { out += pairs(at); at = prev(at) }
    out.reverseIterator.toIndexedSeq
  }

  /** Equal runs (a-length ≥ minRun) of the chunked alignment; equals
    * `new SequenceMatcher(a, b).equalRuns(minRun)` whenever stream
    * differences are local relative to the anchor spacing.
    */
  def equalRuns(a: IndexedSeq[String], b: IndexedSeq[String], minRun: Int,
      maxChunk: Int = 2000, anchorK: Int = 3)
      : Vector[(Int, Int, Int, Int)] = {
    if (math.max(a.length, b.length) <= maxChunk)
      return new SequenceMatcher(a, b).equalRuns(minRun)

    val ua = uniqueGrams(a, anchorK)
    val ub = uniqueGrams(b, anchorK)
    val shared = ua.iterator.flatMap { case (g, ia) =>
      ub.get(g).map(ib => (ia, ib))
    }.toIndexedSeq.sortBy(_._1)
    val consistent = lis(shared)

    // thin to cut points ≥ maxChunk/2 apart on BOTH axes (a cut sits
    // at the anchor's start; the k-gram itself lives in the following
    // chunk, so every cut is a position both alignments agree on)
    val cuts = mutable.ArrayBuffer.empty[(Int, Int)]
    val step = math.max(1, maxChunk / 2)
    var lastA = 0
    var lastB = 0
    consistent.foreach { case (ia, ib) =>
      if (ia >= lastA + step && ib >= lastB + step) {
        cuts += ((ia, ib)); lastA = ia; lastB = ib
      }
    }
    if (cuts.isEmpty)
      return new SequenceMatcher(a, b).equalRuns(minRun)

    val bounds = ((0, 0) +: cuts).:+((a.length, b.length))
    val raw = mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
    var c = 0
    while (c + 1 < bounds.length) {
      val (a0, b0) = bounds(c)
      val (a1, b1) = bounds(c + 1)
      if (a1 > a0 && b1 > b0) {
        val sub = new SequenceMatcher(a.slice(a0, a1), b.slice(b0, b1))
        sub.equalRuns(1).foreach { case (i1, i2, j1, j2) =>
          raw += ((i1 + a0, i2 + a0, j1 + b0, j2 + b0))
        }
      }
      c += 1
    }

    // merge runs split by a cut (they touch with consistent offsets)
    val merged = mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
    raw.foreach { r =>
      if (merged.nonEmpty && merged.last._2 == r._1 &&
          merged.last._4 == r._3) {
        val p = merged.remove(merged.length - 1)
        merged += ((p._1, r._2, p._3, r._4))
      } else merged += r
    }
    merged.iterator.filter(r => r._2 - r._1 >= minRun).toVector
  }
}
