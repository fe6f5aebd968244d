package graft.operators

import scala.collection.mutable

/** Faithful Scala port of CPython's `difflib.SequenceMatcher` over
  * token sequences, fixed to the exact configuration the reference
  * uses: `SequenceMatcher(None, a, b, autojunk=False)`
  * (claude_research_optimal.py:284 and :366).
  *
  * Ported from the public CPython source (Lib/difflib.py). With
  * `isjunk=None` and `autojunk=False` the junk machinery is inert, so
  * it is omitted; everything observable — greedy longest-match
  * recursion, tie-breaking (longest, then earliest in `a`, then
  * earliest in `b`), adjacent-block merging, opcode synthesis — is
  * replicated exactly and golden-tested against difflib outputs
  * (LcsSpec, fixtures in src/test/resources/lcs_golden.jsonl).
  *
  * Cost is O(|a|·|b|) worst-case per call, as in the reference; at
  * engine scale the kernel runs per-document inside `mapGroups`, so
  * the cluster parallelizes across documents (SURVEY.md §4.2 notes
  * anchor-chunked alignment as the scale path for pathological
  * single-document sizes).
  */
final class SequenceMatcher(a: IndexedSeq[String], b: IndexedSeq[String]) {

  /** element → ascending positions in b (difflib's __chain_b). */
  private val b2j: mutable.HashMap[String, mutable.ArrayBuffer[Int]] = {
    val m = mutable.HashMap.empty[String, mutable.ArrayBuffer[Int]]
    var j = 0
    while (j < b.length) {
      m.getOrElseUpdate(b(j), mutable.ArrayBuffer.empty[Int]) += j
      j += 1
    }
    m
  }

  /** (besti, bestj, size) — difflib Match triple. */
  final case class Match(i: Int, j: Int, size: Int)

  private val emptyPositions = mutable.ArrayBuffer.empty[Int]

  /** Port of difflib.SequenceMatcher.find_longest_match. Tie-breaking
    * is inherited from iteration order: `i` ascending, and positions
    * `j` ascending within `b2j(a(i))`, with a strict `>` on size — so
    * the first maximal block in (a-start, b-start) order wins.
    */
  def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): Match = {
    var besti = alo
    var bestj = blo
    var bestsize = 0
    var j2len = mutable.HashMap.empty[Int, Int]
    var i = alo
    while (i < ahi) {
      val newj2len = mutable.HashMap.empty[Int, Int]
      val positions = b2j.getOrElse(a(i), emptyPositions)
      var pi = 0
      var break = false
      while (pi < positions.length && !break) {
        val j = positions(pi)
        if (j < blo) { /* continue */ }
        else if (j >= bhi) break = true // positions ascend: nothing further
        else {
          val k = j2len.getOrElse(j - 1, 0) + 1
          newj2len(j) = k
          if (k > bestsize) {
            besti = i - k + 1
            bestj = j - k + 1
            bestsize = k
          }
        }
        pi += 1
      }
      j2len = newj2len
      i += 1
    }
    // difflib's junk-aware extensions; with no junk both reduce to plain
    // equality extension (kept for structural fidelity — they are no-ops
    // when the dict pass already found maximal runs).
    while (besti > alo && bestj > blo && a(besti - 1) == b(bestj - 1)) {
      besti -= 1; bestj -= 1; bestsize += 1
    }
    while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        a(besti + bestsize) == b(bestj + bestsize)) {
      bestsize += 1
    }
    Match(besti, bestj, bestsize)
  }

  /** Port of get_matching_blocks: LIFO queue of unexplored regions,
    * sort, merge adjacent, append terminal (la, lb, 0) sentinel.
    */
  lazy val matchingBlocks: Vector[Match] = {
    val la = a.length
    val lb = b.length
    val queue = mutable.Stack((0, la, 0, lb))
    val found = mutable.ArrayBuffer.empty[Match]
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val m = findLongestMatch(alo, ahi, blo, bhi)
      if (m.size > 0) {
        found += m
        if (alo < m.i && blo < m.j) queue.push((alo, m.i, blo, m.j))
        if (m.i + m.size < ahi && m.j + m.size < bhi)
          queue.push((m.i + m.size, ahi, m.j + m.size, bhi))
      }
    }
    val sorted = found.sortBy(m => (m.i, m.j, m.size))
    // merge adjacent blocks (difflib non_adjacent pass)
    var i1 = 0; var j1 = 0; var k1 = 0
    val nonAdjacent = mutable.ArrayBuffer.empty[Match]
    for (m <- sorted) {
      if (i1 + k1 == m.i && j1 + k1 == m.j) k1 += m.size
      else {
        if (k1 > 0) nonAdjacent += Match(i1, j1, k1)
        i1 = m.i; j1 = m.j; k1 = m.size
      }
    }
    if (k1 > 0) nonAdjacent += Match(i1, j1, k1)
    nonAdjacent += Match(la, lb, 0)
    nonAdjacent.toVector
  }

  /** Port of get_opcodes: (tag, i1, i2, j1, j2) with half-open ranges. */
  lazy val opcodes: Vector[(String, Int, Int, Int, Int)] = {
    var i = 0
    var j = 0
    val answer = mutable.ArrayBuffer.empty[(String, Int, Int, Int, Int)]
    for (m <- matchingBlocks) {
      val tag =
        if (i < m.i && j < m.j) "replace"
        else if (i < m.i) "delete"
        else if (j < m.j) "insert"
        else ""
      if (tag.nonEmpty) answer += ((tag, i, m.i, j, m.j))
      i = m.i + m.size
      j = m.j + m.size
      if (m.size > 0) answer += (("equal", m.i, i, m.j, j))
    }
    answer.toVector
  }

  /** `lcs_equal_runs` (claude_research_optimal.py:283–289): equal
    * opcodes with a-length ≥ minRun, as (i1, i2, j1, j2).
    */
  def equalRuns(minRun: Int): Vector[(Int, Int, Int, Int)] =
    opcodes.collect {
      case ("equal", i1, i2, j1, j2) if (i2 - i1) >= minRun =>
        (i1, i2, j1, j2)
    }
}
