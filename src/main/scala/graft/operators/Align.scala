package graft.operators

import org.apache.spark.sql.Dataset

import graft.core.{AsrWord, BookWord, EqualRun, VWord}

/** J1/J2 — ordered sequence-alignment "join" between two word streams
  * (SURVEY.md §2.3). No relational equivalent exists, so the difflib
  * kernel runs per-document inside `cogroup`/`mapGroups`: documents are
  * the unit of parallelism, there is exactly one shuffle (by doc_id) on
  * each side, and no driver-side state — the shape that scales to a
  * 1000-executor cluster where each task aligns a bag of documents.
  */
object Align {

  /** J1: `lcs_equal_runs(book_norm, asr_norm, min_run)`
    * (claude_research_optimal.py:283–289, invoked at :457).
    *
    * `maxChunk` bounds the O(n·m) kernel per document: streams longer
    * than it align via anchor-chunked stitching (ChunkedMatcher) so a
    * single 1M-word document cannot become a straggler task. The
    * default keeps the exact direct kernel.
    */
  def lcsEqualRuns(
      book: Dataset[BookWord],
      asr: Dataset[AsrWord],
      minRun: Int,
      maxChunk: Int = Int.MaxValue): Dataset[EqualRun] = {
    val spark = book.sparkSession
    import spark.implicits._
    book.groupByKey(_.doc_id)
      .cogroup(asr.groupByKey(_.doc_id)) { (docId, bs, as) =>
        val bn = bs.toArray.sortBy(_.pos).map(_.norm).toIndexedSeq
        val an = as.toArray.sortBy(_.idx).map(_.norm).toIndexedSeq
        if (bn.isEmpty || an.isEmpty) Iterator.empty
        else ChunkedMatcher.equalRuns(bn, an, minRun, maxChunk)
          .iterator.map {
            case (bi0, bi1, ai0, ai1) =>
              EqualRun(docId, bi0.toLong, bi1.toLong, ai0.toLong, ai1.toLong)
          }
      }
  }

  /** J2: `lcs_pairs(a, b)` consensus between assembled-clip words and
    * validator words per (doc, group) (claude_research_optimal.py:
    * 365–371, invoked at :497). Emits all equal runs (min length 1)
    * keyed by (doc_id, group_id); index spaces are clip-local.
    */
  def lcsConsensusPairs(
      used: Dataset[AsrWord], // idx = position within the clip's word list
      validator: Dataset[VWord])
      : Dataset[(Long, Long, Long, Long, Long, Long)] = {
    val spark = used.sparkSession
    import spark.implicits._
    // used words carry group in `doc_id`-major key: callers pre-key by
    // (doc_id << 20 | group) when needed; here we align per doc_id only.
    used.groupByKey(_.doc_id)
      .cogroup(validator.groupByKey(_.doc_id)) { (key, us, vs) =>
        val a = us.toArray.sortBy(_.idx).map(_.norm).toIndexedSeq
        val b = vs.toArray.sortBy(_.vidx).map(_.norm).toIndexedSeq
        if (a.isEmpty || b.isEmpty) Iterator.empty
        else new SequenceMatcher(a, b).equalRuns(1).iterator.map {
          case (i1, i2, j1, j2) =>
            (key, i1.toLong, i2.toLong, j1.toLong, j2.toLong, (i2 - i1).toLong)
        }
      }
  }
}
