package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X255 — small-file compaction planner: assign every input file to
  * an output group so each group's byte total lands near
  * `targetBytes` — THE housekeeping job of a 100 TB lake (a million
  * 2 MB files make every scan pay a million opens; Spark's own
  * maxPartitionBytes coalescing fixes reads but not the catalog, the
  * shuffle-file pressure, or downstream consumers). The plan is a
  * TABLE (file → output_group), so the rewrite itself is a plain
  * `groupBy(output_group)` repartition-write.
  *
  * Packing rule: files sort by size DESC (path tie-break — big files
  * placed first, the FFD intuition), then the group boundary is the
  * running byte total div target — computed with the two-phase
  * [[CorpusOps.prefixStarts]] machinery, NO single-partition
  * cumulative window (a 100 TB inventory is ~10⁸ rows). Guarantee
  * (spec-asserted): every group's total < targetBytes + its largest
  * file, and a file ≥ targetBytes sits alone in its group.
  * Deterministic: integer sizes, integer prefix sums, integer div.
  */
object Compaction {

  def plan(files: DataFrame, pathCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"bad targetBytes $targetBytes")
    val base = files.select(col(pathCol),
      col(bytesCol).cast("long").as("__b"))
      .filter(col("__b") >= 0L)
    val ranked = CorpusOps.globalRank(base,
      Seq(col("__b").desc, col(pathCol).asc))
    val starts = CorpusOps.prefixStarts(
      ranked.select(col("__rank"), col("__b").as("__n")), "__rank")
    ranked.join(starts, Seq("__rank"))
      .select(col(pathCol), col("__b").as("bytes"),
        (col("__rank") + 1L).as("size_rank"),
        expr(s"__start div ${targetBytes}L").as("output_group"))
  }
}
