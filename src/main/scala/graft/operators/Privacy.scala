package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity profiling with a generalization ladder — the privacy
  * gate a training corpus passes before release. A row is k-anonymous
  * under a quasi-identifier (QI) tuple when at least k rows share its
  * tuple; rows in smaller groups are re-identifiable and must be
  * generalized (coarser QI) or suppressed.
  *
  * [[anonymityLadder]] implements the Mondrian-style fixed ladder:
  * QI levels are given most-specific first, and each row settles at
  * the FIRST level whose anonymity set already reaches `k` (the last
  * level is a catch-all — rows that fail even there report it with
  * their sub-k set size, for the caller to suppress).
  *
  * Scale shape: one skinny count aggregation per ladder level (the
  * group tables are QI-cardinality-sized, orders of magnitude smaller
  * than the corpus), broadcast-joined back onto the rows — the wide
  * document rows are never shuffled, so the profile is a pure
  * scan+broadcast pass at any corpus size. This mirrors how the
  * redaction pass (X22) stays scan-local.
  */
object Privacy {

  /** Per-row (levelCols... , level, k): `level` = index into `levels`
    * where the row first reached `k` anonymity (or `levels.size - 1`
    * if it never did), `k` = the anonymity set size at that level.
    * `keyCols` are carried through for identification.
    */
  def anonymityLadder(df: DataFrame, keyCols: Seq[String],
      levels: Seq[Seq[Column]], k: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one QI level")
    require(k >= 1, s"k=$k must be >= 1")
    val spark = df.sparkSession

    // materialize each level's QI columns once so group keys and the
    // join-back keys are byte-identical expressions
    val qiNames = levels.zipWithIndex.map { case (cols, li) =>
      cols.indices.map(ci => s"__qi_${li}_$ci")
    }
    val withQi = df.select(
      keyCols.map(col) ++
        levels.zip(qiNames).flatMap { case (cols, names) =>
          cols.zip(names).map { case (c, n) => c.as(n) }
        }: _*)

    // one skinny agg per level, broadcast back (group tables are
    // QI-sized; the row table never moves)
    val counted = levels.indices.foldLeft(withQi) { case (acc, li) =>
      val names = qiNames(li)
      val groups = withQi.groupBy(names.map(col): _*)
        .agg(count(lit(1)).as(s"__k_$li"))
      acc.join(broadcast(groups), names, "left")
    }

    val levelExpr = levels.indices
      .foldRight(lit(levels.size - 1): Column) { case (li, rest) =>
        when(col(s"__k_$li") >= k, lit(li)).otherwise(rest)
      }
    val kExpr = levels.indices
      .foldRight(col(s"__k_${levels.size - 1}"): Column) { case (li, rest) =>
        when(col(s"__k_$li") >= k, col(s"__k_$li")).otherwise(rest)
      }
    counted.select(
      keyCols.map(col) :+ levelExpr.as("level") :+ kExpr.as("k"): _*)
  }
}
