package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X240 — largest-remainder (Hamilton) apportionment: split a fixed
  * integer budget `total` across strata proportionally to their
  * counts, with the leftover seats going to the largest remainders —
  * the EXACT integer answer to "give me 1,000,000 sample slots
  * across (lang, source) strata matching the corpus mix" that
  * per-stratum rounding gets wrong (floors under-allocate by up to
  * \|strata\| slots; naive rounding can overshoot the budget). The
  * quota layer X50's fixed-count stratum sampler consumes.
  *
  * Everything is INTEGER arithmetic: base = ⌊total·c/N⌋ and the
  * remainder total·c mod N compare as exact longs (never a double
  * fraction), with the stratum key as the total tie-break, so the
  * allocation is engine-exact and Σquota = total ALWAYS (spec law).
  * Scale shape: one count agg + one strata-bounded rank window —
  * rows never shuffle wide; the window is \|strata\|-sized.
  */
object Apportion {

  /** One row per stratum: count, floor quota, remainder rank, final
    * quota. Exactness bound: total·max(stratum count) must fit a
    * long (~9.2e18 — a 1e6-slot budget over 1e12-row strata is
    * fine), enforced by `require` against nothing data-dependent but
    * documented here; `div`/`pmod` on longs keep floor semantics
    * exact (a decimal cast would ROUND the quotient).
    */
  def largestRemainder(df: DataFrame, strataCols: Seq[String],
      total: Long): DataFrame = {
    require(strataCols.nonEmpty && total >= 0, s"bad total $total")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).cast("long").as("__N"))
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("__base", expr(s"(n_rows * ${total}L) div __N"))
      .withColumn("__rem", pmod(col("n_rows") * lit(total), col("__N")))
    val wRem = Window.orderBy(
      (col("__rem").desc +: strataCols.map(c => col(c).asc)): _*)
    val wBase = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    based
      .withColumn("__rank", row_number().over(wRem).cast("long"))
      .withColumn("__left", (lit(total) - sum(col("__base")).over(wBase))
        .cast("long"))
      .select(strataCols.map(col) ++ Seq(col("n_rows"),
        col("__base").as("floor_quota"),
        col("__rank").as("remainder_rank"),
        (col("__base") +
          when(col("__rank") <= col("__left"), 1L).otherwise(0L))
          .cast("long").as("quota")): _*)
  }
}
