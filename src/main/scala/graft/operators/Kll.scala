package graft.operators

import scala.collection.mutable

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** X312 — mergeable KLL quantile sketches (Apache DataSketches):
  * the QUANTILE member of the sketch warehouse family (X129 HLL =
  * distincts, X104 CMS = frequencies, X244 KMV = set sizes) — store
  * one ~3 KB sketch per group per snapshot and answer "p99 length
  * for any subset of sources/snapshots" later by MERGING sketches,
  * never rescanning data. X7's `approx_quantiles` answers once and
  * evaporates; X60's bisection is exact but needs the data live.
  *
  * Shape: stage 1 builds one sketch per (input partition, group) in
  * a single mapPartitions pass (the hand-rolled map-side combine —
  * sketch state is ~k doubles, bounded); stage 2 groups the
  * part-sketches (\|groups\|·\|partitions\| rows, never data-sized)
  * and merges. KLL compaction is RANDOMIZED (the sketch's accuracy
  * guarantee is probabilistic, ±1.65% rank error at k = 200, 99%
  * confidence), so the contract is rows-only + tolerance specs —
  * same class as the HLL/KMV rows.
  */
object Kll {

  /** One row per group: exact n plus sketch quantile estimates at
    * `qs` (scalar columns only — the X116 driver-shape lesson).
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 200, qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(k >= 8 && k <= 65535, s"bad k $k")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1), s"bad qs $qs")
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.col
    val rows = df.select(col(groupCol).cast("string"),
      col(valueCol).cast("double"))
    // stage 1: per-(partition, group) part-sketches
    val partial = rows.rdd.mapPartitions { it =>
      val acc = mutable.HashMap.empty[String, KllDoublesSketch]
      it.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          acc.getOrElseUpdate(r.getString(0),
            KllDoublesSketch.newHeapInstance(k)).update(r.getDouble(1))
        }
      }
      acc.iterator.map { case (g, s) => (g, s.toByteArray) }
    }
    // stage 2: merge the groups' part-sketches
    val merged = partial.groupByKey().map { case (g, parts) =>
      val u = KllDoublesSketch.newHeapInstance(k)
      parts.foreach(b => u.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
      val quantiles = qs.map(q => u.getQuantile(q))
      Row.fromSeq(g +: u.getN +: quantiles)
    }
    // integral percents keep their p50-style names; fractional ones
    // spell out the decimals (p0_5, p99_4) so two requested quantiles
    // can never collide into one column name (r10 ADVICE: 0.005 and
    // 0.009 both rounded to 'p1')
    def pName(q: Double): String = {
      val pct = q * 100
      if (pct == pct.floor) s"p${pct.toInt}"
      else "p" + BigDecimal(pct).underlying.stripTrailingZeros
        .toPlainString.replace('.', '_')
    }
    val names = qs.map(pName)
    require(names.distinct.size == names.size,
      s"duplicate quantile columns from qs=$qs")
    val schema = StructType(
      StructField("group", StringType) +:
        StructField("n", LongType) +:
        names.map(StructField(_, DoubleType)))
    spark.createDataFrame(merged, schema)
  }
}
