package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two dimension
  * keys so that sorting by the single interleaved key keeps rows
  * close in BOTH dimensions. Written out range-partitioned by that
  * key, every file covers a small 2-D tile, so parquet min/max
  * stats prune files for range predicates on EITHER OR BOTH columns
  * — the standard lakehouse layout trick (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`) for 100 TB tables queried along more than one axis.
  * A plain sort gives perfect pruning on its leading column and none
  * on the second; the z-curve trades a little of the first for most
  * of the second.
  *
  * Everything is integer shift/mask Column arithmetic — codegen'd in
  * the scan stage, no UDF, and bit-for-bit reproducible in any
  * engine with 64-bit integer ops (the oracle replays the identical
  * five spread steps).
  */
object ZOrder {

  /** Spread the low 32 bits of `x`: bit i moves to bit 2i. The five
    * classic mask-and-shift steps; input above 2³² must be masked by
    * the caller (we mask here defensively).
    */
  def spreadBits(x: Column): Column = {
    val steps = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL,
      2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    steps.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) {
      case (v, (s, mask)) =>
        v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(mask))
    }
  }

  /** 64-bit Morton key of two 32-bit dimension values: a's bit i at
    * bit 2i, b's at 2i+1. With both inputs < 2³¹ the result is
    * non-negative ⇔ signed and unsigned orderings agree; a full
    * 32-bit `b` sets the sign bit, so keep dimension keys ≤ 31 bits
    * (bin first — z-ordering wants coarse bins anyway: the curve's
    * locality comes from the high bits).
    */
  def interleave2(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Rewrite `df` clustered on the z-curve of two integer columns:
    * range-partition by the Morton key into `numFiles` output tasks
    * and sort within each — one shuffle, each output file a compact
    * 2-D tile. Downstream scans of the written files prune on
    * min/max stats of BOTH columns.
    */
  def cluster(df: DataFrame, colA: String, colB: String,
      numFiles: Int): DataFrame = {
    val z = interleave2(col(colA).cast("long"), col(colB).cast("long"))
      .as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** X132 — Hilbert-curve clustering key, the locality upgrade over
    * the Morton key above: Hilbert's recursive rotations keep EVERY
    * consecutive pair of cells adjacent on the grid (Morton's "Z"
    * jumps diagonally at every quadrant seam), so range scans over
    * the sorted key touch measurably fewer data files for the same
    * 2-D selectivity — which is why table formats offer it next to
    * Z-order. The xy→d walk is the textbook bit-level loop
    * (Hamilton's conversion; s levels of quadrant pick + rotate), a
    * JIT-compiled UDF on exact longs — the per-level conditional
    * swap/flip as nested column `when`s would blow up the expression
    * tree ~3× per level (the rankedCids lesson) — and the oracle
    * replays the identical integer walk as an unrolled per-level CTE
    * chain (the q_zorder_key pattern), so keys are hash-exact.
    */
  def hilbertKeyUdf(bits: Int = 16): org.apache.spark.sql.expressions
      .UserDefinedFunction = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    val b = bits
    udf { (xi: Long, yi: Long) =>
      var x = xi; var y = yi; var d = 0L
      var s = 1L << (b - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
  }

  /** X178 — jump consistent hashing (Lamping & Veach 2014): the
    * MINIMAL-MOVEMENT shard assigner — growing n → n+1 shards moves
    * EXACTLY the keys that land on the new shard (≈ 1/(n+1) of them)
    * and moves them ONLY there; every other key keeps its shard.
    * The resharding property the X6/X36 contiguous-budget shards
    * deliberately don't have (they optimize packing, this optimizes
    * churn): growing a 1000-file layout by one file rewrites ~0.1%
    * of rows instead of reshuffling everything.
    *
    * The paper's algorithm verbatim — LCG step + float jump — as a
    * JIT-compiled UDF on exact longs (data-dependent trip count ≈
    * ln(n) forbids a fixed expression tree, the hilbertKeyUdf
    * precedent). Deterministic but not SQL-expressible → rows-only
    * contracts; the movement law is spec-ASSERTED, not assumed.
    */
  def jumpHash(key: Long, numBuckets: Int): Int = {
    require(numBuckets >= 1, s"need numBuckets >= 1, got $numBuckets")
    var b = -1L
    var j = 0L
    var k = key
    while (j < numBuckets) {
      b = j
      k = k * 2862933555777941757L + 1
      j = ((b + 1) * (1L << 31).toDouble / ((k >>> 33) + 1).toDouble)
        .toLong
    }
    b.toInt
  }

  def jumpHashUdf(numBuckets: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(numBuckets >= 1, s"need numBuckets >= 1, got $numBuckets")
    val n = numBuckets
    udf { (key: Long) => jumpHash(key, n) }
  }
}
