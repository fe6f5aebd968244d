package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Final row of the Gram/covariance spectral summary — the exact
  * output contract of `Similarity.effectiveRank` (column names and
  * NULL behavior must match its former cells-pipeline form).
  */
case class GramStats(dim: Long, trace: Option[Double],
    frobenius_sq: Option[Double], effective_rank: Option[Double])

/** Per-length component sums: `count` vectors of this exact length,
  * `s(i)` = Σ qᵢ over them (micro-quantized longs). Kept per length
  * so ragged inputs reproduce the join shape's per-cell restricted
  * sums exactly: cell (i,j) only aggregates vectors whose length
  * exceeds max(i,j).
  */
class GramBuf(var d: Int, var lens: java.util.HashMap[Integer, Array[Long]],
    var hi: Array[Long], var lo: Array[Long]) extends Serializable

/** One-pass covariance-Gram aggregator replacing effectiveRank's
  * exploded-components self-join (which shuffled N·d rows twice and
  * emitted N·d² join rows before the d² aggregate). This computes the
  * same exact integer sums in a single scan with a d²-cell buffer —
  * map-side combinable, merge cost d².
  *
  * Exactness contract (the DuckDB oracle hashes these doubles):
  *  - components quantize through Spark's `round(x·1e6, 0)` semantics
  *    (BigDecimal HALF_UP on the double) then cast to long;
  *  - Σqᵢ per length bucket is an exact long (overflow would need
  *    ~9e12 unit-scale rows; addExact raises loudly first);
  *  - Σqᵢqⱼ accumulates in 128-bit two's-complement limbs (hi/lo) —
  *    the same ≥38-digit headroom the former decimal(38,0) sums had —
  *    converted to double only at finish, exactly as decimal→double
  *    cast did;
  *  - every downstream double op replays the old Column tree's IEEE
  *    op order, and rounding is BigDecimal HALF_UP like Spark Round.
  */
class GramAgg extends Aggregator[Seq[Double], GramBuf, GramStats] {

  private def quantize(x: Double): Long = {
    // Spark Round(double, 0): NaN/Inf pass through; else BigDecimal
    // HALF_UP. Cast-to-long on the contract path only sees finite
    // integral doubles.
    require(!x.isNaN && !x.isInfinity, s"non-finite component $x")
    JBigDecimal.valueOf(x * 1e6).setScale(0, RoundingMode.HALF_UP)
      .doubleValue().toLong
  }

  private def grow(b: GramBuf, d: Int): Unit = {
    if (d <= b.d) return
    val nhi = new Array[Long](d * d)
    val nlo = new Array[Long](d * d)
    var i = 0
    while (i < b.d) {
      System.arraycopy(b.hi, i * b.d, nhi, i * d, b.d)
      System.arraycopy(b.lo, i * b.d, nlo, i * d, b.d)
      i += 1
    }
    b.hi = nhi; b.lo = nlo; b.d = d
  }

  // 128-bit two's-complement accumulate of the exact signed product
  // a*b into limb pair (hi(idx), lo(idx))
  private def addProduct(b: GramBuf, idx: Int, a: Long, c: Long): Unit = {
    val pLo = a * c
    val pHi = Math.multiplyHigh(a, c)
    val oldLo = b.lo(idx)
    val sumLo = oldLo + pLo
    // carry-out of unsigned 64-bit add
    val carry = ((oldLo & pLo) | ((oldLo | pLo) & ~sumLo)) >>> 63
    b.lo(idx) = sumLo
    b.hi(idx) = b.hi(idx) + pHi + carry
  }

  def zero: GramBuf = new GramBuf(0,
    new java.util.HashMap[Integer, Array[Long]](),
    Array.emptyLongArray, Array.emptyLongArray)

  def reduce(b: GramBuf, vec: Seq[Double]): GramBuf = {
    // a NULL vector row contributes nothing (the pre-GramAgg
    // posexplode form silently dropped it; keep that contract).
    // NaN/Inf components still throw via quantize's require — an
    // intentional loud contract: a non-finite embedding is corrupt
    // input, not a droppable row.
    if (vec == null) return b
    val len = vec.length
    if (len == 0) {
      // a zero-length vector contributes no components and no cells —
      // but the join shape also gave it no rows, so nothing to track
      return b
    }
    grow(b, len)
    val q = new Array[Long](len)
    var i = 0
    while (i < len) { q(i) = quantize(vec(i)); i += 1 }
    var bucket = b.lens.get(len)
    if (bucket == null) {
      bucket = new Array[Long](len + 1)
      b.lens.put(len, bucket)
    }
    bucket(0) = Math.addExact(bucket(0), 1L)
    i = 0
    while (i < len) {
      bucket(i + 1) = Math.addExact(bucket(i + 1), q(i))
      var j = 0
      val row = i * b.d
      while (j < len) {
        addProduct(b, row + j, q(i), q(j))
        j += 1
      }
      i += 1
    }
    b
  }

  def merge(x: GramBuf, y: GramBuf): GramBuf = {
    if (y.d == 0) return x
    if (x.d == 0) return y
    val (big, small) = if (x.d >= y.d) (x, y) else (y, x)
    small.lens.forEach { (len, bucket) =>
      val tgt = big.lens.get(len)
      if (tgt == null) big.lens.put(len, bucket)
      else {
        var i = 0
        while (i < bucket.length) {
          tgt(i) = Math.addExact(tgt(i), bucket(i)); i += 1
        }
      }
    }
    var i = 0
    while (i < small.d) {
      var j = 0
      while (j < small.d) {
        val si = i * small.d + j
        val bi = i * big.d + j
        val oldLo = big.lo(bi)
        val addLo = small.lo(si)
        val sumLo = oldLo + addLo
        val carry = ((oldLo & addLo) | ((oldLo | addLo) & ~sumLo)) >>> 63
        big.lo(bi) = sumLo
        big.hi(bi) = big.hi(bi) + small.hi(si) + carry
        j += 1
      }
      i += 1
    }
    big
  }

  def finish(b: GramBuf): GramStats = {
    val d = b.d
    if (d == 0) return GramStats(0L, None, None, None)
    // per-cell restricted counts/sums: cell (i,j) covers vectors with
    // length > max(i,j); precompute suffix count + suffix component
    // sums over the (tiny) set of distinct lengths
    val nAtLeast = new Array[Long](d + 1) // nAtLeast(m) = #vecs len > m-1… indexed len≥m
    val sAtLeast = Array.ofDim[Long](d + 1, d) // sums over vecs len ≥ m
    b.lens.forEach { (len, bucket) =>
      var m = 1
      while (m <= len) {
        nAtLeast(m) = Math.addExact(nAtLeast(m), bucket(0))
        var i = 0
        while (i < len) {
          if (i < d) sAtLeast(m)(i) =
            Math.addExact(sAtLeast(m)(i), bucket(i + 1))
          i += 1
        }
        m += 1
      }
    }
    def limbToBigDecimal(hi: Long, lo: Long): JBigDecimal = {
      val loBytes = java.nio.ByteBuffer.allocate(8).putLong(lo).array()
      new JBigDecimal(BigInteger.valueOf(hi).shiftLeft(64)
        .add(new BigInteger(1, loBytes)))
    }
    def sparkRound0(v: Double): Double =
      if (v.isNaN || v.isInfinity) v
      else JBigDecimal.valueOf(v).setScale(0, RoundingMode.HALF_UP)
        .doubleValue()
    def sparkRound6(v: Double): Double =
      if (v.isNaN || v.isInfinity) v
      else JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)
        .doubleValue()
    var tr = 0L
    var fr = BigInteger.ZERO
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        val m = math.max(i, j) + 1 // cell needs len ≥ m
        val nd = nAtLeast(m).toDouble
        val sijD = limbToBigDecimal(b.hi(i * d + j), b.lo(i * d + j))
          .doubleValue()
        val siD = sAtLeast(m)(i).toDouble
        val sjD = sAtLeast(m)(j).toDouble
        // identical IEEE op order to the old Column tree:
        // ((sij/n) - (si/n)*(sj/n)) / 1e12, then * 1e9, round 0
        val cij = (sijD / nd - (siD / nd) * (sjD / nd)) / 1e12
        val cn = sparkRound0(cij * 1e9).toLong
        if (i == j) tr = Math.addExact(tr, cn)
        fr = fr.add(BigInteger.valueOf(cn).multiply(BigInteger.valueOf(cn)))
        j += 1
      }
      i += 1
    }
    val frD = new JBigDecimal(fr).doubleValue()
    val trD = tr.toDouble
    GramStats(
      dim = math.sqrt((d.toLong * d.toLong).toDouble).toLong,
      trace = Some(sparkRound6(trD / 1e9)),
      frobenius_sq = Some(sparkRound6(frD / 1e18)),
      effective_rank =
        if (fr.signum > 0) Some(sparkRound6(trD * trD / frD)) else None)
  }

  def bufferEncoder: Encoder[GramBuf] = Encoders.kryo[GramBuf]
  def outputEncoder: Encoder[GramStats] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
