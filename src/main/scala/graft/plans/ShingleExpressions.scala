package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static shingling kernel callable from generated code: distinct
  * 64-bit hashes of the k-token sequence n-grams of a token array, in
  * one pass with zero intermediate strings.
  *
  * Semantically equivalent (for every consumer in `graft.operators.
  * Dedup`, all of which are hash-invariant) to the Column-tree
  * pipeline `array_distinct(transform(sequence, i -> xxhash64(
  * array_join(slice(toks,i,k)))))` — but that tree is interpreted
  * per element by Spark's higher-order functions and materializes a
  * joined string per shingle; this kernel chains XXH64 over the raw
  * token bytes (seed 42, Spark's own xxhash64 seed) and dedups into
  * a hash set as it goes.
  */
object ShingleMath {
  private val Seed = 42L

  def hashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    // non-empty tokens only (mirrors the tokenizer's empty filter)
    val ts = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (t != null && t.numBytes() > 0) ts.add(t)
      i += 1
    }
    val m = ts.size() - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var j = 0
    while (j < m) {
      var h = Seed
      var p = 0
      while (p < k) {
        val t = ts.get(j + p)
        h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes(), h)
        p += 1
      }
      seen.add(h)
      j += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

object GramMath {
  private val Seed = 42L

  /** Driver-side twin of the kernel's per-gram chain: XXH64 folded
    * over the token bytes in order, seed 42 — used to hash blocklist
    * phrases into plan literals that match [[hashesAll]] output.
    */
  def hashTokens(tokens: Seq[String]): Long = {
    var h = Seed
    tokens.foreach { tok =>
      val t = UTF8String.fromString(tok)
      h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes(), h)
    }
    h
  }

  /** One hash per k-gram POSITION (overlaps included, no dedup) —
    * the counting twin of [[ShingleMath.hashes]]: same empty-token
    * filter, same chained XXH64 seed, but keeps every occurrence so
    * `size(filter(...))` over the result counts matches exactly as
    * the string `isin` did.
    */
  def hashesAll(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val ts = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (t != null && t.numBytes() > 0) ts.add(t)
      i += 1
    }
    val m = ts.size() - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var h = 42L
      var p = 0
      while (p < k) {
        val t = ts.get(j + p)
        h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes(), h)
        p += 1
      }
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingle_hash64_all(array<string>, k) -> array<bigint>`: hashed
  * k-grams of a token array, one per position (occurrence-preserving
  * — unlike `shingle_hash64`, which dedups for set semantics). `k`
  * must be a positive integer literal.
  */
final case class GramHashExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val k: Int = right match {
    case Literal(v: Int, IntegerType) => v
    case _ => -1
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!okLeft)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_hash64_all requires ARRAY<STRING>, got ${left.dataType.sql}")
    else if (!right.foldable || k <= 0)
      TypeCheckResult.TypeCheckFailure(
        "shingle_hash64_all requires a positive INT literal gram width")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(toks: Any, kv: Any): Any =
    GramMath.hashesAll(toks.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (toks, _) =>
      s"graft.plans.GramMath.hashesAll($toks, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GramHashExpression = copy(newLeft, newRight)

  override def prettyName: String = "shingle_hash64_all"
}

/** `shingle_hash64(array<string>, k) -> array<bigint>`: distinct
  * hashed k-gram shingles of a token array. `k` must be a positive
  * integer literal (it shapes the loop at plan time).
  */
final case class ShingleHashExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val k: Int = right match {
    case Literal(v: Int, IntegerType) => v
    case _ => -1
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!okLeft)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_hash64 requires ARRAY<STRING>, got ${left.dataType.sql}")
    else if (!right.foldable || k <= 0)
      TypeCheckResult.TypeCheckFailure(
        "shingle_hash64 requires a positive INT literal shingle width")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(toks: Any, kv: Any): Any =
    ShingleMath.hashes(toks.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (toks, _) =>
      s"graft.plans.ShingleMath.hashes($toks, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleHashExpression = copy(newLeft, newRight)

  override def prettyName: String = "shingle_hash64"
}
