package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A7 — ordered binary concatenation as a typed `Aggregator`
  * (claude_research_optimal.py:308–341, 669: the reference's
  * accumulator-style `full_audio += piece`). Input rows are
  * (ord, bytes); the buffer collects and the finish step sorts by
  * `ord` and splices — so the aggregation is order-insensitive to
  * Spark's partial-merge order while producing a deterministic
  * ordered result. Registrable via `udaf` for SQL use.
  *
  * Scale note: per-group payload must fit an executor (same
  * constraint as any collect_list); groups here are documents, whose
  * audio the reference holds in memory whole anyway.
  */
object OrderedConcat
    extends Aggregator[(Long, Array[Byte]), List[(Long, Array[Byte])],
      Array[Byte]] {

  def zero: List[(Long, Array[Byte])] = Nil

  def reduce(b: List[(Long, Array[Byte])], a: (Long, Array[Byte]))
      : List[(Long, Array[Byte])] = a :: b

  def merge(x: List[(Long, Array[Byte])], y: List[(Long, Array[Byte])])
      : List[(Long, Array[Byte])] = x ::: y

  def finish(b: List[(Long, Array[Byte])]): Array[Byte] = {
    val sorted = b.sortBy(_._1)
    val total = sorted.iterator.map(_._2.length).sum
    val out = new Array[Byte](total)
    var off = 0
    sorted.foreach { case (_, bytes) =>
      System.arraycopy(bytes, 0, out, off, bytes.length)
      off += bytes.length
    }
    out
  }

  def bufferEncoder: Encoder[List[(Long, Array[Byte])]] =
    Encoders.kryo[List[(Long, Array[Byte])]]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
