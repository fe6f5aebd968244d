package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed `Aggregator` — the
  * partial-aggregating alternative to the `row_number() OVER
  * (PARTITION BY g ORDER BY v)` window.
  *
  * Why it matters at 100 TB: the window form shuffles EVERY row of
  * every group and sorts whole groups just to keep k of them. This
  * aggregator is map-side combinable — each map task forwards at
  * most k (value, id) pairs per group it saw, so the exchange
  * carries ≤ k·groups·partitions rows (usually ≪ input), and no
  * full-group sort ever happens. Same trick as the global
  * `TakeOrderedAndProject`, applied per group.
  *
  * Ordering is value desc with id asc tiebreak — identical to the
  * window twin, so results hash-match an ORDER BY ... LIMIT oracle.
  * The buffer is a size-≤k sorted vector: reduce is O(k) insert,
  * merge is O(k) merge — cheap because k is small by contract.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)],
      Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // Double.compare (on -0.0-normalized values) rather than >/==: a
  // strict total order, so sortWith never violates its contract, and
  // NaN ranks above every value — matching Spark's window ORDER BY v
  // DESC, which the oracle contract requires
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    def z(x: Double): Double = if (x == 0.0) 0.0 else x
    val c = java.lang.Double.compare(z(a._1), z(b._1))
    c > 0 || (c == 0 && a._2 < b._2)
  }

  def zero: List[(Double, Long)] = Nil

  def reduce(b: List[(Double, Long)], a: (Double, Long))
      : List[(Double, Long)] = merge(b, a :: Nil)

  def merge(x: List[(Double, Long)], y: List[(Double, Long)])
      : List[(Double, Long)] = {
    // merge two sorted lists, truncate at k
    val out = List.newBuilder[(Double, Long)]
    var (xs, ys, n) = (x, y.sortWith(lt), 0)
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      if (ys.isEmpty || (xs.nonEmpty && lt(xs.head, ys.head))) {
        out += xs.head; xs = xs.tail
      } else { out += ys.head; ys = ys.tail }
      n += 1
    }
    out.result()
  }

  def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b

  def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
