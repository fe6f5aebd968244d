package graft.functions

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Free-pass data-quality counters via `Dataset.observe`: named
  * aggregates that accumulate DURING whatever action the caller was
  * already running — zero extra scans, zero extra shuffles. At
  * 100 TB this is the difference between "also count the nulls"
  * being free and being a second full pass over storage.
  *
  * Batch usage:
  * {{{
  *   val (observed, read) = QualityMetrics.observe(df, "stage1",
  *     Seq("doc_id", "text"))
  *   observed.write.parquet(out)        // the action you wanted anyway
  *   val m = read()                     // Map(metric -> value)
  *   require(m("null_text") == 0)
  * }}}
  *
  * Collection detail: every action (`count`, `write`, `collect`)
  * runs its own QueryExecution, so the metrics are delivered through
  * a `QueryExecutionListener`, not read off the frame — `read()`
  * waits briefly for the (async) listener bus, returns the latest
  * metrics for this observation, and unregisters itself.
  *
  * The same observed frame works under Structured Streaming, where
  * metrics surface per micro-batch in
  * `StreamingQueryProgress.observedMetrics` — one definition for
  * both contexts, which is the point of `observe` over a handwritten
  * agg.
  */
object QualityMetrics {

  /** Attach a row count + per-column null counts to `df` under
    * `name`. Returns the observed frame (use it in place of `df`)
    * and a one-shot reader to call AFTER an action has run on it.
    */
  def observe(df: DataFrame, name: String,
      cols: Seq[String]): (DataFrame, () => Map[String, Long]) = {
    require(cols.nonEmpty, "observe needs at least one column")
    // coalesce: sum() over ZERO rows is null, and the empty-input
    // case (everything filtered upstream) is exactly when a quality
    // readout must report n_rows=0, not NPE
    val aggs = count(lit(1)).as("n_rows") +: cols.map(c =>
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"null_$c"))
    val observed = df.observe(name, aggs.head, aggs.tail: _*)

    val spark = df.sparkSession
    val captured = new AtomicReference[Option[Row]](None)
    // self-unregisters on first capture so a caller that acts but
    // never read()s doesn't leak a per-query listener; a caller that
    // neither acts nor reads still leaks one — read() is the contract
    val listener: QueryExecutionListener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach { r =>
          captured.set(Some(r))
          spark.listenerManager.unregister(this)
        }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    val read = () => {
      // the listener bus is async; give it a moment after the action
      val deadline = System.nanoTime() + 5000000000L
      while (captured.get().isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      spark.listenerManager.unregister(listener)
      val row = captured.get().getOrElse(throw new IllegalStateException(
        s"no observed metrics for '$name' — run an action on the " +
          "OBSERVED frame first"))
      row.schema.fieldNames.zipWithIndex
        .map { case (f, i) => f -> row.getLong(i) }.toMap
    }
    (observed, read)
  }
}
