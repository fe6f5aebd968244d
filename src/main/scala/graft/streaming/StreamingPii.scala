package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** Streaming face of X384 ([[Privacy.piiScan]]): a running PII
  * census over an unbounded document stream — the release gate that
  * answers "is the feed leaking emails/phones/IPs/SSNs, and is the
  * rate rising" WHILE the corpus ingests, instead of at export time.
  * Per micro-batch the distributed pass runs the same scan-stage
  * regex counters as the batch operator and folds them to one row;
  * the driver adds the row into its cumulative census. Counts are
  * additive integers, so the cumulative census equals the batch
  * operator over the whole prefix EXACTLY (the parity spec asserts
  * equality, not a tolerance).
  *
  * Driver state: six longs — independent of stream length.
  */
object StreamingPii {

  final case class Census(nDocs: Long, nFlagged: Long, nEmails: Long,
      nPhones: Long, nIpv4: Long, nSsn: Long) {
    def piiRate: Double =
      if (nDocs == 0) 0.0 else nFlagged.toDouble / nDocs
  }

  final class Tracker {
    private var census = Census(0L, 0L, 0L, 0L, 0L, 0L)

    /** Merge one micro-batch of (docCol, textCol) rows. */
    def update(batch: DataFrame, docCol: String, textCol: String)
        : Unit = {
      val r = Privacy.piiScan(batch, docCol, textCol)
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("has_pii"), 1L).otherwise(0L)).cast("long")
            .as("f"),
          sum(col("n_emails")).cast("long").as("e"),
          sum(col("n_phones")).cast("long").as("p"),
          sum(col("n_ipv4")).cast("long").as("i"),
          sum(col("n_ssn")).cast("long").as("s"))
        .head()
      census = Census(
        census.nDocs + r.getAs[Long]("n"),
        census.nFlagged + Option(r.get(1)).map(_ => r.getAs[Long]("f"))
          .getOrElse(0L),
        census.nEmails + Option(r.get(2)).map(_ => r.getAs[Long]("e"))
          .getOrElse(0L),
        census.nPhones + Option(r.get(3)).map(_ => r.getAs[Long]("p"))
          .getOrElse(0L),
        census.nIpv4 + Option(r.get(4)).map(_ => r.getAs[Long]("i"))
          .getOrElse(0L),
        census.nSsn + Option(r.get(5)).map(_ => r.getAs[Long]("s"))
          .getOrElse(0L))
    }

    def current: Census = census
  }
}
