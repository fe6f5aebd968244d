package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.Privacy

/** Streaming PII census (X384 twin): the cumulative tracker equals
  * the batch piiScan over the whole prefix EXACTLY (counts are
  * additive integers — no tolerance), under any batch split.
  */
class StreamingPiiSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private val docs = Seq(
    (1L, "write to alice@example.com or call 555-123-4567 today"),
    (2L, "plain text with no identifiers at all"),
    (3L, "server 192.168.0.1 and ssn 123-45-6789 leaked"),
    (4L, "backup host 10.0.0.7"),
    (5L, "bob@corp.io and carol@corp.io share 555-000-1111"),
    (6L, "nothing here either"))

  test("cumulative census == batch piiScan over the prefix, exactly, " +
    "for two different batch splits") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    def censusOf(rows: Seq[(Long, String)]): StreamingPii.Census = {
      val r = Privacy.piiScan(rows.toDF("doc_id", "text"),
          "doc_id", "text")
        .agg(count(lit(1)), sum(when(col("has_pii"), 1L).otherwise(0L)),
          sum(col("n_emails")), sum(col("n_phones")),
          sum(col("n_ipv4")), sum(col("n_ssn"))).head()
      StreamingPii.Census(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
    }
    val whole = censusOf(docs)
    for (split <- Seq(Seq(2, 2, 2), Seq(1, 4, 1))) {
      val t = new StreamingPii.Tracker
      var rest = docs
      split.foreach { n =>
        val (batch, tail) = rest.splitAt(n)
        t.update(batch.toDF("doc_id", "text"), "doc_id", "text")
        rest = tail
      }
      assert(t.current == whole, s"split $split diverged")
    }
    assert(whole.nDocs == 6 && whole.nFlagged == 4)
    assert(whole.nEmails == 3 && whole.nPhones == 2)
    assert(whole.nIpv4 == 2 && whole.nSsn == 1)
  }

  test("empty batch leaves the census unchanged; rate handles zero") {
    val s = spark
    import s.implicits._
    val t = new StreamingPii.Tracker
    assert(t.current.piiRate == 0.0)
    t.update(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text")
    assert(t.current == StreamingPii.Census(0, 0, 0, 0, 0, 0))
  }
}
