package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 15: X171 URL analytics, X172 sentence segmentation. */
class UrlSentenceSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("urlParts extracts host/domain/tld/path; domainRollup " +
    "aggregates hosts under their registrable domain") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "https://www.example.com/a/b", 10L),
      (2L, "https://blog.example.com/c", 20L),
      (3L, "http://other.org/", 60L),
      (4L, "https://www.example.com/d", 30L)).toDF("id", "url", "score")
    val (host, domain, tld, path) = CorpusOps.urlParts($"url")
    val p = docs.select(host.as("h"), domain.as("d"), tld.as("t"),
        path.as("p"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3)))
    assert(p(0) == ("www.example.com", "example.com", ".com", "/a/b"))
    assert(p(1) == ("blog.example.com", "example.com", ".com", "/c"))
    assert(p(2) == ("other.org", "other.org", ".org", "/"))
    val roll = CorpusOps.domainRollup(docs, "url", "score")
      .collect().map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_hosts"),
          r.getAs[Double]("mean_score"))).toMap
    assert(roll("example.com") == (3L, 2L, 20.0))
    assert(roll("other.org") == (1L, 1L, 60.0))
  }

  test("urlParts handles uppercase schemes/hosts and ports; " +
    "IP-literal hosts land in the visible (unparsed) bucket") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "HTTPS://WWW.Example.COM:8443/CaseKept/Path", 10L),
      (2L, "http://192.168.0.1/admin", 20L),
      (3L, "https://example.com/x", 30L)).toDF("id", "url", "score")
    val (host, domain, tld, path) = CorpusOps.urlParts($"url")
    val p = docs.orderBy($"id")
      .select(host.as("h"), domain.as("d"), tld.as("t"), path.as("p"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3)))
    // host lowercased + port stripped; path keeps its original case
    assert(p(0) == ("www.example.com", "example.com", ".com",
      "/CaseKept/Path"))
    // IP host: no alphabetic TLD -> empty domain at the parts level
    assert(p(1)._1 == "192.168.0.1" && p(1)._2 == "")
    val roll = CorpusOps.domainRollup(docs, "url", "score")
      .collect().map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_hosts"))).toMap
    assert(roll("example.com") == (2L, 2L))
    assert(roll("(unparsed)") == (1L, 1L))
  }

  test("sentenceSplit cuts on terminal punctuation runs, keeps " +
    "punctuation, trims, and drops empty fragments") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "One sentence. Two!! Three? "),
      (2L, "no terminal punctuation at all"),
      (3L, "Ellipsis... then more.")).toDF("doc_id", "t")
    val out = CorpusOps.sentenceSplit(docs, "doc_id", "t")
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) =>
        d -> rs.sortBy(_.getAs[Long]("sent_idx"))
          .map(_.getAs[String]("sentence")).toSeq
      }
    assert(out(1L) == Seq("One sentence.", "Two!!", "Three?"))
    assert(out(2L) == Seq("no terminal punctuation at all"))
    assert(out(3L) == Seq("Ellipsis...", "then more."))
  }
}
