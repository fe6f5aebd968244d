package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Redaction semantics on literal strings: each pattern class, the
  * ordering guarantees (card/IP before the greedy phone run), and
  * hit counts.
  */
class RedactSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def redactOne(s: String): String = {
    val sp = spark
    import sp.implicits._
    Seq(s).toDF("t").select(Redact.redact($"t")).collect()(0).getString(0)
  }

  test("each pattern class redacts") {
    assert(redactOne("mail a.b+c@ex-ample.co.uk here") == "mail <EMAIL> here")
    assert(redactOne("card 4111111111111111 ok") == "card <CARD> ok")
    assert(redactOne("host 192.168.001.1 up") == "host <IP> up")
    assert(redactOne("call +1 (555) 010-9999 now") == "call <PHONE> now")
  }

  test("ordering: card and IP are not half-eaten by the phone run") {
    val got = redactOne("pay 4111111111111111 via 10.0.0.7 or +49 89 1234567")
    assert(got == "pay <CARD> via <IP> or <PHONE>", got)
  }

  test("clean text unchanged; hit counts match") {
    val sp = spark
    import sp.implicits._
    assert(redactOne("nothing sensitive here") == "nothing sensitive here")
    val row = Seq("a@b.io c@d.io 4111111111111111 10.0.0.1").toDF("t")
      .select(Redact.hitCounts($"t").map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(row.getInt(0) == 2) // email
    assert(row.getInt(1) == 1) // card
    assert(row.getInt(2) == 1) // ipv4
  }
}
