package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.functions.ByteCodec

/** Wave 47 (X361–X363): GPT-2 byte codec, token-level F1, HITS. */
class Wave47Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X361 ByteCodec --------------------------------------------------

  test("byte codec: printable latin keeps itself, space maps to the " +
    "published U+0120, exactly 68 byte values shift") {
    assert(ByteCodec.encode("hello!") == "hello!")
    assert(ByteCodec.encode(" ") == "Ġ") // GPT-2's famous 'Ġ'
    assert(ByteCodec.encode("a b") == "aĠb")
    assert(ByteCodec.ShiftedCount == 68)
  }

  test("byte codec round-trips arbitrary text: multi-byte UTF-8, " +
    "controls, emoji") {
    val cases = Seq("hello world", "naïve café", "汉字テスト",
      "tab\there\nnewline", "emoji 😀 ok", "")
    cases.foreach { s =>
      val enc = ByteCodec.encode(s)
      assert(ByteCodec.decode(enc) == s, s"round-trip broke on: $s")
      // one mapped char per UTF-8 byte
      assert(enc.length == s.getBytes("UTF-8").length)
    }
    assert(ByteCodec.shiftedBytes("a b c") == 2)
    // 汉 = E6 B1 89: E6/B1 are latin-1 keep bytes, 89 shifts
    assert(ByteCodec.shiftedBytes("汉") == 1)
  }

  // ---- X362 tokenF1 ----------------------------------------------------

  test("tokenF1: multiplicity-aware overlap, hand case 2/3") {
    val pairs = Seq((1L, "a a b", "a b b"), (2L, "x y", "x y"),
      (3L, "p q", "r s"), (4L, "", "a")).toDF("id", "pred", "ref")
    val out = RankEval.tokenF1(pairs, "id", "pred", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    val h = out(1L)
    assert(h.getAs[Long]("n_common") == 2)
    assert(h.getAs[Double]("precision") == 0.666667 &&
      h.getAs[Double]("recall") == 0.666667 &&
      h.getAs[Double]("f1") == 0.666667)
    assert(out(2L).getAs[Double]("f1") == 1.0)
    assert(out(3L).getAs[Double]("f1") == 0.0)
    assert(out(4L).isNullAt(out(4L).fieldIndex("precision")))
  }

  // ---- X363 HITS -------------------------------------------------------

  test("hits: hand-computed star graph, one integer iteration") {
    // h1 -> a1, h2 -> a1, h1 -> a2
    val e = Seq(("h1", "a1"), ("h2", "a1"), ("h1", "a2"))
      .toDF("src", "dst")
    val out = PageRank.hits(e, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // auth: raw (2e9, 1e9), tot 3e9 -> (666666666, 333333333)
    assert(out("a1")._2 == 666666666L)
    assert(out("a2")._2 == 333333333L)
    // hubs: raw (999999999, 666666666), tot 1666666665
    assert(out("h1")._1 == 600000000L)
    // 666666666e9 = 1666666665 * 400000000 exactly
    assert(out("h2")._1 == 400000000L)
    // pure hubs have authority 0; pure authorities have hub 0
    assert(out("h1")._2 == 0L && out("a1")._1 == 0L)
  }

  test("hits: authority concentrates on the common target across " +
    "iterations and mass stays ~L1-normalized") {
    val e = Seq(("h1", "a1"), ("h2", "a1"), ("h3", "a1"),
      ("h1", "a2")).toDF("src", "dst")
    val out = PageRank.hits(e, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("a1") > out("a2"))
    val tot = out.values.sum
    assert(tot <= 1000000000L && tot > 1000000000L - 10L)
  }
}
