package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave: X136 line dedup, X137 FIM, X138 embedding drift,
  * X139 windowed PMI, X140 Stupid Backoff, X141 temporal split.
  */
class CorpusWave9Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  // ---- X136 lineDedup ------------------------------------------------

  test("lineDedup: digit-normalized boilerplate cut everywhere, " +
    "unique and blank lines kept, md5 of survivors exact") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Seq("alpha body one", "© 2021 acme corp", "", "tail a")),
      (2L, Seq("beta body two", "© 2024 acme corp", "", "tail b")),
      (3L, Seq("gamma only", "tail c"))).toDF("doc_id", "lines")
    val out = CorpusOps.lineDedup(docs, "doc_id", "lines", minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the copyright line normalizes identically across years -> cut;
    // the blank line is structural -> kept
    assert(out(1L).getAs[Long]("n_lines") == 4)
    assert(out(1L).getAs[Long]("n_kept") == 3)
    assert(out(1L).getAs[String]("clean_md5") ==
      md5Hex("alpha body one\n\ntail a"))
    assert(out(2L).getAs[String]("clean_md5") ==
      md5Hex("beta body two\n\ntail b"))
    assert(out(3L).getAs[Long]("n_kept") == 2)
    assert(out(1L).getAs[Double]("removed_ratio") == 0.25)
  }

  test("lineDedup: empty-lines doc yields a zero row, not a missing row") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, Seq.empty[String]), (2L, Seq("x y")))
      .toDF("doc_id", "lines")
    val out = CorpusOps.lineDedup(docs, "doc_id", "lines")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.contains(1L) && out(1L).getAs[Long]("n_lines") == 0)
    assert(out(1L).getAs[String]("clean_md5") == md5Hex(""))
    assert(out(1L).getAs[Double]("removed_ratio") == 0.0)
  }

  private def md5Hex(t: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  // ---- X137 fimTransform ---------------------------------------------

  test("fimTransform rate=1: every non-empty doc transforms; the PSM " +
    "stream reconstructs from the reported cut points") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c d e f g h"), (2L, "just two tokens here"),
      (3L, "")).toDF("doc_id", "text")
    val out = CorpusOps.fimTransform(docs, "doc_id", "text", fimRate = 1.0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = out(id)
      assert(r.getAs[Boolean]("fim_applied"))
      val toks = docs.filter($"doc_id" === id).head.getString(1)
        .split("\\s+").filter(_.nonEmpty).toSeq
      val lo = r.getAs[Long]("cut_lo").toInt
      val hi = r.getAs[Long]("cut_hi").toInt
      assert(lo >= 0 && lo <= hi && hi <= toks.length)
      val psm = (Seq("<PRE>") ++ toks.take(lo) ++ Seq("<SUF>") ++
        toks.drop(hi) ++ Seq("<MID>") ++ toks.slice(lo, hi))
      assert(r.getAs[String]("out_md5") == md5Hex(psm.mkString(" ")))
    }
    // empty doc: nothing to cut — never applied, hash of empty stream
    assert(!out(3L).getAs[Boolean]("fim_applied"))
    assert(out(3L).getAs[String]("out_md5") == md5Hex(""))
  }

  test("fimTransform rate=0 leaves every stream untouched") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val r = CorpusOps.fimTransform(docs, "doc_id", "text", fimRate = 0.0)
      .head()
    assert(!r.getAs[Boolean]("fim_applied"))
    assert(r.getAs[String]("out_md5") == md5Hex("alpha beta gamma"))
    assert(r.isNullAt(r.fieldIndex("cut_lo")))
  }

  // ---- X138 embeddingDrift -------------------------------------------

  test("embeddingDrift: identical slices give cos 1 and zero gap; " +
    "orthogonal centroids give cos 0 and the exact L2 gap") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // label "same": both slices centered at (2, 0)
      ("same", true, Seq(2.0f, 0.0f)), ("same", false, Seq(2.0f, 0.0f)),
      // label "orth": ref centroid (1,0), cur centroid (0,1)
      ("orth", true, Seq(1.0f, 0.0f)), ("orth", false, Seq(0.0f, 1.0f)))
      .toDF("label", "ref", "embedding")
    val out = Similarity.embeddingDrift(rows, "embedding", "label", "ref")
      .collect().map(r => r.getAs[String]("label") -> r).toMap
    assert(out("same").getAs[Double]("centroid_cos") == 1.0)
    assert(out("same").getAs[Double]("centroid_l2_gap") == 0.0)
    assert(out("orth").getAs[Double]("centroid_cos") == 0.0)
    assert(math.abs(out("orth").getAs[Double]("centroid_l2_gap") -
      math.sqrt(2.0)) < 1e-6)
  }

  test("embeddingDrift is partitioning-invariant (exact integer sums)") {
    val s = spark
    import s.implicits._
    val rows = (0 until 200).map { i =>
      ("l" + (i % 3), i % 2 == 0,
        Seq.tabulate(8)(d => ((i * 31 + d * 7) % 17 - 8) / 3.0f))
    }.toDF("label", "ref", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.embeddingDrift(df, "embedding", "label", "ref")
        .orderBy($"label").collect().map(_.toSeq).toSeq
    assert(run(rows.repartition(1)) == run(rows.repartition(13)))
  }

  // ---- X139 windowedPmi ----------------------------------------------

  test("windowedPmi: a glued bigram outranks an independent pair; " +
    "hand-computed PMI value is exact") {
    val s = spark
    import s.implicits._
    // "x y" always adjacent; fillers vary
    val docs = (0 until 20).map { i =>
      (i.toLong, s"x y f$i g${i % 2} x y h$i")
    }.toDF("doc_id", "text")
    val out = InvertedIndex.windowedPmi(docs, "doc_id", "text",
      window = 3, minCount = 5, k = 10).collect()
    assert(out.nonEmpty)
    // hand-checked: c(x,y)=40, cL(x)=100, cR(y)=80, N=300
    // -> PMI = ln(40*300/(100*80)) = ln(1.5)
    val xy = out.find(r => r.getAs[String]("left") == "x" &&
      r.getAs[String]("right") == "y").get
    assert(xy.getAs[Long]("n_pair") == 40L) // 2 per doc * 20 docs
    assert(math.abs(xy.getAs[Double]("pmi") - math.log(1.5)) < 1e-5)
  }

  test("windowedPmi respects the support floor") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c d"))
      .toDF("doc_id", "text")
    val out = InvertedIndex.windowedPmi(docs, "doc_id", "text",
      window = 2, minCount = 2, k = 10).collect()
    assert(out.forall(_.getAs[Long]("n_pair") >= 2))
    assert(out.exists(r => r.getAs[String]("left") == "a"))
    assert(!out.exists(r => r.getAs[String]("left") == "c"))
  }

  // ---- X140 stupidBackoff --------------------------------------------

  test("stupidBackoff: per-doc token conservation, non-positive " +
    "logprob, and the backoff/OOV paths fire on held-out docs") {
    val s = spark
    import s.implicits._
    val docs = (0 until 40).map { i =>
      (i.toLong, s"w${i % 7} common w${(i * 3) % 11} tail${i}")
    }.toDF("doc_id", "text")
    val out = InvertedIndex.stupidBackoff(docs, "doc_id", "text")
      .collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == 4L)
      assert(r.getAs[Double]("sb_logprob") <= 0.0)
      assert(r.getAs[Long]("n_backoff") <= 3L)
    }
    // tail${i} tokens are unique per doc: docs OUTSIDE the md5 train
    // half must hit the OOV ladder at least once
    val trained = out.filter(_.getAs[Long]("n_oov") == 0)
    val oov = out.filter(_.getAs[Long]("n_oov") > 0)
    assert(trained.nonEmpty && oov.nonEmpty)
  }

  test("stupidBackoff: seen bigram scores ln(c_big/c_prev) exactly") {
    val s = spark
    import s.implicits._
    // find doc ids in the md5 train half deterministically: use the
    // operator's own selection by checking which docs have zero OOV
    // when every token is shared
    val docs = Seq((1L, "p q"), (2L, "p q"), (3L, "p q"), (4L, "p q"),
      (5L, "p q"), (6L, "p q"), (7L, "p q"), (8L, "p q"))
      .toDF("doc_id", "text")
    val out = InvertedIndex.stupidBackoff(docs, "doc_id", "text")
      .collect()
    // all docs identical -> every doc scores identically: with k
    // train docs, lp = ln(c(p)/N) + ln(c(pq)/c(p)) = ln(k/2k) + ln(k/k)
    val lp = out.map(_.getAs[Double]("sb_logprob")).distinct
    assert(lp.length == 1)
    assert(math.abs(lp.head - math.log(0.5)) < 1e-6)
  }

  // ---- X141 temporalSplit --------------------------------------------

  test("temporalSplit: embargo gap is purged and boundaries respect " +
    "the quantile") {
    val s = spark
    import s.implicits._
    val base = 1700000000000000L // epoch micros
    val day = 86400000000L
    val events = (0 until 100).map { i =>
      (i.toLong % 10, timestampMicros(base + i * day / 4))
    }.toDF("user_id", "ts_raw")
      .select($"user_id", $"ts_raw".as("ts"))
    val out = CorpusOps.temporalSplit(events, "user_id", "ts",
        trainFrac = 0.8, embargoMicros = day)
      .collect().map(r => r.getAs[String]("split") -> r).toMap
    val nTrain = out("train").getAs[Long]("n_events")
    val nTest = out("test").getAs[Long]("n_events")
    val nEmb = out.get("embargo").map(_.getAs[Long]("n_events"))
      .getOrElse(0L)
    assert(nTrain + nTest + nEmb == 100)
    assert(nTrain >= 75 && nTrain <= 85) // ~0.8 quantile
    // a one-day embargo spans 4 quarter-day events
    assert(nEmb >= 3 && nEmb <= 5)
    // purged: max(train) < min(test), with at least the gap between
    val trainMax = out("train").getAs[java.sql.Timestamp]("max_ts")
    val testMin = out("test").getAs[java.sql.Timestamp]("min_ts")
    assert(testMin.getTime - trainMax.getTime >= day / 1000)
  }

  private def timestampMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }
}
