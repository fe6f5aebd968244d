package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.{PropertyHarness, SparkHarness}

/** ScalaCheck properties for the round-8 selection/monitoring wave:
  * CDC tiling, typo-join completeness vs the naive form, chrF
  * self-score closed form, classifier score bounds, and bootstrap
  * band ordering — randomized versions of the hand specs.
  */
class SessionWavePropertiesSpec extends AnyFunSuite with PropertyHarness {
  private lazy val spark = SparkHarness.spark

  private val asciiText: Gen[String] = for {
    n <- Gen.choose(0, 300)
    cs <- Gen.listOfN(n, Gen.frequency(
      (9, Gen.alphaLowerChar), (1, Gen.const(' '))))
  } yield cs.mkString

  test("property: CDC chunks tile every random document exactly") {
    val s = spark
    import s.implicits._
    forAllSampled(Gen.listOfN(6, asciiText), n = 12) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = CorpusOps.cdcChunks(df, "doc_id", "text")
        .collect().groupBy(_.getAs[Long]("doc_id"))
      texts.zipWithIndex.foreach { case (t, i) =>
        if (t.nonEmpty) {
          val mine = chunks(i.toLong).sortBy(_.getAs[Long]("chunk_idx"))
          assert(mine.head.getAs[Long]("start_pos") == 0L)
          assert(mine.map(_.getAs[Long]("chunk_len")).sum == t.length)
          mine.sliding(2).foreach {
            case Array(a, b) => assert(a.getAs[Long]("start_pos") +
              a.getAs[Long]("chunk_len") == b.getAs[Long]("start_pos"))
            case _ =>
          }
        } else assert(!chunks.contains(i.toLong))
      }
    }
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("property: typoPairs equals the naive all-pairs form on random " +
    "small-alphabet vocabularies") {
    val s = spark
    import s.implicits._
    // 2-char alphabet, short words -> dense distance-1 neighborhoods
    val wordGen = for {
      n <- Gen.choose(1, 5)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    forAllSampled(Gen.listOfN(14, wordGen), n = 15) { words =>
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = Dedup.typoPairs(df, "text").collect()
        .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
      val vocab = words.distinct
      val want = (for {
        a <- vocab; b <- vocab if a < b && lev(a, b) <= 1
      } yield (a, b)).toSet
      assert(got == want, s"vocab $vocab")
    }
  }

  test("property: chrF self-score is min(len,6)/6 and scores stay in " +
    "[0,1]") {
    val s = spark
    import s.implicits._
    forAllSampled(Gen.zip(asciiText, asciiText), n = 12) {
      case (a, b) =>
        val stripped = a.replaceAll("\\s+", "")
        val pairs = Seq((1L, a, a), (2L, a, b)).toDF("id", "ref", "hyp")
        val out = Bleu.chrF(pairs, "id", "ref", "hyp")
          .collect().map(r => r.getAs[Long]("id") -> r).toMap
        if (stripped.nonEmpty) {
          val want = math.rint(math.min(stripped.length, 6) / 6.0 * 1e6) / 1e6
          assert(out(1L).getAs[Double]("chrf") == want,
            s"self-score of '$stripped'")
        }
        val cross = out(2L).getAs[Double]("chrf")
        assert(cross >= 0.0 && cross <= 1.0)
    }
  }

  test("property: classifier scores stay in [-1, 1]; bootstrap band " +
    "is ordered and brackets the point mean for symmetric data") {
    val s = spark
    import s.implicits._
    forAllSampled(Gen.listOfN(40, Gen.choose(0L, 50L)), n = 10) { vals =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("doc_id", "n_tokens")
      val ci = CorpusOps.bootstrapCI(df, "doc_id", "n_tokens",
        replicates = 16).collect().head
      assert(ci.getAs[Double]("ci_lo") <= ci.getAs[Double]("ci_hi"))
      assert(ci.getAs[Long]("n_replicates") == 16L)
      // fractional statistics survive the micro-unit quantization:
      // scores in [0,1) must NOT truncate to an all-zero band
      val frac = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, 0.25 + (v % 5) * 0.1) }.toDF("doc_id", "score")
      val fci = CorpusOps.bootstrapCI(frac, "doc_id", "score",
        replicates = 16).collect().head
      assert(fci.getAs[Double]("point_mean") >= 0.25)
      assert(fci.getAs[Double]("ci_hi") >= fci.getAs[Double]("ci_lo"))
      assert(fci.getAs[Double]("ci_lo") > 0.0)
      val texts = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, s"w$v t${v % 7} u${v % 3}") }.toDF("doc_id", "text")
      CorpusOps.qualityClassifier(texts, "doc_id", "text")
        .collect().foreach { r =>
          if (!r.isNullAt(r.fieldIndex("score"))) {
            val sc = r.getAs[Double]("score")
            assert(sc >= -1.0 && sc <= 1.0)
          }
        }
    }
  }
}
