package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.{PropertyHarness, SparkHarness}
import graft.functions.TextFunctions

/** ScalaCheck properties for the windowed/join/dedup operators
  * (SURVEY.md §5.2 item 3): session invariants, boundary-math
  * monotonicity, as-of join vs a per-key reference scan, and
  * prefix-filtered vs naive Jaccard equivalence on random corpora.
  */
class OperatorPropertiesSpec extends AnyFunSuite with PropertyHarness {
  private lazy val spark = SparkHarness.spark

  // -------- W2 sessionization invariants on random event streams

  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(0L, 2L)
      idGap <- Gen.choose(1L, 8L)
      tGap <- Gen.choose(1L, 2000L) // ms
    } yield (user, idGap, tGap))
  } yield rows

  test("property: session ids are contiguous, gaps respect both " +
      "predicates inside, violate one at boundaries") {
    val s = spark
    import s.implicits._
    forAllSampled(eventsGen, n = 30) { rows =>
      // build per-user cumulative streams
      val evs = rows.zipWithIndex
        .groupBy(_._1._1)
        .flatMap { case (u, rs) =>
          var id = 0L; var t = 0L
          rs.map { case ((_, idGap, tGap), i) =>
            id += idGap; t += tGap
            (u, new Timestamp(t), id)
          }
        }.toSeq
      if (evs.nonEmpty) {
        val df = evs.toDF("user_id", "ts", "event_id")
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val maxIdGap = 5L
        val maxTGapMs = 700L
        val boundary = lag($"event_id", 1).over(w).isNull ||
          $"event_id" - lag($"event_id", 1).over(w) > maxIdGap ||
          unix_millis($"ts") - unix_millis(lag($"ts", 1).over(w)) > maxTGapMs
        val got = df.withColumn("sid",
            Sessionize.sessionId(Seq($"user_id"), Seq($"ts", $"event_id"),
              boundary))
          .orderBy($"user_id", $"ts", $"event_id")
          .collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
            r.getLong(2), r.getLong(3)))
        got.groupBy(_._1).values.foreach { rows0 =>
          val rows = rows0.sortBy(r => (r._2, r._3))
          // contiguous 1-based ids
          val sids = rows.map(_._4).toSeq
          assert(sids.head == 1L)
          sids.sliding(2).foreach {
            case Seq(a, b) => assert(b == a || b == a + 1)
            case _ =>
          }
          // within-session rows respect BOTH gaps; boundaries violate one
          rows.toSeq.sliding(2).foreach {
            case Seq(a, b) =>
              val within = b._4 == a._4
              val idOk = b._3 - a._3 <= maxIdGap
              val tOk = b._2 - a._2 <= maxTGapMs
              if (within) assert(idOk && tOk)
              else assert(!idOk || !tOk)
            case _ =>
          }
        }
      }
    }
  }

  // -------- boundary math monotonicity (claude_research_optimal.py:584–585)

  test("property: clip boundaries always satisfy s < e") {
    val gen = for {
      start <- Gen.choose(0.0, 100.0)
      dur <- Gen.choose(-0.5, 3.0) // negative = degenerate input
      conf <- Gen.choose(0.0, 1.0)
      nextGap <- Gen.choose(-0.3, 2.0)
      word <- Gen.alphaLowerStr
    } yield (start, dur, conf, nextGap, word)
    forAllSampled(gen, n = 500) { case (start, dur, conf, nextGap, word) =>
      var sMs = TextFunctions.secToMsScala(start)
      sMs = math.max(0L, sMs - 150)
      var eMs = TextFunctions.secToMsScala(start + dur) + 140 + 80
      val nextStart = TextFunctions.secToMsScala(start + dur + nextGap)
      eMs = math.min(eMs,
        nextStart - TextFunctions.adaptiveGuardScala(conf, 35))
      val ext = TextFunctions.phonemeExtensionScala(word)
      if (word.length >= 3 && ext > 0) eMs += ext
      if (eMs <= sMs) eMs = sMs + 1
      assert(eMs > sMs)
    }
  }

  // -------- as-of join vs per-key reference scan on random data

  private val asofGen: Gen[(List[(Long, Long)], List[(Long, Long, Long)])] =
    for {
      nl <- Gen.choose(1, 30)
      nr <- Gen.choose(0, 30)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 500L)))
      rs <- Gen.listOfN(nr, for {
        k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 500L)
        p <- Gen.choose(0L, 999L)
      } yield (k, t, p))
    } yield (ls, rs)

  test("property: AsOfJoin matches a naive per-key scan") {
    val s = spark
    import s.implicits._
    forAllSampled(asofGen, n = 20) { case (ls0, rs0) =>
      // dedupe right (k, ts) so 'latest prior' is unambiguous
      val ls = ls0.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = rs0.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      val left = ls.toDF("k", "ts", "lid")
      val right = rs.toDF("k", "ts", "payload")
      val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("payload"))
        .collect().map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      val want = ls.map { case (k, t, lid) =>
        val prior = rs.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (prior.isEmpty) -1L
                else prior.maxBy(_._2)._3)
      }.toMap
      assert(got == want)
    }
  }

  // -------- prefix-filtered Jaccard == naive on random corpora

  private val corpusGen: Gen[List[String]] = {
    val word = Gen.oneOf((0 until 12).map(i => s"w$i"))
    for {
      nDocs <- Gen.choose(2, 20)
      docs <- Gen.listOfN(nDocs, for {
        n <- Gen.choose(0, 25)
        ws <- Gen.listOfN(n, word)
      } yield ws.mkString(" "))
    } yield docs
  }

  test("property: jaccardPairsExact == naive>=t on random corpora") {
    val s = spark
    import s.implicits._
    forAllSampled(corpusGen, n = 15) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select($"doc_id",
          Dedup.shingles(Dedup.tokens($"text"), 3).as("shingles"))
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          ((r.getLong(0), r.getLong(1)), math.round(r.getDouble(2) * 1e9)))
          .toMap
      val fast = pairs(Dedup.jaccardPairsExact(docs, "doc_id", 0.4))
      val slow = pairs(Dedup.jaccardPairsNaive(docs, "doc_id")
        .filter($"jaccard" >= 0.4))
      assert(fast == slow)
    }
  }

  test("property: incrementalNearDupes == naive odd×even on random corpora") {
    val s = spark
    import s.implicits._
    forAllSampled(corpusGen, n = 10) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select($"doc_id",
          Dedup.shingles(Dedup.tokens($"text"), 3).as("shingles"))
      val inc = Dedup.incrementalNearDupes(
          docs.filter($"doc_id" % 2 === 1), docs.filter($"doc_id" % 2 === 0),
          "doc_id", numHashes = 64, bands = 16, rowsPerBand = 4,
          threshold = 0.4)
        .collect().map(r =>
          ((r.getLong(0), r.getLong(1)), math.round(r.getDouble(2) * 1e9)))
        .toMap
      // naive ground truth emits d1 < d2; restrict to odd×even pairs
      // and normalize to (new=odd, corpus=even) orientation
      val naive = Dedup.jaccardPairsNaive(docs, "doc_id")
        .filter($"jaccard" >= 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .collect {
          case (a, b, j) if a % 2 == 1 && b % 2 == 0 =>
            ((a, b), math.round(j * 1e9))
          case (a, b, j) if a % 2 == 0 && b % 2 == 1 =>
            ((b, a), math.round(j * 1e9))
        }.toMap
      // LSH banding at 16x4 has >= 1-1e-4 recall per pair at J>=0.8
      // but can in principle miss mid-band pairs; assert candidates
      // are verified-correct (no false positives, values exact) and
      // that recall holds on these deterministic generators
      assert(inc == naive,
        s"\ninc-only: ${inc.keySet -- naive.keySet}" +
          s"\nnaive-only: ${naive.keySet -- inc.keySet}")
    }
  }

  // -------- X69 leak-proof split: bands partition, clusters cohere

  private val splitGen: Gen[(Int, Double, Double)] = for {
    nDocs <- Gen.choose(20, 120)
    f1 <- Gen.choose(0.2, 0.7)
    f2 <- Gen.choose(0.1, (1.0 - 0.7) / 2 + 0.1)
  } yield (nDocs, f1, f2)

  test("property: leakProofSplit bands partition every doc; " +
      "components always co-assign") {
    val s = spark
    import s.implicits._
    forAllSampled(splitGen, n = 12) { case (nDocs, f1, f2) =>
      val f3 = 1.0 - f1 - f2
      val docs = (0L until nDocs.toLong).map(i => (i, s"d$i"))
        .toDF("doc_id", "t")
      // components: consecutive triples share a cluster root
      val clusters = (0L until nDocs.toLong).map(i => (i, i / 3 * 3))
        .toDF("doc_id", "cluster_id")
      val got = CorpusOps.leakProofSplit(docs, "doc_id", clusters,
          Seq("a" -> f1, "b" -> f2, "c" -> f3), salt = "p")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.length == nDocs) // total: every doc exactly once
      assert(got.forall(g => Set("a", "b", "c")(g._3)))
      // co-assignment: one split per cluster root
      got.groupBy(_._2).foreach { case (root, members) =>
        assert(members.map(_._3).toSet.size == 1,
          s"cluster $root straddles: $members")
      }
    }
  }

  // -------- X70 MAD: translation invariance on random groups

  private val madGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(4, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("x", "y")
      v <- Gen.choose(-1000L, 1000L)
    } yield (g, v))
  } yield rows

  test("property: madOutliers flags are translation-invariant") {
    val s = spark
    import s.implicits._
    forAllSampled(madGen, n = 12) { rows =>
      val base = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v) }
        .toDF("id", "g", "v")
      val shifted = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v + 5000L) }
        .toDF("id", "g", "v")
      def flags(df: org.apache.spark.sql.DataFrame) =
        Quantiles.madOutliers(df, "id", "g", "v", c = 3L)
          .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
      assert(flags(base) == flags(shifted))
    }
  }

  // -------- X71 next-token: probabilities partition each prev's mass

  test("property: nextTokenStats at k=infinity sums each prev to total") {
    val s = spark
    import s.implicits._
    forAllSampled(Gen.listOfN(6,
        Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d"))), n = 8) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = InvertedIndex.nextTokenStats(df, "doc_id", "text",
          k = Int.MaxValue)
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      got.groupBy(_._1).foreach { case (prev, rows) =>
        val total = rows.head._3
        assert(rows.map(_._2).sum == total,
          s"$prev: successor counts don't partition $total")
        assert(rows.forall(_._3 == total))
      }
    }
  }

  // -------- X81 packing conservation on random corpora

  private val packCorpusGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 25)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      ws <- Gen.listOfN(len, Gen.choose('a', 'f').map(_.toString))
    } yield ws.mkString(" "))
  } yield docs

  test("property: packSequences conserves the token stream exactly " +
      "and only the last sequence is short") {
    val s = spark
    import s.implicits._
    forAllSampled2(packCorpusGen, Gen.choose(1, 9), n = 25) { (docs, len) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val packed = CorpusOps.packSequences(df, "doc_id", "text", len)
        .orderBy($"seq_id")
        .as[(Long, Long, String)].collect().toSeq
      val stream = docs.flatMap(_.split("\\s+").filter(_.nonEmpty))
      assert(packed.flatMap(_._3.split(" ").filter(_.nonEmpty)) == stream)
      assert(packed.map(_._2).sum == stream.length)
      if (packed.nonEmpty) {
        assert(packed.dropRight(1).forall(_._2 == len))
        assert(packed.map(_._1) == packed.indices.map(_.toLong))
      }
    }
  }

  // -------- X86 BLEU identities on random pairs

  test("property: BLEU(x, x) = 1 on non-empty docs; dropping tokens " +
      "never raises clipped match counts above hyp totals") {
    val s = spark
    import s.implicits._
    forAllSampled(packCorpusGen.suchThat(_.nonEmpty), n = 20) { docs =>
      val pairs = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t, t) }
        .toDF("id", "ref", "hyp")
      val rs = Bleu.sentenceBleu(pairs, "id", "ref", "hyp", maxN = 2)
        .collect()
      rs.foreach { r =>
        val n = r.getAs[Long]("ref_len")
        val b = r.getAs[Double]("bleu")
        if (n >= 2) assert(b == 1.0, s"identity pair scored $b")
        else if (n == 1) assert(b == 0.0) // no bigrams -> p_2 = 0
        // precisions are probabilities
        assert(r.getAs[Double]("p_1") <= 1.0 &&
          r.getAs[Double]("p_2") <= 1.0)
      }
    }
  }

  // -------- X85 α=1 recovers uniform sampling

  test("property: temperatureMix at alpha=1 gives every stratum the " +
      "same rate = targetFraction") {
    val s = spark
    import s.implicits._
    forAllSampled(Gen.listOfN(3, Gen.choose(5, 400)), n = 10) { sizes =>
      val df = sizes.zipWithIndex.flatMap { case (n, si) =>
        (0 until n).map(i => (si * 10000L + i, s"src$si"))
      }.toDF("id", "src")
      val rates = CorpusOps
        .temperatureMix(df, "id", "src", alpha = 1.0,
          targetFraction = 0.4, salt = "p")
        .select($"src", $"mix_rate").distinct()
        .as[(String, Double)].collect().toMap
      // n^1 / sum(n) * sum(n) / n = 1, so rate = targetFraction for
      // every stratum (up to the 1e6 weight quantization)
      rates.values.foreach(r => assert(math.abs(r - 0.4) < 1e-4, rates))
    }
  }

  // -------- X95 UniMax waterfill conservation on random source tables

  private val sourcesGen: Gen[List[(String, Long)]] = for {
    k <- Gen.choose(1, 8)
    sizes <- Gen.listOfN(k, Gen.choose(1L, 500L))
  } yield sizes.zipWithIndex.map { case (n, i) => (s"s$i", n) }

  test("property: unimax allocations conserve the budget, respect " +
      "caps, and are budget-monotone") {
    val s = spark
    import s.implicits._
    forAllSampled2(sourcesGen, Gen.choose(1, 19), n = 25) { (srcs, f10) =>
      val frac = f10 / 10.0 // 0.1 .. 1.9 of total tokens
      val epochs = 1.5
      val df = srcs.toDF("source", "n_tokens")
      def run(b: Double) = CorpusOps
        .unimaxAllocation(df, "source", "n_tokens", b, epochs)
        .select($"source", $"n_tokens", $"capacity", $"allocation")
        .as[(String, Long, Double, Double)].collect()
      val total = srcs.map(_._2).sum.toDouble
      val got = run(frac)
      // every allocation respects its cap
      got.foreach { case (src, _, cap, a) =>
        assert(a <= cap + 1e-6, s"$src alloc $a over cap $cap")
        assert(a >= -1e-9)
      }
      // conservation: Σ alloc = min(budget, Σ capacity)
      val want = math.min(frac * total, epochs * total)
      assert(math.abs(got.map(_._4).sum - want) < 1e-4,
        s"sum ${got.map(_._4).sum} != $want for frac=$frac srcs=$srcs")
      // monotone: a bigger budget never shrinks any source's share
      val bigger = run(math.min(frac + 0.2, epochs))
        .map(r => r._1 -> r._4).toMap
      got.foreach { case (src, _, _, a) =>
        assert(bigger(src) >= a - 1e-6, s"$src shrank under a bigger budget")
      }
    }
  }

  // -------- X92 Kneser-Ney: smoothed mass stays a sub-distribution

  test("property: KN probabilities per context sum to <= 1 over SEEN " +
      "continuations, and every scored p is in (0, 1]") {
    val s = spark
    import s.implicits._
    val corpusGen: Gen[List[String]] = for {
      n <- Gen.choose(2, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(2, 20)
        ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
      } yield ws.mkString(" "))
    } yield docs
    forAllSampled(corpusGen, n = 15) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // reconstruct per-bigram p from the per-doc output is lossy, so
      // recompute p directly with the operator's own building blocks:
      // mean_nll of a doc that IS one bigram equals -log2 p(bigram)
      val r = InvertedIndex.knPerplexity(df, "doc_id", "text")
        .as[(Long, Long, Double, Double)].collect()
      r.foreach { case (_, nb, nll, ppl) =>
        assert(nb >= 1)
        assert(nll > 0, s"nll $nll: some p >= 1") // p<1 always under KN
        assert(ppl > 1)
      }
      // seen-continuation mass check on the corpus bigram table
      val toks = docs.flatMap(_.split(" ").sliding(2).toSeq
        .filter(_.length == 2).map(p => (p(0), p(1))))
      if (toks.nonEmpty) {
        val counts = toks.groupBy(identity).map { case (k, v) =>
          (k._1, k._2, v.size.toLong) }.toSeq
        val ctx = counts.groupBy(_._1).map { case (u, rs) =>
          u -> (rs.map(_._3).sum, rs.size) }
        val bw = counts.groupBy(_._2).map { case (v, rs) => v -> rs.size }
        val btypes = counts.size.toDouble
        val d = 0.75
        ctx.foreach { case (u, (cu, n1fw)) =>
          val mass = counts.filter(_._1 == u).map { case (_, v, c) =>
            math.max(c - d, 0.0) / cu +
              (d * n1fw / cu) * (bw(v) / btypes)
          }.sum
          assert(mass <= 1.0 + 1e-9, s"context $u mass $mass > 1")
          assert(mass > 0)
        }
      }
    }
  }

  // -------- X97 ROUGE-L bounds and identity

  test("property: rougeL respects LCS bounds; identity pairs score 1") {
    val s = spark
    import s.implicits._
    val pairGen: Gen[(List[String], List[String])] = for {
      na <- Gen.choose(0, 15); nb <- Gen.choose(0, 15)
      a <- Gen.listOfN(na, Gen.oneOf("x", "y", "z", "w"))
      b <- Gen.listOfN(nb, Gen.oneOf("x", "y", "z", "w"))
    } yield (a, b)
    forAllSampled(pairGen, n = 40) { case (a, b) =>
      val df = Seq((1L, a.mkString(" "), b.mkString(" ")),
        (2L, a.mkString(" "), a.mkString(" ")))
        .toDF("id", "r", "h")
      val rows = Rouge.rougeL(df, "id", "r", "h").orderBy($"id")
        .as[(Long, Long, Long, Long, Double, Double, Double)]
        .collect()
      val (_, nr, nh, lcs, p, rc, f1) = rows(0)
      assert(lcs <= math.min(nr, nh))
      assert(p >= 0 && p <= 1 && rc >= 0 && rc <= 1 && f1 >= 0 && f1 <= 1)
      assert(f1 <= math.max(p, rc) + 1e-9) // harmonic mean bound
      if (a.nonEmpty) // identity: perfect scores
        assert(rows(1)._5 == 1.0 && rows(1)._6 == 1.0 && rows(1)._7 == 1.0)
    }
  }

  // -------- X94 source-overlap bounds and symmetry of the inputs

  test("property: sourceOverlap jaccard in [0,1], n_common <= min sizes") {
    val s = spark
    import s.implicits._
    val corpusGen: Gen[List[(String, String)]] = for {
      n <- Gen.choose(2, 10)
      rows <- Gen.listOfN(n, for {
        src <- Gen.oneOf("A", "B", "C")
        len <- Gen.choose(0, 12)
        ws <- Gen.listOfN(len, Gen.oneOf("p", "q", "r", "s"))
      } yield (src, ws.mkString(" ")))
    } yield rows
    forAllSampled(corpusGen, n = 20) { rows =>
      val df = rows.toDF("source", "text")
      val r = CorpusOps.sourceOverlap(df, "source", "text", k = 2)
        .as[(String, String, Long, Long, Long, Double)].collect()
      r.foreach { case (a, b, na, nb, nc, j) =>
        assert(a < b) // canonical pair order
        assert(nc <= math.min(na, nb), s"common $nc over min($na,$nb)")
        assert(j >= 0.0 && j <= 1.0)
        if (na + nb > 0 && nc == 0) assert(j == 0.0)
      }
    }
  }
}
