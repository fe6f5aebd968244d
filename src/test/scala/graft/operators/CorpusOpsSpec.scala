package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** CorpusOps invariants: content-stable nested sampling, exact
  * shard-packing arithmetic; Dedup.resolveClusters on hand graphs.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("hashSample: nested fractions, content-stable, ~unbiased") {
    val s = spark
    import s.implicits._
    val docs = (0 until 2000).map(i => (i.toLong, s"content number $i"))
      .toDF("id", "text")
    val at10 = CorpusOps.hashSample(docs, "text", 0.1, "salt")
      .select($"id").as[Long].collect().toSet
    val at30 = CorpusOps.hashSample(docs, "text", 0.3, "salt")
      .select($"id").as[Long].collect().toSet
    assert(at10.subsetOf(at30)) // nested
    assert(math.abs(at10.size - 200) < 60) // ~10% ± noise
    assert(math.abs(at30.size - 600) < 100)
    // content-stable: dropping other rows never changes a row's fate
    val subset = docs.filter($"id" < 1000)
    val at10sub = CorpusOps.hashSample(subset, "text", 0.1, "salt")
      .select($"id").as[Long].collect().toSet
    assert(at10sub == at10.filter(_ < 1000))
    // salt changes the sample
    val other = CorpusOps.hashSample(docs, "text", 0.1, "tlas")
      .select($"id").as[Long].collect().toSet
    assert(other != at10)
  }

  test("stratifiedSample: per-stratum fractions, unlisted strata drop") {
    val s = spark
    import s.implicits._
    val docs = (0 until 3000).map(i =>
      (i.toLong, s"doc body $i", Seq("en", "de", "xx")(i % 3)))
      .toDF("id", "text", "lang")
    val got = CorpusOps.stratifiedSample(docs, "text", "lang",
        Map("en" -> 0.2, "de" -> 1.0), "s")
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("xx")) // unlisted stratum fully dropped
    assert(got("de") == 1000L) // fraction 1.0 keeps everything
    assert(math.abs(got("en") - 200L) < 70) // ~20%
    // consistency with the flat sampler at the same salt+fraction
    val flat = CorpusOps.hashSample(docs.filter($"lang" === "en"),
      "text", 0.2, "s").count()
    assert(flat == got("en"))
  }

  test("tokenShards packs by exact cumulative budget per partition") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("en", 1L, 800L), ("en", 2L, 900L), ("en", 3L, 500L),
      ("en", 4L, 2500L), ("en", 5L, 10L),
      ("de", 1L, 1999L), ("de", 2L, 1L), ("de", 3L, 5L))
      .toDF("lang", "doc_id", "n")
    val got = CorpusOps.tokenShards(docs, "lang", "doc_id", "n", 2000L)
      .select($"lang", $"doc_id", $"tokens_before", $"shard_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("en", 1L)) == (0L, 0L))
    assert(got(("en", 2L)) == (800L, 0L))
    assert(got(("en", 3L)) == (1700L, 0L)) // crosses budget mid-doc: stays
    assert(got(("en", 4L)) == (2200L, 1L))
    assert(got(("en", 5L)) == (4700L, 2L)) // oversized doc owns shard 2's start
    assert(got(("de", 1L)) == (0L, 0L))
    assert(got(("de", 2L)) == (1999L, 0L))
    assert(got(("de", 3L)) == (2000L, 1L))
  }

  test("cleanCorpus: reject priority and per-rule verdicts") {
    val s = spark
    import s.implicits._
    val en10 = ("the and of to in is that it for a " * 12).trim // ~120 toks
    val docs = Seq(
      (1L, en10), // canonical, long, high quality, en -> kept
      (2L, en10), // exact dup of 1 -> duplicate (beats every other rule)
      (3L, "the cat"), // en but 2 tokens -> too_short
      (4L, "der die das und ist nicht mit ein zu den " * 12) // de -> language
    ).toDF("doc_id", "text")
    val got = CorpusOps.cleanCorpus(docs, "doc_id", "text",
        graft.queries.TextAnalysisQueries.Stopwords,
        keepLangs = Seq("en"), minTokens = 5, minQuality = 0.1)
      .select($"doc_id", coalesce($"reject_reason", lit("kept")), $"kept")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2)))
      .toMap
    assert(got(1L) == ("kept", true))
    assert(got(2L) == ("duplicate", false))
    assert(got(3L) == ("too_short", false))
    assert(got(4L) == ("language", false))
    // low_quality outranks language: gibberish with no stopword hits
    // and all-punctuation chars scores ~0 quality
    val lowQ = Seq((9L, "@#$% ^&*( )!@# $%^& *()! @#$% ^&*( )!@#"))
      .toDF("doc_id", "text")
    val gotQ = CorpusOps.cleanCorpus(lowQ, "doc_id", "text",
        graft.queries.TextAnalysisQueries.Stopwords,
        keepLangs = Seq("en"), minTokens = 5, minQuality = 0.5)
      .select($"reject_reason").collect().head.getString(0)
    assert(gotQ == "low_quality")
  }

  test("resolveClusters: chains, triangles, isolated pairs") {
    val s = spark
    import s.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (11L, 12L), (10L, 12L), (20L, 21L)).toDF("d1", "d2")
    val got = Dedup.resolveClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("resolveClusters converges on a long chain within maxIters") {
    val s = spark
    import s.implicits._
    // a 24-node path: worst-case diameter for min-propagation
    val pairs = (0L until 23L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Dedup.resolveClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 24 && got.values.forall(_ == 0L))
  }

  test("weightedSample: per-row keep rates, weight-1 keeps all, " +
      "weight-0 drops all, consistent with flat sampler") {
    val s = spark
    import s.implicits._
    val docs = (0 until 3000).map(i =>
      (i.toLong, s"payload $i", Seq(0.0, 0.2, 1.0)(i % 3)))
      .toDF("id", "text", "w")
    val kept = CorpusOps.weightedSample(docs, "text", "w", "ws")
      .groupBy($"w").count()
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(!kept.contains(0.0))
    assert(kept(1.0) == 1000L)
    assert(math.abs(kept(0.2) - 200L) < 70)
    // equals hashSample at a uniform weight (same salt, same keys)
    val uni = docs.withColumn("w", lit(0.3))
    val viaWeighted = CorpusOps.weightedSample(uni, "text", "w", "ws")
      .select($"id").as[Long].collect().toSet
    val viaFlat = CorpusOps.hashSample(docs, "text", 0.3, "ws")
      .select($"id").as[Long].collect().toSet
    assert(viaWeighted == viaFlat)
    // out-of-range weights clamp instead of misbehaving
    val wild = docs.withColumn("w",
      when($"id" % 2 === 0, 7.5).otherwise(-3.0))
    val gotWild = CorpusOps.weightedSample(wild, "text", "w", "ws")
      .select($"id").as[Long].collect().toSet
    assert(gotWild == (0L until 3000L by 2L).toSet)
  }

  test("selectKeepers: best score survives, ties break to smaller id") {
    val s = spark
    import s.implicits._
    // components {0,1,2} and {5,6}; scores: 1 wins first (tie 0/1
    // on score 9 → smaller id 0? no: 1 has 9, 0 has 9 → id 0 wins);
    // 6 wins second outright
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("d1", "d2")
    val scores = Seq((0L, 9L), (1L, 9L), (2L, 3L), (5L, 1L), (6L, 4L))
      .toDF("doc_id", "score")
    val got = Dedup.selectKeepers(Dedup.resolveClusters(pairs), scores,
        "doc_id", "score")
      .select($"doc_id", $"is_kept").as[(Long, Boolean)]
      .collect().toMap
    assert(got == Map(0L -> true, 1L -> false, 2L -> false,
      5L -> false, 6L -> true))
  }

  test("sampleNPerGroup: exact counts, deterministic, salt-sensitive") {
    val s = spark
    import s.implicits._
    val docs = (0 until 900).map(i =>
      (i.toLong, s"text body $i", Seq("en", "de", "xx")(i % 3)))
      .toDF("id", "text", "lang")
    val got = CorpusOps.sampleNPerGroup(docs, "text", "lang", 25, "s1")
    val counts = got.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 25L, "de" -> 25L, "xx" -> 25L))
    // stratum smaller than n → whole stratum
    val tiny = CorpusOps.sampleNPerGroup(docs.filter($"id" < 9),
      "text", "lang", 25, "s1")
    assert(tiny.count() == 9)
    // deterministic across runs; different under another salt
    def ids(salt: String) =
      CorpusOps.sampleNPerGroup(docs, "text", "lang", 25, salt)
        .select($"id").as[Long].collect().toSet
    assert(ids("s1") == ids("s1"))
    assert(ids("s1") != ids("s2"))
  }

  test("snapshotDiff: verdicts on a hand-built pair of versions") {
    val s = spark
    import s.implicits._
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("id", "text")
    val v2 = Seq((2L, "beta"), (3L, "gamma prime"), (4L, "delta"))
      .toDF("id", "text")
    val got = CorpusOps.snapshotDiff(v1, v2, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // null content: presence decides added/removed, null-safe hash
    // compare decides changed/unchanged
    val n1 = Seq((1L, Option.empty[String]), (2L, Some("x")),
      (3L, Option.empty[String])).toDF("id", "text")
    val n2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (4L, Option.empty[String])).toDF("id", "text")
    val gotN = CorpusOps.snapshotDiff(n1, n2, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotN == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("leakProofSplit: whole clusters share a split, singletons " +
    "default, fractions sane") {
    val s = spark
    import s.implicits._
    val docs = (0L until 400L).map(i => (i, s"doc $i")).toDF("doc_id", "t")
    // components: {0..9} rooted at 0, {10,11} rooted at 10; rest singleton
    val clusters = ((0L until 10L).map(i => (i, 0L)) ++
      Seq((10L, 10L), (11L, 10L))).toDF("doc_id", "cluster_id")
    val got = CorpusOps.leakProofSplit(docs, "doc_id", clusters,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = got.map(g => g._1 -> g._3).toMap
    // every member of a component carries the component's split
    assert((0L until 10L).map(byDoc).toSet.size == 1, "cluster 0 straddles")
    assert(byDoc(10L) == byDoc(11L), "cluster 10 straddles")
    // singletons keyed by their own id
    assert(got.filter(_._1 >= 12L).forall(g => g._2 == g._1))
    // all three bands populated at ~reasonable rates on 390 clusters
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set("train", "val", "test"), sizes.toString)
    assert(sizes("train") > 250 && sizes("val") > 5 && sizes("test") > 5,
      sizes.toString)
    // deterministic: same inputs, same assignment
    val again = CorpusOps.leakProofSplit(docs, "doc_id", clusters,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(again == byDoc)
    intercept[IllegalArgumentException] {
      CorpusOps.leakProofSplit(docs, "doc_id", clusters,
        Seq("train" -> 0.8, "val" -> 0.1), "s") // sums to 0.9
    }
  }

  test("negativeSample: different labels only, deterministic, " +
    "rank-contiguous, salt-sensitive") {
    val s = spark
    import s.implicits._
    val vecs = (0L until 200L).map(i => (i, (i % 4).toInt))
      .toDF("vec_id", "label")
    def run(salt: String) =
      CorpusOps.negativeSample(vecs, "vec_id", "label", k = 3,
          probes = 8, buckets = 16, salt = salt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val got = run("s1")
    val labels = vecs.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // negatives always carry a different label, never the anchor itself
    got.foreach { case (a, n, _) =>
      assert(a != n && labels(a) != labels(n), s"($a, $n)")
    }
    // ranks contiguous from 1 per anchor, at most k
    got.groupBy(_._1).foreach { case (a, rows) =>
      val rks = rows.map(_._3).sorted.toSeq
      assert(rks == (1 to rks.length), s"anchor $a ranks $rks")
      assert(rks.length <= 3)
    }
    // 8 probes of 16 buckets reach ~half the corpus — every anchor
    // finds a full k here
    assert(got.groupBy(_._1).size == 200)
    // deterministic; different salt draws a different sample
    assert(run("s1").toSeq == got.toSeq)
    assert(run("s2").toSeq != got.toSeq)
  }

  test("vocabCoverage: boundary tie resolves by token, exact OOV rates") {
    val s = spark
    import s.implicits._
    // counts: a=3, c=3, b=1 → top-2 vocab (n desc, token asc) = {a, c}
    val docs = Seq(("g1", "a a b"), ("g2", "a c c c"))
      .toDF("lang", "text")
    val got = CorpusOps.vocabCoverage(docs, "text", "lang", vocabSize = 2)
      .orderBy($"lang")
      .select($"lang", $"n_tokens", $"n_covered", $"oov_rate")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("g1", 3L, 2L, 0.333333), ("g2", 4L, 4L, 0.0)))
  }

  test("charPairCounts: within-word pairs only, multiplicity counted") {
    val s = spark
    import s.implicits._
    // words: "ab" → [ab]; "abc" → [ab, bc]; "a" → none (length 1)
    val docs = Seq((1L, "ab abc a")).toDF("doc_id", "text")
    val got = CorpusOps.charPairCounts(docs, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 2L), ("bc", 1L)))
  }

  test("packSequences: exact hand-computed packing, tail short, " +
      "empty docs vanish") {
    val s = spark
    import s.implicits._
    // doc order matters: 1:[a b c], 2:[] , 3:[d e], 4:[f]
    // stream = a b c d e f ; L=4 -> seq0 = a b c d, seq1 = e f
    val docs = Seq((1L, "a b  c"), (2L, "   "), (3L, "d e"), (4L, "f"))
      .toDF("doc_id", "text")
    val got = CorpusOps.packSequences(docs, "doc_id", "text", 4)
      .orderBy($"seq_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((0L, 4L, "a b c d"), (1L, 2L, "e f")))
    // every token in exactly one sequence, all full except the last
    val big = (0 until 50).map(i => (i.toLong, s"w${i}a w${i}b w${i}c"))
      .toDF("doc_id", "text")
    val packed = CorpusOps.packSequences(big, "doc_id", "text", 7)
      .orderBy($"seq_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(packed.map(_._2).sum == 150)
    assert(packed.dropRight(1).forall(_._2 == 7))
    assert(packed.map(_._1) == packed.indices.map(_.toLong))
    assert(packed.flatMap(_._3.split(" ")).toSeq ==
      (0 until 50).flatMap(i => Seq(s"w${i}a", s"w${i}b", s"w${i}c")))
  }

  test("packBoundaries: hand-computed span map; tiles every sequence; " +
      "reconstructs packSequences exactly") {
    val s = spark
    import s.implicits._
    // stream = a b c | d e | f with L=4: seq0 = [1:(0..2), 3:(3, d)],
    // seq1 = [3:(0, e), 4:(1, f)]
    val docs = Seq((1L, "a b  c"), (2L, "   "), (3L, "d e"), (4L, "f"))
      .toDF("doc_id", "text")
    val got = CorpusOps.packBoundaries(docs, "doc_id", "text", 4)
      .orderBy($"seq_id", $"start_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 0L, 0L, 3L), (0L, 3L, 3L, 0L, 1L),
      (1L, 3L, 0L, 1L, 1L), (1L, 4L, 1L, 0L, 1L)))
    // cross-operator invariant: slicing each doc's tokens by
    // (start_in_doc, len) in start_in_seq order rebuilds every packed
    // sequence's text bit-for-bit
    val big = (0 until 40).map(i => (i.toLong, s"w${i}a w${i}b w${i}c"))
      .toDF("doc_id", "text")
    val packed = CorpusOps.packSequences(big, "doc_id", "text", 7)
      .orderBy($"seq_id").as[(Long, Long, String)].collect()
    val spans = CorpusOps.packBoundaries(big, "doc_id", "text", 7)
      .orderBy($"seq_id", $"start_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
    val toks = (0 until 40).map(i =>
      i.toLong -> Seq(s"w${i}a", s"w${i}b", s"w${i}c")).toMap
    val rebuilt = spans.groupBy(_._1).map { case (seq, ss) =>
      seq -> ss.sortBy(_._3).flatMap { case (_, d, _, sd, len) =>
        toks(d).slice(sd.toInt, (sd + len).toInt) }.mkString(" ")
    }
    packed.foreach { case (seq, n, text) =>
      assert(rebuilt(seq) == text, s"seq $seq")
      // spans tile [0, n): contiguous, non-overlapping, full cover
      val ss = spans.filter(_._1 == seq).sortBy(_._3)
      assert(ss.head._3 == 0L)
      assert(ss.map(_._5).sum == n)
      ss.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._5 == b._3, s"gap in seq $seq")
        case _ =>
      }
    }
  }

  test("temperatureMix: hand-computed rates, small-source upweight, " +
      "cap at 1, deterministic") {
    val s = spark
    import s.implicits._
    // strata: big=1600 rows, mid=400, tiny=4
    val docs = ((0 until 1600).map(i => (i.toLong, "big")) ++
      (0 until 400).map(i => (2000L + i, "mid")) ++
      (0 until 4).map(i => (3000L + i, "tiny")))
      .toDF("id", "src")
    val r = CorpusOps.temperatureMix(docs, "id", "src",
      alpha = 0.5, targetFraction = 0.25, salt = "t")
    val rates = r.select($"src", $"mix_rate").distinct()
      .as[(String, Double)].collect().toMap
    // w = sqrt(n)*1e6: big=40e6, mid=20e6, tiny=2e6; tw=62e6; tn=2004
    def expect(n: Long, w: Double) =
      math.min(1.0, 0.25 * 2004.0 * w / (6.2e7 * n))
    assert(math.abs(rates("big") - expect(1600, 4.0e7)) < 1e-12)
    assert(math.abs(rates("mid") - expect(400, 2.0e7)) < 1e-12)
    // tiny: 0.25*2004*2e6/(6.2e7*4) = 4.04... -> capped at 1,
    // so ALL tiny rows survive
    assert(rates("tiny") == 1.0)
    assert(r.filter($"src" === "tiny").count() == 4)
    // smaller sources keep a larger fraction (the point of α<1)
    assert(rates("tiny") > rates("mid") && rates("mid") > rates("big"))
    // deterministic
    val again = CorpusOps.temperatureMix(docs, "id", "src",
      alpha = 0.5, targetFraction = 0.25, salt = "t")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(again == r.select($"id").as[Long].collect().sorted.toSeq)
    // realized keep rates track the computed rates (md5 band ~ U[0,1))
    val keptMid = r.filter($"src" === "mid").count().toDouble / 400
    assert(math.abs(keptMid - rates("mid")) < 0.12)
  }

  test("vocabGrowth: hand-computed cumulative curve; heapsFit " +
      "recovers an exact power law") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b a"),     // 3 tokens, 2 new types
      (2L, "b c"),       // 2 tokens, 1 new type (c)
      (3L, ""),          // empty
      (4L, "a d e")      // 3 tokens, 2 new types (d, e)
    ).toDF("doc_id", "text")
    val g = CorpusOps.vocabGrowth(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(g == Seq(
      (1L, 3L, 2L, 3L, 2L),
      (2L, 2L, 1L, 5L, 3L),
      (3L, 0L, 0L, 5L, 3L),
      (4L, 3L, 2L, 8L, 5L)))
    // a synthetic exact power law V = 2 * n^0.5 fits with beta ~ 0.5
    val curve = Seq.tabulate(50) { i =>
      val n = (i + 1L) * (i + 1L) * 25L // n = 25, 100, ...
      (i.toLong, 0L, 0L, n, 2L * (i + 1) * 5L) // V = 2*sqrt(n)
    }.toDF("doc_id", "n_tokens", "new_types", "cum_tokens", "vocab_size")
    val fit = CorpusOps.heapsFit(curve).collect().head
    assert(fit.getAs[Long]("n_points") == 50)
    assert(math.abs(fit.getAs[Double]("beta") - 0.5) < 1e-6)
    assert(math.abs(fit.getAs[Double]("k") - 2.0) < 1e-4)
  }

  test("zipfFit recovers the exponent of an exact power-law corpus") {
    val s = spark
    import s.implicits._
    // token w_r appears floor(1000 / r^2) times -> s = 2, c = 1000
    val docs = Seq.tabulate(8) { r =>
      (r.toLong, Seq.fill(1000 / ((r + 1) * (r + 1)))(f"w$r%02d")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val fit = CorpusOps.zipfFit(docs, "text").collect().head
    assert(fit.getAs[Long]("n_points") == 8)
    // floor() distorts the tail slightly; the fit stays near -2
    assert(math.abs(fit.getAs[Double]("beta") + 2.0) < 0.02,
      fit.toString)
    assert(math.abs(fit.getAs[Double]("k") - 1000.0) < 30.0)
  }

  test("gopherRules: each rule trips on its crafted violator") {
    val s = spark
    import s.implicits._
    val good = (("the quick brown fox jumps over a lazy dog and " +
      "then runs far away with great speed ") * 5).trim // 95 words, clean
    val docs = Seq(
      (1L, good),
      (2L, "the a short doc"), // < 50 words
      (3L, good.split(" ").map(_ => "ab").mkString(" ")), // mean len 2 < 3
      (4L, good + " " + Array.fill(20)("#").mkString(" ")), // symbols
      (5L, (0 until 60).map(i => f"xyzq$i%02d").mkString(" ")), // no stopwords
      (6L, good.split(" ").map(w => "123").mkString(" ")) // no alpha words
    ).toDF("doc_id", "text")
    val r = CorpusOps.gopherRules(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    val byId = r.map(x => x.getLong(0) -> x).toMap
    assert(byId(1L).getAs[Boolean]("keep"))
    assert(!byId(2L).getAs[Boolean]("pass_words"))
    assert(!byId(3L).getAs[Boolean]("pass_word_len"))
    assert(!byId(4L).getAs[Boolean]("pass_symbols"))
    assert(!byId(5L).getAs[Boolean]("pass_stopwords"))
    assert(!byId(6L).getAs[Boolean]("pass_alpha"))
    assert(Seq(2L, 3L, 4L, 5L, 6L).forall(i => !byId(i).getAs[Boolean]("keep")))
  }

  test("dsirWeights: target-like docs score above off-target docs; " +
      "gram count is 2n-1; deterministic") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha"), (2L, "alpha beta"),
      (3L, "gamma delta gamma"), (4L, "gamma delta")
    ).toDF("doc_id", "text")
    val r = CorpusOps.dsirWeights(docs, "doc_id", "text",
        isTarget = $"doc_id" <= 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(r.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(r.map(_._2) == Seq(5L, 3L, 5L, 3L)) // unigrams + bigrams
    // target vocabulary dominates the target model → positive ratios;
    // off-target grams never occur in the target slice → negative
    assert(r(0)._3 > 0 && r(1)._3 > 0, r.toString)
    assert(r(2)._3 < 0 && r(3)._3 < 0, r.toString)
    assert(r(0)._3 > r(2)._3 && r(1)._3 > r(3)._3)
    val again = CorpusOps.dsirWeights(docs, "doc_id", "text",
        isTarget = $"doc_id" <= 2)
      .orderBy($"doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(r == again)
  }

  test("sourceOverlap: hand-computed shingle Jaccard matrix, " +
      "zero-overlap pairs included") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("A", "w1 w2 w3 w4"), // shingles {w1w2w3, w2w3w4}
      ("B", "w1 w2 w3 w5"), // shingles {w1w2w3, w2w3w5}
      ("C", "x y z")        // {xyz}
    ).toDF("source", "text")
    val r = CorpusOps.sourceOverlap(docs, "source", "text", k = 3)
      .orderBy($"source_a", $"source_b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("A", "B", 2L, 2L, 1L, 1.0 / 3), // round(0.333333..., 6)
      ("A", "C", 2L, 1L, 0L, 0.0),
      ("B", "C", 2L, 1L, 0L, 0.0)
    ).map { case (a, b, na, nb, nc, j) =>
      (a, b, na, nb, nc, math.rint(j * 1e6) / 1e6) })
  }

  test("spanCorruption: independent replay of the md5 placement rule; " +
      "conservation; degenerate docs") {
    val s = spark
    import s.implicits._
    val d1 = (0 until 23).map(i => s"w$i").mkString(" ") // 4 blocks + tail
    val docs = Seq((1L, d1), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val B = 5; val L = 2
    val got = CorpusOps.spanCorruption(docs, "doc_id", "text",
        blockSize = B, spanLen = L, salt = "t")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String, String)].collect()

    // independent replay: same md5-band arithmetic, plain Scala
    def md5Int(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString,
      16)
    def replay(id: Long, text: String): (Long, Long, String, String) = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val corr = toks.indices.map { p =>
        val off = md5Int(s"t$id#${p / B}") % (B - L + 1)
        p % B >= off && p % B < off + L
      }
      val firstOf = toks.indices.filter(corr)
        .groupBy(_ / B).map { case (b, ps) => b -> ps.min }
      val inp = scala.collection.mutable.ArrayBuffer.empty[String]
      val tgt = scala.collection.mutable.ArrayBuffer.empty[String]
      var k = -1
      toks.indices.foreach { p =>
        if (!corr(p)) inp += toks(p)
        else {
          if (p == firstOf(p / B)) { k += 1; inp += s"<extra_id_$k>"
            tgt += s"<extra_id_$k>" }
          tgt += toks(p)
        }
      }
      if (k >= 0) tgt += s"<extra_id_${k + 1}>"
      (toks.size.toLong, corr.count(identity).toLong,
        inp.mkString(" "), tgt.mkString(" "))
    }
    Seq((1L, d1), (2L, "a b"), (3L, "")).zip(got).foreach {
      case ((id, text), (gid, nt, nc, gi, gt)) =>
        val (en, ec, ei, et) = replay(id, text)
        assert(gid == id)
        assert((nt, nc) == ((en, ec)), s"doc $id counts")
        assert(gi == ei, s"doc $id input")
        assert(gt == et, s"doc $id target")
        // conservation: non-sentinel input tokens + corrupted = total
        val plain = gi.split(" ").filter(_.nonEmpty)
          .count(!_.startsWith("<extra_id_"))
        assert(plain + nc == nt, s"doc $id conservation")
    }
    assert(got(2) == ((3L, 0L, 0L, "", "")))
    // density lands near spanLen/blockSize on the long doc
    assert(got(0)._3.toDouble / got(0)._2 >= 0.3 &&
      got(0)._3.toDouble / got(0)._2 <= 0.5)
  }

  test("unimaxAllocation: hand waterfill — uncapped, mixed, all-capped") {
    val s = spark
    import s.implicits._
    val docs = Seq(("a", 10L), ("b", 20L), ("c", 70L))
      .toDF("source", "n_tokens")
    def run(frac: Double, epochs: Double) =
      CorpusOps.unimaxAllocation(docs, "source", "n_tokens", frac, epochs)
        .orderBy($"source")
        .as[(String, Long, Double, Double, Double)].collect().toSeq
    // T = 50, caps (20, 40, 140): level 50/3 fits under every cap
    val uncapped = run(0.5, 2.0)
    assert(uncapped.map(_._4) == Seq(16.666667, 16.666667, 16.666667))
    assert(uncapped.map(_._5) == Seq(1.666667, 0.833333, 0.238095))
    // T = 90: a caps at 20, remaining 70 levels at 35 across b and c
    val mixed = run(0.9, 2.0)
    assert(mixed.map(_._4) == Seq(20.0, 35.0, 35.0))
    assert(mixed.map(_._5) == Seq(2.0, 1.75, 0.5))
    // budget beyond total capacity: everyone capped at maxEpochs
    val capped = run(3.0, 2.0)
    assert(capped.map(_._4) == Seq(20.0, 40.0, 140.0))
    assert(capped.map(_._5) == Seq(2.0, 2.0, 2.0))
  }
}
