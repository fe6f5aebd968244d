package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Hand-computed checks for X111–X113: content-defined chunking,
  * rolling z-score anomaly flags, and contrastive span pairs.
  */
class ChunkingWaveSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Deterministic pseudo-text long enough to contain several CDC
    * boundaries at mask=64 (expected chunk ≈ 64 chars).
    */
  private def pseudo(seed: Int, n: Int): String =
    (0 until n).map(i => ('a' + ((i * 31 + seed * 17 + i * i % 97) % 26))
      .toChar).mkString

  test("cdc: chunks tile each document exactly") {
    val t1 = pseudo(1, 500); val t2 = pseudo(2, 300)
    val out = CorpusOps.cdcChunks(docs((1L, t1), (2L, t2)), "doc_id", "text")
      .collect().groupBy(_.getAs[Long]("doc_id"))
    for ((id, text) <- Seq(1L -> t1, 2L -> t2)) {
      val chunks = out(id).sortBy(_.getAs[Long]("chunk_idx"))
      assert(chunks.head.getAs[Long]("start_pos") == 0L)
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("start_pos") + a.getAs[Long]("chunk_len") ==
            b.getAs[Long]("start_pos"))
        case _ =>
      }
      assert(chunks.map(_.getAs[Long]("chunk_len")).sum == text.length)
    }
  }

  test("cdc: boundaries are content-anchored — a prefix insertion " +
    "re-synchronizes and identical docs dedup fully") {
    val base = pseudo(3, 800)
    val shifted = "XYZQ" + base // 4-char insertion at the front
    val out = CorpusOps.cdcChunks(
        docs((1L, base), (2L, shifted), (3L, base)), "doc_id", "text")
      .collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
      .map { case (k, v) => k -> v.map(_.getAs[String]("chunk_hash")).toSet }
    // identical docs 1 and 3: same chunk set, and every copy count >= 2
    assert(byDoc(1L) == byDoc(3L))
    assert(out.filter(_.getAs[Long]("doc_id") == 1L)
      .forall(_.getAs[Long]("n_copies") >= 2L))
    // the insertion shifts every byte offset, yet chunking re-syncs at
    // the first content boundary: docs 1 and 2 still share chunks
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "no shared chunks after a 4-char insertion — boundaries are not " +
        "content-defined")
    // sanity: the doc actually split (mask 64 over 800 chars)
    assert(byDoc(1L).size >= 3)
  }

  test("cdc: short doc is one whole-doc chunk; empty doc emits none") {
    val out = CorpusOps.cdcChunks(docs((1L, "abc"), (2L, "")), "doc_id",
      "text").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.head.getAs[Long]("chunk_len") == 3L)
    assert(out.head.getAs[Long]("start_pos") == 0L)
  }

  // ---- X112 rolling z-score -----------------------------------------

  private def events(rows: (Long, Long, Double)*) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, u, v) =>
      (id, u, new java.sql.Timestamp(1700000000000L + id * 60000), v)
    }.toDF("event_id", "user_id", "ts", "value")
  }

  test("rollingZScore: spike flags, steady state does not, minN gates") {
    // user 7: 14 alternating 10/12 readings, then a 100.0 spike
    val base = (0L until 14L).map(i =>
      (i, 7L, if (i % 2 == 0) 10.0 else 12.0))
    val rows = base :+ (14L, 7L, 100.0)
    val out = TimeSeries.rollingZScore(events(rows: _*), "user_id", "ts",
        "event_id", "value", lookback = 20, minN = 10, threshold = 3.0)
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    // replicate the integer math for the spike row
    val q = base.map { case (_, _, v) => math.round(v * 100) }
    val n = q.length.toLong
    val s1 = q.sum; val s2 = q.map(x => x * x).sum
    val mean = s1.toDouble / n
    val sd = math.sqrt((s2 - s1.toDouble * s1 / n) / n)
    val wantZ = math.rint((10000L - mean) / sd * 1e6) / 1e6
    assert(out(14L).getAs[Boolean]("is_anomaly"))
    assert(out(14L).getAs[Double]("z") == wantZ)
    assert(out(14L).getAs[Long]("n_ref") == 14L)
    // steady rows with a full reference window are not anomalous
    assert(!out(13L).getAs[Boolean]("is_anomaly"))
    // early rows fail the minN gate: z null, flag false
    assert(out(5L).isNullAt(out(5L).fieldIndex("z")))
    assert(!out(5L).getAs[Boolean]("is_anomaly"))
  }

  test("rollingZScore: zero-variance reference yields null z, no flag") {
    val rows = (0L until 12L).map(i => (i, 1L, 5.0)) :+ (12L, 1L, 9.0)
    val out = TimeSeries.rollingZScore(events(rows: _*), "user_id", "ts",
        "event_id", "value").collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(out(12L).isNullAt(out(12L).fieldIndex("z")))
    assert(!out(12L).getAs[Boolean]("is_anomaly"))
  }

  // ---- X123 grouped k-fold ------------------------------------------

  test("groupedKFold: cluster-mates share a fold; singletons key on " +
    "their own id; folds stay in range") {
    val s = spark
    import s.implicits._
    val d = docs((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster_id")
    val out = CorpusOps.groupedKFold(d, "doc_id", clusters, k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("fold") == out(2L).getAs[Int]("fold"))
    assert(out(3L).getAs[Int]("fold") == out(4L).getAs[Int]("fold"))
    assert(out.values.forall { r =>
      val f = r.getAs[Int]("fold"); f >= 0 && f < 3
    })
    assert(out(5L).getAs[Long]("cluster_id") == 5L)
  }

  // ---- X124 SCD2 interval compaction --------------------------------

  test("compactIntervals: runs collapse, valid_to chains, open run " +
    "is null; null values compact like any other") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (0L, 1L, Some("A")), (1L, 1L, Some("A")), (2L, 1L, Some("B")),
      (3L, 1L, Option.empty[String]), (4L, 1L, Option.empty[String]),
      (5L, 1L, Some("A")),
      (10L, 2L, Some("X")))
      .map { case (id, u, v) =>
        (id, u, new java.sql.Timestamp(1700000000000L + id * 1000), v)
      }.toDF("event_id", "user_id", "ts", "event_type")
    val out = TimeSeries.compactIntervals(rows, "user_id", "ts",
        "event_id", "event_type")
      .orderBy(col("user_id"), col("valid_from")).collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(r => Option(r.getAs[String]("event_type"))).toSeq ==
      Seq(Some("A"), Some("B"), None, Some("A")))
    assert(u1.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L, 2L, 1L))
    // valid_to of each interval == valid_from of the next; last open
    u1.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[java.sql.Timestamp]("valid_to") ==
          b.getAs[java.sql.Timestamp]("valid_from"))
      case _ =>
    }
    assert(u1.last.isNullAt(u1.last.fieldIndex("valid_to")))
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 1 && u2.head.isNullAt(u2.head.fieldIndex("valid_to")))
  }

  // ---- X125 retention cohorts ---------------------------------------

  test("retentionCohorts: hand matrix — day-0 full, day-2 half") {
    val s = spark
    import s.implicits._
    val day = 86400000L
    val rows = Seq((1L, 0L), (1L, 2 * day), (2L, day / 2))
      .zipWithIndex.map { case ((u, off), i) =>
        (i.toLong, u, new java.sql.Timestamp(1700000000000L -
          1700000000000L % day + off))
      }.toDF("event_id", "user_id", "ts")
    val out = Funnel.retentionCohorts(rows, "user_id", "ts")
      .collect().map(r => r.getAs[Long]("offset") -> r).toMap
    // both users first-seen on the same UTC day -> one cohort
    assert(out(0L).getAs[Long]("cohort_size") == 2L)
    assert(out(0L).getAs[Long]("n_active") == 2L)
    assert(out(0L).getAs[Double]("retention") == 1.0)
    assert(out(2L).getAs[Long]("n_active") == 1L)
    assert(out(2L).getAs[Double]("retention") == 0.5)
  }

  // ---- X126 chi-square drift ----------------------------------------

  test("contingencyChi2: perfect association and perfect independence") {
    val s = spark
    import s.implicits._
    val assoc = (Seq.fill(10)(("s1", "en")) ++ Seq.fill(10)(("s2", "fr")))
      .toDF("source", "lang")
    val a = CorpusOps.contingencyChi2(assoc, "source", "lang")
      .collect().head
    // 2x2 with e = 5 everywhere: chi2 = 4·25/5 = 20; V = 1
    assert(a.getAs[Double]("chi2") == 20.0)
    assert(a.getAs[Long]("dof") == 1L)
    assert(a.getAs[Double]("cramers_v") == 1.0)
    val indep = (Seq.fill(5)(("s1", "en")) ++ Seq.fill(5)(("s1", "fr")) ++
      Seq.fill(5)(("s2", "en")) ++ Seq.fill(5)(("s2", "fr")))
      .toDF("source", "lang")
    val b = CorpusOps.contingencyChi2(indep, "source", "lang")
      .collect().head
    assert(b.getAs[Double]("chi2") == 0.0)
    assert(b.getAs[Double]("cramers_v") == 0.0)
  }

  // ---- X127 typo pairs ----------------------------------------------

  test("typoPairs: substitutions, deletions, insertions found; " +
    "transpositions and distance-2 pairs excluded; counts carried") {
    // NB the driver corpus vocabulary has no distance-1 pairs (the
    // contract query legitimately returns 0 rows there) — this hand
    // corpus is where the completeness claim is actually exercised.
    val d = docs(
      (1L, "color color colour"), // insertion pair (dist 1)
      (2L, "cat bat cat"), // substitution pair
      (3L, "cart cat"), // deletion pair (cart/cat dist 1? c-a-r-t vs c-a-t = 1 deletion)
      (4L, "ab ba"), // transposition = distance 2 -> excluded
      (5L, "alpha omega")) // distance > 1 -> excluded
    val out = Dedup.typoPairs(d, "text")
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        r).toMap
    assert(out.contains(("color", "colour")))
    assert(out.contains(("bat", "cat")))
    assert(out.contains(("cart", "cat")))
    assert(!out.keys.exists(p => p == ("ab", "ba")))
    assert(!out.keys.exists { case (a, b) =>
      Set(a, b).intersect(Set("alpha", "omega")).size == 2 })
    // corpus frequencies ride along: "color" appears twice
    assert(out(("color", "colour")).getAs[Long]("c1") == 2L)
    assert(out(("color", "colour")).getAs[Long]("c2") == 1L)
    assert(out.values.forall(_.getAs[Int]("dist") == 1))
    // completeness vs the naive form on this corpus
    val words = Seq("color", "colour", "cat", "bat", "cart", "ab", "ba",
      "alpha", "omega")
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val naive = (for {
      a <- words; b <- words if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(out.keySet == naive)
  }

  // ---- X128 quality dashboard ---------------------------------------

  test("qualityDashboard: sizes, dup ratio, and entropy on a hand corpus") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "alpha beta", "en", "s1"), (2L, "alpha beta", "en", "s1"),
      (3L, "gamma delta epsilon", "fr", "s1"),
      (4L, "zeta", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusOps.qualityDashboard(d, "doc_id", "text", "source",
        "lang").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("s1").getAs[Long]("n_docs") == 3L)
    assert(out("s1").getAs[Long]("total_tokens") == 7L)
    // docs 1 and 2 are identical -> 2 distinct hashes over 3 docs
    assert(out("s1").getAs[Double]("uniq_ratio") ==
      math.rint(2.0 / 3.0 * 1e6) / 1e6)
    // s1 langs: en 2, fr 1 -> H = ln3 − 2·ln2/3
    val h = math.rint((math.log(3) - 2 * math.log(2) / 3) * 1e6) / 1e6
    assert(math.abs(out("s1").getAs[Double]("lang_entropy") - h) < 2e-6)
    // single-language source: entropy exactly 0
    assert(out("s2").getAs[Double]("lang_entropy") == 0.0)
    assert(out("s2").getAs[Double]("uniq_ratio") == 1.0)
  }

  // ---- X129 HLL sketch snapshots ------------------------------------

  test("hll: estimates track exact counts; union of persisted part " +
    "sketches equals the whole-corpus sketch") {
    val s = spark
    import s.implicits._
    val df = (0 until 3000).map(i => (s"g${i % 3}", s"user${i % 700}"))
      .toDF("grp", "uid")
    val parts = Hll.groupSketches(df, "grp", "uid")
    val exact = df.groupBy("grp").agg(count_distinct(col("uid")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    parts.collect().foreach { r =>
      val est = r.getAs[Long]("estimate").toDouble
      val ex = exact(r.getAs[String]("grp")).toDouble
      assert(math.abs(est - ex) / ex < 0.05, s"estimate $est vs $ex")
    }
    // persist the sketch table, reload, union — must equal the
    // single-pass whole-corpus sketch estimate exactly (register-max
    // merge is associative and idempotent at fixed p)
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    parts.select("grp", "sketch").write.mode("overwrite").parquet(dir)
    val mergedFromDisk = Hll.mergedEstimate(s.read.parquet(dir))
      .collect().head.getAs[Long]("estimate")
    val whole = Hll.groupSketches(df.withColumn("grp", lit("all")),
      "grp", "uid").collect().head.getAs[Long]("estimate")
    assert(mergedFromDisk == whole)
  }

  test("hll: raw-regime branch (n >> 2.5m at p=6) stays within HLL " +
    "error; driver-side integer replica equals the Column estimator") {
    val s = spark
    import s.implicits._
    // 700 distinct keys over m=64 registers: raw > 2.5m = 160, so the
    // harmonic-mean branch (not linear counting) produces the
    // estimate. σ ≈ 1.04/√64 = 13% — bound at 3σ.
    val df = (0 until 700).map(i => ("g", s"k$i")).toDF("grp", "uid")
    val row = Hll.groupSketches(df, "grp", "uid", p = 6).collect().head
    val est = row.getAs[Long]("estimate")
    assert(est > 160L, s"expected raw-branch estimate, got $est")
    assert(math.abs(est - 700.0) / 700.0 < 0.39, s"estimate $est vs 700")
    // the driver replica (StreamingHll's estimator) is bit-identical
    val regs = row.getSeq[Int](row.fieldIndex("sketch")).toArray
    assert(Hll.estimateFromRegisters(regs, p = 6) == est)
  }

  // ---- X130 active-user trend ---------------------------------------

  test("activeUserTrend: hand DAU/WAU — coverage window is exactly 7 " +
    "days and stickiness divides correctly") {
    val s = spark
    import s.implicits._
    val day = 86400000L
    val base = 1700000000000L - 1700000000000L % day
    // u1 active day0 and day8; u2 active day0 only
    val rows = Seq((0L, 1L, 0L), (1L, 2L, 0L), (2L, 1L, 8 * day))
      .map { case (id, u, off) =>
        (id, u, new java.sql.Timestamp(base + off))
      }.toDF("event_id", "user_id", "ts")
    val out = Funnel.activeUserTrend(rows, "user_id", "ts")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r)
      .toMap
    assert(out.size == 2) // only days with activity are reported
    val d0 = out.values.find(_.getAs[Long]("dau") == 2L).get
    assert(d0.getAs[Long]("wau") == 2L)
    assert(d0.getAs[Double]("stickiness") == 1.0)
    // day 8: u1 active; day-0 activity is 8 days old — outside the
    // trailing window, so WAU is 1, not 2
    val d8 = out.values.find(_.getAs[Long]("dau") == 1L).get
    assert(d8.getAs[Long]("wau") == 1L)
  }

  // ---- X131 PSI drift -----------------------------------------------

  test("psi: identical halves are stable; a shifted distribution is " +
    "major drift; smoothing keeps empty bands finite") {
    val s = spark
    import s.implicits._
    val same = (1 to 400).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("id", "v")
    val a = CorpusOps.psi(same, "v", col("id") % 2 === 0)
      .collect().head
    assert(a.getAs[String]("verdict") == "stable", a.toString)
    assert(a.getAs[Long]("n_baseline") == 200L)
    // current slice shifted far outside the baseline's bands: every
    // current value lands in the top band -> major drift, and the
    // empty current-side bands stay finite through the +1 smoothing
    val shifted = ((1 to 200).map(i => (i.toLong * 2, (i % 100).toDouble))
      ++ (1 to 200).map(i => (i.toLong * 2 + 1, 1000.0 + i)))
      .toDF("id", "v")
    val b = CorpusOps.psi(shifted, "v", col("id") % 2 === 0)
      .collect().head
    assert(b.getAs[String]("verdict") == "major", b.toString)
    assert(!b.getAs[Double]("psi").isNaN &&
      !b.getAs[Double]("psi").isInfinite)
    assert(b.getAs[Double]("psi") > a.getAs[Double]("psi"))
  }

  // ---- X113 contrastive pairs ---------------------------------------

  test("contrastivePairs: views are real in-bounds crops with the " +
    "declared overlap; short docs drop; deterministic") {
    val d = docs(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")),
      (2L, "a b c"), // 3 tokens < minTokens — dropped
      (3L, (1 to 7).map(i => s"t$i").mkString(" ")))
    val out = CorpusOps.contrastivePairs(d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(2L))
    for (id <- Seq(1L, 3L)) {
      val r = out(id)
      val toks = d.filter(col("doc_id") === id).collect().head
        .getString(1).split(" ").toSeq
      val n = r.getAs[Long]("n_tokens"); val l = r.getAs[Long]("crop_len")
      val sa = r.getAs[Long]("start_a"); val sb = r.getAs[Long]("start_b")
      assert(n == toks.length)
      assert(l == math.ceil(n * 0.6).toLong)
      assert(sa >= 0 && sa + l <= n && sb >= 0 && sb + l <= n)
      assert(r.getAs[String]("view_a") ==
        toks.slice(sa.toInt, (sa + l).toInt).mkString(" "))
      assert(r.getAs[String]("view_b") ==
        toks.slice(sb.toInt, (sb + l).toInt).mkString(" "))
      val want = math.max(0L, math.min(sa + l, sb + l) - math.max(sa, sb))
      assert(r.getAs[Long]("overlap_tokens") == want)
    }
    // determinism across repartitioning
    val again = CorpusOps.contrastivePairs(d.repartition(5), "doc_id",
      "text").collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    assert(again == out.map { case (k, v) => k -> v.toSeq })
  }
}
