package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Hand-computed checks for the X101–X105 curation wave: integer
  * PageRank, the k-anonymity ladder, Count-Min estimates, MLM
  * masking, and the export manifest.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  // ---- X101 PageRank -------------------------------------------------

  private def edges(pairs: (String, String)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("src", "dst")
  }

  test("pagerank: two-node symmetric graph is the exact fixed point") {
    // n=2: r0 = 5e8, deg 1, share = 5e8,
    // rank' = (3e9)//(40) + (17*5e8)//20 = 75e6 + 425e6 = 5e8 — stable
    val r = PageRank.run(edges("a" -> "b", "b" -> "a"), "src", "dst", 10)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 500000000L, "b" -> 500000000L))
  }

  test("pagerank: star center outranks leaves; leaves tie") {
    val star = edges("c" -> "l1", "l1" -> "c", "c" -> "l2", "l2" -> "c",
      "c" -> "l3", "l3" -> "c")
    val r = PageRank.run(star, "src", "dst", 10)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("c") > r("l1"))
    assert(r("l1") == r("l2") && r("l2") == r("l3"))
    // floor divisions only ever LOSE grid units: total in (0.9, 1.0] of scale
    val total = r.values.sum
    assert(total <= 1000000000L && total > 900000000L)
  }

  test("pagerank: dangling node is refused loudly") {
    val e = intercept[IllegalArgumentException] {
      PageRank.run(edges("a" -> "b"), "src", "dst", 2)
    }
    assert(e.getMessage.contains("dangling"))
  }

  test("pagerank: zero iterations returns the uniform grid") {
    val r = PageRank.run(edges("a" -> "b", "b" -> "a"), "src", "dst", 0)
      .collect().map(_.getLong(1)).toSet
    assert(r == Set(500000000L))
  }

  // ---- X102 k-anonymity ladder ---------------------------------------

  test("anonymityLadder: rows settle at the first level reaching k") {
    val s = spark
    import s.implicits._
    // (a,b,c) QI ladder, k=5:
    //   ids 1-5   share (1,1,1)            → level 0, k=5
    //   ids 6-8   (1,2,2); ids 9-10 (1,2,3) → level0 sub-k, level1
    //             group (1,2) has 5         → level 1, k=5
    //   ids 11-12 (2,9,9)                   → fails every level →
    //             catch-all level 2, k=2
    val rows =
      (1 to 5).map(i => (i, 1, 1, 1)) ++
        (6 to 8).map(i => (i, 1, 2, 2)) ++ (9 to 10).map(i => (i, 1, 2, 3)) ++
        (11 to 12).map(i => (i, 2, 9, 9))
    val df = rows.toDF("id", "a", "b", "c")
    val out = Privacy.anonymityLadder(df, Seq("id"),
        Seq(Seq($"a", $"b", $"c"), Seq($"a", $"b"), Seq($"a")), k = 5)
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    (1 to 5).foreach(i => assert(out(i) == ((0, 5L)), s"id $i"))
    (6 to 10).foreach(i => assert(out(i) == ((1, 5L)), s"id $i"))
    (11 to 12).foreach(i => assert(out(i) == ((2, 2L)), s"id $i"))
  }

  // ---- X104 Count-Min Sketch -----------------------------------------

  private def keysDf(ks: Seq[String]) = {
    val s = spark
    import s.implicits._
    ks.toDF("k")
  }

  test("cms: estimate is always >= the exact count") {
    val data = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      (1 to 30).map(i => s"tail$i")
    val df = keysDf(data)
    val sk = Cms.sketch(df, "k", depth = 4, width = 8) // force collisions
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = Cms.estimate(sk, keysDf(data.distinct), "k", depth = 4,
        width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"estimate for $k under exact")
    }
    // the heavy keys dominate their buckets: estimates stay in range
    assert(est("alpha") >= 40L && est("alpha") <= 95L)
  }

  test("cms: merge of two sketches equals the sketch of the union") {
    val a = keysDf(Seq("x", "x", "y"))
    val b = keysDf(Seq("y", "z"))
    val merged = Cms.merge(Cms.sketch(a, "k"), Cms.sketch(b, "k"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Cms.sketch(keysDf(Seq("x", "x", "y", "y", "z")), "k")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("cms: a key never inserted estimates >= 0 (usually 0 at width 4096)") {
    val sk = Cms.sketch(keysDf(Seq("only")), "k", width = 4096)
    val est = Cms.estimate(sk, keysDf(Seq("absent")), "k", width = 4096)
      .collect().head.getLong(1)
    assert(est >= 0L)
  }

  // ---- X103 MLM masking ----------------------------------------------

  test("mlmMask: reconstruction, 80/10/10 sanity, and determinism") {
    val s = spark
    import s.implicits._
    val words = (0 until 400).map(i => s"w${i % 37}")
    val docs = Seq((1L, words.mkString(" ")), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val out = CorpusOps.mlmMask(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap

    val (n, nm, masked, targets) = out(1L)
    assert(n == 400L)
    // 15% nominal; the md5 draw over 400 positions stays well inside
    assert(nm >= 20L && nm <= 120L)
    val mtoks = masked.split(" ")
    assert(mtoks.length == 400)
    val tmap = targets.split(" ").filter(_.nonEmpty).map { t =>
      val Array(p, w) = t.split(":", 2); p.toInt -> w
    }.toMap
    assert(tmap.size == nm)
    val vocab = words.toSet
    mtoks.zipWithIndex.foreach { case (t, i) =>
      if (tmap.contains(i)) {
        // masked position: original word recorded in targets; surface
        // form is [MASK], a corpus word, or the kept original
        assert(tmap(i) == words(i))
        assert(t == "[MASK]" || vocab.contains(t))
      } else assert(t == words(i), s"unmasked position $i changed")
    }
    // some positions must be [MASK] (80% of selections)
    assert(mtoks.count(_ == "[MASK]") > 0)

    assert(out(3L) == ((0L, 0L, "", "")))
    // determinism: bit-identical on rerun
    val again = CorpusOps.mlmMask(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(again == out)
  }

  // ---- X105 export manifest ------------------------------------------

  test("exportManifest: totals, contiguous shards, partitioning-agnostic") {
    val s = spark
    import s.implicits._
    val docs = (1 to 30).map { i =>
      (s"src${i % 3}", i.toLong, (0 until 10).map(j => s"t$i$j").mkString(" "))
    }.toDF("source", "doc_id", "text")
    val m = CorpusOps.exportManifest(docs, "source", "doc_id", "text", 25L)
    val rows = m.collect()
    // every source's shards are contiguous from 0 and totals add up
    Seq("src0", "src1", "src2").foreach { src =>
      val mine = rows.filter(_.getString(0) == src)
        .sortBy(_.getLong(1))
      assert(mine.map(_.getLong(1)).toSeq == mine.indices.map(_.toLong))
      assert(mine.map(_.getLong(2)).sum == 10L) // 10 docs per source
      assert(mine.map(_.getLong(3)).sum == 100L) // 10 tokens per doc
    }
    // shard assignment and checksums ignore physical partitioning
    val reparted = CorpusOps.exportManifest(docs.repartition(7),
        "source", "doc_id", "text", 25L)
      .collect().map(_.toSeq).toSet
    assert(reparted == rows.map(_.toSeq).toSet)
  }

  // ---- X122 sharded release writer ----------------------------------

  test("writeShardedCorpus: physical layout matches the manifest and " +
    "a consumer re-derives the checksums from the written data") {
    val s = spark
    import s.implicits._
    val docs = (1 to 30).map { i =>
      (s"src${i % 3}", i.toLong, (0 until 10).map(j => s"t$i$j").mkString(" "))
    }.toDF("source", "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shardout").toString
    val manifest = graft.Sinks.writeShardedCorpus(docs, "source",
      "doc_id", "text", 25L, dir)

    // layout: source=/shard_id= partition directories exist
    val srcDirs = new java.io.File(s"$dir/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("source="))
    assert(srcDirs.length == 3)
    assert(srcDirs.forall(_.listFiles()
      .exists(_.getName.startsWith("shard_id="))))

    // round trip: every (doc_id, text) row survives exactly once
    val back = s.read.parquet(s"$dir/data")
    assert(back.count() == 30)
    assert(back.select("doc_id", "text").collect().map(_.toSeq).toSet ==
      docs.select("doc_id", "text").collect().map(_.toSeq).toSet)

    // the persisted manifest equals the returned one, and a consumer
    // recomputing per-(source, shard) stats from the DATA files gets
    // the same counts and checksums
    val persisted = s.read.parquet(s"$dir/manifest")
    assert(persisted.collect().map(_.toSeq).toSet ==
      manifest.collect().map(_.toSeq).toSet)
    val rederived = back
      .groupBy($"source", $"shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        min($"doc_id").as("first_id"), max($"doc_id").as("last_id"),
        sum(conv(substring(md5($"text"), 1, 8), 16, 10).cast("long"))
          .as("checksum"))
      .collect().map(_.toSeq).toSet
    assert(rederived == manifest.collect().map(_.toSeq).toSet)
  }

  // ---- X114 l-diversity ---------------------------------------------

  test("lDiversity: distinct and entropy forms on a hand example") {
    val s = spark
    import s.implicits._
    // class A: sensitive [x, x, x, y]; class B: all the same value
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "z"), ("B", "z"), ("B", "z"))
      .toDF("grp", "sens")
    val out = Privacy.lDiversity(df, Seq("grp"), col("sens"), l = 2L)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("A").getAs[Long]("n_rows") == 4L)
    assert(out("A").getAs[Long]("distinct_l") == 2L)
    // H = ln4 − 3·ln3/4 → e^H ≈ 1.754765
    assert(math.abs(out("A").getAs[Double]("entropy_l") - 1.754765) < 1e-6)
    assert(out("A").getAs[Boolean]("meets_l"))
    assert(out("B").getAs[Long]("distinct_l") == 1L)
    assert(out("B").getAs[Double]("entropy_l") == 1.0)
    assert(!out("B").getAs[Boolean]("meets_l"))
  }

  // ---- X115 score calibration ---------------------------------------

  test("calibrateScores: z and percentile within group; singleton " +
    "group yields null z, pct 0") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "g1", Some(1.0)), (2L, "g1", Some(2.0)),
      (3L, "g1", Some(3.0)), (4L, "solo", Some(0.7)),
      (5L, "g1", Option.empty[Double]))
      .toDF("id", "grp", "score")
    val out = CorpusOps.calibrateScores(df, "grp", "id", "score")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(!out.contains(5L)) // null score dropped
    // population std of {1,2,3} = sqrt(2/3); z = ±1/std, 0
    val z3 = math.rint(1.0 / math.sqrt(2.0 / 3.0) * 1e6) / 1e6
    assert(math.abs(out(1L).getAs[Double]("z_in_group") + z3) < 1e-6)
    assert(out(2L).getAs[Double]("z_in_group") == 0.0)
    assert(math.abs(out(3L).getAs[Double]("z_in_group") - z3) < 1e-6)
    assert(out(1L).getAs[Double]("pct_in_group") == 0.0)
    assert(out(2L).getAs[Double]("pct_in_group") == 0.5)
    assert(out(3L).getAs[Double]("pct_in_group") == 1.0)
    assert(out(4L).isNullAt(out(4L).fieldIndex("z_in_group")))
    assert(out(4L).getAs[Double]("pct_in_group") == 0.0)
  }
}
