package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 6: X153 percentile gate, X154 Fellegi-Sunter linkage,
  * X155 diversity indices, X156 Bloom store.
  */
class ReliabilityWaveSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  // ---- X153 percentileGate -------------------------------------------

  test("percentileGate keeps exactly ceil(f*n) per group with " +
    "deterministic tie-breaks, including a skewed group") {
    val s = spark
    import s.implicits._
    // g1: 10 rows all score 5 (pure tie -> id order), g2: 3 rows
    val rows = (1L to 10L).map(i => ("g1", i, 5L)) ++
      Seq(("g2", 1L, 9L), ("g2", 2L, 7L), ("g2", 3L, 8L))
    val out = CorpusOps.percentileGate(rows.toDF("g", "id", "score"),
        "g", "score", "id", keepFrac = 0.34)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("id"),
        r.getAs[Long]("group_rank"), r.getAs[Long]("group_size")))
    val g1 = out.filter(_._1 == "g1").sortBy(_._2)
    // ceil(0.34*10) = 4, ties resolved by ascending id
    assert(g1.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(g1.forall(_._4 == 10L))
    val g2 = out.filter(_._1 == "g2")
    // ceil(0.34*3) = 2 -> scores 9 (id 1) and 8 (id 3)
    assert(g2.map(t => t._2 -> t._3).toMap == Map(1L -> 1L, 3L -> 2L))
  }

  // ---- X154 Linkage.score --------------------------------------------

  test("linkage score matches hand-computed log2 weights and bands " +
    "into match/possible/nonmatch") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (1L, 2L, true, true),    // both agree
      (1L, 3L, true, false),   // first only
      (1L, 4L, false, false))  // none
      .toDF("k1", "k2", "f1", "f2")
    val fields = Seq(("f1", 0.9, 0.1), ("f2", 0.8, 0.2))
    val out = Linkage.score(pairs, fields, upper = 4.0, lower = -4.0)
      .collect().map(r => r.getAs[Long]("k2") ->
        (r.getAs[Double]("score"), r.getAs[String]("decision"))).toMap
    val w1a = math.log(0.9 / 0.1) / math.log(2.0)   //  3.169925
    val w1d = math.log(0.1 / 0.9) / math.log(2.0)   // -3.169925
    val w2a = math.log(0.8 / 0.2) / math.log(2.0)   //  2.0
    val w2d = math.log(0.2 / 0.8) / math.log(2.0)   // -2.0
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(2L) == (r6(w1a + w2a), "match"))      //  5.169925
    assert(out(3L) == (r6(w1a + w2d), "possible"))   //  1.169925
    assert(out(4L) == (r6(w1d + w2d), "nonmatch"))   // -5.169925
  }

  test("linkage score rejects empty fields and out-of-range m/u") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, true)).toDF("k", "f")
    intercept[IllegalArgumentException] {
      Linkage.score(df, Seq.empty, 1.0, 0.0)
    }
    intercept[IllegalArgumentException] {
      Linkage.score(df, Seq(("f", 1.0, 0.5)), 1.0, 0.0)
    }
  }

  // ---- X155 diversityIndices -----------------------------------------

  test("diversityIndices: uniform group has evenness 1, single-" +
    "category group has entropy 0 and simpson 1") {
    val s = spark
    import s.implicits._
    val rows = Seq(("u", "a"), ("u", "b"), ("u", "c"), ("u", "d")) ++
      Seq.fill(5)(("m", "only"))
    val out = CorpusOps.diversityIndices(rows.toDF("g", "cat"), "g", "cat")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val u = out("u")
    assert(u.getAs[Long]("n") == 4L)
    assert(u.getAs[Long]("n_categories") == 4L)
    assert(u.getAs[Double]("shannon_bits") == 2.0)
    assert(u.getAs[Double]("simpson") == 0.25)
    assert(u.getAs[Double]("gini_simpson") == 0.75)
    assert(u.getAs[Double]("evenness") == 1.0)
    val m = out("m")
    assert(m.getAs[Double]("shannon_bits") == 0.0)
    assert(m.getAs[Double]("simpson") == 1.0)
    assert(m.getAs[Double]("gini_simpson") == 0.0)
    assert(m.isNullAt(m.fieldIndex("evenness")))
  }

  // ---- X156 BloomStore -----------------------------------------------

  test("bloom store: no false negatives, disjoint probes mostly " +
    "absent, sparse layout bounded") {
    val s = spark
    import s.implicits._
    val in = (1 to 100).map(i => ("k", s"member$i")).toDF("key", "v")
    val store = BloomStore.build(in, "key", "v")
    val words = store.collect()
    assert(words.length <= 128) // 4096 bits / 32-bit words
    assert(words.forall(r => r.getAs[Long]("word_idx") >= 0 &&
      r.getAs[Long]("word_idx") < 128))
    // every inserted value probes true
    val self = BloomStore.mightContain(store, in, "key", "v")
    assert(self.filter(!col("might_contain")).count() == 0)
    // disjoint values probe overwhelmingly false (fp rate ~(k*n/m)^k)
    val other = (1 to 100).map(i => ("k", s"stranger$i")).toDF("key", "v")
    val fp = BloomStore.mightContain(store, other, "key", "v")
      .filter(col("might_contain")).count()
    assert(fp <= 5, s"implausible false-positive count $fp/100")
  }

  test("bloom store merge law: OR of part filters equals the filter " +
    "of the union") {
    val s = spark
    import s.implicits._
    val partA = (1 to 40).map(i => ("sh0", s"v$i")).toDF("key", "v")
    val partB = (30 to 70).map(i => ("sh1", s"v$i")).toDF("key", "v")
    val whole = partA.unionAll(partB).withColumn("key", lit("all"))
    val merged = BloomStore.merge(
      BloomStore.build(partA, "key", "v")
        .unionAll(BloomStore.build(partB, "key", "v")), lit("all"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "word_idx", "bits").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(canon(merged) == canon(BloomStore.build(whole, "key", "v")))
  }

  test("bloom store rejects bad geometry") {
    val s = spark
    import s.implicits._
    val df = Seq(("k", "v")).toDF("key", "v")
    intercept[IllegalArgumentException] {
      BloomStore.build(df, "key", "v", bits = 100)
    }
    intercept[IllegalArgumentException] {
      BloomStore.build(df, "key", "v", hashes = 0)
    }
  }
}
