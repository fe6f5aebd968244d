package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Dedup operator verification (SURVEY.md §2.10 X1): shingling
  * semantics on literal data, MinHash+LSH and SimHash recall against
  * exact shingle-Jaccard ground truth on the sf0.001 driver table.
  * Everything here is deterministic (xxhash64 + fixed data) — these
  * are exact assertions, not statistical ones.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  private val dir = "/root/testdata/sf0.001"

  import Dedup._

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private lazy val shingled = {
    val s = spark
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", shingles(tokens($"text"), 3).as("shingles"))
      .cache()
  }

  private lazy val exactPairs: Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    jaccardPairsNaive(shingled, "doc_id").filter($"jaccard" >= 0.5)
      .select($"d1", $"d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("shingles: sequence 3-grams, distinct, separator-joined") {
    val s = spark
    import s.implicits._
    val out = df(Seq((1L, "a b c d"), (2L, "a b"), (3L, "x x x x x")))
      .select($"doc_id", shingles(tokens($"text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq(s"a${Sep}b${Sep}c", s"b${Sep}c${Sep}d"))
    assert(out(2L) == Seq.empty) // shorter than k
    assert(out(3L) == Seq(s"x${Sep}x${Sep}x")) // distinct collapses repeats
  }

  test("jaccardPairsNaive: identical docs -> 1.0, disjoint docs absent") {
    val s = spark
    import s.implicits._
    val docs = df(Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s t")))
      .select($"doc_id", shingles(tokens($"text"), 3).as("shingles"))
    val got = jaccardPairsNaive(docs, "doc_id").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == Map((1L, 2L) -> 1.0))
  }

  test("planted near-dups exist in driver data (sanity of ground truth)") {
    assert(exactPairs.nonEmpty)
  }

  test("prefix-filtered exact join == naive join at threshold 0.5") {
    val s = spark
    import s.implicits._
    val fast = jaccardPairsExact(shingled, "doc_id", 0.5)
      .select($"d1", $"d2", round($"jaccard", 9).as("j")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val slow = jaccardPairsNaive(shingled, "doc_id")
      .filter($"jaccard" >= 0.5)
      .select($"d1", $"d2", round($"jaccard", 9).as("j")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(fast == slow)
  }

  test("containmentPairs: embedded doc found where Jaccard misses it; " +
      "matches the naive ground truth") {
    val s = spark
    import s.implicits._
    // doc 1 quoted whole inside the much longer doc 2: containment
    // 1.0, Jaccard small
    val host = "a b c d e " + (0 until 40).map(i => s"w$i").mkString(" ")
    val docs = df(Seq((1L, "a b c d e"), (2L, host), (3L, "p q r s t")))
      .select($"doc_id", shingles(tokens($"text"), 3).as("shingles"))
    val got = containmentPairs(docs, "doc_id", 0.9).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == Map((1L, 2L) -> 1.0), got.toString)
    assert(jaccardPairsNaive(docs, "doc_id")
      .filter($"jaccard" >= 0.5).count() == 0) // Jaccard blind to it
    // ground-truth equality on the driver corpus: prefix-filtered ==
    // naive containment at the contract threshold
    val fast = containmentPairs(shingled, "doc_id", 0.5)
      .select($"d1", $"d2", round($"containment", 9).as("c")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val slow = {
      val sets = shingled.select($"doc_id".as("d"), $"shingles")
      sets.as("a").join(sets.as("b"), $"a.d" < $"b.d")
        .select($"a.d".as("d1"), $"b.d".as("d2"),
          (size(array_intersect($"a.shingles", $"b.shingles"))
            .cast("double") /
            least(size($"a.shingles"), size($"b.shingles"))).as("c"))
        .filter($"c" >= 0.5)
        .select($"d1", $"d2", round($"c", 9).as("c")).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    }
    assert(fast == slow)
  }

  test("containmentPairs == naive on random corpora (prefix-filter " +
      "completeness property)") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    // small vocab forces heavy shingle sharing — the adversarial
    // regime for a prefix filter
    val docGen = Gen.listOfN(12,
      Gen.chooseNum(0, 7).map(i => s"t$i")).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(14, docGen)
    new graft.PropertyHarness {}.forAllSampled(corpusGen, n = 12) { texts =>
      val docs = df(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
        .select($"doc_id", shingles(tokens($"text"), 3).as("shingles"))
      for (t <- Seq(0.4, 0.7)) {
        val fast = containmentPairs(docs, "doc_id", t)
          .select($"d1", $"d2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val sets = docs.select($"doc_id".as("d"), $"shingles")
        val slow = sets.as("a").join(sets.as("b"), $"a.d" < $"b.d")
          .select($"a.d", $"b.d",
            (size(array_intersect($"a.shingles", $"b.shingles"))
              .cast("double") /
              least(size($"a.shingles"), size($"b.shingles"))).as("c"))
          .filter($"c" >= t)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(fast == slow, s"t=$t corpus=$texts")
      }
    }
  }

  test("MinHash+LSH finds every exact near-dup pair (deterministic)") {
    val s = spark
    import s.implicits._
    val exploded = shingled.select($"doc_id", explode($"shingles").as("g"))
    val sigs = minhashSignature(exploded, "doc_id", "g", 64)
    val cand = candidatePairs(bandBuckets(sigs, "doc_id", 16, 4), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exactPairs -- cand
    assert(missed.isEmpty, s"LSH missed planted pairs: $missed")
  }

  test("SimHash recall >= 0.9 vs exact Jaccard, no false positives") {
    val s = spark
    import s.implicits._
    val exploded = shingled.select($"doc_id", explode($"shingles").as("g"))
    val sigs = simhash(exploded, "doc_id", "g")
    val got = simhashPairs(sigs, "doc_id", maxHamming = 7)
      .select($"d1", $"d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // SimHash approximates cosine over shingle vectors, not Jaccard —
    // a planted pair can land just past the radius; require >=0.9.
    val recall = (exactPairs & got).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall $recall; missed ${exactPairs -- got}")
    assert((got -- exactPairs).isEmpty,
      s"simhash false positives: ${got -- exactPairs}")
  }

  test("SimHash recall with md5Hash64 (oracle-portable hash choice)") {
    val s = spark
    import s.implicits._
    // same assertion as the xxhash64 case above: the signature math is
    // hash-agnostic, so the engine-portable md5 hash used by
    // q_dedup_simhash must deliver the same recall/precision contract
    val exploded = shingled.select($"doc_id", explode($"shingles").as("g"))
    val sigs = simhashWith(exploded, "doc_id", md5Hash64($"g"))
    val got = simhashPairs(sigs, "doc_id", maxHamming = 7)
      .select($"d1", $"d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactPairs & got).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall $recall; missed ${exactPairs -- got}")
    assert((got -- exactPairs).isEmpty,
      s"md5 simhash false positives: ${got -- exactPairs}")
  }

  test("incrementalNearDupes: asymmetric — new×corpus only") {
    val s = spark
    import s.implicits._
    val mk = (rows: Seq[(Long, String)]) => df(rows)
      .select($"doc_id", shingles(tokens($"text"), 3).as("shingles"))
    // two identical NEW docs (1, 3) and their corpus twin (2) plus an
    // unrelated corpus doc (4)
    val newDocs = mk(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (5L, "completely different content with no overlap at all here")))
    val corpus = mk(Seq(
      (2L, "the quick brown fox jumps over the lazy dog"),
      (4L, "unrelated corpus document about other things entirely now")))
    val got = incrementalNearDupes(newDocs, corpus, "doc_id",
        numHashes = 64, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select($"d1", $"d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // both new duplicates pair with the corpus twin; the new-new
    // identical pair (1,3) must NOT appear, nor corpus-corpus
    assert(got == Set((1L, 2L), (3L, 2L)), got.toString)
  }

  test("simhash: identical shingle sets -> identical signature") {
    val s = spark
    import s.implicits._
    val exploded = df(Seq((1L, "a b c d e f"), (2L, "a b c d e f")))
      .select($"doc_id", explode(shingles(tokens($"text"), 3)).as("g"))
    val sigs = simhash(exploded, "doc_id", "g").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
  }
}
