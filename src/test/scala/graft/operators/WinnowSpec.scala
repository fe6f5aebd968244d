package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 2: X188 winnowing fingerprints. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private val k = 5
  private val w = 4

  test("winnowing guarantee: docs sharing a substring of length >= " +
    "w+k-1 share at least one fingerprint hash") {
    val s = spark
    import s.implicits._
    // 'commonsharedrun' (15 chars) embedded in both docs amid
    // different surroundings
    val docs = Seq(
      (1L, "xxxyyy commonsharedrun zzzwww"),
      (2L, "abcdef commonsharedrun ghijkl")).toDF("id", "t")
    val fp = Winnow.fingerprintRows(docs, "id", "t", k, w)
    val h1 = fp.filter($"id" === 1L).select("h").collect()
      .map(_.getLong(0)).toSet
    val h2 = fp.filter($"id" === 2L).select("h").collect()
      .map(_.getLong(0)).toSet
    assert((h1 & h2).nonEmpty,
      s"no shared fingerprint between docs sharing a 15-char run")
    // unrelated docs share nothing
    val other = Winnow.fingerprintRows(
      Seq((3L, "qqqqrrrrsssstttt"), (4L, "0123456789012345"))
        .toDF("id", "t"), "id", "t", k, w)
    val h3 = other.filter($"id" === 3L).select("h").collect()
      .map(_.getLong(0)).toSet
    val h4 = other.filter($"id" === 4L).select("h").collect()
      .map(_.getLong(0)).toSet
    assert((h3 & h4).isEmpty)
  }

  test("selection density: every window of w k-grams contributes a " +
    "selection, so n_fp >= ceil(windows/w); digest is " +
    "normalization-stable and deterministic") {
    val s = spark
    import s.implicits._
    val text = "the quick brown fox jumps over the lazy dog " +
      "pack my box with five dozen liquor jugs"
    val docs = Seq((1L, text), (2L, text),
      (3L, "The, QUICK... brown fox jumps over the lazy dog " +
        "pack my box with five dozen liquor jugs!!")).toDF("id", "t")
    val fp = Winnow.fingerprints(docs, "id", "t", k, w).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_fp"), r.getAs[String]("fp_md5"))).toMap
    val norm = text.toLowerCase.replaceAll("[^a-z0-9]", "")
    val windows = norm.length - k + 1 - (w - 1)
    assert(fp(1L)._1 >= (windows + w - 1) / w,
      s"${fp(1L)._1} selections below the density floor")
    assert(fp(1L) == fp(2L), "identical docs must digest identically")
    // punctuation/case differences vanish under normalization
    assert(fp(1L)._2 == fp(3L)._2)
  }

  test("short docs (under k+w-1 normalized chars) emit no rows") {
    val s = spark
    import s.implicits._
    val fp = Winnow.fingerprints(
      Seq((1L, "abc"), (2L, "a b c d!")).toDF("id", "t"), "id", "t",
      k, w)
    assert(fp.count() == 0L)
  }
}
