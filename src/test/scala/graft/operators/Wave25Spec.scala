package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 25: X276 Jaro-Winkler linkage, X277 soundex blocking,
  * X278 Unicode script profile, X279 sequential-pattern support.
  */
class Wave25Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("jaro/jaroWinkler: textbook goldens, the DuckDB edge cases " +
    "(floored transpositions, both-empty = 0, 0.7 boost threshold, " +
    "prefix cap 4)") {
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    // classic pairs (values = DuckDB jaro_winkler_similarity output)
    assert(close(Linkage.jaroWinkler("martha", "marhta"),
      0.9611111111111111))
    assert(close(Linkage.jaroWinkler("DWAYNE", "DUANE"), 0.84))
    assert(close(Linkage.jaro("abcd", "badc"), 0.8333333333333334))
    // floored transposition halving: 3 mismatched positions -> t=1,
    // not 1.5 — the rapidfuzz/DuckDB divergence from the textbook
    assert(close(Linkage.jaro("old anvil", "small rod"),
      0.4444444444444444))
    // boost only above jaro 0.7; prefix capped at 4
    assert(close(Linkage.jaroWinkler("abcdefgh", "abzzzzzz"), 0.5))
    assert(close(Linkage.jaroWinkler("prefixaa", "prefixzz"), 0.9))
    // empties: DuckDB order — any empty side is 0, both empty too
    assert(Linkage.jaroWinkler("", "") == 0.0)
    assert(Linkage.jaroWinkler("", "abc") == 0.0)
    assert(Linkage.jaroWinkler("abc", "abc") == 1.0)
    // window 0 at short lengths: only same-position chars match
    assert(Linkage.jaro("ab", "ba") == 0.0)
    assert(close(Linkage.jaro("abc", "cba"), 0.5555555555555555))
  }

  test("soundexCode: the NARA/commons-codec golden set, including " +
    "the H/W merge, vowel separation, and uncoded-first-letter slots") {
    val s = spark
    import s.implicits._
    val expected = Map(
      "ROBERT" -> "R163", "RUPERT" -> "R163",
      "ASHCRAFT" -> "A261", "ASHCROFT" -> "A261", // S,C merge via H
      "TYMCZAK" -> "T522", // vowel keeps the second 2
      "PFISTER" -> "P236", // P,F collapse into the dropped first slot
      "HONEYMAN" -> "H555", "AUBREY" -> "A160",
      "HANS" -> "H520", // first-letter H has no code slot to drop
      "A" -> "A000", "WU" -> "W000", "LLOYD" -> "L300",
      "GAUSS" -> "G200", "GHOSH" -> "G200",
      "HEILBRONN" -> "H416", "LUKASIEWICZ" -> "L222")
    val got = expected.keys.toSeq.toDF("w")
      .select($"w", Linkage.soundexCode($"w").as("code"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    expected.foreach { case (w, code) =>
      assert(got(w) == code, s"$w: got ${got(w)}, want $code")
    }
  }

  test("nameMatchPairs: near-dup names pair with their multiplicity; " +
    "different-first-letter names never meet; threshold filters") {
    val s = spark
    import s.implicits._
    val df = Seq("red widget", "red widgett", "red widget",
      "blue anvil", "rad widget", "xylophone").toDF("name")
    val r = Linkage.nameMatchPairs(df, "name", minSim = 0.8)
      .collect()
      .map(x => (x.getAs[String]("name_a"), x.getAs[String]("name_b"))
        -> x).toMap
    // the typo pair scores high and carries row counts (2 exact dups)
    val main = r(("red widget", "red widgett"))
    assert(main.getAs[Long]("rows_a") == 2L)
    assert(main.getAs[Long]("rows_b") == 1L)
    assert(main.getAs[Double]("sim") > 0.98)
    // 'rad widget' ~ 'red widget' share the 'r' block and pass 0.8
    assert(r.contains(("rad widget", "red widget")))
    // 'blue anvil' is alone in the 'b' block: no pair at all
    assert(!r.keys.exists(k => k._1.startsWith("b") ||
      k._2.startsWith("b")))
    // canonical order: name_a < name_b always
    r.keys.foreach { case (a, b) => assert(a < b) }
  }

  test("soundexBlocks: homophones share a block, the pair count is " +
    "c(c-1)/2, members are a sorted CSV, input rows dedup first") {
    val s = spark
    import s.implicits._
    val words = Seq("robert", "rupert", "rupert", "ashcraft",
      "ashcroft", "tymczak").toDF("w")
    val r = Linkage.soundexBlocks(words, "w")
      .collect().map(x => x.getAs[String]("code") -> x).toMap
    assert(r("R163").getAs[Long]("n_words") == 2L)
    assert(r("R163").getAs[Long]("n_pairs") == 1L)
    assert(r("R163").getAs[String]("members") == "robert,rupert")
    assert(r("A261").getAs[Long]("n_words") == 2L)
    assert(r("T522").getAs[Long]("n_pairs") == 0L)
  }

  test("scriptProfile: mixed-script rows split exactly; shares sum " +
    "to 1; pure-ASCII text books zero cyrillic/han") {
    val s = spark
    import s.implicits._
    // 'привет' = 6 cyrillic; '你好' = 2 han; 'ab 12!' = 2 latin,
    // 1 space, 2 digits, 1 punct
    val df = Seq(("ru", "привет"), ("zh", "你好"), ("en", "ab 12!"))
      .toDF("lang", "text")
    val r = CorpusOps.scriptProfile(df, "text", "lang")
      .collect().map(x => x.getAs[String]("lang") -> x).toMap
    assert(r("ru").getAs[Long]("n_chars") == 6L)
    assert(r("ru").getAs[Double]("cyrillic_share") == 1.0)
    assert(r("ru").getAs[Double]("latin_share") == 0.0)
    assert(r("zh").getAs[Double]("han_share") == 1.0)
    val en = r("en")
    assert(en.getAs[Long]("n_chars") == 6L)
    assert(en.getAs[Double]("latin_share") == math.round(2.0 / 6 * 1e6) / 1e6)
    assert(en.getAs[Double]("digit_share") == math.round(2.0 / 6 * 1e6) / 1e6)
    assert(en.getAs[Double]("punct_share") == math.round(1.0 / 6 * 1e6) / 1e6)
    assert(en.getAs[Double]("other_share") == 0.0)
  }

  test("sequencePairs: a-then-b needs a STRICTLY earlier a; support " +
    "divides by ALL keys; both directions can hold at once") {
    val s = spark
    import s.implicits._
    def ts(sec: Int) = new Timestamp(sec * 1000L)
    // u1: a@1 b@2 (a->b); u2: b@1 a@2 (b->a); u3: a@5 only;
    // u4: a@3 b@3 equal ts -> neither direction
    val ev = Seq((1L, "a", ts(1)), (1L, "b", ts(2)),
      (2L, "b", ts(1)), (2L, "a", ts(2)),
      (3L, "a", ts(5)),
      (4L, "a", ts(3)), (4L, "b", ts(3))).toDF("uid", "typ", "ts")
    val r = Funnel.sequencePairs(ev, "uid", "ts", "typ")
      .collect()
      .map(x => (x.getAs[String]("type_first"),
        x.getAs[String]("type_then")) -> x).toMap
    assert(r(("a", "b")).getAs[Long]("n_keys") == 1L)
    assert(r(("b", "a")).getAs[Long]("n_keys") == 1L)
    assert(r(("a", "b")).getAs[Double]("support") == 0.25)
    // u1 both ways? a@1 < b@2 yes; b's first (2) < a's last (1)? no —
    // exactly one direction each for u1/u2, none for u3/u4
    assert(r.size == 2)
  }
}
