package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Golden value tables from FIXTURES.md §A3 (derived from the reference
  * implementations) + ScalaCheck properties (SURVEY.md §5.2 item 3).
  */
class TextFunctionsSpec extends AnyFunSuite with graft.PropertyHarness {

  test("num_to_words golden table (claude_research_optimal.py:37-64)") {
    val golden = Seq(
      0L -> "zero",
      1L -> "one",
      13L -> "thirteen",
      20L -> "twenty",
      21L -> "twentyone",
      100L -> "onehundred",
      101L -> "onehundredone",
      115L -> "onehundredfifteen",
      999L -> "ninehundredninetynine",
      1000L -> "onethousand",
      1001L -> "onethousandone",
      -5L -> "minusfive",
      1000001L -> "onemillionone",
      123456789L -> "onehundredtwentythreemillionfourhundredfiftysixthousandsevenhundredeightynine",
      2000000000L -> "twobillion",
    )
    for ((n, want) <- golden) assert(NumToWords.concat(n) == want, s"n=$n")
  }

  test("num_to_words reference quirk: digits above billions are dropped") {
    // reference loop caps at i < len(units)=4 chunks (CRO:52-58)
    assert(NumToWords.concat(BigInt("1000000000000")) == "")
    assert(NumToWords.concat(BigInt("1000000000001")) == "one")
    assert(NumToWords.concat(BigInt("5234000000000")) == "twohundredthirtyfourbillion")
  }

  test("normalize_word golden table (claude_research_optimal.py:66-80)") {
    assert(TextFunctions.normalizeScala("Don't", false) == Some("dont"))
    assert(TextFunctions.normalizeScala("co-op", false) == Some("coop"))
    assert(TextFunctions.normalizeScala("Hello!", false) == Some("hello"))
    assert(TextFunctions.normalizeScala("''--", false) == None)
    assert(TextFunctions.normalizeScala("", false) == None)
    assert(TextFunctions.normalizeScala("...", false) == None)
    assert(TextFunctions.normalizeScala("123", false) == Some("123"))
    assert(TextFunctions.normalizeScala("123", true) == Some("onehundredtwentythree"))
    assert(TextFunctions.normalizeScala("12a3", true) == Some("12a3"))
    assert(TextFunctions.normalizeScala("ABC-123", true) == Some("abc123"))
  }

  test("phoneme extension golden table (claude_research_optimal.py:557-582)") {
    val golden = Seq(
      "running" -> 60, "sing" -> 60, "hats" -> 50, "buzz" -> 50, "box" -> 50,
      "leaf" -> 50, "love" -> 0, "cat" -> 40, "bad" -> 40, "book" -> 40,
      "cup" -> 40, "sun" -> 40, "ham" -> 40, "bag" -> 40, "church" -> 50,
      "dance" -> 50, "house" -> 50, "breeze" -> 50, "large" -> 50,
      "wash" -> 50, "math" -> 50, "to" -> 0, "a" -> 0, "" -> 0,
      "hello" -> 0, "ing" -> 60,
    )
    for ((w, want) <- golden)
      assert(TextFunctions.phonemeExtensionScala(w) == want, s"word=$w")
  }

  test("adaptive guard golden table (claude_research_optimal.py:374-386)") {
    assert(TextFunctions.adaptiveGuardScala(0.8, 35) == 24)
    assert(TextFunctions.adaptiveGuardScala(0.7, 35) == 35)
    assert(TextFunctions.adaptiveGuardScala(0.5, 35) == 45)
    assert(TextFunctions.adaptiveGuardScala(0.75, 35) == 35)  // boundary: not >
    assert(TextFunctions.adaptiveGuardScala(0.6, 35) == 35)   // boundary: not <
  }

  test("secToMs uses banker's rounding (Python round parity)") {
    assert(TextFunctions.secToMsScala(0.0005) == 0)   // 0.5 -> 0 (even)
    assert(TextFunctions.secToMsScala(0.0015) == 2)   // 1.5 -> 2 (even)
    assert(TextFunctions.secToMsScala(0.0025) == 2)   // 2.5 -> 2 (even)
    assert(TextFunctions.secToMsScala(1.234) == 1234)
    assert(TextFunctions.secToMsScala(185.22) == 185220)
  }

  test("property: normalization is idempotent and stays in [a-z0-9]") {
    forAllSampled(Gen.asciiPrintableStr) { (s: String) =>
      TextFunctions.normalizeScala(s, false).foreach { n =>
        assert(n.nonEmpty)
        assert(n.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')))
        assert(TextFunctions.normalizeScala(n, false) == Some(n))
      }
    }
  }

  test("property: num_to_words is total and non-empty below the quirk cap") {
    forAllSampled(Gen.chooseNum(-999999999999L, 999999999999L)) { (n: Long) =>
      assert(NumToWords.concat(n).nonEmpty)
    }
  }

  test("property: tokenizer output matches the word regex") {
    forAllSampled(Gen.asciiPrintableStr) { (s: String) =>
      for (t <- TextFunctions.tokenizeScala(s))
        assert(t.matches("[A-Za-z0-9'-]+"))
    }
  }
}
