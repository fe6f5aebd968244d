package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer → English words, replicating the reference's `_num_to_words`
  * (claude_research_optimal.py:37–64) exactly, including its quirks:
  *
  *   - words are concatenated WITHOUT separators by the caller
  *     (normalize_word joins with "", claude_research_optimal.py:77)
  *   - units stop at "billion"; the chunk loop exits after four chunks
  *     (`i < len(units)`), so digits above 10^12−1 are silently DROPPED
  *     (reference quirk, preserved for parity)
  *   - negatives are prefixed with "minus"
  */
object NumToWords {
  private val Smalls = Array(
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen")
  private val Tens = Array(
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety")
  private val Units = Array("", "thousand", "million", "billion")

  private def belowThousand(x0: Int): List[String] = {
    var x = x0
    val out = scala.collection.mutable.ListBuffer.empty[String]
    if (x >= 100) { out += Smalls(x / 100); out += "hundred"; x %= 100 }
    if (x >= 20) {
      out += Tens(x / 10); x %= 10
      if (x > 0) out += Smalls(x)
    } else if (x > 0) out += Smalls(x)
    out.toList
  }

  /** Word list for n; BigInt so arbitrarily long digit strings behave like
    * Python's unbounded int (high chunks are dropped per the quirk anyway).
    */
  def words(n: BigInt): List[String] = {
    if (n == 0) return List("zero")
    var words = List.empty[String]
    var nAbs = n.abs
    var i = 0
    while (nAbs > 0 && i < Units.length) {
      val chunk = (nAbs % 1000).toInt
      if (chunk != 0) {
        val seg = belowThousand(chunk) ++
          (if (Units(i).nonEmpty) List(Units(i)) else Nil)
        words = seg ++ words
      }
      nAbs /= 1000
      i += 1
    }
    if (n < 0) "minus" :: words else words
  }

  def words(n: Long): List[String] = words(BigInt(n))

  /** Concatenated form as used by normalize_word: "".join(words). */
  def concat(n: BigInt): String = words(n).mkString("")
  def concat(n: Long): String = concat(BigInt(n))

  /** Unambiguous entry point for generated Java code
    * (NumToWordsExpression.doGenCode calls this via the static
    * forwarder class).
    */
  def javaConcat(n: Long): String = concat(BigInt(n))
}

/** Scalar text kernels of the reference pipeline, exposed both as pure
  * Scala (for `Dataset` kernels and tests) and as codegen-friendly
  * `Column` expressions built from `org.apache.spark.sql.functions._`
  * (preferred on hot paths — no UDF serialization, full Catalyst
  * optimization).
  */
object TextFunctions {

  /** Reference `_WORD_RE` (claude_research_optimal.py:30). */
  val WordRegex = "[A-Za-z0-9'-]+"

  // ---------------------------------------------------------------- pure

  /** `tokenize_text_to_words` (claude_research_optimal.py:82–83). */
  def tokenizeScala(text: String): Seq[String] =
    if (text == null) Seq.empty
    else WordRegex.r.findAllIn(text).toSeq

  /** `normalize_word` (claude_research_optimal.py:66–80): strip+lower,
    * keep [a-z0-9'-], drop ' and -, empty → None, optional digits→words.
    */
  def normalizeScala(s: String, numbersToWords: Boolean): Option[String] = {
    if (s == null || s.isEmpty) return None
    var t = s.trim.toLowerCase
    t = t.replaceAll("[^a-z0-9'\\-]", "")
    t = t.replace("'", "").replace("-", "")
    if (t.isEmpty) None
    else if (numbersToWords && t.forall(c => c >= '0' && c <= '9'))
      Some(NumToWords.concat(BigInt(t)))
    else Some(t)
  }

  /** `compute_adaptive_guard` (claude_research_optimal.py:374–386).
    * Python `int()` truncates toward zero; guards are non-negative so
    * floor ≡ trunc here.
    */
  def adaptiveGuardScala(confidence: Double, baseGuard: Int): Int =
    if (confidence > 0.75) (baseGuard * 0.7).toInt
    else if (confidence < 0.6) (baseGuard * 1.3).toInt
    else baseGuard

  /** Phoneme-aware tail extension (claude_research_optimal.py:557–582),
    * LIVE branches only. The reference's `elif last3 in ('dge','tch')`
    * at CRO:576–577 is unreachable: it sits behind
    * `elif len(word) >= 2` which is always true once `len >= 3`
    * (documented parity decision, SURVEY.md §7.4).
    */
  def phonemeExtensionScala(word0: String): Int = {
    if (word0 == null) return 0
    val word = word0.toLowerCase
    if (word.length < 3) return 0
    val last1 = word.last
    if (word.endsWith("ing")) 60
    else if ("szxfv".indexOf(last1.toInt) >= 0) 50
    else if ("tdkpnmg".indexOf(last1.toInt) >= 0) 40
    else {
      val last2 = word.substring(word.length - 2)
      if (Set("ce", "se", "ze", "ge", "ch", "sh", "th", "ng")(last2)) 50
      else 0
    }
  }

  /** `int(round(x*1000))` — Python 3 banker's rounding
    * (claude_research_optimal.py:318, 527–528, …).
    */
  def secToMsScala(seconds: Double): Long =
    BigDecimal(seconds * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLong

  // -------------------------------------------------------------- column

  /** P1: text → array of raw word tokens (codegen'd generator input). */
  def tokenizeCol(text: Column): Column =
    regexp_extract_all(text, lit(WordRegex), lit(0))

  /** P2 (sans digit branch): SQL-expressible normalization — the exact
    * chain of `normalize_word` minus numbers_to_words. NULL when empty.
    */
  def normalizeCol(token: Column): Column = {
    val cleaned =
      translate(regexp_replace(lower(trim(token)), "[^a-z0-9'\\-]", ""), "'-", "")
    when(cleaned === "", lit(null)).otherwise(cleaned)
  }

  /** P4: confidence-adaptive guard as a `when` chain (codegen'd).
    * `floor` matches Python `int()` for the non-negative guards used.
    */
  def adaptiveGuardCol(confidence: Column, baseGuard: Column): Column =
    when(confidence > 0.75, floor(baseGuard * 0.7).cast("long"))
      .when(confidence < 0.6, floor(baseGuard * 1.3).cast("long"))
      .otherwise(baseGuard.cast("long"))

  /** P5: phoneme-aware tail extension, live branches in reference order. */
  def phonemeExtensionCol(word0: Column): Column = {
    val word = lower(word0)
    val len = length(word)
    val last1 = substring(word, -1, 1)
    val last2 = substring(word, -2, 2)
    val last3 = substring(word, -3, 3)
    when(word.isNull || len < 3, lit(0L))
      .when(last3 === "ing", lit(60L))
      .when(last1.isin("s", "z", "x", "f", "v"), lit(50L))
      .when(last1.isin("t", "d", "k", "p", "n", "m", "g"), lit(40L))
      .when(last2.isin("ce", "se", "ze", "ge", "ch", "sh", "th", "ng"), lit(50L))
      .otherwise(lit(0L))
  }

  /** P6: float seconds → int millis with HALF_EVEN (Python round parity). */
  def secToMsCol(seconds: Column): Column =
    bround(seconds * 1000, 0).cast("long")

  /** P10: 2-of-3 boolean majority vote (claude_research_optimal.py:225–226). */
  def majorityVoteCol(b1: Column, b2: Column, b3: Column): Column =
    (b1.cast("int") + b2.cast("int") + b3.cast("int")) >= 2
}
