package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / sensitive-pattern redaction — the text-scrubbing stage every
  * training-data pipeline runs before export. Pure `regexp_replace`
  * Column chains (codegen'd, scan-stage — no shuffle, no UDF), with
  * per-pattern hit counts so the pipeline can report redaction volume
  * without a second pass.
  *
  * Patterns are deliberately conservative/simple (emails, E.164-ish
  * phone runs, 13–19-digit card-like runs, IPv4): redaction recall vs
  * precision is a policy decision, and the operator takes the pattern
  * list as data, not as code.
  */
object Redact {

  /** (name, regex, replacement) applied in order. Order matters: the
    * specific patterns run before the greedy phone digit-run — a
    * 16-digit card or a dotted IPv4 would otherwise be half-eaten by
    * the phone pattern first.
    */
  val DefaultPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", "\\b\\d{13,19}\\b", "<CARD>"),
    ("ipv4", "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>"),
    ("phone", "\\+?\\d[\\d() .-]{6,}\\d", "<PHONE>"))

  /** Redacted text: every pattern replaced, in declaration order. */
  def redact(text: Column,
      patterns: Seq[(String, String, String)] = DefaultPatterns): Column =
    patterns.foldLeft(text) { case (c, (_, re, repl)) =>
      regexp_replace(c, re, repl)
    }

  /** Per-pattern hit count BEFORE redaction (counts overlap-free
    * left-to-right matches, same as the replacement pass sees them
    * when applied to the original text — callers wanting sequential
    * semantics should count on the progressively redacted text).
    */
  def hitCounts(text: Column,
      patterns: Seq[(String, String, String)] = DefaultPatterns)
      : Seq[(String, Column)] =
    patterns.map { case (name, re, _) =>
      name -> size(regexp_extract_all(text, lit(re), lit(0)))
    }
}
