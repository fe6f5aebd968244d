package graft.core

/** Typed core data model — Spark-encodable case classes mirroring the
  * reference's dataclasses (SURVEY.md §1.1), extended with `doc_id`
  * so every stream is partitionable by document: the unit of
  * parallelism for the whole pipeline at cluster scale.
  */

/** One recognized ASR word (dataclass ASRWord,
  * claude_research_optimal.py:95–102). Times are float seconds.
  */
final case class AsrWord(
    doc_id: Long,
    idx: Long,
    text: String,
    norm: String,
    start: Double,
    end: Double,
    confidence: Double)

/** One normalized reference-transcript token
  * (book_norm, claude_research_optimal.py:434–438).
  */
final case class BookWord(
    doc_id: Long,
    pos: Long,
    token: String,
    norm: String)

/** One validator-retranscription word (dataclass VWord,
  * claude_research_optimal.py:109–110); times are clip-relative.
  */
final case class VWord(
    doc_id: Long,
    group_id: Long,
    vidx: Long,
    text: String,
    norm: String,
    start: Double,
    end: Double,
    confidence: Double)

/** One equal-alignment run: half-open index intervals into the book
  * and ASR word streams (dataclass EqualRun,
  * claude_research_optimal.py:105–106).
  */
final case class EqualRun(
    doc_id: Long,
    bi0: Long,
    bi1: Long,
    ai0: Long,
    ai1: Long)

/** EqualRun enriched with boundary times and a session/group id from
  * the gap-bridging merge (claude_research_optimal.py:291–305).
  */
final case class GroupedRun(
    doc_id: Long,
    group_id: Long,
    bi0: Long,
    bi1: Long,
    ai0: Long,
    ai1: Long,
    start_time: Double,
    end_time: Double)
