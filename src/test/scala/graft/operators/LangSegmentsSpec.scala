package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 11: X162 language segmentation, X163 robust scaling. */
class LangSegmentsSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private val langs = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "nicht", "ist"),
    "fr" -> Seq("le", "et", "est", "une"))

  test("langSegments merges adjacent same-language runs and breaks " +
    "ties toward the first declared language") {
    val s = spark
    import s.implicits._
    val lines = Seq(
      (1L, 0L, "the cat and the dog"),     // en
      (1L, 1L, "of the and is"),           // en (same run)
      (1L, 2L, "der hund und nicht"),      // de
      (1L, 3L, "le chat et une"),          // fr
      (1L, 4L, "nope nothing scores"),     // all-zero tie -> en
      (2L, 0L, "und der nicht"))           // single-segment doc
      .toDF("doc_id", "line_idx", "line")
    val out = CorpusOps.langSegments(lines, "doc_id", "line_idx",
        "line", langs)
      .orderBy("doc_id", "segment_idx")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("segment_idx"), r.getAs[String]("lang_pred"),
        r.getAs[Long]("start_line"), r.getAs[Long]("end_line"),
        r.getAs[Long]("n_lines")))
    assert(out.toSeq == Seq(
      (1L, 1L, "en", 0L, 1L, 2L),
      (1L, 2L, "de", 2L, 2L, 1L),
      (1L, 3L, "fr", 3L, 3L, 1L),
      (1L, 4L, "en", 4L, 4L, 1L), // zero-score tie -> first lang
      (2L, 1L, "de", 0L, 0L, 1L)))
  }

  test("langSegments: 'ist' appearing in both en-absent lists keeps " +
    "declaration-order tie-break (de before fr when equal)") {
    val s = spark
    import s.implicits._
    // 'ist' + 'est' -> de=1, fr=1, en=0: tie between de and fr -> de
    val lines = Seq((9L, 0L, "ist est")).toDF("doc_id", "line_idx",
      "line")
    val out = CorpusOps.langSegments(lines, "doc_id", "line_idx",
      "line", langs).collect()
    assert(out.head.getAs[String]("lang_pred") == "de")
  }

  test("robustScale: hand-computed median/IQR per group, degenerate " +
    "IQR -> NULL z") {
    val s = spark
    import s.implicits._
    // g1 values 1..8: med=ceil(.5*8)=4th smallest=4, q1=2nd=2,
    // q3=6th=6 -> iqr 4; x=8 -> z=(8-4)/4=1.0
    val rows = (1L to 8L).map(v => ("g1", v, v)) ++
      Seq(("g2", 100L, 5L), ("g2", 101L, 5L), ("g2", 102L, 5L))
    val out = CorpusOps.robustScale(
        rows.toDF("g", "id", "v"), "g", "v")
      .collect().map(r => (r.getAs[Long]("id")) -> r).toMap
    assert(out(8L).getAs[Long]("median") == 4L)
    assert(out(8L).getAs[Long]("iqr") == 4L)
    assert(out(8L).getAs[Double]("robust_z") == 1.0)
    assert(out(1L).getAs[Double]("robust_z") == -0.75)
    // constant group: iqr 0 -> NULL
    assert(out(100L).getAs[Long]("iqr") == 0L)
    assert(out(100L).isNullAt(out(100L).fieldIndex("robust_z")))
  }
}
