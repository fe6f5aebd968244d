package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.CorpusOps
import org.apache.spark.sql.functions.col

/** Streaming parity for the scan-stage corpus filters: gopherRules
  * and temperatureMix are pure functions of a batch (per-row
  * predicates; temperatureMix additionally of the batch's own stratum
  * counts), so running them per micro-batch under foreachBatch (the
  * X42 pattern) must reproduce the batch operator applied to the same
  * rows — no cross-batch state, nothing to drift.
  */
class StreamingCorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("gopherRules under foreachBatch == batch form per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def rules(df: DataFrame): DataFrame =
      CorpusOps.gopherRules(df, "doc_id", "text",
        minWords = 3, minMeanWordLen = 1.0, maxMeanWordLen = 12.0,
        minStopwordHits = 1)
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, Set[String]]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = canon(rules(batch))
        got.synchronized { got(batchId) = out }
        ()
      }.start()
    val b0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "### ... ### ... symbols everywhere in this one ..."),
      (3L, "a b"))
    val b1 = Seq(
      (4L, "another perfectly ordinary document with the usual words"),
      (5L, "zz"))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    assert(got(0L) == canon(rules(b0.toDF("doc_id", "text"))))
    assert(got(1L) == canon(rules(b1.toDF("doc_id", "text"))))
    // the rules discriminate inside a batch: doc 1 passes, doc 2
    // trips the symbol ratio (6 '#' + 4 '...' over 10 words), doc 3
    // the word-count floor
    val keeps = rules(b0.toDF("doc_id", "text"))
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keeps == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("temperatureMix under foreachBatch == batch form per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def mix(df: DataFrame): DataFrame =
      CorpusOps.temperatureMix(df, "doc_id", "source",
        alpha = 0.5, targetFraction = 0.6, salt = "parity")
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, Set[String]]()
    val q = mem.toDF().toDF("doc_id", "source").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = canon(mix(batch))
        got.synchronized { got(batchId) = out }
        ()
      }.start()
    // skewed strata: "web" dominates, "tail" is tiny (its α=0.5 rate
    // caps at 1.0 and every tail row must survive)
    val b0 = (0L until 40L).map(i => (i, "web")) ++
      Seq((100L, "tail"), (101L, "tail"))
    val b1 = (200L until 230L).map(i => (i, "web")) ++
      Seq((300L, "tail"))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    assert(got(0L) == canon(mix(b0.toDF("doc_id", "source"))))
    assert(got(1L) == canon(mix(b1.toDF("doc_id", "source"))))
    // capped tail stratum: rate 1.0, all rows kept, in both batches
    val tailRows = got(0L).filter(_.contains("tail"))
    assert(tailRows.size == 2 && tailRows.forall(_.contains("1.0")))
    assert(got(1L).count(_.contains("tail")) == 1)
  }

  test("spanCorruption under foreachBatch == batch form (and is " +
      "content-stable across batch splits)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def corrupt(df: DataFrame): DataFrame =
      CorpusOps.spanCorruption(df, "doc_id", "text",
        blockSize = 5, spanLen = 2, salt = "st")
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, Set[String]]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = canon(corrupt(batch))
        got.synchronized { got(batchId) = out }
        ()
      }.start()
    val b0 = Seq((1L, (0 until 12).map(i => s"a$i").mkString(" ")),
      (2L, "b0 b1 b2"))
    val b1 = Seq((3L, (0 until 7).map(i => s"c$i").mkString(" ")))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    assert(got(0L) == canon(corrupt(b0.toDF("doc_id", "text"))))
    assert(got(1L) == canon(corrupt(b1.toDF("doc_id", "text"))))
    // content stability: the md5 placement depends only on (doc,
    // block), so a doc's corruption is identical no matter which
    // batch (or corpus) it arrives in
    val all = canon(corrupt((b0 ++ b1).toDF("doc_id", "text")))
    assert(got(0L) ++ got(1L) == all)
  }

  test("cdcChunks under foreachBatch == batch form except corpus-wide " +
      "copy counts (per-doc cuts are content-stable)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def chunks(df: DataFrame): DataFrame =
      CorpusOps.cdcChunks(df, "doc_id", "text")
        .drop("n_copies") // corpus-wide by definition; batch-scoped here
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, Set[String]]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = canon(chunks(batch))
        got.synchronized { got(batchId) = out }
        ()
      }.start()
    def pseudo(seed: Int, n: Int): String =
      (0 until n).map(i => ('a' + ((i * 31 + seed * 17 + i * i % 97) % 26))
        .toChar).mkString
    val b0 = Seq((1L, pseudo(1, 400)), (2L, pseudo(2, 300)))
    val b1 = Seq((3L, pseudo(1, 400))) // same content as doc 1
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    assert(got(0L) == canon(chunks(b0.toDF("doc_id", "text"))))
    assert(got(1L) == canon(chunks(b1.toDF("doc_id", "text"))))
    // content stability across batches: doc 3 repeats doc 1's text —
    // identical cut offsets and hashes, only the doc id differs
    val strip = (x: Set[String]) => x.map(_.split("\\|").drop(1).mkString("|"))
    assert(strip(got(1L)).subsetOf(strip(got(0L))))
  }

  test("contrastivePairs under foreachBatch == batch form per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def pairs(df: DataFrame): DataFrame =
      CorpusOps.contrastivePairs(df, "doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, Set[String]]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = canon(pairs(batch))
        got.synchronized { got(batchId) = out }
        ()
      }.start()
    val b0 = Seq((1L, (1 to 12).map(i => s"a$i").mkString(" ")),
      (2L, "too short"))
    val b1 = Seq((3L, (1 to 9).map(i => s"b$i").mkString(" ")))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    assert(got(0L) == canon(pairs(b0.toDF("doc_id", "text"))))
    assert(got(1L) == canon(pairs(b1.toDF("doc_id", "text"))))
  }

  test("qualityClassifier under foreachBatch == batch form (and is " +
      "content-stable across batch splits)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def clf(df: DataFrame): DataFrame =
      CorpusOps.qualityClassifier(df, "doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, Set[String]]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = canon(clf(batch))
        got.synchronized { got(batchId) = out }
        ()
      }.start()
    val b0 = Seq((1L, "alpha beta gamma delta"), (2L, ""), (3L, "solo"))
    val b1 = Seq((4L, "alpha beta gamma delta"), (5L, "epsilon zeta"))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    assert(got(0L) == canon(clf(b0.toDF("doc_id", "text"))))
    assert(got(1L) == canon(clf(b1.toDF("doc_id", "text"))))
    // the score is a pure per-doc function (fixed hashed weights, no
    // corpus statistics), so identical text scores identically in any
    // batch — doc 4 repeats doc 1's text and must repeat its score
    val score = (got(0L) ++ got(1L)).map(_.split("\\|"))
      .map(a => a(0).toLong -> a.drop(1).mkString("|")).toMap
    assert(score(1L) == score(4L))
  }

  test("dsirWeights under foreachBatch == batch form per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def dsir(df: DataFrame): DataFrame =
      CorpusOps.dsirWeights(df, "doc_id", "text",
        isTarget = col("doc_id") % 2 === 0)
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, Set[String]]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = canon(dsir(batch))
        got.synchronized { got(batchId) = out }
        ()
      }.start()
    val b0 = Seq((1L, "alpha beta alpha"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon"))
    val b1 = Seq((4L, "alpha delta"), (5L, "zeta eta theta"))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    assert(got(0L) == canon(dsir(b0.toDF("doc_id", "text"))))
    assert(got(1L) == canon(dsir(b1.toDF("doc_id", "text"))))
  }
}
