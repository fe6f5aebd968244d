package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** chunkDocs / assembleBatches / mixCorpus semantics on hand data:
  * exact chunk boundaries, tail coverage, bucket population balance,
  * batch density, and mixing's budget concentration.
  */
class TrainingPrepSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("chunkDocs: exact windows, tail chunk shorter, full coverage") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = CorpusOps.chunkDocs(docs, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .orderBy($"chunk_id")
      .select($"chunk_id", $"n_chunk_tokens", $"chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (0, 4, "t1 t2 t3 t4"),
      (1, 4, "t4 t5 t6 t7"),
      (2, 4, "t7 t8 t9 t10")))
    // every token appears in at least one chunk
    val covered = got.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("chunkDocs: doc shorter than one chunk yields exactly one chunk") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val got = CorpusOps.chunkDocs(docs, "doc_id", "text", 4, 3)
      .select($"doc_id", $"chunk_id", $"chunk_text")
      .as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((1L, 0, "a b"))) // empty doc: zero chunks
  }

  test("chunkDocs: stride == chunkSize gives disjoint cover") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, (1 to 9).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = CorpusOps.chunkDocs(docs, "doc_id", "text", 3, 3)
      .orderBy($"chunk_id").select($"chunk_text").as[String]
      .collect().toSeq
    assert(got == Seq("t1 t2 t3", "t4 t5 t6", "t7 t8 t9"))
  }

  test("assembleBatches: buckets ~equal population, batches dense") {
    val s = spark
    import s.implicits._
    // lengths 1..100 → quartile buckets of 25 each
    val docs = (1 to 100).map(i => (i.toLong, i)).toDF("doc_id", "n")
    val got = CorpusOps.assembleBatches(docs, "doc_id", "n",
        numBuckets = 4, batchSize = 10)
      .select($"doc_id", $"n", $"bucket", $"batch_id", $"pos_in_batch")
      .as[(Long, Int, Int, Long, Long)].collect().toSeq
    val byBucket = got.groupBy(_._3)
    assert(byBucket.keySet == Set(1, 2, 3, 4))
    assert(byBucket.values.forall(_.size == 25))
    // bucket boundaries respect length order: all of bucket 1 shorter
    // than all of bucket 2, etc.
    val maxPerBucket = byBucket.view.mapValues(_.map(_._2).max).toMap
    val minPerBucket = byBucket.view.mapValues(_.map(_._2).min).toMap
    assert(maxPerBucket(1) < minPerBucket(2) &&
      maxPerBucket(2) < minPerBucket(3) &&
      maxPerBucket(3) < minPerBucket(4))
    // batches within a bucket: 10 + 10 + 5, positions dense from 0
    byBucket.values.foreach { rows =>
      val byBatch = rows.groupBy(_._4).view.mapValues(_.size).toMap
      assert(byBatch == Map(0L -> 10, 1L -> 10, 2L -> 5))
      rows.groupBy(_._4).values.foreach { b =>
        assert(b.map(_._5).sorted == (0L until b.size).toList)
      }
    }
  }

  test("mixCorpus: realized tokens near targets, allowlist drops") {
    val s = spark
    import s.implicits._
    // 3 sources × 400 docs × 10 tokens = 4000 tokens each
    val docs = (0 until 1200).map { i =>
      val src = s"s${i % 3}"
      (i.toLong, s"$src doc $i " + (1 to 7).map(j => s"w$j").mkString(" "),
        src, 10)
    }.toDF("doc_id", "text", "source", "n_tokens")
    val got = CorpusOps.mixCorpus(docs, "text", "source", "n_tokens",
        Map("s0" -> 2000.0, "s1" -> 8000.0), "salt")
      .groupBy($"source")
      .agg(sum($"n_tokens").as("kept"), first($"keep_frac").as("frac"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!got.contains("s2")) // unlisted source dropped entirely
    // s0: target 2000 of 4000 → frac 0.5, realized within ±20%
    assert(got("s0")._2 == 0.5)
    assert(math.abs(got("s0")._1 - 2000L) < 400, got("s0").toString)
    // s1: target exceeds supply → frac caps at 1.0, everything kept
    assert(got("s1") == ((4000L, 1.0)))
  }

  test("mixCorpus: content-stable — decisions survive corpus growth") {
    val s = spark
    import s.implicits._
    def mk(n: Int) = (0 until n).map(i =>
      (i.toLong, s"content $i", "s0", 5)).toDF("doc_id", "text", "source", "n_tokens")
    // same keep fraction both runs (fix target to half the BIGGER
    // corpus supply so frac is 0.5 in both) — only then is the md5
    // decision per-row comparable
    val small = CorpusOps.mixCorpus(mk(400), "text", "source", "n_tokens",
        Map("s0" -> 1000.0), "z")
      .select($"doc_id").as[Long].collect().toSet
    val grown = CorpusOps.mixCorpus(mk(800), "text", "source", "n_tokens",
        Map("s0" -> 2000.0), "z")
      .select($"doc_id").as[Long].collect().toSet
    assert(small == grown.filter(_ < 400))
  }
}
