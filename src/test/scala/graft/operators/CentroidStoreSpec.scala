package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 13: X166 table-driven blocklist join, X167 centroid
  * store.
  */
class CentroidStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("centroid store merge law: sum-merge of shard stores equals " +
    "the store of the union") {
    val s = spark
    import s.implicits._
    val vecs = (1 to 40).map(i =>
      (s"sh${i % 3}", Array(i * 0.25f, -i * 0.5f, 1.0f)))
    val sharded = CentroidStore.build(vecs.toDF("key", "v"), "key", "v")
    val merged = CentroidStore.merge(sharded, lit("all"))
    val whole = CentroidStore.build(
      vecs.map(t => ("all", t._2)).toDF("key", "v"), "key", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("key"), col("dim"),
          col("sum_nano").cast("long"), col("n").cast("long"))
        .collect().map(_.toSeq).toSet
    assert(canon(merged) == canon(whole))
  }

  test("centroid compare reads exact geometry from sums: identical " +
    "sets cos 1 gap 0, opposite sets cos -1, zero centroid NULL") {
    val s = spark
    import s.implicits._
    val a = Seq(("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 2.0f)))
    val b = a.map { case (_, v) => ("b", v) }
    val c = a.map { case (_, v) => ("c", v.map(-_)) }
    val z = Seq(("z", Array(1.0f, 0.0f)), ("z", Array(-1.0f, 0.0f)))
    val store = CentroidStore.build(
      (a ++ b ++ c ++ z).toDF("key", "v"), "key", "v")
    val same = CentroidStore.compare(store, "a", "b").head()
    assert(same.getAs[Double]("centroid_cos") == 1.0)
    assert(same.getAs[Double]("centroid_l2_gap") == 0.0)
    assert(same.getAs[Long]("n_a") == 2L)
    val opp = CentroidStore.compare(store, "a", "c").head()
    assert(opp.getAs[Double]("centroid_cos") == -1.0)
    val nul = CentroidStore.compare(store, "a", "z").head()
    assert(nul.isNullAt(nul.fieldIndex("centroid_cos")))
  }

  test("blocklistJoin matches phrases as data: counts, positions, " +
    "multi-phrase hits, and no bag-of-words false matches") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "bad actor here and bad actor there"),
      (2L, "actor bad reversed"),
      (3L, "totally clean"),
      (4L, "bad actor and spam eggs overlap")).toDF("doc_id", "text")
    val phrases = Seq((10L, "bad actor"), (20L, "spam eggs"))
      .toDF("phrase_id", "phrase")
    val out = CorpusOps.blocklistJoin(docs, "doc_id", "text", phrases)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("phrase_id")) ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"))).toMap
    assert(out == Map(
      (1L, 10L) -> (2L, 0L),
      (4L, 10L) -> (1L, 0L),
      (4L, 20L) -> (1L, 3L)))
  }

  test("blocklistJoin single-token phrases work and empty phrase " +
    "table matches nothing") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "x y x")).toDF("doc_id", "text")
    val one = CorpusOps.blocklistJoin(docs, "doc_id", "text",
        Seq((5L, "x")).toDF("phrase_id", "phrase"))
      .head()
    assert(one.getAs[Long]("n_matches") == 2L)
    assert(CorpusOps.blocklistJoin(docs, "doc_id", "text",
      Seq.empty[(Long, String)].toDF("phrase_id", "phrase")).count() == 0)
  }
}
