package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Salted-join equivalence and physical-shape checks. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("salted join output equals the plain inner join (skewed keys)") {
    val s = spark
    import s.implicits._
    // heavily skewed probe: 90% of rows on key 7
    val probe = (1 to 2000).map(i =>
      (i.toLong, if (i % 10 == 0) i.toLong % 5 else 7L, i * 1.5))
      .toDF("row_id", "k", "v")
    val build = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (99L, "unmatched")).toDF("bk", "tag")
    val salted = SaltedJoin.join(probe, build, "k", "bk", $"row_id", 16)
      .select($"row_id", $"tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val plain = probe.join(build, $"k" === $"bk")
      .select($"row_id", $"tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("build side replicates numSalts times; probe salts spread") {
    val s = spark
    import s.implicits._
    val probe = (1 to 1000).map(i => (i.toLong, 7L)).toDF("row_id", "k")
    val build = Seq((7L, "hot")).toDF("bk", "tag")
    val n = 8
    // all probe rows share key 7; the salted join must still produce
    // exactly 1000 output rows (each row matches its single salted
    // replica, not all replicas)
    val out = SaltedJoin.join(probe, build, "k", "bk", $"row_id", n)
    assert(out.count() == 1000)
    // the salt genuinely partitions the hot key: every salt value of
    // the probe side is hit (1000 hashed rows over 8 salts)
    val salts = probe.withColumn("s",
        pmod(xxhash64($"row_id"), lit(n.toLong)).cast("int"))
      .select(countDistinct($"s")).collect()(0).getLong(0)
    assert(salts == n.toLong, s"expected all $n salts used, got $salts")
  }

  test("skewProfile: exact stats and salt suggestion on a known skew") {
    val s = spark
    import s.implicits._
    // key 1: 60 rows, key 2: 30, key 3: 10 → n=100, keys=3, max=60
    val df = (Seq.fill(60)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(10)(3L))
      .toDF("k")
    val r = SaltedJoin.skewProfile(df, "k").collect()(0)
    assert(r.getLong(0) == 100L && r.getLong(1) == 3L &&
      r.getLong(2) == 60L)
    assert(r.getLong(3) == 1L) // hot key
    assert(math.abs(r.getDouble(4) - 0.6) < 1e-9)
    assert(r.getLong(5) == 2L) // ceil(60*3/100) = 2 salts level it
    // tie on counts reports the LARGEST key deterministically
    val tied = (Seq.fill(5)(7L) ++ Seq.fill(5)(9L)).toDF("k")
    assert(SaltedJoin.skewProfile(tied, "k").collect()(0).getLong(3) == 9L)
  }
}
