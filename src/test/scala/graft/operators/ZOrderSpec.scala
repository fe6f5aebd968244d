package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** ZOrder: interleave math against a bit-by-bit reference, and the
  * layout claim itself — after z-clustering, a 2-D range predicate
  * touches far fewer files than a single-column sort layout, measured
  * on real per-file min/max spans of the written parquet.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def refInterleave(a: Long, b: Long): Long =
    (0 until 32).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i & 1L) << (2 * i)) | ((b >> i & 1L) << (2 * i + 1))
    }

  test("interleave2 matches the bit-by-bit reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFL, 0xFFFFL),
      (0x7FFFFFFFL, 0x7FFFFFFFL)) ++
      Seq.fill(200)((rnd.nextLong() & 0x7FFFFFFFL, rnd.nextLong() & 0x7FFFFFFFL))
    val got = cases.toDF("a", "b")
      .select(ZOrder.interleave2($"a", $"b").as("z"))
      .as[Long].collect()
    cases.zip(got).foreach { case ((a, b), z) =>
      assert(z == refInterleave(a, b), s"a=$a b=$b")
    }
  }

  test("z-cluster prunes a 2-D box query better than a linear sort") {
    val s = spark
    import s.implicits._
    val grid = for { x <- 0 until 128; y <- 0 until 128 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val dir = Files.createTempDirectory("zorder").toString

    ZOrder.cluster(df, "x", "y", numFiles = 64)
      .write.mode("overwrite").parquet(s"$dir/z")
    df.repartitionByRange(64, $"x").sortWithinPartitions($"x", $"y")
      .write.mode("overwrite").parquet(s"$dir/linear")

    // files whose [min,max]×[min,max] box intersects the query box —
    // exactly the files a stats-pruning reader must open
    def filesTouched(path: String): (Long, Long) = {
      val spans = s.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"y").as("y0"), max($"y").as("y1"))
      val total = spans.count()
      val hit = spans.filter($"x1" >= 32 && $"x0" <= 47 &&
        $"y1" >= 32 && $"y0" <= 47).count()
      (hit, total)
    }
    val (zHit, zTotal) = filesTouched(s"$dir/z")
    val (lHit, lTotal) = filesTouched(s"$dir/linear")
    assert(zTotal == 64 && lTotal == 64)
    // linear layout: y-ranges span everything, so the x-slice decides
    // (~1/8 of files); z layout: only tiles meeting the 16×16 box
    assert(zHit < lHit, s"z=$zHit linear=$lHit")
    assert(zHit <= 6, s"z-curve touched $zHit/64 files")
  }

  // ---- X132 Hilbert key ---------------------------------------------

  test("hilbert: first-order curve visits the 2x2 grid in U order") {
    val s = graft.SparkHarness.spark
    import s.implicits._
    val hk = ZOrder.hilbertKeyUdf(1)
    val got = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L))
      .toDF("x", "y").select($"x", $"y", hk($"x", $"y").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L,
      (1L, 0L) -> 3L))
  }

  test("hilbert: bijective over the 16x16 grid and every consecutive " +
    "key pair is grid-ADJACENT (the locality Morton lacks)") {
    val s = graft.SparkHarness.spark
    import s.implicits._
    val cells = for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y)
    val hk = ZOrder.hilbertKeyUdf(4)
    val d2xy = cells.toDF("x", "y")
      .select($"x", $"y", hk($"x", $"y").as("d"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .toMap
    assert(d2xy.size == 256 && d2xy.keySet == (0L until 256L).toSet)
    (0L until 255L).foreach { d =>
      val (x1, y1) = d2xy(d); val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // contrast: the Morton order HAS seams (so this property is not
    // vacuous) — at least one consecutive zkey pair is non-adjacent
    val z = cells.map { case (x, y) =>
      var zi = 0L
      (0 until 4).foreach { b =>
        zi |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
      }
      zi -> ((x, y))
    }.toMap
    val seams = (0L until 255L).count { d =>
      val (x1, y1) = z(d); val (x2, y2) = z(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(seams > 0)
  }
}
