package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.ZOrder

/** SkippingIndex: pruned reads equal full scans on a z-clustered
  * layout while opening a fraction of the files; all-null spans and
  * empty survivor sets are safe.
  */
class SkippingIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("prunedRead == full filter, and actually skips files") {
    val s = spark
    import s.implicits._
    val grid = for { x <- 0 until 128; y <- 0 until 128 }
      yield (x.toLong, y.toLong, s"p$x-$y")
    val dir = Files.createTempDirectory("skipidx").toString
    ZOrder.cluster(grid.toDF("x", "y", "payload"), "x", "y", numFiles = 64)
      .write.mode("overwrite").parquet(s"$dir/t")

    val manifest = SkippingIndex.build(s, s"$dir/t", Seq("x", "y"))
    assert(manifest.count() == 64)

    val ranges = Map("x" -> (lit(32L), lit(47L)), "y" -> (lit(32L), lit(47L)))
    val pruned = SkippingIndex.prunedRead(s, s"$dir/t", manifest, ranges)
    val full = s.read.parquet(s"$dir/t")
      .filter($"x".between(32, 47) && $"y".between(32, 47))
    assert(pruned.select($"x", $"y", $"payload").as[(Long, Long, String)]
      .collect().toSet ==
      full.select($"x", $"y", $"payload").as[(Long, Long, String)]
        .collect().toSet)
    assert(full.count() == 256)
    // the box query must touch only a handful of z-tiles
    val opened = pruned.select(input_file_name()).distinct().count()
    assert(opened <= 6, s"opened $opened/64 files")
  }

  test("stale manifest: files appended after build are still read") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("skipidx3").toString
    Seq((1L, "old")).toDF("x", "tag")
      .write.mode("overwrite").parquet(s"$dir/t")
    val manifest = SkippingIndex.build(s, s"$dir/t", Seq("x"))
    // ingest one more file AFTER the manifest was built
    Seq((2L, "new")).toDF("x", "tag")
      .write.mode("append").parquet(s"$dir/t")
    val got = SkippingIndex.prunedRead(s, s"$dir/t", manifest,
        Map("x" -> (lit(0L), lit(10L))))
      .select($"x", $"tag").as[(Long, String)].collect().toSet
    // the unknown file cannot be skipped — staleness must never lose
    // rows (the soundness contract)
    assert(got == Set((1L, "old"), (2L, "new")), got.toString)
  }

  test("empty survivor set and all-null spans are sound") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("skipidx2").toString
    Seq((1L, Option.empty[Long]), (2L, None)).toDF("a", "b")
      .write.mode("overwrite").parquet(s"$dir/t")
    val manifest = SkippingIndex.build(s, s"$dir/t", Seq("a", "b"))
    // range outside a's span → zero files, empty result, no crash
    val none = SkippingIndex.prunedRead(s, s"$dir/t", manifest,
      Map("a" -> (lit(100L), lit(200L))))
    assert(none.count() == 0)
    // all-null b: span is null → file skipped, which equals the full
    // scan's answer (null fails any range predicate)
    val byB = SkippingIndex.prunedRead(s, s"$dir/t", manifest,
      Map("b" -> (lit(0L), lit(10L))))
    assert(byB.count() == 0)
  }
}
