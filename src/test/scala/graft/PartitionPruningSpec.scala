package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-pruned reads: a table written with
  * `partitionBy(column)` must serve an equality filter on that
  * column from the matching directory alone — the scan's
  * PartitionFilters prove it, and at 100 TB this is the difference
  * between reading one partition and reading everything.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("filter on the partition column prunes the scan") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_part").toString
    (1 to 3000).map(i => (i.toLong, s"t${i % 5}", i * 0.5))
      .toDF("id", "kind", "v")
      .write.mode("overwrite").partitionBy("kind").parquet(dir)
    // AQE wraps stages in QueryStageExec leaves whose inner plan is
    // invisible to collect(); disable it through planning + execution
    // so the scan node (and its metrics) sit in the plan tree directly
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val q = s.read.parquet(dir).filter($"kind" === "t3")
      .agg(count(lit(1)).as("n"), round(sum($"v"), 2).as("sv"))
    val n =
      try q.collect()(0).getLong(0)
      finally s.conf.set("spark.sql.adaptive.enabled", "true")
    assert(n == 600L)
    val plan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*kind[^\\]]*\\]".r
      .findFirstIn(plan).isDefined,
      s"no partition filter in:\n${plan.take(1200)}")
    // the pruned scan must touch only one of the five partition dirs
    // (unwrap AQE — collectLeaves on the adaptive wrapper does not
    // descend into the final plan)
    val finalPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scanned = finalPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value }
      .sum
    import scala.jdk.CollectionConverters._
    val totalFiles = Files.walk(java.nio.file.Paths.get(dir)).iterator()
      .asScala.count(p => p.toString.endsWith(".parquet"))
    assert(scanned > 0, "scan metrics missing")
    assert(scanned < totalFiles,
      s"pruning read too many files: $scanned of $totalFiles")
  }
}
