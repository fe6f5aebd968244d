package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) joins — the 100 TB shuffle-elimination
  * strategy SCALING.md prescribes for repeated big-big joins: write
  * both sides bucketed by the join key once, and every subsequent
  * join reads co-partitioned buckets with NO exchange on either side.
  * This spec proves the claim on the physical plan, not just prose.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("join of two tables bucketed by the key needs no exchange") {
    val s = spark
    import s.implicits._
    // external table paths — no warehouse config needed (static conf)
    val wh = Files.createTempDirectory("graft_bucketed").toString
    val left = (1 to 10000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 10000).map(i => (i.toLong % 500, i * 2.0))
      .toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k")
      .sortBy("k").option("path", s"$wh/bl").saveAsTable("bl")
    right.write.mode("overwrite").bucketBy(8, "k")
      .sortBy("k").option("path", s"$wh/br").saveAsTable("br")
    try {
      // disable broadcast so the plan MUST pick a shuffle-capable
      // join — bucketing should then satisfy both sides' distribution
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = s.table("bl").join(s.table("br"), "k")
          .groupBy($"k").agg(count(lit(1)).as("n"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        val joinSection = plan.split("HashAggregate").last
        assert(!joinSection.contains("Exchange hashpartitioning"),
          s"bucketed join still exchanged:\n$plan")
        // correctness: every right row matches (keys 1..499 present,
        // key 0 has no match in left range... it does: left has 1..10000,
        // right keys are i%500 in 0..499; key 0 occurs for i=500,1000,...)
        val n = s.table("bl").join(s.table("br"), "k").count()
        val expect = (1 to 10000).map(_.toLong % 500)
          .count(k => k >= 1 && k <= 10000)
        assert(n == expect.toLong, s"got $n want $expect")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      s.sql("DROP TABLE IF EXISTS bl")
      s.sql("DROP TABLE IF EXISTS br")
    }
  }
}
