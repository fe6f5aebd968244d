package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** As-of join semantics on literal data plus physical-plan shape
  * checks for the join suite (broadcast where intended).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOf: latest prior-or-simultaneous right row per key") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts(10), "l1"), (1L, ts(20), "l2"), (1L, ts(5), "l0"),
      (2L, ts(10), "l3")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts(10), 100L), (1L, ts(15), 150L), (3L, ts(1), 999L))
      .toDF("k", "ts", "rid")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("rid"))
      .select($"lv", $"rid").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(
      "l0" -> -1L, // before any right row
      "l1" -> 100L, // simultaneous right row visible
      "l2" -> 150L, // latest prior
      "l3" -> -1L)) // key with no right rows
  }

  test("asOf forward: earliest following-or-simultaneous right row") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts(10), "l1"), (1L, ts(16), "l2"), (1L, ts(99), "l3"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, ts(10), 100L), (1L, ts(15), 150L),
      (1L, ts(20), 200L)).toDF("k", "ts", "rid")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("rid"),
        direction = "forward")
      .select($"lv", $"rid").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(
      "l1" -> 100L, // simultaneous right row visible
      "l2" -> 200L, // earliest following
      "l3" -> -1L)) // nothing after
  }

  test("asOf tolerance: distant matches become nulls (both directions)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts(100), "a"), (1L, ts(500), "b"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, ts(95), 1L), (1L, ts(505), 2L))
      .toDF("k", "ts", "rid")
    def run(dir: String, tolMicros: Long) =
      AsOfJoin.asOf(left, right, "k", "ts", Seq("rid"), dir,
          Some(tolMicros))
        .select($"lv", $"rid").collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // backward: a←95 (5s away), b←95 (405s away)
    assert(run("backward", 10_000_000L) == Map("a" -> 1L, "b" -> -1L))
    assert(run("backward", 500_000_000L) == Map("a" -> 1L, "b" -> 1L))
    // forward: a→505 (405s away), b→505 (5s away)
    assert(run("forward", 10_000_000L) == Map("a" -> -1L, "b" -> 2L))
  }

  test("asOf: null payload in matched row stays null (whole-row semantics)") {
    val s = spark
    import s.implicits._
    // nearest right row at ts=15 has a NULL price; pandas merge_asof
    // keeps that null — it must NOT backfill from the older ts=10 row,
    // and the other payload must come from the same ts=15 row
    val left = Seq((1L, ts(20), "l")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts(10), Some(99L), "old"),
      (1L, ts(15), None: Option[Long], "new"))
      .toDF("k", "ts", "price", "tag")
    val row = AsOfJoin.asOf(left, right, "k", "ts", Seq("price", "tag"))
      .select($"price", $"tag").collect().head
    assert(row.isNullAt(0), "null payload was backfilled from an older row")
    assert(row.getString(1) == "new")
  }

  test("asOf tolerance: whole matched row nulls together") {
    val s = spark
    import s.implicits._
    // the nearest row is out of tolerance; no payload may survive
    // individually (the old per-column fill could keep a farther row's
    // value alive past the gate)
    val left = Seq((1L, ts(100), "l")).toDF("k", "ts", "lv")
    val right = Seq((1L, ts(10), 1L, "far"), (1L, ts(90), 2L, "near"))
      .toDF("k", "ts", "rid", "tag")
    val row = AsOfJoin.asOf(left, right, "k", "ts", Seq("rid", "tag"),
        "backward", Some(5_000_000L)) // 5s tolerance, nearest is 10s away
      .select($"rid", $"tag").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1),
      "out-of-tolerance payloads must all null together")
  }

  test("asOf: duplicate-(key,ts) right rows tiebreak deterministically") {
    val s = spark
    import s.implicits._
    // three right rows at the identical (key, ts): the documented
    // tiebreaker (xxhash64 of the full payload struct, largest wins)
    // must pick the same one regardless of input row order or
    // partitioning, and both directions must agree with a rerun
    val left = Seq((1L, ts(20), "l1"), (1L, ts(5), "l0"))
      .toDF("k", "ts", "lv")
    val dups = Seq((1L, ts(10), 100L, "x"), (1L, ts(10), 200L, "y"),
      (1L, ts(10), 300L, "z"))
    def pick(right: Seq[(Long, Timestamp, Long, String)],
        parts: Int, direction: String): Map[String, Long] =
      AsOfJoin.asOf(left,
          right.toDF("k", "ts", "rid", "tag").repartition(parts),
          "k", "ts", Seq("rid", "tag"), direction)
        .select($"lv", $"rid").collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val expectBackward = pick(dups, 1, "backward")
    assert(expectBackward("l0") == -1L) // before the dup cluster
    assert(expectBackward("l1") != -1L) // matched one of the dups
    // every permutation and partitioning picks the same duplicate
    for (perm <- dups.permutations; parts <- Seq(1, 3)) {
      assert(pick(perm, parts, "backward") == expectBackward,
        s"backward tiebreak unstable for $perm/$parts")
    }
    val expectForward = pick(dups, 1, "forward")
    for (perm <- dups.permutations; parts <- Seq(1, 3)) {
      assert(pick(perm, parts, "forward") == expectForward,
        s"forward tiebreak unstable for $perm/$parts")
    }
    // bucketed form agrees on the same duplicate pick
    val bucketed = AsOfJoin.asOfBucketed(left,
        dups.toDF("k", "ts", "rid", "tag"), "k", "ts",
        Seq("rid", "tag"), bucketWidth = 8L)
      .select($"lv", $"rid").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(bucketed == expectBackward,
      s"bucketed pick $bucketed != asOf pick $expectBackward")
  }

  test("asOfBucketed == asOf across widths, directions, tolerance") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // dense single hot key plus sparse keys; right rows with nulls
    val left = (1 to 400).map { i =>
      val k = if (i % 4 == 0) rnd.nextInt(3).toLong + 10 else 1L
      (k, ts(rnd.nextInt(5000).toLong), i.toLong)
    }.toDF("k", "ts", "lid")
    val right = (1 to 150).map { i =>
      val k = if (i % 5 == 0) rnd.nextInt(3).toLong + 10 else 1L
      (k, ts(rnd.nextInt(5000).toLong), i.toLong,
        if (i % 7 == 0) None else Some(s"p$i"))
    }.toDF("k", "ts", "rid", "tag")
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"lid", $"rid", $"tag").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) "" else r.getString(2))).toSet
    for {
      dir <- Seq("backward", "forward")
      tol <- Seq(None, Some(600_000_000L)) // 600 s
      width <- Seq(1_000_000L, 250_000_000L, 60_000_000_000L)
    } {
      val plain = collectSet(AsOfJoin.asOf(left, right, "k", "ts",
        Seq("rid", "tag"), dir, tol))
      val bucketed = collectSet(AsOfJoin.asOfBucketed(left, right, "k",
        "ts", Seq("rid", "tag"), width, dir, tol))
      assert(bucketed == plain,
        s"dir=$dir tol=$tol width=$width\n" +
          s"bucketed-only: ${bucketed -- plain}\nplain-only: ${plain -- bucketed}")
    }
  }

  test("asOf plan: single exchange (window), no join node") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts(10), "x")).toDF("k", "ts", "lv")
    val right = Seq((1L, ts(5), 1L)).toDF("k", "ts", "rid")
    val plan = AsOfJoin.asOf(left, right, "k", "ts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"), s"expected window in:\n$plan")
  }

  test("star join plan broadcasts every dimension") {
    val plan = graft.SparkEntry.queries("q_star_join")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts == 3, s"expected 3 broadcast joins, got $broadcasts")
    assert(!plan.contains("SortMergeJoin"), "dims must not sort-merge")
  }

  test("range join plan broadcasts the tier table") {
    val plan = graft.SparkEntry.queries("q_range_join")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast NLJ in:\n$plan")
  }

  test("q_asof_join matches a per-key reference computation") {
    val s = spark
    import s.implicits._
    val got = graft.SparkEntry.queries("q_asof_join")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // reference: per-user sorted scan in plain Scala
    val ev = QueryDefTestAccess.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val byUser = ev.groupBy(_._1)
    val want = byUser.values.flatMap { rows =>
      val clicks = rows.filter(_._4 == "click").sortBy(r => (r._2.getTime, r._3))
      rows.filter(_._4 == "purchase").map { p =>
        val prior = clicks.filter(c => !c._2.after(p._2))
        p._3 -> prior.lastOption.map(_._3).getOrElse(-1L)
      }
    }.toMap
    assert(got == want)
  }
}

/** Test access to the events reader (nanos → micros handling). */
object QueryDefTestAccess {
  def events(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.queries.QueryDef.events(spark, dir)
}
