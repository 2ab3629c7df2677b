package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoinApi

/** The native sort-merge as-of operator must agree row-for-row with the
  * window-based composition (both also hash-match the same DuckDB oracle
  * driver-side). */
class AsOfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("native as-of join == window-based as-of join on the full event set") {
    val native = RelOps.qJoinAsofNative(spark, sf).collect().map(_.toSeq)
    val windowed = RelOps.qJoinAsof(spark, sf).collect().map(_.toSeq)
    assert(native.length === windowed.length)
    assert(native.sameElements(windowed))
  }

  test("left rows without a match keep null right columns") {
    import spark.implicits._
    val left = Seq((1L, "2024-01-10 00:00:00"), (2L, "2024-01-10 00:00:00"))
      .toDF("k", "t_s").select(col("k"), col("t_s").cast("timestamp").as("t"))
    val right = Seq((1L, "2024-01-09 00:00:00", "early"),
        (1L, "2024-01-10 00:00:00", "exact"),
        (1L, "2024-01-11 00:00:00", "late"))
      .toDF("k2", "rt_s", "tag")
      .select(col("k2"), col("rt_s").cast("timestamp").as("rt"), col("tag"))
    val out = AsOfJoinApi.asofJoin(left, right, "k", "t", "k2", "rt")
      .orderBy(col("k")).collect()
    assert(out.length === 2)
    // k=1: inclusive as-of picks the row at exactly t, not the later one
    assert(out(0).getString(4) === "exact")
    // k=2: no right rows → all right columns null
    assert(out(1).isNullAt(2) && out(1).isNullAt(3) && out(1).isNullAt(4))
  }

  test("as-of respects per-key isolation (no cross-key matches)") {
    import spark.implicits._
    val left = Seq((10L, "2024-06-01 00:00:00")).toDF("k", "t_s")
      .select(col("k"), col("t_s").cast("timestamp").as("t"))
    val right = Seq((99L, "2024-01-01 00:00:00", "other_key"))
      .toDF("k2", "rt_s", "tag")
      .select(col("k2"), col("rt_s").cast("timestamp").as("rt"), col("tag"))
    val out = AsOfJoinApi.asofJoin(left, right, "k", "t", "k2", "rt").collect()
    assert(out.length === 1 && out(0).isNullAt(4))
  }

  test("NULL left key/time rows null-extend; NULL right key/time rows never match") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), Option("2024-01-10 00:00:00")), // normal: should match "good"
      (Option.empty[Long], Option("2024-01-10 00:00:00")), // NULL key
      (Option(1L), Option.empty[String])) // NULL time
      .toDF("k", "t_s").select(col("k"), col("t_s").cast("timestamp").as("t"))
    val right = Seq(
      (Option(1L), Option("2024-01-09 00:00:00"), "good"),
      // a LATER null-time row for the same key: must never become the match
      (Option(1L), Option.empty[String], "null_time"),
      (Option.empty[Long], Option("2024-01-01 00:00:00"), "null_key"))
      .toDF("k2", "rt_s", "tag")
      .select(col("k2"), col("rt_s").cast("timestamp").as("rt"), col("tag"))
    val out = AsOfJoinApi.asofJoin(left, right, "k", "t", "k2", "rt").collect()
    assert(out.length === 3)
    val matched = out.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(matched.length === 1 && matched(0).getString(4) === "good")
    // NULL-key and NULL-time left rows compare false to everything
    out.filter(r => r.isNullAt(0) || r.isNullAt(1)).foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4),
        s"null-keyed/timed left row must null-extend, got $r")
    }
  }

  test("a right side of only NULL keys/times matches nothing") {
    import spark.implicits._
    val left = Seq((7L, "2024-03-01 00:00:00")).toDF("k", "t_s")
      .select(col("k"), col("t_s").cast("timestamp").as("t"))
    val right = Seq(
      (Option(7L), Option.empty[String], "null_time"),
      (Option.empty[Long], Option("2024-01-01 00:00:00"), "null_key"))
      .toDF("k2", "rt_s", "tag")
      .select(col("k2"), col("rt_s").cast("timestamp").as("rt"), col("tag"))
    val out = AsOfJoinApi.asofJoin(left, right, "k", "t", "k2", "rt").collect()
    assert(out.length === 1 && out(0).isNullAt(2) && out(0).isNullAt(4))
  }

  test("non-long keys and non-timestamp times are rejected at the API") {
    import spark.implicits._
    val intKey = Seq((1, "2024-01-10 00:00:00")).toDF("k", "t_s")
      .select(col("k"), col("t_s").cast("timestamp").as("t")) // k is IntegerType
    val longKey = Seq((1L, "2024-01-10 00:00:00")).toDF("k", "t_s")
      .select(col("k"), col("t_s").cast("timestamp").as("t"))
    val dateTime = Seq((1L, "2024-01-10")).toDF("k", "d_s")
      .select(col("k"), col("d_s").cast("date").as("t")) // t is DateType
    assertThrows[IllegalArgumentException] {
      AsOfJoinApi.asofJoin(intKey, longKey, "k", "t", "k", "t")
    }
    assertThrows[IllegalArgumentException] {
      AsOfJoinApi.asofJoin(longKey, dateTime, "k", "t", "k", "t")
    }
  }

  test("left time bound pushes into the right scan (AsOfJoinTimeFilterPushdown)") {
    val bound = Tables.events(spark, sf)
      .agg(expr("percentile_approx(ts, 0.5)")).collect()(0).getTimestamp(0)
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sf).select(col("o_custkey"), col("o_orderdate"))
    val pushed = AsOfJoinApi.asofJoin(
      e.filter(col("ts") <= lit(bound)), o, "user_id", "ts", "o_custkey", "o_orderdate")
    val physical = pushed.queryExecution.executedPlan.toString
    // the orders scan (the only one with o_orderdate) must carry the bound
    assert(physical.matches("(?s).*PushedFilters: \\[[^\\]]*o_orderdate[^\\]]*\\].*"),
      s"no time bound pushed into the right scan:\n$physical")
    // as-of output is 1:1 with left rows and keeps ts, so filter-then-join
    // (pushed) must equal join-then-filter (not rewritten by the rule)
    val unpushed = AsOfJoinApi.asofJoin(e, o, "user_id", "ts", "o_custkey", "o_orderdate")
      .filter(col("ts") <= lit(bound))
    val a = pushed.orderBy(col("event_id")).collect().map(_.toSeq)
    val b = unpushed.orderBy(col("event_id")).collect().map(_.toSeq)
    assert(a.nonEmpty && a.length === b.length && a.sameElements(b))
  }

  test("a filter inside ONE Union branch is NOT pushed as a right-side bound") {
    // Union output reuses the FIRST child's exprIds, so a bound filtered in
    // branch 1 must not prune right-side history that branch 2 still needs
    // (the r10 ADVICE soundness hole — the rule now walks only the unary
    // spine above the join's left child)
    // the bound sits INSIDE the orders date range (1995–2001) while all
    // events are later (2024): branch 1 is empty, branch 2 is everything,
    // and an unsound right-side prune at the bound would drop the
    // post-1998 orders that are the true as-of matches
    val bound = java.sql.Timestamp.valueOf("1998-06-01 00:00:00")
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val early = e.filter(col("ts") <= lit(bound))
    val late = e.filter(col("ts") > lit(bound))
    val o = Tables.orders(spark, sf).select(col("o_custkey"), col("o_orderdate"))
    val joined = AsOfJoinApi.asofJoin(early.union(late), o,
      "user_id", "ts", "o_custkey", "o_orderdate")
    // correctness: the union covers every event exactly once, so the result
    // must equal the as-of join over the unsplit event set — if the branch-1
    // bound leaked into the right scan, late events would lose matches
    val whole = AsOfJoinApi.asofJoin(e, o, "user_id", "ts", "o_custkey", "o_orderdate")
    val a = joined.orderBy(col("event_id")).collect().map(_.toSeq)
    val b = whole.orderBy(col("event_id")).collect().map(_.toSeq)
    assert(a.nonEmpty && a.length === b.length && a.sameElements(b))
    // and at least one late event has a match beyond the branch-1 bound —
    // otherwise this test couldn't detect the unsound prune
    val lateMatched = joined.filter(col("ts") > lit(bound) &&
      col("o_orderdate") > lit(bound)).count()
    assert(lateMatched > 0,
      "fixture has no match beyond the bound; the soundness check is vacuous")
  }

  test("limit pushes through the as-of join (AsOfJoinLimitPushdown rule)") {
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sf).select(col("o_custkey"), col("o_orderdate"))
    val limited = AsOfJoinApi.asofJoin(e, o, "user_id", "ts", "o_custkey", "o_orderdate")
      .limit(5)
    val optimized = limited.queryExecution.optimizedPlan.toString
    // the rewritten plan has a LocalLimit BELOW the AsOfJoin (on its left)
    val joinIdx = optimized.indexOf("AsOfJoin")
    assert(joinIdx >= 0)
    assert(optimized.indexOf("LocalLimit", joinIdx) > joinIdx,
      s"no limit pushed below the as-of join:\n$optimized")
    assert(limited.count() === 5)
  }
}
