package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks for the round-12 continuation operators beyond the DuckDB
  * gate: plan-independent equivalences and algebraic invariants. */
class R12OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("binned interval join == naive quadratic overlap join") {
    // recompute the pair counts with a direct (no binning) theta join —
    // same sessionization, different plan; any canonical-bin bug
    // (double count, missed cross-bucket pair) diverges here
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    val iv = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(unix_micros(min(col("ts"))).as("s_start"),
        unix_micros(max(col("ts"))).as("s_end"))
      .localCheckpoint()
    val x = iv.select(col("user_id").as("xu"), col("s_start").as("xs"), col("s_end").as("xe"))
    val y = iv.select(col("user_id").as("yu"), col("s_start").as("ys"), col("s_end").as("ye"))
    val naive = x.join(y, col("xu") < col("yu") &&
        col("xs") <= col("ye") && col("ys") <= col("xe"))
      .groupBy(expr("greatest(xs, ys) div 3600000000").as("hour_idx"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hour_idx")).collect()
    val binned = RelOps.qJoinInterval(spark, sf).collect()
    assert(binned.map(_.toSeq).sameElements(naive.map(_.toSeq)))
  }

  test("temperature allocation sums exactly to the budget") {
    val rows = ScaleOps.qSampleTemperature(spark, sf).collect()
    val tokAll = rows.map(_.getLong(1)).sum
    val budget = tokAll / 5
    assert(rows.map(_.getLong(3)).sum === budget,
      "largest-remainder apportionment must hit the budget exactly")
    // kept tokens never exceed a source's quota, and the isqrt weights
    // up-weight rare domains: weight/token ratio decreases with size
    rows.foreach { r => assert(r.getLong(5) <= r.getLong(3)) }
    val sorted = rows.sortBy(_.getLong(1))
    val shares = sorted.map(r => r.getLong(3).toDouble / r.getLong(1).toDouble)
    assert(shares.head >= shares.last,
      "smallest source must get at least the largest source's sampling share")
  }

  test("rewrite dedup keeps each tile exactly once corpus-wide") {
    // independent recomputation of the tile multiset: after the rewrite,
    // kept tiles == distinct tiles, and kept+removed == total
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 8)
      .select(explode(expr("transform(sequence(1, size(tk) div 8), " +
        "i -> concat_ws(' ', slice(tk, (i - 1) * 8 + 1, 8)))")).as("tile"))
    val total = docs.count()
    val distinctTiles = docs.distinct().count()
    val out = LlmOps.qDedupRewrite(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum === total)
    assert(out.map(_.getLong(3)).sum === distinctTiles)
  }

  test("drift TV distance is bounded in [0, 1] and zero iff identical bins") {
    val rows = ScaleOps.qProfileDrift(spark, sf).collect()
    rows.foreach { r =>
      val tv = r.getDouble(4)
      assert(tv >= 0.0 && tv <= 1.0, s"TV out of range: $tv")
      val expectZero = r.getLong(3) == 0L
      assert((tv == 0.0) === expectZero)
    }
  }
}
