package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Non-graded Structured Streaming demo (SURVEY.md §2.4 note): the same
  * tumbling-window aggregation used by q_stream_tumbling, executed as a real
  * readStream→writeStream query with a watermark, must agree with the batch
  * result. Proves the streaming surface works, not just batch look-alikes.
  */
class StreamingDemoSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("tumbling-window aggregation agrees between batch and structured streaming") {
    // Stage events (with the ns→µs-normalized ts) into a streamable dir.
    val dir = Files.createTempDirectory("graft_stream").toString
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("ts"), col("event_type"), col("value"))
    ev.write.mode("overwrite").parquet(dir)
    val schema = ev.schema

    def tumble(df: org.apache.spark.sql.DataFrame) = df
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).as("sum_value"))

    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = tumble(stream).writeStream
      .outputMode("complete")
      .format("memory").queryName("tumbled")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("tumbled")
      .select(unix_seconds(col("window.start")).as("w"), col("event_type"),
        col("n"), col("sum_value").cast(StringType))
      .collect().map(_.toSeq).sortBy(_.toString)
    val exp = tumble(ev)
      .select(unix_seconds(col("window.start")).as("w"), col("event_type"),
        col("n"), col("sum_value").cast(StringType))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.length > 0)
    assert(got.sameElements(exp))
  }

  test("session_window streaming agrees with the batch gap-trick sessionization") {
    val dir = Files.createTempDirectory("graft_sess").toString
    val ev = Tables.events(spark, TestSpark.sf).select(col("ts"), col("user_id"))
    ev.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val q = stream
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("complete")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sessions")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = StreamOps.qStreamSession(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch,
      "session_window streaming and batch lag+cumsum sessionization disagree")
  }

  test("flatMapGroupsWithState keeps per-user running state matching batch counts") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val dir = Files.createTempDirectory("graft_state").toString
    val ev = Tables.events(spark, TestSpark.sf).select(col("user_id"))
    ev.write.mode("overwrite").parquet(dir)

    val counted = spark.readStream.schema(ev.schema).parquet(dir)
      .as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator((user, total))
      }

    val q = counted.toDF("user_id", "n")
      .writeStream.outputMode("update")
      .format("memory").queryName("user_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // last update per user == total batch count
    val streamed = spark.table("user_counts")
      .groupBy(col("user_id")).agg(max(col("n")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = ev.groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("q_stream_pattern accumulates CEP state ACROSS micro-batches") {
    // the operator's whole point is cross-batch continuation: the match
    // counter must keep counting in batch 2 from batch 1's state. The
    // Update-mode memory sink keeps every batch's emissions, so at least
    // one user must show two DIFFERENT running counts — a single-batch
    // run (or state lost between batches) could not produce that while
    // still hash-matching the batch truth.
    val result = StreamOps.qStreamPattern(spark, TestSpark.sf)
    val batchTruth = AggWinOps.qWindowPattern(spark, TestSpark.sf)
    assert(result.collect().map(_.toSeq).toSeq ===
      batchTruth.collect().map(_.toSeq).toSeq)
    val emissions = spark.table("graft_stream_pattern_sink")
    val multi = emissions.groupBy(col("user_id"))
      .agg(countDistinct(col("n")).as("distinct_counts"))
      .filter(col("distinct_counts") >= 2)
      .count()
    assert(multi >= 1,
      "no user's match count advanced across batches — the replay " +
        "collapsed to one micro-batch or state did not carry")
  }
}
