package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Partition layout + AQE behaviors the 100 TB story leans on:
  * date-partitioned writes prune at the directory level, and AQE splits
  * skewed join partitions at runtime. */
class PartitionPruningSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("date-partitioned parquet scan prunes partitions on a date predicate") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val pruned = spark.read.parquet(dir)
      .filter(col("day") === lit("2024-01-05").cast("date"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters:\n$plan")
    // one day's directory only: scan must read far fewer files than days
    val nDays = Tables.events(spark, sf).select(to_date(col("ts"))).distinct().count()
    assert(nDays > 20)
    val n = pruned.count()
    assert(n > 0 && n < Tables.events(spark, sf).count() / 10)
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val prev = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // key 0 holds ~100k rows; keys 1..1000 hold ~100 total
      val skewed = spark.range(100000).select(
        when(col("id") < 99000, 0L).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
      val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = skewed.join(dim, Seq("k"))
      // collect() runs THIS queryExecution (count() would execute a derived
      // plan and leave this one unfinalized)
      assert(joined.collect().length === 100000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew="), s"no skew handling in final plan:\n$finalPlan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
