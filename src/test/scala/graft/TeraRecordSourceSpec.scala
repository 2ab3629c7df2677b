package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

import graft.sources.BinaryRecords

/** DSv2 source: format("terarecord") must agree with the RDD-based reader,
  * prune the payload on key-only projections, and sort end-to-end. */
class TeraRecordSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def writeRecords(n: Int): String = {
    val dir = Files.createTempDirectory("graft_dsv2").toString + "/in"
    BinaryRecords.write(BinaryRecords.teragen(spark, n), dir)
    dir
  }

  test("DSv2 scan matches the RDD-based reader record-for-record") {
    val dir = writeRecords(4000)
    val v2 = spark.read.format("terarecord").load(dir)
    val v1 = BinaryRecords.read(spark, dir)
    assert(v2.count() === 4000)
    val k2 = v2.select(col("key").cast("string")).collect().map(_.getString(0)).sorted
    val k1 = v1.select(col("key").cast("string")).collect().map(_.getString(0)).sorted
    assert(k2.sameElements(k1))
  }

  test("key-only projection prunes the payload column in the scan") {
    val dir = writeRecords(1000)
    val df = spark.read.format("terarecord").load(dir).select(col("key"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("columns=key"), s"payload not pruned:\n$scan")
    assert(df.distinct().count() === 1000)
  }

  test("session Hadoop conf reaches the DSv2 scan (no fresh Configuration)") {
    val dir = writeRecords(200)
    spark.conf.set("graft.test.hadoop.marker", "teraconf42")
    try {
      val df = spark.read.format("terarecord").load(dir)
      val scan = df.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.head.asInstanceOf[graft.sources.TeraScan]
      // newHadoopConf() copies session conf entries into the Hadoop conf,
      // so a session-level setting asserts the capture end-to-end
      assert(scan.conf.value.get("graft.test.hadoop.marker") === "teraconf42")
      assert(df.count() === 200)
    } finally spark.conf.unset("graft.test.hadoop.marker")
  }

  test("orderBy over the DSv2 source produces a globally sorted result") {
    val dir = writeRecords(3000)
    val keys = spark.read.format("terarecord").load(dir)
      .orderBy(col("key")).select(col("key").cast("string"))
      .collect().map(_.getString(0))
    assert(keys.length === 3000)
    assert(keys.sameElements(keys.sorted))
  }
}
