package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset API coverage beyond what queries exercise: groupByKey +
  * cogroup must agree with the equivalent relational join. */
class TypedOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("cogroup over customers/orders matches the relational outer rollup") {
    import spark.implicits._
    val customers = Tables.customer(spark, sf)
      .select(col("c_custkey")).as[Long].groupByKey(identity)
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey")).as[Long].groupByKey(identity)
    val cogrouped = customers.cogroup(orders) { (key, cs, os) =>
      val nOrders = os.size
      if (cs.nonEmpty) Iterator((key, nOrders.toLong)) else Iterator.empty
    }.toDF("custkey", "n_orders")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val relational = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(cogrouped === relational)
  }
}
