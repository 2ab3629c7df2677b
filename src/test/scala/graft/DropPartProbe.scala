package graft
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Probe (r11): does ALTER TABLE DROP PARTITION work on the in-memory
  * catalog's partitioned datasource tables? The index delete/rebalance
  * queries depend on it for fully-emptied / split cells. */
class DropPartProbe extends AnyFunSuite {
  private val spark = TestSpark.spark
  test("DROP PARTITION removes a cell dir; append recreates others") {
    spark.sql("DROP TABLE IF EXISTS default.dp_test")
    spark.range(10).select(col("id"), (col("id") % 3).as("cell"))
      .write.mode("overwrite").partitionBy("cell").saveAsTable("default.dp_test")
    assert(spark.table("default.dp_test").count() === 10)
    spark.sql("ALTER TABLE default.dp_test DROP IF EXISTS PARTITION (cell = 1)")
    assert(spark.table("default.dp_test").count() === 7,
      "partition rows must be gone after DROP PARTITION")
    assert(spark.table("default.dp_test")
      .filter(col("cell") === 1).count() === 0)
    spark.range(4).select((col("id") + 100).as("id"), lit(7L).as("cell"))
      .write.mode("append").partitionBy("cell").saveAsTable("default.dp_test")
    assert(spark.table("default.dp_test").count() === 11)
    spark.sql("DROP TABLE IF EXISTS default.dp_test")
  }
}
