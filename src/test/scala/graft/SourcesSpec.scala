package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source-format coverage: the engine's tables round-trip through JSON and
  * CSV with explicit schemas, and the SQL entry surface plans identically
  * to the DataFrame API. */
class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("events round-trip through json and csv with identical contents") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val base = Files.createTempDirectory("graft_src").toString
    ev.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(s"$base/json")
    ev.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(s"$base/csv")

    def checksum(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("event_id")), sum(col("user_id")),
        sum(unix_micros(col("ts"))),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))))
        .collect()(0).toSeq

    val fromJson = spark.read.schema(ev.schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(s"$base/json")
    val fromCsv = spark.read.schema(ev.schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(s"$base/csv")
    assert(checksum(fromJson) === checksum(ev))
    assert(checksum(fromCsv) === checksum(ev))
  }

  test("SQL entry surface matches the DataFrame API result") {
    val viaSql = GraftSql.sql(spark, sf,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(_.toSeq)
    val viaDf = RelOps.qAggHash(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"), col("count_order"))
      .collect().map(_.toSeq)
    assert(viaSql.sameElements(viaDf))
  }

  test("SQL over the normalized events view handles the ns-timestamp table") {
    val n = GraftSql.sql(spark, sf,
      "SELECT COUNT(*) FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'")
      .collect()(0).getLong(0)
    val direct = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp")).count()
    assert(n === direct && n > 0)
  }
}
