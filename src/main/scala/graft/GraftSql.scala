package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry surface: registers the engine's tables as temp views (with
  * the same normalizations the DataFrame readers apply — notably the
  * events ns→µs timestamp) and hands queries to Spark SQL. Users who
  * prefer `spark.sql` over the DataFrame API get the identical Catalyst
  * planning either way. */
object GraftSql {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { n =>
      val df = n match {
        case "events" => Tables.events(spark, sfDir)
        case other => Tables.table(spark, sfDir, other)
      }
      df.createOrReplaceTempView(n)
    }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerTables(spark, sfDir)
    spark.sql(query)
  }
}
