package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time named SparkEntry queries (args) on SPARK_GRAFT_SF_DIR,
  * N repetitions each, printing per-run seconds — the tool for isolating a
  * single query's cost from Bench's 84-query JVM. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    Scratch.init() // match Bench's scratch placement
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", Scratch.diskTmp) // spill on DISK (see Scratch)
      // managed tables (the ANN index family) are rebuilt per run —
      // ephemeral, so the warehouse follows the scratch placement too
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft-warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench: see the comment there on the 100-entry default
      .config("spark.sql.codegen.cache.maxEntries", "10000")
    // A/B overrides: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF entry '$kv' is not of the form key=value")
        }
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      if (AnnOps.publishedAnswerQueries(name))
        System.err.println(s"[timeq] WARNING: $name serves a staged " +
          "published answer after its first call - reps 2+ time a " +
          "<=30-row parquet read, not the pipeline; time the inner " +
          "*Search frame instead (see AnnOps.publishedAnswer)")
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        // number of janino compilations attributable to this run (from
        // Spark's CodegenMetrics histogram count) — a cold run compiling
        // ~40+ units at ~30-50 ms each IS the cold-vs-steady gap; a
        // repeat showing c0 proves the cache absorbed all of it
        val c0 = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME.getCount
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val cMs = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME.getCount - c0
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (dt, cMs)
      }
      println(f"[timeq] $name%-28s " +
        ts.map { case (t, c) => f"$t%.2f(c$c%d)" }.mkString(" "))
    }
    spark.stop()
  }
}
