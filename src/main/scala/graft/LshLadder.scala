package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness for the LSH recall/cost grid (the r9 verdict's "measured
  * ladder" discipline applied to q_sim_ann_lsh): for each (tables,
  * probe-radius) variant of AnnOps.lshSearch, print recall@3 against the
  * brute cosine truth over the graded probe set, plus wall seconds —
  * pick the graded config from this table, never by intuition.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.LshLadder"
  */
object LshLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.VectorFunctions.register(spark)

    // brute cosine truth for the lsh probe set (vec_id < 10), same score
    // expression as the graded query so ties break identically
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("na", expr("graft_norm_sq(embedding)"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"),
        col("na").as("pna"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("key").desc, col("vec_id"))
    val truth = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("key", round(expr("graft_dot(embedding, pvec)") /
        sqrt(col("na") * col("pna")), 4))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
      .cache()
    val nTruth = truth.count()

    val variants = for (t <- Seq(1, 2, 3, 4, 5); r <- Seq(2, 3)) yield (t, r)
    println(f"${"tables"}%6s ${"radius"}%6s ${"recall"}%9s ${"secs"}%s")
    variants.foreach { case (t, r) =>
      val ans = AnnOps.lshSearch(spark, sfDir, t, r)
        .select(col("probe_id"), col("neighbor_id"))
      val hits = ans.join(truth, Seq("probe_id", "neighbor_id")).count()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        AnnOps.lshSearch(spark, sfDir, t, r).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$t%6d $r%6d $hits%4d/$nTruth%-4d ${times.map(x => f"$x%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
