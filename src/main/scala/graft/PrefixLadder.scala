package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness for the prefix-ANN recall/cost grid (same measured-ladder
  * discipline as LshLadder): for each (prefix dim, shortlist R) variant
  * of AnnOps.prefixSearch, print recall@3 against the brute cosine truth
  * over the graded probe set (vec_id in [20, 30)) plus wall seconds —
  * pick the graded config from this table, never by intuition.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.PrefixLadder"
  */
object PrefixLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.VectorFunctions.register(spark)

    // brute cosine truth over the prefix probe set, same score expression
    // as the graded query so ties break identically
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("na", expr("graft_norm_sq(embedding)"))
    val probes = e.filter(col("vec_id") >= 20 && col("vec_id") < 30)
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

    val variants = for (dim <- Seq(16, 24, 32); r <- Seq(64, 160, 320)) yield (dim, r)
    println(f"${"dim"}%4s ${"R"}%4s ${"recall"}%9s ${"secs"}%s")
    variants.foreach { case (dim, r) =>
      val ans = AnnOps.prefixSearch(spark, sfDir, dim, r)
        .select(col("probe_id"), col("neighbor_id"))
      val hits = ans.join(truth, Seq("probe_id", "neighbor_id")).count()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        AnnOps.prefixSearch(spark, sfDir, dim, r).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$dim%4d $r%4d $hits%4d/$nTruth%-4d ${times.map(x => f"$x%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
