package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for the prefix-inside-IVF experiment (r12 verdict item:
  * "graded prefix+IVF composition measured against the 25/30 ivf
  * ceiling; accept rejection with numbers"): for each (prefix dim,
  * shortlist R) variant of AnnOps.ivfPrefixSearch, print recall@3
  * against the brute cosine truth over the IVF probe set (vec_id in
  * [10, 20)) plus wall seconds, alongside plain qSimAnnIvf as the
  * ceiling row. The composition's claim is equal-recall-at-lower-cost,
  * so the decision needs BOTH columns.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IvfPrefixLadder"
  */
object IvfPrefixLadder {
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

    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("na", expr("graft_norm_sq(embedding)"))
    // the scorecard's own single-pass truth builder, one spec: ivf's
    // probes [10, 20) under cosine
    val truth = AnnOps.recallTruthAll(spark, e,
        Seq(("ivf", 10L, 20L, false, 0L)))
      .select(col("probe_id"), col("neighbor_id"))
      .cache()
    val nTruth = truth.count()

    def score(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val hits = mk().select(col("probe_id"), col("neighbor_id"))
        .join(truth, Seq("probe_id", "neighbor_id")).count()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%16s $hits%4d/$nTruth%-4d ${times.map(x => f"$x%.2f").mkString(" ")}")
    }

    // time the INNER pipeline frame, not the published-answer query:
    // after its first call qSimAnnIvf serves a staged ≤30-row parquet,
    // so rep timings of it would measure a trivial file read while the
    // prefix variants time real pipelines (r15 ADVICE)
    score("ivf(ceiling)", () => ScaleOps.ivfSearch(spark, sfDir))
    for (dim <- Seq(16, 32); r <- Seq(64, 160, 320))
      score(s"ivfpfx d$dim R$r", () => AnnOps.ivfPrefixSearch(spark, sfDir, dim, r))
    spark.stop()
  }
}
