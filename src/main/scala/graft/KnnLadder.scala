package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness for the corpus-scale kNN join's fanout knob (the measured-
  * ladder discipline): for each query-side cell fanout, recall@3 of the
  * cell-confined join against the brute-force cosine truth over the SAME
  * query class, plus wall seconds — the graded q_sim_knn_join fanout is
  * picked from this table, never by intuition. (The truth side is a full
  * |queries|×|corpus| cross-join — fine at sf0.1, the exact thing the
  * graded operator exists to avoid at scale.)
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.KnnLadder"
  */
object KnnLadder {
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

    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("na", expr("graft_norm_sq(embedding)"))
      .cache()
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"),
        col("na").as("nc"))

    // brute-force truth for the whole query class
    val queriesAll = e.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("na").as("qna"))
    val wT = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val truth = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nvec"), col("na").as("nna"))
      .crossJoin(queriesAll)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(expr("graft_dot(nvec, qvec)") /
        sqrt(col("nna") * col("qna")), 4))
      .withColumn("rn", row_number().over(wT)).filter(col("rn") <= 3)
      .select(col("query_id"), col("neighbor_id"))
      .cache()
    val nTruth = truth.count()

    def knn(fanout: Int) = {
      val ranked = CellAssign.rank(e, cents, "embedding", "na", top = fanout)
        .select(col("vec_id"), col("embedding"), col("na"), col("cell_id"),
          col("arn"))
      val corpus = ranked.filter(col("arn") === 1)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"),
          col("na").as("nna"), col("cell_id"))
      val queries = ranked.filter(col("vec_id") % 7 === 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
          col("na").as("qna"), col("cell_id"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      corpus.hint("shuffle_hash").join(queries, Seq("cell_id"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(expr("graft_dot(nvec, qvec)") /
            sqrt(col("nna") * col("qna")), 4).as("sim"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("query_id"), col("neighbor_id"))
    }

    println(f"${"fanout"}%6s ${"recall@3"}%12s ${"secs"}%s")
    // fanout can run to the full cell count (8 = no pruning, recall 1.0);
    // the graded config sits at the measured knee of this table
    Seq(1, 2, 3, 4, 5, 6).foreach { f =>
      val hits = knn(f).join(truth, Seq("query_id", "neighbor_id")).count()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        knn(f).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$f%6d $hits%5d/$nTruth%-5d ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
