package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions

/** IVF coarse-quantizer training: Lloyd's k-means iterations as pure
  * DataFrame operations (q_sim_ann_ivf uses seeded centroids for oracle
  * determinism; this is the production path that refines them).
  *
  * Per iteration: broadcast the k centroids, assign every vector to its
  * nearest (row-local L2 argmin over the broadcast centroid array — no
  * shuffle of the vectors at all), then recompute means by exploding to
  * (cell, dim, value) and averaging — two keyed shuffles of (k × dim)
  * aggregates, never of raw vectors. Scales linearly in rows; k and dim
  * are the small constants.
  */
object IvfTraining {

  /** Nearest centroid by ||v||² − 2·v·c + ||c||², row-local over the
    * broadcast centroid array (CellAssign). */
  private def assign(vectors: DataFrame, cents: DataFrame): DataFrame =
    CellAssign.rank(vectors,
        cents.select(col("cell_id"), col("centroid").as("cvec"),
          expr("graft_norm_sq(centroid)").as("nc")),
        "embedding", "graft_norm_sq(embedding)", top = 1)
      .select(col("vec_id"), col("embedding"), col("cell_id"))

  /** (cell_id, centroid: array<double>, n) after `iters` Lloyd rounds,
    * seeded from the first k vectors. */
  def train(spark: SparkSession, vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = vectors.select(col("vec_id"), col("embedding"))
    var cents = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assign(vecs, cents)
      cents = assigned
        .select(col("cell_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cell_id"), col("dim"))
        .agg(avg(col("x").cast(DoubleType)).as("m"))
        .groupBy(col("cell_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
        .select(col("cell_id"),
          transform(col("pairs"), p => p.getField("m")).as("centroid"))
    }
    assign(vecs, cents)
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
      .join(cents, Seq("cell_id"))
      .select(col("cell_id"), col("centroid"), col("n"))
  }

  /** Mean within-cluster squared distance — the k-means objective. */
  def objective(spark: SparkSession, vectors: DataFrame, cents: DataFrame): Double = {
    VectorFunctions.register(spark)
    assign(vectors.select(col("vec_id"), col("embedding")),
        cents.select(col("cell_id"), col("centroid")))
      .join(cents, Seq("cell_id"))
      .select((expr("graft_norm_sq(embedding)") -
        lit(2.0) * expr("graft_dot(embedding, centroid)") +
        expr("graft_norm_sq(centroid)")).as("d2"))
      .agg(avg(col("d2"))).collect()(0).getDouble(0)
  }
}
