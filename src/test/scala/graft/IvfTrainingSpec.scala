package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd's iterations must not increase the k-means objective, must keep
  * every vector assigned, and must produce k non-degenerate cells. */
class IvfTrainingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("k-means training lowers the objective and covers all vectors") {
    val vecs = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding"))
    val seed = IvfTraining.train(spark, vecs, k = 8, iters = 0)
    val trained = IvfTraining.train(spark, vecs, k = 8, iters = 3)

    val objBefore = IvfTraining.objective(spark, vecs, seed)
    val objAfter = IvfTraining.objective(spark, vecs, trained)
    assert(objAfter <= objBefore + 1e-9,
      s"objective increased: $objBefore -> $objAfter")
    assert(objAfter < objBefore, "three Lloyd rounds should improve seeded centroids")

    val cells = trained.collect()
    assert(cells.length === 8)
    assert(cells.map(_.getLong(2)).sum === vecs.count())
    cells.foreach(r => assert(r.getSeq[Double](1).length === 64))
  }
}
