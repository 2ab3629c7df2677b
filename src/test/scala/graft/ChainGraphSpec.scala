package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stress graph shape for dedup clustering: a long PATH. Min-label's
  * pointer jump halves label distance per round (measured: 2048 nodes in
  * 12 rounds — the r7 "doubling doesn't help" note was wrong for
  * chains); the alternating large-star/small-star contraction
  * (spark.graft.ccAlgo=stars) carries a proven O(log² n) bound on ANY
  * shape, independent of pointer alignment. This spec pins both
  * behaviors and their equivalence on paths and on the real candidate
  * graph. */
class ChainGraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def path(n: Int): DataFrame = spark.range(n - 1)
    .select(col("id").as("va"), (col("id") + 1).as("vb"))

  private def withAlgo[T](algo: String)(body: => T): T = {
    spark.conf.set("spark.graft.ccAlgo", algo)
    try body finally spark.conf.unset("spark.graft.ccAlgo")
  }

  test("star contraction labels a 2048-node path entirely to node 0") {
    val labels = withAlgo("stars") {
      LlmOps.connectedComponents(path(2048), maxIter = 40)
        .agg(count(lit(1)).as("n"), max(col("label")).as("mx"),
          min(col("label")).as("mn")).collect()(0)
    }
    assert(labels.getLong(0) === 2048L)
    assert(labels.getLong(1) === 0L && labels.getLong(2) === 0L)
  }

  test("min-label's pointer jump halves chains: a 2048-node path converges under the cap") {
    val labels = LlmOps.connectedComponents(path(2048), maxIter = 20)
      .agg(count(lit(1)).as("n"), max(col("label")).as("mx")).collect()(0)
    assert(labels.getLong(0) === 2048L && labels.getLong(1) === 0L,
      "jump-accelerated label propagation should cover a 2048-path in ~12 rounds")
  }

  test("star contraction labels two disjoint paths to their own minima") {
    // path 0..99 plus path 1000..1099
    val pairs = path(100).union(path(100)
      .select((col("va") + 1000).as("va"), (col("vb") + 1000).as("vb")))
    val labels = withAlgo("stars") {
      LlmOps.connectedComponents(pairs, maxIter = 40).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(labels.size === 200)
    assert(labels.filter(_._1 < 1000).values.toSet === Set(0L))
    assert(labels.filter(_._1 >= 1000).values.toSet === Set(1000L))
  }

  test("spark.graft.ccStarsMaxIter makes a tight stars budget enforceable") {
    // the default floor of 60 exists because stars' bound is O(log² n)
    // rounds, but a caller that really wants a hard cap sets the conf:
    // 2 rounds cannot contract a 2048-path, so the loud iteration-cap
    // throw must fire instead of silently running 60 rounds
    spark.conf.set("spark.graft.ccStarsMaxIter", "2")
    try {
      val ex = intercept[Exception] {
        withAlgo("stars") {
          LlmOps.connectedComponents(path(2048), maxIter = 40).collect()
        }
      }
      assert(ex.getMessage != null)
    } finally spark.conf.unset("spark.graft.ccStarsMaxIter")
  }

  test("both algorithms agree on the real near-dup candidate graph") {
    val a = LlmOps.qDedupComponents(spark, sf).collect().map(_.toSeq)
    val b = withAlgo("stars") {
      LlmOps.qDedupComponents(spark, sf).collect().map(_.toSeq)
    }
    assert(a.nonEmpty && a.sameElements(b),
      "minlabel and stars must produce identical clusters")
  }
}
