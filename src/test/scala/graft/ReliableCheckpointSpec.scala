package graft

import org.scalatest.funsuite.AnyFunSuite

/** spark.graft.reliableCheckpoint=true must route the connected-components
  * round loop through reliable (directory-backed) checkpoints and still
  * reach the identical fixpoint labeling. */
class ReliableCheckpointSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("connectedComponents converges identically under reliable checkpoints") {
    val expected = LlmOps.qDedupComponents(spark, sf).collect().toSeq
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try {
      val got = LlmOps.qDedupComponents(spark, sf).collect().toSeq
      assert(got === expected)
      // the reliable path must actually have established a checkpoint dir
      assert(spark.sparkContext.getCheckpointDir.nonEmpty)
    } finally spark.conf.set("spark.graft.reliableCheckpoint", "false")
  }
}
