package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the r18 staging-disclosure plumbing (the r17 verdict's item
  * 3): bench.json's `staging` map is built from SharedStage.buildLog,
  * so the ledger must (a) record exactly one entry per built stage,
  * keyed by (sfDir, name) with positive seconds and the consumer label
  * current at build time, and (b) NOT re-record on memo hits — a
  * cache hit that re-logged would smear a later query's label over the
  * true first consumer and fabricate phantom surcharges. */
class SharedStageLedgerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("buildLog records one entry per build with the consumer label; hits do not re-record") {
    import spark.implicits._
    val sfTag = s"/tmp/ledger_spec_fake_sf_${System.nanoTime()}"
    val name = "ledger_spec_stage"
    var builds = 0
    def stage(): String =
      SharedStage.memoDir(spark, sfTag, name)(
        d => new java.io.File(d, "_done").exists()) { d =>
        builds += 1
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        Seq(1L, 2L).toDF("x").write.mode("overwrite")
          .parquet(s"$d/data")
        java.nio.file.Files.createFile(java.nio.file.Paths.get(d, "_done"))
      }

    val prev = SharedStage.consumerLabel
    try {
      SharedStage.consumerLabel = "q_first_consumer"
      val dir = stage()
      assert(builds === 1)
      val entry = SharedStage.buildLog.get((sfTag, name))
      assert(entry != null, "build must land in the ledger")
      assert(entry._1 > 0.0, s"build seconds must be positive: $entry")
      assert(entry._2 === "q_first_consumer")
      // expected path comes from the single naming authority
      assert(dir === SharedStage.stagedPath(spark, sfTag, name))

      // a later consumer HITS the memo: no rebuild, no re-record
      SharedStage.consumerLabel = "q_second_consumer"
      val dir2 = stage()
      assert(dir2 === dir)
      assert(builds === 1, "memo hit must not rebuild")
      assert(SharedStage.buildLog.get((sfTag, name))._2 === "q_first_consumer",
        "memo hit must not smear a later consumer over the first")
    } finally {
      SharedStage.consumerLabel = prev
      RelOps.deleteRecursively(SharedStage.stagedPath(spark, sfTag, name))
    }
  }
}
