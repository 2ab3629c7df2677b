package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MiniLog

/** The mini-log contract behind q_timetravel: immutable data files +
  * versioned manifests give structural sharing across commits and
  * snapshot-isolated historical reads. */
class MiniLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming ingestion commits one mini-log version per micro-batch") {
    val sf = TestSpark.sf
    val result = StreamOps.qStreamMinilog(spark, sf).collect()
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_stream_minilog_tbl_" +
      spark.sparkContext.applicationId
    // two staged source files under maxFilesPerTrigger=1 → two commits
    // (initial load + one read-combine-rewrite merge)
    assert(MiniLog.latestVersion(table) === 2)
    // the final snapshot IS the batch aggregate (associativity of the
    // count/decimal-sum merge across arbitrary micro-batch slicings)
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
      .orderBy(col("user_id")).collect()
    assert(result.map(_.toSeq).sameElements(batch.map(_.toSeq)))
  }

  test("commits share unchanged files; as-of reads are snapshot-isolated") {
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_minilog_spec"
    RelOps.deleteRecursively(table)
    val base = spark.range(100).select(col("id"),
      (col("id") % 4).as("bucket"), (col("id") * 2).as("v"))

    val v1 = MiniLog.writeBucketFiles(base, table, "v1")
    MiniLog.commit(table, 1, v1)
    assert(v1.keySet === Set(0L, 1L, 2L, 3L))

    // v2: rewrite ONLY bucket 1 (v += 1000)
    val b1 = spark.read.parquet(v1(1L))
      .withColumn("v", col("v") + 1000).withColumn("bucket", lit(1L))
    val v2 = v1 ++ MiniLog.writeBucketFiles(b1, table, "v2")
    MiniLog.commit(table, 2, v2)
    // structural sharing: buckets 0/2/3 reference the v1 files BY PATH
    assert(Seq(0L, 2L, 3L).forall(b => v2(b) == v1(b)))
    assert(v2(1L) != v1(1L))

    // v3: delete bucket 3's id % 8 == 7 half (bucket 3 holds ids
    // ≡ 3 mod 4, i.e. ≡ 3 or 7 mod 8 — the rewrite must stay non-empty;
    // an EMPTIED bucket is dropped from the manifest map instead, per
    // the MiniLog contract)
    val b3 = spark.read.parquet(v2(3L))
      .filter(col("id") % 8 === 3).withColumn("bucket", lit(3L))
    val v3 = v2 ++ MiniLog.writeBucketFiles(b3, table, "v3")
    MiniLog.commit(table, 3, v3)
    assert(MiniLog.latestVersion(table) === 3)

    // manifest round-trip is exact
    assert(MiniLog.manifest(table, 2) === v2)

    def sumV(version: Int): Long =
      MiniLog.readAsOf(spark, table, version)
        .agg(sum(col("v"))).collect()(0).getLong(0)
    def nRows(version: Int): Long =
      MiniLog.readAsOf(spark, table, version).count()

    val baseSum = (0L until 100L).map(_ * 2).sum
    val b1Rows = (0L until 100L).count(_ % 4 == 1)
    assert(sumV(1) === baseSum)                      // v1: pristine
    assert(sumV(2) === baseSum + 1000L * b1Rows)     // v2: update visible
    assert(nRows(2) === 100L)                        // v3's delete invisible
    assert(nRows(3) === 100L - (0L until 100L).count(_ % 8 == 7))
    // historical reads unchanged AFTER later commits (files immutable)
    assert(sumV(1) === baseSum)

    // VACUUM retention: keep versions >= 2 — v1's superseded bucket-1
    // file (the only file no kept manifest references) is deleted, the
    // shared files survive, kept snapshots read byte-identically, and
    // v1's manifest is gone
    val keptBefore = (sumV(2), sumV(3), nRows(2), nRows(3))
    val (deleted, kept) = MiniLog.vacuum(table, keepFrom = 2)
    assert(deleted === 1, "exactly v1's rewritten bucket-1 file dies")
    assert(kept === MiniLog.manifest(table, 2).values.toSet
      .union(MiniLog.manifest(table, 3).values.toSet).size)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(v1(1L))))
    assert((sumV(2), sumV(3), nRows(2), nRows(3)) === keptBefore)
    assertThrows[Exception](MiniLog.readAsOf(spark, table, 1))
    RelOps.deleteRecursively(table)
  }

  test("two writers racing one version slot: exactly one wins, intact manifest") {
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_minilog_race"
    RelOps.deleteRecursively(table)
    val nWriters = 8
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nWriters)
    try {
      // all writers pile onto VERSION 1 with distinguishable payloads
      val attempts = (0 until nWriters).map { w =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            MiniLog.tryCommit(table, 1, Map(w.toLong -> s"writer$w.parquet"))
          }
        })
      }
      gate.countDown()
      val wins = attempts.map(_.get())
      assert(wins.count(identity) === 1, s"exactly one winner: $wins")
      // the published manifest is the WINNER's, whole and parseable
      val m = MiniLog.manifest(table, 1)
      val winner = wins.indexOf(true)
      assert(m === Map(winner.toLong -> s"writer$winner.parquet"))
      // no temp-file debris leaks past the race
      val leftovers = java.nio.file.Files.list(
        java.nio.file.Paths.get(table, "_graft_log"))
      try assert(leftovers.iterator().asScala
        .map(_.getFileName.toString).toList === List("00000001.json"))
      finally leftovers.close()
    } finally pool.shutdown()
    RelOps.deleteRecursively(table)
  }

  test("losers retry via commitNext: N writers land N distinct versions") {
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_minilog_retry"
    RelOps.deleteRecursively(table)
    val nWriters = 6
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nWriters)
    try {
      val committed = (0 until nWriters).map { w =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            gate.await()
            // each writer adds its own bucket, REBASED on the parent
            // manifest it observes at claim time (structural sharing:
            // earlier winners' entries ride through)
            MiniLog.commitNext(table, (v, parent) =>
              parent + (w.toLong -> s"writer$w.parquet"))
          }
        })
      }
      gate.countDown()
      val versions = committed.map(_.get())
      // every writer eventually lands, each on its own slot
      assert(versions.sorted === (1 to nWriters).toList,
        s"expected versions 1..$nWriters, got $versions")
      // the final manifest accumulated EVERY writer's bucket: each
      // retry rebased on the winner's map instead of clobbering it
      val last = MiniLog.manifest(table, nWriters)
      assert(last === (0 until nWriters)
        .map(w => w.toLong -> s"writer$w.parquet").toMap)
    } finally pool.shutdown()
    RelOps.deleteRecursively(table)
  }
}
