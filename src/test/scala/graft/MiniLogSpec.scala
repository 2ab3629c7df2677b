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
    // minAgeMillis=0: this test is single-writer, so the retention
    // guard (which protects files a CONCURRENT writer staged but has
    // not yet committed) would otherwise keep the just-written v1 file
    val keptBefore = (sumV(2), sumV(3), nRows(2), nRows(3))
    val (deleted, kept) = MiniLog.vacuum(table, keepFrom = 2, minAgeMillis = 0L)
    assert(deleted === 1, "exactly v1's rewritten bucket-1 file dies")
    assert(kept === MiniLog.manifest(table, 2).values.toSet
      .union(MiniLog.manifest(table, 3).values.toSet).size)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(v1(1L))))
    assert((sumV(2), sumV(3), nRows(2), nRows(3)) === keptBefore)
    assertThrows[Exception](MiniLog.readAsOf(spark, table, 1))
    RelOps.deleteRecursively(table)
  }

  test("vacuum retention guard: an in-flight writer's staged files survive") {
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_minilog_vacretain"
    RelOps.deleteRecursively(table)
    val dir = java.nio.file.Paths.get(table, "w0", "bucket=0")
    java.nio.file.Files.createDirectories(dir)
    val f0 = dir.resolve("part-0.parquet")
    java.nio.file.Files.write(f0, Array[Byte](1, 2, 3))
    MiniLog.commit(table, 1, Map(0L -> f0.toString))

    // a concurrent writer has STAGED its data file under its unique tag
    // but not yet committed a manifest naming it — to a manifest-only
    // liveness scan this file is dead
    val wdir = java.nio.file.Paths.get(table, "w1", "bucket=1")
    java.nio.file.Files.createDirectories(wdir)
    val staged = wdir.resolve("part-0.parquet")
    java.nio.file.Files.write(staged, Array[Byte](4, 5, 6))

    // default retention: the young staged file survives the sweep
    val (d1, _) = MiniLog.vacuum(table, keepFrom = 1)
    assert(d1 === 0)
    assert(java.nio.file.Files.exists(staged))
    // ... so the writer's subsequent commit names files that EXIST
    val v = MiniLog.commitNext(table, (_, parent) => parent + (1L -> staged.toString))
    assert(MiniLog.manifest(table, v).values
      .forall(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))))

    // the guard is age-based, not a no-op: an ORPHAN aged past the
    // window (a long-dead writer's debris) does get swept
    val orphan = wdir.resolve("part-orphan.parquet")
    java.nio.file.Files.write(orphan, Array[Byte](7))
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60L * 60 * 1000))
    val (d2, _) = MiniLog.vacuum(table, keepFrom = 1)
    assert(d2 === 1)
    assert(!java.nio.file.Files.exists(orphan))
    assert(java.nio.file.Files.exists(staged)) // still younger than window
    RelOps.deleteRecursively(table)
  }

  test("vacuum racing committing writers: real deletions, committed files survive") {
    // The sweep must be given REAL work or the race guarantee is
    // vacuous (the r15 first cut of this spec swept only young files,
    // which the retention window protects by construction — every
    // assertion passed even with the keep-set logic broken). Here each
    // writer REPLACES its own bucket per iteration and back-dates the
    // file it just SUPERSEDED (never the live one: aging a file that a
    // live manifest names would re-create the documented
    // staging-longer-than-retention hazard as test flake — the
    // retention window's contract is that it exceeds any
    // stage-to-commit latency). A superseded, aged file is exactly the
    // prey vacuum exists to take, and the sweeper keeps only the
    // LATEST manifest — so deletions genuinely interleave with
    // commits.
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_minilog_vacrace"
    RelOps.deleteRecursively(table)
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 60L * 60 * 1000)
    val seed = java.nio.file.Paths.get(table, "seed", "bucket=0")
    java.nio.file.Files.createDirectories(seed)
    val f0 = seed.resolve("part-0.parquet")
    java.nio.file.Files.write(f0, Array[Byte](0))
    MiniLog.commit(table, 1, Map(0L -> f0.toString))
    java.nio.file.Files.setLastModifiedTime(f0, old)
    val nWriters = 4
    val iters = 5
    val gate = new java.util.concurrent.CountDownLatch(1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nWriters + 1)
    val sweptDuring = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      val sweeper = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          gate.await()
          while (!stop.get()) {
            // keep only the latest snapshot — superseded, back-dated
            // files are live prey; in-flight (young) ones are not
            val (d, _) = MiniLog.vacuum(table, MiniLog.latestVersion(table))
            sweptDuring.addAndGet(d)
          }
        }
      })
      val writers = (0 until nWriters).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            gate.await()
            var prev: Option[java.nio.file.Path] = None
            (0 until iters).foreach { i =>
              val d = java.nio.file.Paths.get(table, s"w$w-$i", s"bucket=${w + 1}")
              java.nio.file.Files.createDirectories(d)
              val f = d.resolve("part-0.parquet")
              java.nio.file.Files.write(f, Array[Byte](w.toByte, i.toByte))
              MiniLog.commitNext(table,
                (_, parent) => parent + ((w + 1).toLong -> f.toString))
              // the commit superseded prev — age IT past the window
              // (the live file f stays young until ITS successor lands)
              prev.foreach(p =>
                try java.nio.file.Files.setLastModifiedTime(p, old)
                catch { case _: java.nio.file.NoSuchFileException => () })
              prev = Some(f)
            }
          }
        })
      }
      gate.countDown()
      writers.foreach(_.get())
      stop.set(true)
      sweeper.get()
    } finally pool.shutdown()
    // final deterministic sweep catches whatever the racing sweeps
    // missed; across both, EVERY superseded file (iters-1 per writer)
    // must die — proof the sweeps were doing real deletions — while
    // the live snapshot keeps exactly one file per bucket
    val (dFinal, kept) =
      MiniLog.vacuum(table, MiniLog.latestVersion(table))
    assert(sweptDuring.get() + dFinal === nWriters * (iters - 1),
      s"expected ${nWriters * (iters - 1)} superseded files swept, got " +
        s"${sweptDuring.get()} during + $dFinal final")
    assert(kept === nWriters + 1)
    val last = MiniLog.manifest(table, MiniLog.latestVersion(table))
    assert(last.size === nWriters + 1)
    assert(last.values.forall(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    RelOps.deleteRecursively(table)
  }

  test("manifest meta round-trips; batch replay with the same batchId is a no-op") {
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_minilog_idem"
    RelOps.deleteRecursively(table)
    import org.apache.spark.sql.types.DecimalType
    def delta(): org.apache.spark.sql.DataFrame = spark.range(8)
      .select(col("id").as("user_id"), lit(1L).as("n_events"),
        col("id").cast(DecimalType(18, 4)).as("sum_value"),
        (col("id") % 4).as("bucket"))
    StreamOps.minilogMergeBatch(spark, table, delta(), batchId = 0L)
    assert(MiniLog.latestVersion(table) === 1)
    assert(MiniLog.manifestMeta(table, 1) === Map("batchId" -> "0"))
    // Spark failure-retry re-invokes foreachBatch with the SAME batchId:
    // the merge must be a no-op success, not a double-apply or an abort
    StreamOps.minilogMergeBatch(spark, table, delta(), batchId = 0L)
    assert(MiniLog.latestVersion(table) === 1)
    // a genuinely new batch advances the version and double-counts nothing
    StreamOps.minilogMergeBatch(spark, table, delta(), batchId = 1L)
    assert(MiniLog.latestVersion(table) === 2)
    val total = MiniLog.readAsOf(spark, table, 2)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total === 16L) // 2 batches x 8 users, the replay added nothing
    // a CORRUPT parent manifest must FAIL the next batch (Spark then
    // retries it), never silently restart the log at version 1 or
    // "rebase" on an empty file set over committed data
    val log = java.nio.file.Paths.get(table, "_graft_log", "00000002.json")
    java.nio.file.Files.write(log, "{not json".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    assertThrows[IllegalArgumentException](
      StreamOps.minilogMergeBatch(spark, table, delta(), batchId = 2L))
    assert(MiniLog.latestVersion(table) === 2) // nothing restarted the log
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
