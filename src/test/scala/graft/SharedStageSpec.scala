package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SharedStage is the session-scoped build-once/serve-many memo every
  * trained ANN midpoint and the time-travel log ride on. The r13 ADVICE
  * found two latent hazards in its first cut: builds ran INSIDE a
  * ConcurrentHashMap mapping function (nested stages → JDK "Recursive
  * update" ~1-in-8 fresh applications), and the staging tag used
  * `sfDir.hashCode` (two colliding sfDirs silently share one dir).
  * These tests pin the fixed contract. */
class SharedStageSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("nested stages build without recursive-update crashes, once each") {
    val builds = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    def counted(name: String)(mk: => org.apache.spark.sql.DataFrame) =
      SharedStage(spark, "/nested/probe", name) {
        builds.merge(name, 1, (a, b) => a + b); mk
      }
    // outer build stages TWO inner keys from inside its own build block —
    // the exact shape that crashed the CHM version when bins collided
    val outer = counted("ss_outer") {
      val a = counted("ss_inner_a")(spark.range(10).toDF("v"))
      val b = counted("ss_inner_b")(spark.range(5).toDF("v"))
      a.union(b)
    }
    assert(outer.count() === 15)
    // every consumer after the first reads files; no rebuilds
    assert(counted("ss_outer")(fail("must not rebuild")).count() === 15)
    assert(counted("ss_inner_a")(fail("must not rebuild")).count() === 10)
    assert(builds.get("ss_outer") === 1)
    assert(builds.get("ss_inner_a") === 1)
    assert(builds.get("ss_inner_b") === 1)
  }

  test("concurrent first-touch of one key builds once, all readers agree") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            SharedStage(spark, "/conc/probe", "ss_conc") {
              builds.incrementAndGet()
              spark.range(100).toDF("v")
            }.count()
        })
      }
      assert(tasks.map(_.get()).forall(_ === 100L))
      // the per-key lock serializes the build: exactly one runs
      assert(builds.get() === 1, s"expected 1 build, got ${builds.get()}")
    } finally pool.shutdown()
  }

  test("8 threads first-touching a NESTED stage: no crash, every build once") {
    // the combined worst case of the r13 bug class: concurrent first
    // touch AND nested staging in the same instant. The CHM version
    // could throw 'Recursive update' here; a naive lock design could
    // deadlock (outer lock held while taking inner locks) — the DAG
    // lock-order argument says neither happens and builds stay unique.
    val builds = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    def counted(name: String)(mk: => org.apache.spark.sql.DataFrame) =
      SharedStage(spark, "/nested/conc", name) {
        builds.merge(name, 1, (a, b) => a + b); mk
      }
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (0 until 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            gate.await()
            counted("nc_outer") {
              counted("nc_a")(spark.range(4).toDF("v"))
                .union(counted("nc_b")(spark.range(6).toDF("v")))
            }.count()
          }
        })
      }
      gate.countDown()
      assert(tasks.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        .forall(_ === 10L))
      assert(builds.get("nc_outer") === 1)
      assert(builds.get("nc_a") === 1)
      assert(builds.get("nc_b") === 1)
    } finally pool.shutdown()
  }

  test("staging tags are injective over sfDir (no hashCode collisions)") {
    // distinct paths that an ASCII-sanitizer or hashCode could conflate
    val dirs = Seq("/a/b", "/a.b", "/a_b", "/a/b/", "Aa", "BB")
    val tags = dirs.map(SharedStage.pathTag)
    assert(tags.distinct.size === dirs.size, s"tag collision: $tags")
    // hex round-trips: the tag fully determines a short path
    assert(new String(tags.head.grouped(2).toArray
      .map(h => Integer.parseInt(h, 16).toByte), "UTF-8") === dirs.head)
    // long paths digest to a FIXED 64 chars (raw hex would blow the
    // ~255-byte filesystem name limit) and stay distinct
    val long1 = "/data/" + ("x" * 200) + "/sf0.1"
    val long2 = "/data/" + ("x" * 200) + "/sf0.2"
    val (t1, t2) = (SharedStage.pathTag(long1), SharedStage.pathTag(long2))
    assert(t1.length === 64 && t2.length === 64 && t1 != t2)
  }

  test("an externally cleaned dir is rebuilt on next touch") {
    var builds = 0
    def go() = SharedStage(spark, "/clean/probe", "ss_clean") {
      builds += 1; spark.range(7).toDF("v")
    }
    assert(go().count() === 7)
    val dir = RelOps.stagingDir(spark,
      s"shared_ss_clean_${SharedStage.pathTag("/clean/probe")}")
    RelOps.deleteRecursively(dir)
    assert(go().count() === 7)
    assert(builds === 2, "missing-_SUCCESS dir must trigger a rebuild")
  }
}
