package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The safety contract of the r17 write-once ANN index store: every
  * maintenance query mutates a CATALOG TABLE whose data files are hard
  * links into the shared staged store, so the whole design rests on one
  * invariant — no mutation path may ever write THROUGH a link into the
  * store (parquet files are immutable here; dynamic partition
  * overwrite, DROP PARTITION purge, and append all replace whole
  * files). A violation would silently corrupt every LATER consumer's
  * clone (the classic shared-mutable-state failure), and nothing else
  * in the suite would catch it until hashes diverged downstream. This
  * spec pins it directly: byte-hash every store file, run all three
  * mutating queries (delete+compact, rebalance split, incremental
  * append), and require the store bit-identical — and the read-only
  * probe's answer unchanged. */
class IndexCloneIsolationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def fileHashes(dir: Path): Map[String, Int] =
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => dir.relativize(p).toString ->
        java.util.Arrays.hashCode(Files.readAllBytes(p)))
      .toMap

  test("maintenance mutations never write through a clone link into the store") {
    // first consumer builds the store
    val probeBefore = AnnOps.qSimAnnIndex(spark, sf).collect().map(_.toSeq)
    assert(probeBefore.nonEmpty)
    // the naming authority, not a re-derived string (r17 ADVICE)
    val store = Paths.get(AnnOps.indexStorePath(spark, sf))
    assert(Files.isDirectory(store), s"staged store missing at $store")
    val before = fileHashes(store)
    assert(before.nonEmpty)

    // all three mutation paths, each against its own clone
    AnnOps.qSimAnnIndexDelete(spark, sf).collect()
    AnnOps.qSimAnnIndexRebalance(spark, sf).collect()
    AnnOps.qSimAnnIndexIncr(spark, sf).collect()

    assert(fileHashes(store) === before,
      "a maintenance query mutated the shared staged store through a link")
    // and the read-only probe still serves the original answer
    val probeAfter = AnnOps.qSimAnnIndex(spark, sf).collect().map(_.toSeq)
    assert(probeAfter.sameElements(probeBefore))
  }
}
