package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.sources.BinaryRecords

/** Round-trip + TeraSort property for the fixed-width binary source/sink:
  * gen → write unsorted → terasort → files concatenated in name order are
  * globally key-sorted, record count and key multiset preserved. */
class BinaryRecordsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def genTeraRecords(n: Int) = BinaryRecords.teragen(spark, n)

  test("binary record sink/scan round-trips 100-byte records") {
    val dir = Files.createTempDirectory("graft_bin").toString
    val in = s"$dir/in"
    BinaryRecords.write(genTeraRecords(5000), in)
    val back = BinaryRecords.read(spark, in)
    assert(back.count() === 5000)
    val r = back.select(length(col("key")).as("lk"), length(col("payload")).as("lp"))
      .distinct().collect()
    assert(r.length === 1 && r(0).getInt(0) === 10 && r(0).getInt(1) === 90)
  }

  test("terasort over binary files: name-ordered concatenation is globally sorted") {
    val dir = Files.createTempDirectory("graft_tera").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    BinaryRecords.write(genTeraRecords(5000), in)
    BinaryRecords.terasort(spark, in, out, partitions = 6)

    // read output files in name order, byte-concatenate, check sortedness
    val parts = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)
    assert(parts.size === 6)
    val keys = parts.flatMap { p =>
      val bytes = Files.readAllBytes(p)
      assert(bytes.length % 100 === 0, s"partial record in $p")
      bytes.grouped(100).map(r => new String(r.take(10), "UTF-8")).toSeq
    }
    assert(keys.length === 5000)
    assert(keys.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true },
      "concatenated output not globally sorted")
    // permutation: same key multiset as input
    val inKeys = genTeraRecords(5000)
      .select(col("key").cast("string")).collect().map(_.getString(0))
    assert(keys.sorted.sameElements(inKeys.sorted))
  }
}
