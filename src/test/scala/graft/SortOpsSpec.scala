package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** TeraValidate properties, ported per SURVEY.md §5: sortedness (zero
  * adjacent inversions) + permutation preservation (order-independent
  * checksum), over both the engine pipeline and seeded-random inputs. */
class SortOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("q_sort_global output is globally sorted and a permutation of the input") {
    val out = SortOps.qSortGlobal(spark, TestSpark.sf).collect()
    val keys = out.map(_.getString(0))
    assert(keys.length === 6000)
    assert(keys.sameElements(keys.sorted), "global order violated")
    assert(keys.distinct.length === keys.length, "keys must be unique (LCG injective)")
    // permutation: payloads are lpad(i) for i in [0, n)
    val payloads = out.map(_.getString(1)).map(_.toLong).sorted
    assert(payloads.sameElements(0L until 6000L))
  }

  test("q_sort_validate reports zero violations on 6000 rows") {
    val r = SortOps.qSortValidate(spark, TestSpark.sf).collect()(0)
    assert(r.getLong(0) === 6000L)
    assert(r.getLong(1) === 0L, "violations")
  }

  test("q_sort_range_partition reports exhaustive rows and zero range overlaps") {
    val r = SortOps.qSortRangePartition(spark, TestSpark.sf).collect()(0)
    assert(r.getLong(0) === 6000L, "all rows accounted for across partitions")
    assert(r.getLong(1) === 0L, "adjacent partition ranges overlap")
    assert(r.getString(2) <= r.getString(3), "global min above global max")
  }

  test("property: BinaryType orderBy == unsigned byte-lexicographic order (TeraSort semantics)") {
    for (seed <- Seq(1, 7, 42, 1234, 99999)) {
      val rnd = new Random(seed)
      val recs = Seq.fill(300)(Array.fill(rnd.nextInt(12) + 1)(rnd.nextInt(256).toByte))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(recs.map(Row(_)), 4),
        StructType(Seq(StructField("key", BinaryType))))
      val got = df.orderBy(col("key")).collect().map(_.getAs[Array[Byte]](0).toSeq)
      val exp = recs.map(_.toSeq).sortWith { (a, b) =>
        val diff = a.zip(b).find { case (x, y) => x != y }
        diff match {
          case Some((x, y)) => (x & 0xff) < (y & 0xff)
          case None => a.length < b.length
        }
      }
      assert(got.sameElements(exp), s"seed=$seed")
    }
  }
}
