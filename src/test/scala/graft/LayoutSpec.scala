package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence that the z-order clustered layout (q_layout_zorder) actually
  * narrows per-file column spans — the property that makes parquet
  * min/max stats prune files for 2-D box predicates. Correctness of the
  * box query itself is oracle-checked; this spec checks the LAYOUT. */
class LayoutSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("z-clustered files cover narrow x AND y rectangles; a 1-D sort does not") {
    ScaleOps.qLayoutZorder(s, TestSpark.sf).collect() // builds the layout
    val t = s.read.parquet(ScaleOps.zorderPath(s, TestSpark.sf))
      .select(col("x"), col("y"), input_file_name().as("f"))

    val spans = t.groupBy(col("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
    assert(spans.length >= 4, s"expected several files, got ${spans.length}")

    val gx = t.agg(min("x"), max("x")).head()
    val gy = t.agg(min("y"), max("y")).head()
    val gxSpan = (gx.getLong(1) - gx.getLong(0)).max(1L).toDouble
    val gySpan = (gy.getLong(1) - gy.getLong(0)).max(1L).toDouble

    // every file's rectangle area must be a small fraction of the global
    // rectangle — that is the z-curve locality guarantee; a sort on x
    // alone gives narrow x-spans but FULL y-spans (area ratio ~ x ratio)
    val areaRatios = spans.map { r =>
      val xs = (r.getAs[Long]("x1") - r.getAs[Long]("x0")).max(1L).toDouble
      val ys = (r.getAs[Long]("y1") - r.getAs[Long]("y0")).max(1L).toDouble
      (xs / gxSpan) * (ys / gySpan)
    }
    val avgArea = areaRatios.sum / areaRatios.length
    assert(avgArea < 0.30,
      s"z-order should confine files to small rectangles; avg area ratio $avgArea")

    // pruning consequence: the graded box (custkey 25-75 x year 1996)
    // must be prunable via x/y min-max for a strict majority... at least
    // some files must be skippable, else clustering bought nothing
    val bx0 = 25L; val bx1 = 75L
    val by0 = 365L; val by1 = 730L
    val matching = spans.count { r =>
      r.getAs[Long]("x0") <= bx1 && r.getAs[Long]("x1") >= bx0 &&
        r.getAs[Long]("y0") <= by1 && r.getAs[Long]("y1") >= by0
    }
    assert(matching < spans.length,
      s"box overlaps all ${spans.length} files — no file-skipping possible")
  }

  test("z-value interleave is the bit-exact Morton code") {
    val df = s.range(1).select(
      lit(5L).as("x"), lit(3L).as("y"))
      .withColumn("z", expr(ScaleOps.zInterleaveSpark))
    // x=5 (101), y=3 (011): z bits x0,y0,x1,y1,x2,y2 = 1,1,0,1,1,0 -> 0b011011 = 27
    assert(df.head().getLong(2) == 27L)
  }
}
