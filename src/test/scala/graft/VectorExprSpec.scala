package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** The codegen'd vector kernels must agree bit-for-bit with the
  * higher-order-function formulation they replaced (that equivalence is
  * what lets AnnOps swap them in without touching any oracle). */
class VectorExprSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("graft_dot and graft_norm_sq match the HOF forms bit-for-bit") {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, TestSpark.sf).limit(200)
    val hofNorm = aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
    val hofDot = aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    val rows = e.select(
      expr("graft_norm_sq(embedding)").as("n_native"),
      hofNorm.as("n_hof"),
      expr("graft_dot(embedding, embedding)").as("d_native"),
      hofDot.as("d_hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "norm differs from HOF")
      assert(r.getDouble(2) == r.getDouble(3), "dot differs from HOF")
      assert(r.getDouble(0) == r.getDouble(2), "dot(v,v) != norm_sq(v)")
    }
  }

  test("graft_dot handles mixed float/double arrays (literal hyperplanes)") {
    VectorFunctions.register(spark)
    val r = Tables.embeddings(spark, TestSpark.sf).limit(1)
      .select(expr(s"graft_dot(embedding, array(${Seq.fill(64)("1.0D").mkString(",")}))").as("s"),
        aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast(DoubleType)).as("h"))
      .collect()(0)
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("GraftExtensions wiring applies cleanly") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
