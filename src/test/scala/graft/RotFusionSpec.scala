package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19 rot∘aniso FUSION (AnnOps.rotAnisoSql) bit-identical to
  * the nested composition rotSql(anisoSql(x)) it replaced in the
  * pq_rot_aniso pipeline. The fusion exists for performance only — the
  * nested form re-evaluates the whole inner 64-element transform per
  * element_at call once Catalyst collapses the two projections
  * (higher-order functions run interpreted: 64×64 lambda invocations +
  * 64 array allocations per row, measured r19 as a 2.3×
  * q_sim_ann_recall pass-1 regression) — so the ONLY acceptable output
  * difference is none at all: the trained rotated codebook, the codes,
  * and the arm's oracle hash all sit downstream of these doubles. */
class RotFusionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("fused rot∘aniso equals the nested composition bit-for-bit") {
    val nested = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr(AnnOps.anisoSql("embedding")).as("e"))
      .localCheckpoint() // materialize: block the projection collapse
      .select(col("vec_id"), expr(AnnOps.rotSql("e")).as("e"))
    val fused = AnnOps.rotAnisoEmb(spark, sf)
      .select(col("vec_id"), col("embedding").as("f"))
    // representation-level compare (shortest-roundtrip string form is
    // injective over distinct double bit patterns, and unlike `=` it
    // distinguishes -0.0 from 0.0 and matches NaN to itself): equality
    // must be on the representation, not tolerance — parquet staging
    // and the oracle replay both hash the exact doubles
    // null-safe (r19 ADVICE): a null element or a length mismatch makes
    // zip_with emit a null comparison and forall return null — count a
    // row as a MISMATCH unless forall is literally true
    val mismatches = nested.join(fused, Seq("vec_id"))
      .select(col("vec_id"),
        expr("zip_with(e, f, (a, b) -> " +
          "CAST(a AS STRING) = CAST(b AS STRING))").as("eq"),
        expr("size(e) = size(f)").as("samelen"))
      .filter(!(coalesce(expr("forall(eq, x -> x)"), lit(false)) &&
        coalesce(col("samelen"), lit(false))))
      .count()
    assert(mismatches == 0L,
      s"$mismatches vectors differ between fused and nested rot∘aniso")
  }
}
