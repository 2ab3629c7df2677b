package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the fixed-point PageRank: total mass conservation (up to
  * the bounded integer-floor leak), the teleport floor, and exact rerun
  * determinism — the property floating-point PageRank cannot give and the
  * whole reason the iteration runs in scaled integers. */
class GraphOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val rows = GraphOps.qGraphPagerank(spark, sf).collect()

  test("one rank per nation, ordered by descending fixed-point rank") {
    assert(rows.length === 25)
    val ranks = rows.map(_.getLong(1))
    assert(ranks.sameElements(ranks.sortBy(-_)))
  }

  test("mass is conserved up to the integer-floor leak (<1% of scale)") {
    val total = rows.map(_.getLong(1)).sum
    assert(total <= 1000000000000L)
    // each floor (share normalization, contrib, damping) only ever LOSES
    // sub-unit mass; the compounded leak over 5 rounds stays tiny
    assert(total >= 990000000000L)
  }

  test("every node keeps at least the teleport floor 0.15/n") {
    val base = 15L * 1000000000000L / (100L * 25L)
    assert(rows.forall(_.getLong(1) >= base))
  }

  test("reruns are bit-identical (integer iteration, no float sums)") {
    val again = GraphOps.qGraphPagerank(spark, sf).collect()
    assert(rows.map(_.toSeq).sameElements(again.map(_.toSeq)))
  }

  test("the double rendering is exactly rank_fp / 1e12") {
    rows.foreach { r =>
      assert(r.getDouble(2) === r.getLong(1).toDouble / 1e12)
    }
  }

  test("dangling nodes redistribute their mass instead of leaking it") {
    import spark.implicits._
    // 0 → 1 → 2, node 2 dangling: without redistribution node 2's mass
    // drains and the total collapses toward the teleport floor
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val edges = Seq((0L, 1L, 1000000L), (1L, 2L, 1000000L))
      .toDF("src", "dst", "wshare")
    val out = GraphOps.pagerankIterate(nodes, edges, 3L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = out.values.sum
    assert(total <= 1000000000000L && total >= 999999990000L,
      s"mass not conserved with a dangling node: $total")
    // the chain ranks strictly: 2 (fed by 1 + dangling) > 1 > 0
    assert(out(2L) > out(1L) && out(1L) > out(0L))
  }

  test("a disconnected isolate keeps teleport + dangling share only") {
    import spark.implicits._
    // 0 ↔ 1 strongly connected, 2 isolated (dangling, no in-edges)
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val edges = Seq((0L, 1L, 1000000L), (1L, 0L, 1000000L))
      .toDF("src", "dst", "wshare")
    val out = GraphOps.pagerankIterate(nodes, edges, 3L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // symmetric pair ties exactly (integer arithmetic — no float wobble)
    assert(out(0L) === out(1L))
    assert(out(2L) < out(0L))
    // the isolate's floor: base teleport plus its own recycled dangling
    // share, never zero
    assert(out(2L) > 0L)
  }
}
