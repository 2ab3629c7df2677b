package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property proof-by-fuzz for the batched BPE selection
  * (TextOps.selectSafeBatch): over RANDOM weighted word tables on tiny
  * alphabets — the regime with maximal pair ties, shared symbols,
  * self-pairs, and forced chains — the batched trainer must produce the
  * IDENTICAL merge sequence as reference sequential BPE. The whole
  * simulation is driver-side Scala (the snapshots the Spark jobs would
  * collect are computed exactly from the token table), so thousands of
  * corpora run in seconds; the graded q_text_bpe_batched covers the
  * Spark plumbing against the DuckDB oracle.
  */
class BpeBatchSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: $res")
  }

  private type Table = Seq[(Vector[String], Long)] // (symbols, weight)

  private def pairCounts(tab: Table): Map[(String, String), Long] =
    tab.flatMap { case (tk, n) =>
      tk.zip(tk.tail).map(p => p -> n)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def tripleCounts(tab: Table): Map[(String, String, String), Long] =
    tab.flatMap { case (tk, n) =>
      tk.indices.drop(2).map(i => (tk(i - 2), tk(i - 1), tk(i)) -> n)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  /** Greedy left-to-right non-overlapping merge — the token-level
    * equivalent of the double-space string replace. */
  private def applyMerge(tk: Vector[String], x: String, y: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < tk.length) {
      if (i + 1 < tk.length && tk(i) == x && tk(i + 1) == y) {
        out += (x + y); i += 2
      } else { out += tk(i); i += 1 }
    }
    out.result()
  }

  private def applyAll(tab: Table, x: String, y: String): Table =
    tab.map { case (tk, n) => (applyMerge(tk, x, y), n) }

  /** Reference sequential BPE: argmax by (cnt DESC, x ASC, y ASC). */
  private def sequential(tab0: Table, rounds: Int): Seq[(String, String)] = {
    var tab = tab0
    val out = Seq.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val pc = pairCounts(tab)
      if (pc.isEmpty) exhausted = true
      else {
        val (x, y) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        out += ((x, y))
        tab = applyAll(tab, x, y)
        r += 1
      }
    }
    out.result()
  }

  /** Batched BPE driven by the SAME selection logic as the graded query,
    * with the Spark snapshot jobs simulated exactly in Scala. */
  private def batched(tab0: Table, rounds: Int, maxBatch: Int)
      : (Seq[(String, String)], Int) = {
    var tab = tab0
    val out = Seq.newBuilder[(String, String)]
    var done = 0
    var loops = 0
    var exhausted = false
    while (done < rounds && !exhausted) {
      val pc = pairCounts(tab)
      if (pc.isEmpty) exhausted = true
      else {
        loops += 1
        val top = pc.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }
          .take(3 * maxBatch).map { case ((x, y), c) => (x, y, c) }.toArray
        val tc = tripleCounts(tab)
        val topSet = top.map(t => (t._1, t._2)).toSet
        val tripTopK = tc.toSeq.flatMap { case ((a, b, c), n) =>
          Seq(((b, c), (n, "L", a)), ((a, b), (n, "R", c)))
        }.filter(e => topSet.contains(e._1))
          .groupMap(_._1)(_._2)
          .map { case (k, vs) =>
            k -> vs.groupMapReduce(v => (v._2, v._3))(_._1)(_ + _)
              .map { case ((side, z), n) => (n, side, z) }.toSeq
              .sortBy { case (c3, side, z) => (-c3, side, z) }.take(4)
          }
        val syms = top.flatMap(t => Seq(t._1, t._2)).distinct.toSet
        val pairSub = pc.filter { case ((x, y), _) =>
          syms.contains(x) && syms.contains(y)
        }
        val concats = top.map(t => t._1 + t._2).toSet
        val symbolsInPairs = pc.keySet.flatMap(p => Seq(p._1, p._2))
        val clash = concats.intersect(symbolsInPairs)
        val accepted = TextOps.selectSafeBatch(top, tripTopK, pairSub, clash,
          maxBatch, rounds - done)
        assert(accepted.nonEmpty, "selection must make progress")
        for ((x, y, _) <- accepted) {
          out += ((x, y))
          tab = applyAll(tab, x, y)
          done += 1
        }
      }
    }
    (out.result(), loops)
  }

  private val genTable: Gen[Table] = for {
    alpha <- Gen.choose(2, 4)
    nWords <- Gen.choose(3, 20)
    words <- Gen.listOfN(nWords, for {
      len <- Gen.choose(1, 8)
      cs <- Gen.listOfN(len, Gen.choose(0, alpha - 1).map(i => ('a' + i).toChar.toString))
      n <- Gen.choose(1L, 40L)
    } yield (cs.toVector, n))
  } yield words.groupMapReduce(_._1)(_._2)(_ + _).toSeq.map { case (w, n) => (w, n) }

  test("batched merge sequence is IDENTICAL to sequential BPE on random corpora") {
    val gen = for {
      tab <- genTable
      rounds <- Gen.choose(1, 25)
      maxBatch <- Gen.oneOf(2, 4, 8, 16)
    } yield (tab, rounds, maxBatch)
    check("batch-equiv", Prop.forAll(gen) { case (tab, rounds, maxBatch) =>
      val ref = sequential(tab, rounds)
      val (bat, _) = batched(tab, rounds, maxBatch)
      if (bat != ref) {
        println(s"MISMATCH rounds=$rounds batch=$maxBatch tab=$tab")
        println(s"  ref=$ref")
        println(s"  bat=$bat")
      }
      bat == ref
    })
  }

  test("token counts decrement exactly per accepted x!=y merge (the n_tokens identity)") {
    check("decrement", Prop.forAll(genTable) { tab =>
      val pc = pairCounts(tab)
      pc.isEmpty || {
        // apply the single best pair; for x != y the applied instance
        // count must equal the pair count exactly
        val ((x, y), c) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        val before = tab.map { case (tk, n) => tk.length * n }.sum
        val after = applyAll(tab, x, y).map { case (tk, n) => tk.length * n }.sum
        if (x == y) before - after <= c // greedy run-merging applies fewer
        else before - after == c
      }
    })
  }
}
