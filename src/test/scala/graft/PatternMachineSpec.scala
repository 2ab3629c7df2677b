package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** The CEP state machine (StreamOps.patternStep) vs a brute-force
  * recomputation of the BATCH query's segment semantics, over arbitrary
  * event-type sequences — independent of the fixture, so the streaming/
  * batch agreement the oracle grades can't be an artifact of the data.
  *
  * Batch semantics (q_window_pattern / its SQL): seg(i) = # boundary
  * events ('e'/'s'/'p' initial) strictly before i; a 'p' event matches
  * iff some 'v' event shares its segment. The machine claims the fold
  * (flag, count) over the ordered sequence counts exactly those
  * matches. */
class PatternMachineSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, s"$name: $res")
  }

  private def bruteMatches(ts: Seq[String]): Long = {
    val boundary = Set("e", "s", "p")
    val seg = ts.scanLeft(0L)((acc, t) =>
      if (boundary(t)) acc + 1 else acc).init // seg(i): boundaries before i
    val vSegs = ts.zip(seg).collect { case ("v", g) => g }.toSet
    ts.zip(seg).count { case (t, g) => t == "p" && vSegs(g) }.toLong
  }

  private val eventGen: Gen[String] =
    Gen.frequency(4 -> "v", 3 -> "c", 2 -> "p", 1 -> "e", 1 -> "s", 1 -> "x")
  private val seqGen: Gen[List[String]] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, eventGen))

  test("fold(patternStep) counts exactly the batch segment matches") {
    check("machine-equals-brute", Prop.forAll(seqGen) { ts =>
      ts.foldLeft((0L, 0L))(StreamOps.patternStep)._2 == bruteMatches(ts)
    })
  }

  test("the fold composes across arbitrary batch boundaries") {
    // split-anywhere: running the machine over slices in order,
    // threading state, equals one pass — the exact property the
    // micro-batch replay relies on
    check("split-anywhere", Prop.forAll(seqGen, Gen.chooseNum(0, 200)) {
      (ts, cut) =>
        val (a, b) = ts.splitAt(cut min ts.length)
        val once = ts.foldLeft((0L, 0L))(StreamOps.patternStep)
        val threaded = b.foldLeft(
          a.foldLeft((0L, 0L))(StreamOps.patternStep))(StreamOps.patternStep)
        threaded == once
    })
  }

  test("known vignettes") {
    def n(ts: Seq[String]) = ts.foldLeft((0L, 0L))(StreamOps.patternStep)._2
    // v p → match; p v → no match (v lands after the boundary p);
    // v e p → no match (error closes the flagged segment);
    // v p v p → two matches; c/x never affect anything
    assert(n(Seq("v", "p")) === 1L)
    assert(n(Seq("p", "v")) === 0L)
    assert(n(Seq("v", "e", "p")) === 0L)
    assert(n(Seq("v", "p", "v", "p")) === 2L)
    assert(n(Seq("c", "v", "x", "c", "p")) === 1L)
  }
}
