package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** The compiled CEP machine (PatternMachine) vs two independent
  * formulations, over arbitrary event-type sequences — independent of
  * the fixture, so the streaming/batch agreement the oracle grades
  * can't be an artifact of the data:
  *
  *  1. the ORIGINAL brute segment semantics (q_window_pattern's r14
  *     SQL): for pattern v→p, a 'p' matches iff some 'v' shares its
  *     segment — pins the generalized compile to the old machine;
  *  2. the REGEX formulation the DuckDB oracle now runs
  *     (PatternMachine.oracleRegex): non-overlapping leftmost-shortest
  *     matches of the lazy-quantifier pattern over the concatenated
  *     initials — java.util.regex here, RE2 in DuckDB, but for these
  *     patterns (literal chars, negated classes, lazy stars) the two
  *     engines' leftmost-shortest semantics coincide.
  *
  * Plus the split-anywhere composition property the micro-batch
  * replay relies on, for EVERY graded pattern.
  */
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

  /** The oracle's count, verbatim: non-overlapping leftmost-shortest
    * regex matches over the concatenated initials. */
  private def regexMatches(ts: Seq[String], pattern: Seq[String]): Long = {
    val re = PatternMachine.oracleRegex(pattern)
    val m = java.util.regex.Pattern.compile(re).matcher(ts.mkString)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  private def machine(ts: Seq[String], pattern: Seq[String]): Long =
    PatternMachine.compile(pattern).run((0L, 0L), ts)._2

  private val eventGen: Gen[String] =
    Gen.frequency(4 -> "v", 3 -> "c", 2 -> "p", 1 -> "e", 1 -> "s", 1 -> "x")
  private val seqGen: Gen[List[String]] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, eventGen))
  /** Random patterns: 1-4 non-boundary steps, optionally 'p'-closed. */
  private val patternGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 4)
    body <- Gen.listOfN(n, Gen.oneOf("v", "c", "x"))
    closeP <- Gen.oneOf(true, false)
  } yield if (closeP) body :+ "p" else body

  test("compile(v,p) equals the r14 hard-coded machine and its brute semantics") {
    check("vp-equals-brute", Prop.forAll(seqGen) { ts =>
      ts.foldLeft((0L, 0L))(StreamOps.patternStep)._2 == bruteMatches(ts) &&
        machine(ts, Seq("v", "p")) == bruteMatches(ts)
    })
  }

  test("machine count equals the oracle's regex count, arbitrary patterns") {
    check("machine-equals-regex", Prop.forAll(seqGen, patternGen) {
      (ts, pat) => machine(ts, pat) == regexMatches(ts, pat)
    })
  }

  test("the fold composes across arbitrary batch boundaries, every graded pattern") {
    // split-anywhere: running the machine over slices in order,
    // threading state, equals one pass — the exact property the
    // micro-batch replay relies on
    check("split-anywhere", Prop.forAll(seqGen, Gen.chooseNum(0, 200)) {
      (ts, cut) =>
        val (a, b) = ts.splitAt(cut min ts.length)
        PatternMachine.Graded.forall { case (_, pat) =>
          val c = PatternMachine.compile(pat)
          c.run(c.run((0L, 0L), a), b) == c.run((0L, 0L), ts)
        }
    })
  }

  test("sqlFold (the batch query's executed artifact) equals the machine") {
    // the third compiled artifact, pinned by EXECUTION: the generated
    // aggregate() lambda runs through real Catalyst/codegen over random
    // sequences and must reproduce the machine fold exactly — a bug in
    // the SQL string (IF-nesting, element_at indexing, quoting) would
    // otherwise hide until the driver grades fixture data that may not
    // cover the diverging sequence
    val spark = TestSpark.spark
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(20260815L)
    val alphabet = Vector("v", "c", "p", "e", "s", "x")
    val seqs = (0 until 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(120)).map(_ =>
        alphabet(rnd.nextInt(alphabet.size))))
    }
    val patterns = PatternMachine.Graded.map(_._2) ++
      Seq(Seq("v", "v", "p"), Seq("x", "c"), Seq("c", "x", "v", "p"))
    val df = spark.createDataFrame(
      seqs.map { case (id, ts) => org.apache.spark.sql.Row(id, ts.toArray) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts_chars",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))))
    val folded = patterns.zipWithIndex.foldLeft(df) { case (acc, (pat, i)) =>
      acc.withColumn(s"n_$i",
        org.apache.spark.sql.functions.expr(
          PatternMachine.sqlFold(pat, "ts_chars")))
    }
    val got = folded.collect().map(r =>
      r.getLong(0) -> patterns.indices.map(i => r.getLong(2 + i))).toMap
    seqs.foreach { case (id, ts) =>
      patterns.zipWithIndex.foreach { case (pat, i) =>
        val want = PatternMachine.compile(pat).run((0L, 0L), ts)._2
        assert(got(id)(i) === want,
          s"sqlFold diverged from machine: id=$id pattern=$pat " +
            s"seq=${ts.mkString} sql=${got(id)(i)} machine=$want")
      }
    }
  }

  test("compiler rejects mid-pattern boundary types") {
    assertThrows[IllegalArgumentException](
      PatternMachine.compile(Seq("p", "v")))
    assertThrows[IllegalArgumentException](PatternMachine.compile(Nil))
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
    // 3-step funnel: a mid-pattern boundary kills partial progress
    assert(machine(Seq("v", "c", "p"), Seq("v", "c", "p")) === 1L)
    assert(machine(Seq("v", "e", "c", "p"), Seq("v", "c", "p")) === 0L)
    assert(machine(Seq("v", "c", "x", "v", "p"), Seq("v", "c", "p")) === 1L)
    // non-boundary-closed pattern matches repeatedly inside a segment
    assert(machine(Seq("c", "v", "c", "v"), Seq("c", "v")) === 2L)
    assert(machine(Seq("c", "s", "v"), Seq("c", "v")) === 0L)
  }
}
