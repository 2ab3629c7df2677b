package graft

/** Parameterized CEP pattern compiler — the MATCH_RECOGNIZE-class core
  * behind q_window_pattern (batch) and q_stream_pattern (live): a
  * PATTERN (ordered sequence of event-type initials) plus a BOUNDARY
  * set compiles to a constant-space state machine whose fold over a
  * user's time-ordered events counts the pattern's non-overlapping
  * subsequence completions within boundary-delimited segments.
  *
  * Semantics (the generalization of the round-14 hard-coded
  * view→purchase machine, which is exactly `compile(Seq("v","p"))`):
  *   - events partition into per-user SEGMENTS: a boundary-typed event
  *     closes the current segment after itself being processed, so a
  *     boundary type may complete a pattern (as its final element) but
  *     never carries progress across segments;
  *   - within a segment, the machine advances on the earliest
  *     occurrence of the next needed pattern element (leftmost-
  *     completion subsequence scan) and resets after each completion,
  *     so completions are counted non-overlapping;
  *   - state is ONE (progress, count) pair per pattern per key —
  *     never a buffered event history — which is what lets the
  *     streaming form run unbounded at 100 TB with O(#patterns) state
  *     per user.
  *
  * The same compile emits THREE artifacts pinned to each other by
  * PatternMachineSpec and the driver's oracle: (a) [[Compiled.step]]
  * for the streaming StatefulProcessor, (b) [[sqlFold]] — a Spark SQL
  * `aggregate()` lambda for the batch form (row-local, codegen'd, no
  * UDF), and (c) [[oracleRegex]] — the lazy-quantifier regex whose
  * non-overlapping leftmost-shortest scan over the segment-typed
  * character string is the independent DuckDB formulation of the same
  * count (banned-set character classes keep a match inside one
  * segment; laziness makes each match the earliest completion, i.e.
  * the machine's scan order).
  */
object PatternMachine {

  /** Default boundary set: the event-type initials that close a
    * per-user segment ('e'rror, 's'ignup, 'p'urchase). */
  val Boundary: Set[String] = Set("e", "s", "p")

  /** The graded pattern set, shared by the batch and streaming forms:
    * the original view→purchase machine, the 3-step funnel
    * view→click→purchase, and click→view — distinct shapes (2- vs
    * 3-step, boundary- vs non-boundary-terminated; the last can
    * complete several times inside one segment). */
  val Graded: Seq[(String, Seq[String])] = Seq(
    "vp" -> Seq("v", "p"),
    "vcp" -> Seq("v", "c", "p"),
    "cv" -> Seq("c", "v"))

  final case class Compiled(steps: IndexedSeq[String], boundary: Set[String]) {
    private val m = steps.length

    /** One transition of the machine: state = (progress, matches). */
    def step(state: (Long, Long), t: String): (Long, Long) = {
      val (prog, n) = state
      val matched = t == steps(prog.toInt)
      val completed = matched && prog + 1 == m
      val prog1 =
        if (completed) 0L else if (matched) prog + 1 else prog
      val n1 = if (completed) n + 1 else n
      // the boundary closes the segment AFTER the event participates:
      // a boundary type may be the pattern's final element, but any
      // partial progress dies with the segment
      if (boundary(t)) (0L, n1) else (prog1, n1)
    }

    /** Fold over a whole ordered sequence (threading state across
      * arbitrary splits equals one pass — PatternMachineSpec pins the
      * composition property the micro-batch replay relies on). */
    def run(state: (Long, Long), ts: IterableOnce[String]): (Long, Long) =
      ts.iterator.foldLeft(state)(step)
  }

  /** Compile a pattern. Only the FINAL element may be a boundary type:
    * a mid-pattern boundary would reset the very progress it just
    * made, a contradiction the compiler rejects rather than silently
    * never-matching. */
  def compile(pattern: Seq[String],
      boundary: Set[String] = Boundary): Compiled = {
    require(pattern.nonEmpty, "empty pattern")
    require(pattern.forall(_.length == 1),
      s"pattern elements are event-type initials, got $pattern")
    require(pattern.init.forall(c => !boundary(c)),
      s"only the final pattern element may be a boundary type: $pattern")
    Compiled(pattern.toIndexedSeq, boundary)
  }

  private def sqlStr(xs: Iterable[String]): String =
    xs.map(x => s"'$x'").mkString(", ")

  /** The batch form: a Spark SQL `aggregate()` fold over `arr` (an
    * array column of event-type initials in event-time order) that
    * computes exactly [[Compiled.run]] from the zero state — row-local
    * and whole-stage-codegen'd, no UDF. */
  def sqlFold(pattern: Seq[String], arr: String,
      boundary: Set[String] = Boundary): String = {
    val c = compile(pattern, boundary) // validates
    val m = c.steps.length
    val stepsArr = s"array(${sqlStr(c.steps)})"
    val isBoundary = s"t IN (${sqlStr(boundary.toSeq.sorted)})"
    val matched = s"t = element_at($stepsArr, CAST(st.prog AS INT) + 1)"
    val completed = s"($matched AND st.prog = ${m - 1}L)"
    s"""aggregate($arr, named_struct('prog', 0L, 'cnt', 0L),
       |  (st, t) -> named_struct(
       |    'prog', IF($isBoundary, 0L,
       |      IF($completed, 0L, IF($matched, st.prog + 1L, st.prog))),
       |    'cnt', IF($completed, st.cnt + 1L, st.cnt)),
       |  st -> st.cnt)""".stripMargin
  }

  /** The DuckDB oracle formulation: count non-overlapping
    * leftmost-shortest matches of this regex over the user's
    * concatenated event-initial string. Lazy quantifiers make each
    * match the earliest completion from the earliest viable start —
    * the machine's scan — and the banned character classes forbid a
    * match from spanning a segment boundary (the final element is
    * matched literally, so a boundary type may still complete). */
  def oracleRegex(pattern: Seq[String],
      boundary: Set[String] = Boundary): String = {
    val c = compile(pattern, boundary)
    // the machine ≡ regex equivalence (and the Java-regex-property ≈
    // DuckDB-RE2-oracle transfer) is argued ONLY for this restricted
    // class: literal alphanumeric chars, negated classes, lazy stars.
    // Reject anything that could smuggle a metacharacter past it —
    // general regex semantics are NOT portable across engines (the
    // r12 lesson that moved pattern matching off regexes in the first
    // place).
    require((pattern ++ boundary).forall(_.forall(_.isLetterOrDigit)),
      s"pattern/boundary must be alphanumeric initials: $pattern / $boundary")
    val banned = boundary.toSeq.sorted.mkString
    c.steps.init.map(s => s"$s[^$banned]*?").mkString + c.steps.last
  }
}
