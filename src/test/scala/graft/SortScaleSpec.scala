package graft

import org.scalatest.funsuite.AnyFunSuite

/** Teragen synthesis arithmetic at cluster row counts: the LCGs apply to
  * `i mod P` with a block-offset mix of `i div P`, which must stay
  * inside Long (no ANSI overflow) and keep producing well-formed keys
  * far past 2³¹ rows — checked here by driving the REAL synthesis
  * expressions (SortOps.genRecordsFrom) at offset ranges, never by
  * materializing 2³¹ rows. */
class SortScaleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val P = 2147483647L

  /** Driver-side reference of the same formula in BigInt (cannot
    * overflow), collapsed back to the expected 19-digit key. */
  private def refKey(i: Long): String = {
    val (lo, hi) = (BigInt(i % P), BigInt(i / P))
    val k1 = (BigInt(1103515245) * lo + 12345 + BigInt(1013904223) * hi) % P
    val k2 = (BigInt(214013) * lo + 2531011 + BigInt(1664525) * hi) % P
    val s = (k1 * P + k2).toString
    "0" * (19 - s.length) + s
  }

  private def keysAt(start: Long, n: Int): Map[Long, String] =
    SortOps.genRecordsFrom(spark.range(start, start + n).toDF())
      .collect()
      .map(r => r.getString(1).toLong -> r.getString(0))
      .toMap

  test("synthesis matches the BigInt reference at a >2^31 row offset") {
    val start = 5000000000L // past 2^32, well past the old 2^31 bound
    val keys = keysAt(start, 1000)
    assert(keys.size === 1000)
    keys.foreach { case (i, k) =>
      assert(k.length === 19)
      assert(k === refKey(i), s"key mismatch at i=$i")
    }
  }

  test("synthesis crosses a block boundary (i div P increments) cleanly") {
    val start = 2 * P - 500 // spans block 1 → block 2
    val keys = keysAt(start, 1000)
    assert(keys.size === 1000)
    keys.foreach { case (i, k) => assert(k === refKey(i)) }
    // keys remain distinct across the boundary in this window
    assert(keys.values.toSet.size === 1000)
  }

  test("synthesis arithmetic peaks stay inside Long near the P^2 row bound") {
    // the largest representable block: i just below P*P keeps
    // k1*P + k2 <= P^2 - 1 < Long.MaxValue; ANSI mode would throw here
    // if any intermediate overflowed
    val start = P * P - 1000
    val keys = keysAt(start, 1000)
    assert(keys.size === 1000)
    keys.foreach { case (i, k) => assert(k === refKey(i)) }
  }
}
