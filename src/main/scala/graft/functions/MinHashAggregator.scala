package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed MinHash sketch aggregator: k independent LCG hash slots over
  * shingle values, each keeping the minimum — the classic fixed-size,
  * merge-associative sketch buffer (the UDAF analogue of
  * LlmOps.qDedupNear's expression-based minima, kept arithmetically
  * identical so the same DuckDB oracle checks both).
  *
  * Scale: the buffer is k longs regardless of input size; partial
  * aggregation happens map-side, so the shuffle carries one sketch per
  * (group, partition) — the property that makes MinHash viable at 100 TB.
  */
class MinHashAggregator extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val P = MinHash.P
  private val A = MinHash.A
  private val B = MinHash.B
  val k: Int = A.length

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    var j = 0
    while (j < k) {
      val h = (A(j) * v + B(j)) % P
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) {
      if (b(j) < a(j)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
