package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch aggregate: bounded-memory frequency estimation over
  * an unbounded key domain. The buffer is a depth x width counter matrix
  * (flattened row-major); each key increments one counter per row at
  * slot h_i(key), and a key's estimated count is the MINIMUM of its
  * depth counters — an overestimate by at most eN/width with probability
  * 1 - (1/2)^depth (Cormode & Muthukrishnan 2005).
  *
  * The aggregator's input is the per-row slot vector, NOT the raw key:
  * the depth hash positions are computed by `CountMinAgg.slots` as
  * ordinary codegen Column expressions (the engine-portable md5 hash31
  * family) in the projection feeding the aggregate, so (a) the hot loop
  * here is pure array increments with zero hashing or allocation, and
  * (b) the estimate-probe side of a query addresses the same counters
  * by construction — it reuses the very same Column builder.
  *
  * Distributed-correctness properties:
  *  - counters are plain sums, so reduce/merge are associative AND
  *    commutative — Spark runs map-side partials and the sketch is
  *    bit-identical under any partitioning (unlike order-sensitive
  *    sketches such as space-saving, whose merge result depends on
  *    arrival order);
  *  - at 100 TB the sketch never grows: 4 x 1024 longs = 32 KB per
  *    partial regardless of key cardinality — the whole point vs an
  *    exact groupBy-count whose state is ∝ distinct keys.
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(depth * width)(0L)

  override def reduce(buf: Array[Long], slots: Seq[Int]): Array[Long] = {
    if (slots == null) return buf
    var i = 0
    while (i < depth) {
      buf(i * width + slots(i)) += 1
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) {
      a(i) += b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMinAgg {

  /** The depth hash positions of `key` as one array column — h_i(key) =
    * hash31("cms{i}_" || key) mod width, fully codegen. Both the
    * sketch-build projection and the estimate probe MUST use this
    * builder so they can never address different counters. */
  def slots(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(i => slot(i, key, width)): _*)

  /** Single hash position (int) for probe-side counter lookups. */
  def slot(row: Int, key: Column, width: Int): Column =
    (EngineFns.hash31(concat(lit(s"cms${row}_"), key.cast("string")))
      % width).cast("int")
}
