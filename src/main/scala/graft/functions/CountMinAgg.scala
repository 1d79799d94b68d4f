package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch aggregate: bounded-memory frequency estimation over
  * an unbounded key domain. The buffer is a depth x width counter matrix
  * (flattened row-major); each key increments one counter per row at
  * slot h_i(key), and a key's estimated count is the MINIMUM of its
  * depth counters — an overestimate by at most eN/width with probability
  * 1 - (1/2)^depth (Cormode & Muthukrishnan 2005).
  *
  * Distributed-correctness properties:
  *  - counters are plain sums, so reduce/merge are associative AND
  *    commutative — Spark runs map-side partials and the sketch is
  *    bit-identical under any partitioning (unlike order-sensitive
  *    sketches such as space-saving, whose merge result depends on
  *    arrival order);
  *  - the hash family is the engine-portable md5 recipe (EngineFns
  *    .hash31): h_i(k) = md5("cms{i}_{k}") mod width, reproducible from
  *    SQL for the estimate-lookup side of the query.
  *
  * At 100 TB the sketch never grows: 4 x 1024 longs = 32 KB per partial
  * regardless of key cardinality — the whole point vs an exact
  * groupBy-count whose state is ∝ distinct keys.
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(depth * width)(0L)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var i = 0
    while (i < depth) {
      buf(i * width + CountMinAgg.slot(i, key, width)) += 1
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

  /** JVM twin of the SQL-side hash31("cms{row}_{key}") % width — the
    * first 15 md5 hex chars as a long, mod 2^31-1, mod width. Must stay
    * in lockstep with EngineFns.hash31 so estimate lookups written as
    * SQL expressions address the same counters the aggregator filled. */
  def slot(row: Int, key: Long, width: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"cms${row}_$key".getBytes(StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString // 16 hex chars; take 15
    ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2147483647L)
      % width).toInt
  }
}
