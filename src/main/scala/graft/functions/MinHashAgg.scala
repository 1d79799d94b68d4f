package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate: element-wise minimum over MinHash signature
  * arrays. Union semantics — minhash(A ∪ B) = elementwise-min(sig(A),
  * sig(B)) — so aggregating per-document signatures yields the signature
  * of the concatenated group (per source, per cluster, per shard).
  *
  * Associative and commutative, so Spark evaluates it with map-side
  * partial aggregation and the result is partitioning-independent — the
  * property that lets one signature summarize an arbitrarily large
  * group at 100 TB without reshuffling documents.
  *
  * Input elements are boxed and nullable: shingle-less documents (< 3
  * tokens) carry an all-NULL signature array, and NULL slots are skipped
  * exactly like the oracle's null-ignoring min(). (A group consisting
  * ONLY of null signatures finishes as Long.MaxValue sentinels — such
  * groups don't occur in the corpus; callers that could see them should
  * filter empty signatures first.)
  */
class MinHashAgg(numPerms: Int)
    extends Aggregator[Seq[java.lang.Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numPerms)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[java.lang.Long]): Array[Long] = {
    // a wholly-NULL input array contributes nothing, matching the
    // null-ignoring min semantics applied per-slot below
    if (sig == null) return buf
    var i = 0
    val n = math.min(buf.length, sig.length)
    while (i < n) {
      val s = sig(i)
      if (s != null && s.longValue < buf(i)) buf(i) = s.longValue
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) {
      if (b(i) < a(i)) a(i) = b(i)
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
