package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation salted equi-join.
  *
  * A hash shuffle sends every row of a hot key to one reducer; at 100 TB
  * a single viral key can hold a stage hostage. Salting splits each left
  * key into `saltBuckets` sub-keys (deterministically, by hashing a
  * unique column — no rand(), so retries and oracle runs agree) and
  * replicates the right side once per bucket, so the hot key's rows
  * spread over `saltBuckets` reducers. Semantically identical to the
  * plain join — verified by the q_salted_join oracle, which is written
  * as an ordinary SQL join.
  *
  * AQE's skew-join handles this adaptively for sort-merge joins; explicit
  * salting remains the tool for aggregation-grade skew and for engines
  * of record where the plan must be deterministic.
  */
object Salting {

  /** Equi-join `left` with `right` on `key`, spreading each left key
    * over `saltBuckets` sub-keys. `saltBy` must be a deterministic
    * expression over left columns (e.g. a unique id). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, saltBuckets: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(saltBuckets.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
