package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized properties for the algorithmic kernels (seeded ScalaCheck
  * Gens, deterministic across runs): connected components must equal a
  * brute-force union-find on arbitrary graphs, and the SimHash chunk
  * pigeonhole must produce exactly the naive all-pairs Hamming result
  * for arbitrary signatures — not just the planted corpus. */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("connectedComponents equals union-find closure on random graphs") {
    for (round <- 1 to 5) {
      val n = sample(Gen.choose(5, 30), 100 + round)
      val edges = sample(
        Gen.listOfN(n, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L))),
        200 + round).filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // brute force: union-find with min-label representatives
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      val expect = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val docs = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("a_id", "b_id")
      val got = operators.Dedup.connectedComponents(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"round $round, n=$n, edges=$edges")
    }
  }

  test("simhash chunk pigeonhole equals naive all-pairs on random signatures") {
    for (round <- 1 to 3) {
      val n = sample(Gen.choose(20, 80), 300 + round)
      val sigs = sample(
        Gen.listOfN(n, Gen.choose(0L, (1L << 60) - 1)), 400 + round)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val naive = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        if java.lang.Long.bitCount(sa ^ sb) <= 3
      } yield (a, b)).toSet
      val df = sigs.toDF("doc_id", "simhash")
      val got = operators.Dedup.simhashChunkPairs(df, numChunks = 4, chunkBits = 15)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive, s"round $round, n=$n")
    }
  }
}
