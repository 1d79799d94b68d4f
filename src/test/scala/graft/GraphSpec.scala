package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** PageRank on a planted near-dup star: a hub document sharing one
  * shingle with each of 5 leaves (leaves pairwise disjoint), plus two
  * isolated documents. */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_graph").toString
    // hub carries shingles c1c2c3 .. c6c7c8; leaf i shares ONLY the
    // trigram (c_i, c_i+1, c_i+2) with the hub, so leaves are pairwise
    // disjoint (a leaf clique would make the graph regular and the
    // uniform distribution a fixed point — no rank separation)
    val hub = (0L, "c1 c2 c3 c4 c5 c6 c7 c8")
    val leaves = (1L to 5L).map(i => (i, s"c$i c${i + 1} c${i + 2} x$i y$i z$i"))
    val isolated = Seq((6L, "p6 q6 r6 s6"), (7L, "p7 q7 r7 s7"))
    val docs = (Seq(hub) ++ leaves ++ isolated)
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("pagerank ranks hub > leaf > isolated, leaves symmetric, mass bounded") {
    val out = Registry.byName("graph_pagerank").run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pagerank_q")).toMap
    assert(out.size === 8)
    val leafRanks = (1L to 5L).map(out)
    assert(leafRanks.distinct.size === 1, "symmetric leaves must tie")
    assert(out(0L) > leafRanks.head, "hub collects leaf mass")
    assert(leafRanks.head > out(6L), "leaf gets hub mass, isolated only base")
    assert(out(6L) === out(7L))
    // total quantized mass never exceeds the initial Q (integer division
    // only loses mass; nothing is created)
    assert(out.values.sum <= 1000000000000L)
  }
}
