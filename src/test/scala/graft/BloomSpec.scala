package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.EngineFns._

/** Bloom-probe gate semantics (true hits, true misses, and a planted
  * FALSE POSITIVE found by searching the hash space), plus directed
  * containment asymmetry. */
class BloomSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val BloomBits = 4096

  /** Pure-Scala mirror of EngineFns.hash31 (md5 -> 15 hex chars -> bigint
    * mod 2^31-1), so the FP search below costs no Spark jobs. */
  private def h31(sIn: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2147483647L
  }

  /** The operator's position set for a given text. */
  private def positions(text: String): Set[Long] =
    (0 until 3).map(i => h31(s"bf${i}_$text") % BloomBits).toSet

  test("bloom probe: exact dup collides, novel text passes, planted FP collides") {
    // corpus: 400 docs (ids not divisible by 5) -> ~1200 of 4096 bits set
    val corpusTexts = (0 until 400).map(i => s"corpus doc number $i body")
    val corpusBits = corpusTexts.flatMap(positions).toSet
    // search deterministically for a text that is NOT in the corpus but
    // whose 3 positions are all covered — a real Bloom false positive
    val fpText = (0 until 5000).iterator.map(i => s"fp candidate $i")
      .find(t => positions(t).subsetOf(corpusBits))
    assert(fpText.isDefined, "no false positive found in 5000 candidates")

    val d = Files.createTempDirectory("graft_bloom").toString
    val corpus = corpusTexts.zipWithIndex
      .map { case (t, i) => (i.toLong * 5 + 1, t) } // ids % 5 != 0
    val batch = Seq(
      (0L, corpusTexts.head), // exact dup -> true
      (5L, "definitely novel text never hashed"), // clean -> false (checked below)
      (10L, fpText.get)) // planted FP -> true
    val docs = (corpus ++ batch)
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

    val out = Registry.byName("dedup_bloom_probe").run(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("collided")).toMap
    assert(out(0L) === true, "exact duplicate must collide")
    assert(out(10L) === true, "planted false positive must collide")
    // the novel doc's verdict must equal the membership test exactly
    assert(out(5L) ===
      positions("definitely novel text never hashed").subsetOf(corpusBits))
  }

  test("containment is directed: contained doc scores 1.0, container scores low") {
    val d = Files.createTempDirectory("graft_contain").toString
    val docs = Seq(
      (0L, "t1 t2 t3 t4"), // 2 shingles, both inside doc 1
      (1L, "t1 t2 t3 t4 u1 u2 u3 u4 u5 u6"), // 8 shingles
      (2L, "v1 v2 v3 v4 v5")) // unrelated
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = Registry.byName("dedup_containment").run(spark, d).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Double]("containment")))
    assert(rows.toSeq === Seq((0L, 1L, 1.0)),
      s"expected only the contained->container direction, got ${rows.toSeq}")
  }
}
