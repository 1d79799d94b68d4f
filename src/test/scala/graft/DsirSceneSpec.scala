package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Exact local replays of the two new hash-driven operators:
  * sample_dsir (importance resampling) and mm_scene_cut (shot-boundary
  * detection). Both are deterministic md5 arithmetic end-to-end, so the
  * spec recomputes the ENTIRE expected output row set in plain Scala and
  * asserts bit-for-bit equality — the same proof style as BloomSpec /
  * AggFormatsSpec's rand-proj replay. */
class DsirSceneSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Pure-Scala mirror of EngineFns.hash31. */
  private def h31(sIn: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2147483647L
  }

  // Planted corpus: 40 English docs sharing one phrase (their bigram
  // buckets have target == raw, importance ratio ~DsirScale), 40 German
  // docs sharing another (target 0, ratio ~DsirScale/41), 1 single-token
  // doc with no bigram at all (must be absent from the output). Keep
  // probabilities are ~0.49 (en) vs ~0.012 (de), so over 40 independent
  // md5 draws per side the favor-the-target assertion is deterministic
  // with overwhelming margin.
  private val dsirDocs: Seq[(Long, String, String)] =
    (0L until 40L).map(i => (i, "alpha beta gamma delta", "en")) ++
      (40L until 80L).map(i => (i, "kalt nacht wind regen", "de")) :+
      ((80L, "solo", "en"))

  private lazy val dsirDir: String = {
    val d = Files.createTempDirectory("graft_dsir").toString
    dsirDocs
      .map { case (id, t, l) => (id, t, l, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("sample_dsir equals a full local replay of the gate arithmetic") {
    // replay: bucket counts over bigram OCCURRENCES
    val bg = dsirDocs.flatMap { case (id, t, l) =>
      t.split(" ").sliding(2).filter(_.length == 2)
        .map(p => (id, l, h31(s"dsir|${p(0)} ${p(1)}") % 64L)).toSeq
    }
    val rB = bg.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val tB = bg.filter(_._2 == "en").groupBy(_._3)
      .map { case (b, xs) => b -> xs.size.toLong }
    val lam = rB.map { case (b, r) =>
      b -> (1000L * (tB.getOrElse(b, 0L) + 1L)) / (r + 1L)
    }
    val score = bg.groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(x => lam(x._3)).sum }
    val sSum = score.values.sum
    val nb = score.size.toLong * 262144L
    val expected = dsirDocs
      .filter { case (id, _, _) => score.contains(id) }
      .filter { case (id, _, _) =>
        BigInt(h31(s"dsir|$id") % 1048576L) * sSum < BigInt(score(id)) * nb
      }
      .map { case (id, _, l) => (id, l, score(id)) }
      .sortBy(_._1)

    val out = Registry.byName("sample_dsir").run(spark, dsirDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("score_q"))).toSeq

    assert(out === expected)
    assert(expected.nonEmpty, "planted corpus must keep at least one doc")
    assert(!out.exists(_._1 == 80L), "bigram-less doc carries no evidence")
    // the selection must actually favor the target language: the en keep
    // RATE (kept / present) strictly exceeds the de keep rate
    val enRate = out.count(_._2 == "en").toDouble / 40
    val deRate = out.count(_._2 == "de").toDouble / 40
    assert(enRate > deRate,
      s"importance resampling must favor the target dist ($enRate vs $deRate)")
  }

  // Scene-cut fixture: 30 ten-frame items (19 % 10 + 1) plus one
  // single-frame item (no adjacent pair, can never produce a cut) —
  // ~270 frame pairs at ~16% cut rate make the nonempty assertion
  // deterministic with overwhelming margin.
  private val sceneDocs: Seq[(Long, String)] =
    (0L until 30L).filter(_ != 2L).map(i => (i, "a" * 19)) :+
      ((2L, "c" * 10)) // 1 frame -> no adjacent pair, never a cut

  private lazy val sceneDir: String = {
    val d = Files.createTempDirectory("graft_scene").toString
    sceneDocs
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("mm_scene_cut equals a full local replay of the energy lag") {
    val expected = sceneDocs.flatMap { case (id, t) =>
      val energies = (0L to t.length % 10).map(i =>
        i -> h31(s"scene|$id:$i") % 1000L)
      energies.sliding(2).filter(_.length == 2).collect {
        case Seq((_, pe), (i, e)) if math.abs(e - pe) > 600L =>
          (id, i, e - pe)
      }.toSeq
    }.sortBy(x => (x._1, x._2))

    val out = Registry.byName("mm_scene_cut").run(spark, sceneDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("delta_e"))).toSeq

    assert(out === expected)
    assert(expected.nonEmpty, "fixture must contain at least one cut")
    assert(out.forall(c => math.abs(c._3) > 600L))
    assert(!out.exists(_._1 == 2L), "single-frame item can have no cut")
  }

  test("mm_keyframe equals a full local replay of segmentation + argmax") {
    val expected = sceneDocs.flatMap { case (id, t) =>
      val energies = (0L to t.length % 10).map(i =>
        i -> h31(s"scene|$id:$i") % 1000L)
      // scene id = running count of cuts at or before the frame
      var scene = 0L
      val tagged = energies.zipWithIndex.map { case ((i, e), k) =>
        if (k > 0 && math.abs(e - energies(k - 1)._2) > 600L) scene += 1
        (i, e, scene)
      }
      tagged.groupBy(_._3).toSeq.map { case (sid, frames) =>
        val best = frames.maxBy(f => (f._2, -f._1))
        (id, sid, best._1, best._2, frames.size.toLong)
      }
    }.sortBy(x => (x._1, x._2))

    val out = Registry.byName("mm_keyframe").run(spark, sceneDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("scene_id"),
        r.getAs[Long]("keyframe_idx"), r.getAs[Long]("energy"),
        r.getAs[Long]("n_frames"))).toSeq

    assert(out === expected)
    // every media item yields scene 0, single-frame items exactly one
    // one-frame scene
    assert(out.count(_._1 == 2L) === 1)
    assert(out.find(_._1 == 2L).get._5 === 1L)
    // scene count per item = cut count + 1 (consistency with scene_cut)
    val cuts = Registry.byName("mm_scene_cut").run(spark, sceneDir).collect()
      .map(_.getAs[Long]("doc_id"))
    sceneDocs.foreach { case (id, _) =>
      assert(out.count(_._1 == id) === cuts.count(_ == id) + 1,
        s"doc $id: scenes != cuts + 1")
    }
  }

  // Silence fixture: 'a' frames have mean_sq 961 (quiet, < 2015), space
  // frames 9216 (loud). Each text is 40 chars -> 4 frames of 10.
  private val silenceDocs: Seq[(Long, String)] = Seq(
    (1L, "a" * 40),               // all quiet -> one segment (0,3)
    (3L, "a" * 20 + " " * 20),    // quiet, quiet, loud, loud -> (0,1)
    (5L, "a" * 10 + " " * 10 + "a" * 20), // quiet,loud,quiet,quiet -> (0,0),(2,3)
    (7L, " " * 40),               // all loud -> no segment
    (2L, "a" * 40))               // even id = png payload -> excluded

  private lazy val silenceDir: String = {
    val d = Files.createTempDirectory("graft_silence").toString
    silenceDocs
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("mm_silence_segments finds exactly the planted quiet runs") {
    val out = Registry.byName("mm_silence_segments").run(spark, silenceDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seg_start"),
        r.getAs[Long]("seg_end"), r.getAs[Long]("n_frames"))).toSeq
    val q = 961L * 10 // sum_sq of one all-'a' frame
    assert(out === Seq(
      (1L, 0L, 3L, 4L),
      (3L, 0L, 1L, 2L),
      (5L, 0L, 0L, 1L),
      (5L, 2L, 3L, 2L)))
    // sum_sq of the all-quiet clip is exactly 4 quiet frames
    val full = Registry.byName("mm_silence_segments").run(spark, silenceDir)
      .collect().find(_.getAs[Long]("doc_id") == 1L).get
    assert(full.getAs[Long]("sum_sq") === 4 * q)
  }

  test("mm_audio_downsample pair-averages the planted PCM exactly") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_ds").toString
    // 'a'=97,'b'=98 -> pair mean 97 (floor), centered -31, square 961;
    // odd-length clip drops its unpaired tail byte
    Seq((1L, "ab" * 20), (3L, "ab" * 10 + "c"), (2L, "ab" * 20))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Registry.byName("mm_audio_downsample").run(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_in"),
        r.getAs[Long]("n_out"), r.getAs[Long]("sum_sq"))).toSeq
    // even doc 2 is a png payload -> excluded
    assert(out === Seq((1L, 40L, 20L, 20L * 961), (3L, 21L, 10L, 10L * 961)))
  }

  test("mm_norm_stats computes the planted byte moments exactly") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_norm").toString
    // doc 1 (wav): 40x 'a' (97); doc 2 (png): 20x 'b' (98)
    Seq((1L, "a" * 40), (2L, "b" * 20))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Registry.byName("mm_norm_stats").run(spark, d).collect()
      .map(r => (r.getAs[String]("format"), r.getAs[Long]("n_bytes"),
        r.getAs[Long]("sum_bytes"), r.getAs[Long]("sum_sq_bytes"),
        r.getAs[Double]("mean"), r.getAs[Double]("std"))).toSeq
    assert(out === Seq(
      ("png", 20L, 20L * 98, 20L * 98 * 98, 98.0, 0.0),
      ("wav", 40L, 40L * 97, 40L * 97 * 97, 97.0, 0.0)))
  }
}
