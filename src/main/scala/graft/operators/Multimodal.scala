package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decode / feature-extraction via `mapPartitions`
  * over a typed Dataset (the Scala analog of mapInPandas batch UDFs), and
  * frame sampling via sequence + explode.
  *
  * The container has no image/audio codecs, so `FakeCodec.decode` is a
  * clearly-marked deterministic stand-in — the Spark-side plumbing
  * (schema, batch iteration, partitioning, flat typed output) is real and
  * oracle-/test-covered. The binary payloads themselves are derived from
  * `documents.text` bytes since the corpus ships no media blobs.
  */
object Multimodal {

  /** Typed record for the decode stage. */
  final case class MediaIn(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, format: String, width: Int, height: Int,
      n_bytes: Long, checksum: Long)

  /** STUB: deterministic fake decoder standing in for a real image/audio
    * codec (none available in this environment). Real deployments swap
    * this body for e.g. a JNI codec call; the surrounding mapPartitions
    * plumbing is unchanged. */
  object FakeCodec {
    def decode(in: MediaIn): MediaMeta = {
      val b = in.payload
      val checksum = b.foldLeft(17L)((acc, x) => acc * 31 + (x & 0xff))
      val fmt = (checksum % 3) match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "wav"
      }
      MediaMeta(
        doc_id = in.doc_id,
        format = fmt,
        width = 64 + (b.length % 512),
        height = 64 + ((checksum % 512).toInt + 512) % 512,
        n_bytes = b.length.toLong,
        checksum = checksum)
    }
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  val defs: Seq[QueryDef] = Seq(

    // Binary column + metadata extraction (byte length, magic bytes).
    QueryDef(
      "mm_meta",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
            upper(hex(substring(col("text").cast("binary"), 1, 4))).as("magic"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
                upper(hex(CAST(substr(text, 1, 4) AS BLOB))) AS magic
              FROM documents ORDER BY doc_id""")),

    // Frame sampling: one row per sampled frame index (sequence + explode).
    QueryDef(
      "mm_frame_sample",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            explode(sequence(lit(0L), pmod(col("n_chars"), lit(10L))))
              .as("frame_idx"))
          .select(col("doc_id"), col("frame_idx").cast("long"))
          .orderBy("doc_id", "frame_idx"),
      Some("""SELECT doc_id, CAST(unnest(range(0, n_chars % 10 + 1)) AS BIGINT) AS frame_idx
              FROM documents ORDER BY doc_id, frame_idx""")),

    // Batch decode via mapPartitions over a typed Dataset — the decode
    // body is the FakeCodec stub; partition-parallel, no shuffle.
    QueryDef(
      "mm_decode",
      (s, dir) => {
        import s.implicits._
        docs(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[MediaIn]
          .mapPartitions(_.map(FakeCodec.decode))
          .toDF()
          .orderBy("doc_id")
      },
      None)
  )
}
