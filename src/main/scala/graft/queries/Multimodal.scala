package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal-column plumbing (builder-prompt surface): media payloads as
  * opaque `binary` columns with typed metadata, decoded per-partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything the
  * engine is responsible for — binary columns end-to-end, partition-wise
  * batched decode via `mapPartitions` (the Scala analog of a pandas
  * `mapInPandas` batch UDF), typed output schema — is real and oracled.
  * Swapping [[decodeStub]] for a real codec is the only change needed in
  * production.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, source: String, n_bytes: Long,
      width: Long, height: Long, n_frames: Long)

  /** STUB decoder: derives fake media dimensions from the payload size
    * with pure arithmetic so the DuckDB oracle can reproduce it. A real
    * deployment replaces this body with an actual codec call. */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val n = payload.length.toLong
    (64 + n % 512, 64 + (n * 31) % 512, n / 1024 + 1)
  }

  /** Q31 — binary-column metadata extraction: text payload → binary →
    * per-partition decode → typed metadata rows. */
  val q31_multimodal_meta: Query = Query(
    """SELECT doc_id, source,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       64 + octet_length(encode(text)) % 512 AS width,
      |       64 + (octet_length(encode(text)) * 31) % 512 AS height,
      |       octet_length(encode(text)) // 1024 + 1 AS n_frames
      |FROM documents
      |ORDER BY doc_id""") { (s, dir) =>
    import s.implicits._
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, src, payload) =>
          val (w, h, frames) = decodeStub(payload)
          MediaMeta(id, src, payload.length.toLong, w, h, frames)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Q31b — frame sampling: expand each media payload into one row per
    * sampled frame (every 4th frame), with a deterministic per-frame
    * byte offset — the generator/explode shape a video pipeline needs.
    * The decode stub supplies n_frames; the expansion itself (sequence +
    * explode, predicate on the generated column) is the real machinery. */
  val q31b_frame_sample: Query = Query(
    """WITH m AS (SELECT doc_id,
      |                  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |                  octet_length(encode(text)) // 1024 + 1 AS n_frames
      |           FROM documents),
      |     f AS (SELECT doc_id, n_bytes, unnest(range(n_frames)) AS frame_no FROM m)
      |SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
      |       frame_no * 1024 AS byte_offset
      |FROM f
      |WHERE frame_no % 4 = 0
      |ORDER BY doc_id, frame_no""") { (s, dir) =>
    import s.implicits._
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        (id, payload.length.toLong, decodeStub(payload)._3)
      })
      .toDF("doc_id", "n_bytes", "n_frames")
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_no"))
      .filter(col("frame_no") % 4 === 0)
      .select(col("doc_id"), col("frame_no").cast("int").as("frame_no"),
        (col("frame_no") * 1024).as("byte_offset"))
      .orderBy("doc_id", "frame_no")
  }

  /** Q31c — resize + feature-extract stages of the media pipeline:
    * aspect-preserving integer resize of the (stub-)decoded dimensions to
    * a 224-long edge, plus a small char-class histogram over the payload
    * standing in for a codec-derived feature vector (a real deployment
    * extracts features from the decoded pixels; the batch shape —
    * per-partition decode, then columnar arithmetic — is identical). */
  val q31c_resize_features: Query = Query(
    """WITH m AS (SELECT doc_id, text,
      |                  64 + octet_length(encode(text)) % 512 AS width,
      |                  64 + (octet_length(encode(text)) * 31) % 512 AS height
      |           FROM documents)
      |SELECT doc_id, width, height,
      |       CASE WHEN width >= height THEN 224
      |            ELSE greatest(1, (width * 224) // height) END AS rw,
      |       CASE WHEN width >= height THEN greatest(1, (height * 224) // width)
      |            ELSE 224 END AS rh,
      |       CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
      |       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
      |       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space
      |FROM m
      |ORDER BY doc_id""") { (s, dir) =>
    import s.implicits._
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("text").cast("binary").as("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, text, payload) =>
        val (w, h, _) = decodeStub(payload)
        val (rw, rh) =
          if (w >= h) (224L, math.max(1L, h * 224 / w))
          else (math.max(1L, w * 224 / h), 224L)
        (id, text, w, h, rw, rh)
      })
      .toDF("doc_id", "text", "width", "height", "rw", "rh")
      .select(col("doc_id"), col("width"), col("height"), col("rw"), col("rh"),
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long").as("n_alpha"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("n_digit"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).cast("long").as("n_space"))
      .orderBy("doc_id")
  }

  val all: Map[String, Query] = Map(
    "q31_multimodal_meta" -> q31_multimodal_meta,
    "q31b_frame_sample" -> q31b_frame_sample,
    "q31c_resize_features" -> q31c_resize_features)
}
