package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 group H, north star per
  * BASELINE.json:6): media as opaque `binary` columns with typed metadata,
  * plus a partition-wise feature-extraction stage whose decode step is a
  * STUB (no image/audio codecs in this environment) while the Spark-side
  * plumbing — schema, batching, partitioning — is real and tested.
  *
  * Scale design: payloads stay opaque binary end-to-end (never re-encoded,
  * mirroring the reference's verbatim-raw rule, ref: internal/gh/gh.go:200-204);
  * per-record feature extraction is a narrow map (no shuffle), executed
  * partition-at-a-time so a real decoder would amortize model/codec init
  * across each partition exactly like a vectorized-batch UDF.
  */
object MultimodalOps {

  /** Typed record for the partition-wise pipeline. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], source: String)
  case class MediaFeatures(doc_id: Long, byte_len: Long, width: Int, height: Int,
                           n_frames: Int, source: String)

  /** STUB decoder — deterministic fake standing in for an image/audio codec.
    * A production build replaces ONLY this function (e.g. with a JNI codec);
    * everything around it — the mapPartitions batch shape, the schema, the
    * opaque-binary carriage — is the real plumbing under test.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    // ??? <- real codec goes here; deterministic fake below
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val w = math.floorMod(h, 1920L).toInt + 1
    val ht = math.floorMod(h >> 16, 1080L).toInt + 1
    val fr = math.floorMod(h >> 32, 240L).toInt + 1
    (w, ht, fr)
  }

  /** Partition-wise feature extraction: the Scala analog of a vectorized
    * batch UDF — one decoder init per partition, records streamed through.
    */
  def extractFeatures(records: org.apache.spark.sql.Dataset[MediaRecord]):
      org.apache.spark.sql.Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // (a real decoder would be initialized once, here)
      it.map { r =>
        val (w, h, f) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.payload.length.toLong, w, h, f, r.source)
      }
    }
  }

  case class MediaProcessed(doc_id: Long, width: Int, height: Int,
                            kept_frames: Int, frame_idx: Seq[Int], source: String)

  /** Resize STUB: recompute target dimensions preserving aspect ratio toward
    * a 224-wide thumbnail (the ubiquitous vision-model input). Pure metadata
    * math — a real implementation swaps in the pixel resampler only.
    */
  def resizeStub(w: Int, h: Int, targetW: Int = 224): (Int, Int) = {
    val scaledH = math.max(1, math.round(h.toDouble * targetW / w).toInt)
    (targetW, scaledH)
  }

  /** Frame sampling: keep every `stride`-th frame index — deterministic,
    * bounded output per record (ceil(n/stride) indices).
    */
  def sampleFrames(nFrames: Int, stride: Int = 24): Seq[Int] =
    0 until nFrames by stride

  /** Decode → frame-sample → resize as one partition-wise stage chain: the
    * full media pipeline shape (each stage a narrow map, codec init
    * amortized per partition, payload dropped as soon as features are out).
    */
  def processMedia(records: org.apache.spark.sql.Dataset[MediaRecord]):
      org.apache.spark.sql.Dataset[MediaProcessed] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val (w, h, frames) = decodeStub(r.payload)
        val idx = sampleFrames(frames)
        val (rw, rh) = resizeStub(w, h)
        MediaProcessed(r.doc_id, rw, rh, idx.length, idx, r.source)
      }
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Opaque binary payload + typed metadata, content-addressed: the
    // checkable half of the multimodal surface (byte length + SHA-256).
    "multimodal_binary" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast(LongType).as("byte_len"),
          sha2(col("payload"), 256).as("digest"),
          col("source"))
        .orderBy("doc_id")
    }),

    // Decode → frame-sample (every 24th) → resize (224-wide) pipeline —
    // deterministic but not SQL-expressible (stub codec) -> rows-only check.
    "multimodal_pipeline" -> ((s, dir) => {
      import s.implicits._
      val recs = Tables.documents(s, dir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("source"))
        .as[MediaRecord]
      processMedia(recs).toDF()
        .select(col("doc_id"), col("width").cast(LongType),
          col("height").cast(LongType), col("kept_frames").cast(LongType),
          col("source"))
        .orderBy("doc_id")
    }),

    // Full pipeline incl. the stubbed decode — deterministic but not
    // SQL-expressible (JVM-side hash fake) -> no oracle, rows-only check.
    "multimodal_features" -> ((s, dir) => {
      import s.implicits._
      val recs = Tables.documents(s, dir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("source"))
        .as[MediaRecord]
      extractFeatures(recs).toDF()
        .select(col("doc_id"), col("byte_len"), col("width").cast(LongType),
          col("height").cast(LongType), col("n_frames").cast(LongType), col("source"))
        .orderBy("doc_id")
    }))

  def oracle: Map[String, String] = Map(
    "multimodal_binary" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       sha256(text) AS digest,
        |       source
        |FROM documents ORDER BY doc_id""".stripMargin)
}
