package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata, processed in per-partition batches.
 *
 * The actual codecs (JPEG decode, resample, frame extraction) are STUBBED —
 * this container has no image/audio libraries — behind [[StubCodec]], a
 * deterministic fake that parses a tiny synthetic header. Everything
 * Spark-side is real and tested: the schema, the typed batch pipeline, the
 * partition-parallel decode, and the metadata projection.
 *
 * 100 TB notes: payload bytes never leave their partition (decode is
 * mapPartitions, metadata-only results shuffle), and batch size is bounded
 * by `spark.sql.files.maxPartitionBytes`, not by document count.
 */
object Multimodal {

  /** An opaque media payload: id + declared kind + raw bytes. */
  case class MediaBlob(id: Long, kind: String, bytes: Array[Byte])

  /** Extracted metadata for one payload. */
  case class MediaMeta(id: Long, kind: String, nBytes: Int, width: Int,
      height: Int, durationMs: Int, valid: Boolean)

  /**
   * Deterministic fake codec. Real deployments replace this object with
   * bindings to an actual decode library; the pipeline shape is unchanged.
   * Header layout (synthetic): byte0=width, byte1=height, byte2..3=duration
   * big-endian; payloads shorter than 4 bytes are invalid.
   */
  object StubCodec {
    def decode(kind: String, bytes: Array[Byte]): MediaMeta = {
      // ??? <- real codec goes here; deterministic fake below.
      if (bytes.length < 4) MediaMeta(-1, kind, bytes.length, 0, 0, 0, valid = false)
      else MediaMeta(-1, kind, bytes.length,
        bytes(0) & 0xff, bytes(1) & 0xff,
        ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff), valid = true)
    }

    /** Fake "resize": recompute header for the scaled dimensions. */
    def resize(meta: MediaMeta, maxSide: Int): MediaMeta = {
      val scale = if (math.max(meta.width, meta.height) <= maxSide) 1.0
        else maxSide.toDouble / math.max(meta.width, meta.height)
      meta.copy(width = (meta.width * scale).toInt, height = (meta.height * scale).toInt)
    }
  }

  /** Batch-decode blobs to metadata; partition-parallel, payloads stay put. */
  def decodeBatch(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => StubCodec.decode(b.kind, b.bytes).copy(id = b.id)))
  }

  /** Decode + bounded "thumbnail" resize in one partition pass. */
  def decodeAndResize(blobs: Dataset[MediaBlob], maxSide: Int): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      StubCodec.resize(StubCodec.decode(b.kind, b.bytes).copy(id = b.id), maxSide)
    })
  }

  /** One sampled frame reference: payload id, frame ordinal, timestamp. */
  case class FrameRef(id: Long, frameIdx: Int, tsMs: Int)

  /**
   * Deterministic frame sampling for video-kind payloads: one frame every
   * `stepMs` from t=0 through the decoded duration, capped at `maxFrames`
   * per payload (bounded output regardless of clip length — the cap is
   * what keeps a 10-hour outlier from exploding a partition). Emits frame
   * REFERENCES (id, index, timestamp); the real frame-pixel extraction
   * belongs to the codec binding, exactly like [[StubCodec.decode]].
   * Invalid payloads emit nothing.
   */
  def frameSample(blobs: Dataset[MediaBlob], stepMs: Int,
      maxFrames: Int): Dataset[FrameRef] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      val meta = StubCodec.decode(b.kind, b.bytes)
      if (!meta.valid) Iterator.empty
      else {
        val n = math.min(meta.durationMs / stepMs + 1, maxFrames)
        (0 until n).iterator.map(i => FrameRef(b.id, i, i * stepMs))
      }
    })
  }

  /** Wrap a string column as a media-blob Dataset (test/demo source). */
  def blobsFromText(df: DataFrame, idCol: String, textCol: String,
      kind: String): Dataset[MediaBlob] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => MediaBlob(id, kind, bytes) }
  }
}
