package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata, processed in per-partition batches.
 *
 * IMAGES have a REAL codec: [[ImageIoCodec]] rides the JDK's built-in
 * `javax.imageio` (PNG/JPEG/BMP/GIF — no external library needed), with
 * genuine pixel decode and rescale, oracle-checked end-to-end by the
 * `media_decode_imageio` round-trip query. AUDIO/VIDEO codecs remain
 * STUBBED — the JDK ships no audio/video decoders and this container has
 * no media libraries — behind [[StubCodec]], a deterministic fake that
 * parses a tiny synthetic header. Everything Spark-side is real and tested
 * either way: the schema, the typed batch pipeline, the partition-parallel
 * decode, and the metadata projection.
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

  /**
   * REAL image codec over the JDK's built-in `javax.imageio` (PNG / JPEG /
   * BMP / GIF readers ship with Java itself — no external library, so the
   * container constraint that stubbed [[StubCodec]] does not apply to
   * images): [[dims]] reads actual pixel dimensions from the image header
   * (no full-pixel decode on the metadata path), and [[resizeBytes]]
   * performs a genuine pixel rescale re-encoded as PNG. Payloads ImageIO
   * has no reader for fall back to the stub, keeping the pipeline total.
   * Disk caching is off: executors must not write a temp file per payload.
   */
  object ImageIoCodec {
    locally {
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
    }

    /** Actual (width, height) from the image header; None when no
      * installed reader recognizes the bytes. */
    def dims(bytes: Array[Byte]): Option[(Int, Int)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
          finally r.dispose()
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally iis.close()
    }

    /** Decode real dims when the bytes are an actual image; stub header
      * math otherwise (same totality contract as the stub alone). */
    def decode(kind: String, bytes: Array[Byte]): MediaMeta =
      dims(bytes) match {
        case Some((w, h)) =>
          MediaMeta(-1, kind, bytes.length, w, h, 0, valid = true)
        case None => StubCodec.decode(kind, bytes)
      }

    /** Real bounded resize: decode pixels, scale the long side down to
      * `maxSide` (never upscale), re-encode as PNG. None when the bytes
      * are not a decodable image. */
    def resizeBytes(bytes: Array[Byte], maxSide: Int): Option[Array[Byte]] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val m = math.max(img.getWidth, img.getHeight)
          val scale = if (m <= maxSide) 1.0 else maxSide.toDouble / m
          val nw = math.max(1, (img.getWidth * scale).toInt)
          val nh = math.max(1, (img.getHeight * scale).toInt)
          val out = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /**
     * 64-bit difference hash over REAL decoded pixels (dHash — the
     * classic perceptual image-dedup fingerprint): integer luminance
     * block sums on an 8×9 grid; bit (y*8 + x) is set when the average
     * luminance of cell (x, y+1) exceeds cell (x, y). Averages compare by
     * exact integer cross-multiplication (sum₁·n₂ > sum₂·n₁), so
     * arbitrary dimensions stay deterministic and synthetic inputs have
     * ARITHMETICALLY DERIVABLE hashes — which is what lets the
     * `media_dedup_dhash` oracle predict the full duplicate-pair set.
     * None when the bytes aren't decodable or smaller than the grid.
     */
    def dHash(bytes: Array[Byte]): Option[Long] = try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 8 || img.getHeight < 9) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val sum = Array.ofDim[Long](8, 9)
        val cnt = Array.ofDim[Long](8, 9)
        var gx = 0
        while (gx < 8) {
          var gy = 0
          while (gy < 9) {
            var s = 0L; var n = 0L
            var px = gx * w / 8
            val pxEnd = (gx + 1) * w / 8
            while (px < pxEnd) {
              var py = gy * h / 9
              val pyEnd = (gy + 1) * h / 9
              while (py < pyEnd) {
                val rgb = img.getRGB(px, py)
                s += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                  114L * (rgb & 0xff)
                n += 1
                py += 1
              }
              px += 1
            }
            sum(gx)(gy) = s; cnt(gx)(gy) = n
            gy += 1
          }
          gx += 1
        }
        var hash = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (sum(x)(y + 1) * cnt(x)(y) > sum(x)(y) * cnt(x)(y + 1))
              hash |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        Some(hash)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

    /** Solid-row test PNG whose dHash is arithmetically derivable: 8×36
      * pixels, row band y/4 carries brightness 20 + 200·bit_{y/4}(seed).
      * The 8×9 dHash grid's cells land exactly on the bands (4 rows per
      * cell), so transition bit k equals [bit_{k+1}(seed) > bit_k(seed)],
      * replicated across all 8 columns. */
    def encodeBitRowPng(seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 36,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 36) {
        val v = 20 + 200 * ((seed >> (y / 4)) & 1L).toInt
        val rgb = (v << 16) | (v << 8) | v
        var x = 0
        while (x < 8) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic w×h test PNG (gradient fill) — the generator side of
      * the round-trip the oracle query checks. */
    def encodeTestPng(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /**
   * REAL audio codec over the JDK's built-in `javax.sound.sampled`
   * (WAV/AIFF/AU parsing ships with Java — header-only, no audio device
   * needed): decodes actual frame count and sample rate into an exact
   * duration. Bytes no installed provider recognizes fall back to the
   * stub, keeping the pipeline total. Video remains stub-only: the JDK
   * ships no video decoders.
   */
  object WavCodec {
    /** Real duration from the audio header; stub fallback otherwise. */
    def decode(kind: String, bytes: Array[Byte]): MediaMeta =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val frames = aff.getFrameLength.toLong
        val rate = aff.getFormat.getFrameRate
        val dur = if (frames >= 0 && rate > 0)
          math.round(frames * 1000.0 / rate).toInt else 0
        MediaMeta(-1, kind, bytes.length, 0, 0, dur, valid = true)
      } catch { case scala.util.control.NonFatal(_) =>
        StubCodec.decode(kind, bytes)
      }

    /** Deterministic 16-bit mono PCM WAV (sawtooth fill) — the generator
      * side of the round trip the oracle query checks. */
    def encodeTestWav(frames: Int, rate: Float = 8000f): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val data = new Array[Byte](frames * 2)
      var i = 0
      while (i < frames) {
        val v = ((i * 37) % 65536 - 32768).toShort
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Batch-decode blobs to metadata; partition-parallel, payloads stay put. */
  def decodeBatch(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => StubCodec.decode(b.kind, b.bytes).copy(id = b.id)))
  }

  /**
   * Real-codec batch decode: kind-dispatched to the JDK codecs (images →
   * [[ImageIoCodec]], audio → [[WavCodec]]); anything else — including
   * video, which the JDK cannot decode — keeps the stub's synthetic
   * header behavior.
   */
  def decodeBatchReal(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      (b.kind match {
        case "image" | "png" | "jpeg" => ImageIoCodec.decode(b.kind, b.bytes)
        case "audio" | "wav" => WavCodec.decode(b.kind, b.bytes)
        case _ => StubCodec.decode(b.kind, b.bytes)
      }).copy(id = b.id)
    })
  }

  /**
   * Real-codec decode + bounded resize: images go through an actual
   * pixel rescale (re-encoded PNG, dims re-read from the RESIZED bytes —
   * a full encode→decode→rescale→encode→decode round trip); non-image
   * payloads keep the stub's synthetic-header behavior.
   */
  def decodeAndResizeReal(blobs: Dataset[MediaBlob],
      maxSide: Int): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      ImageIoCodec.resizeBytes(b.bytes, maxSide) match {
        case Some(rb) =>
          val (w, h) = ImageIoCodec.dims(rb).getOrElse((0, 0))
          MediaMeta(b.id, b.kind, rb.length, w, h, 0, valid = w > 0)
        case None =>
          StubCodec.resize(StubCodec.decode(b.kind, b.bytes).copy(id = b.id), maxSide)
      }
    })
  }

  /** One perceptual-hash row: payload id, 64-bit dHash, decodability. */
  case class MediaHash(id: Long, dhash: Long, valid: Boolean)

  /** Per-payload perceptual hash through the typed batch pipeline (real
    * ImageIO decode; payload bytes never cross a stage boundary — only
    * (id, 64-bit hash) rows shuffle afterwards). */
  def dHashBatch(blobs: Dataset[MediaBlob]): Dataset[MediaHash] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      ImageIoCodec.dHash(b.bytes) match {
        case Some(hh) => MediaHash(b.id, hh, valid = true)
        case None => MediaHash(b.id, 0L, valid = false)
      }
    })
  }

  /**
   * Perceptual-duplicate pairs: payloads whose dHash is identical —
   * the image analog of exact text dedup, robust to re-encoding (PNG ↔
   * JPEG survives because the hash reads pixels, not bytes). An
   * equi-join on the 64-bit hash, never all-pairs: candidate groups are
   * hash buckets, and at 100 TB the shuffle moves (id, hash) rows only.
   * Near-dup (hamming ≤ r) extends this exactly like SimHash banding —
   * the same band machinery applies to the dhash column.
   */
  def dHashDupPairs(hashes: Dataset[MediaHash]): DataFrame = {
    val h = hashes.toDF().filter(org.apache.spark.sql.functions.col("valid"))
    val a = h.select(org.apache.spark.sql.functions.col("id").as("d1"),
      org.apache.spark.sql.functions.col("dhash"))
    val b = h.select(org.apache.spark.sql.functions.col("id").as("d2"),
      org.apache.spark.sql.functions.col("dhash"))
    a.join(b, "dhash")
      .filter(org.apache.spark.sql.functions.col("d1") <
        org.apache.spark.sql.functions.col("d2"))
      .select("d1", "d2")
  }

  /**
   * NEAR-duplicate pairs by hamming distance over dHash — SimHash-style
   * pigeonhole banding: 4 disjoint 16-bit bands, so any pair within
   * hamming 3 shares at least one full band (guaranteed recall, not
   * probabilistic); candidates verify by popcount(xor). The join is a
   * bucketed (band, bval) equi-join — never all-pairs — exactly the
   * scale shape of the text SimHash path.
   */
  def dHashNearPairs(hashes: Dataset[MediaHash], radius: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    require(radius >= 0 && radius <= 3,
      "4×16-bit pigeonhole bands guarantee recall only for radius <= 3")
    val h = hashes.toDF().filter(col("valid"))
    val banded = h.select(col("id"), col("dhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("dhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bval")))
    val a = banded.select(col("band"), col("bval"),
      col("id").as("d1"), col("dhash").as("h1"))
    val b = banded.select(col("band"), col("bval"),
      col("id").as("d2"), col("dhash").as("h2"))
    a.join(b, Seq("band", "bval"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= radius)
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
