package graft

import org.apache.spark.sql.functions._
import graft.functions.LangId
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaBlob

/** LangId accuracy on constructed multilingual text + multimodal plumbing. */
class TextSpec extends SparkSpecBase {

  test("langid classifies constructed sentences per language") {
    val samples = Seq(
      "en" -> "the weather is nice today and we should go to the park with the dog",
      "en" -> "this is a simple test of the language identification that should work",
      "de" -> "das wetter ist heute schoen und wir sollten mit dem hund in den park gehen",
      "de" -> "dies ist ein einfacher test der erkennung der funktionieren sollte",
      "es" -> "el clima esta agradable hoy y deberiamos ir al parque con el perro",
      "fr" -> "le temps est agreable aujourd hui et nous devrions aller au parc avec le chien",
      "zh" -> "jin tian tian qi hen hao wo men ying gai dai gou qu gong yuan")
    val correct = samples.count { case (lang, text) => LangId.classify(text) == lang }
    assert(correct >= samples.size - 1, s"only $correct/${samples.size} correct")
  }

  test("langid predict runs distributed over a DataFrame") {
    import spark.implicits._
    val df = Seq((1L, "the cat sat on the mat with the hat"),
      (2L, "der hund lief durch den wald und ueber die wiese")).toDF("id", "text")
    val out = LangId.predict(df, "id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
  }

  test("langid handles degenerate input") {
    assert(LangId.classify("") === "und")
    assert(LangId.classify("123 456 !!!") === "und")
  }

  test("multimodal decode extracts header metadata per partition") {
    import spark.implicits._
    val blobs = Seq(
      MediaBlob(1L, "image", Array[Byte](64, 48, 0, 100, 9, 9)),
      MediaBlob(2L, "video", Array[Byte](-128, 72, 1, 0)), // 128 via unsigned
      MediaBlob(3L, "image", Array[Byte](1, 2))            // too short -> invalid
    ).toDS().repartition(2)
    val metas = Multimodal.decodeBatch(blobs).collect().map(m => m.id -> m).toMap
    assert(metas(1L).width === 64 && metas(1L).height === 48 && metas(1L).durationMs === 100)
    assert(metas(1L).valid)
    assert(metas(2L).width === 128 && metas(2L).durationMs === 256)
    assert(!metas(3L).valid && metas(3L).nBytes === 2)
  }

  test("multimodal resize bounds the longer side") {
    import spark.implicits._
    val blobs = Seq(MediaBlob(1L, "image", Array[Byte](-56, 100, 0, 0))).toDS() // 200x100
    val m = Multimodal.decodeAndResize(blobs, maxSide = 50).collect().head
    assert(m.width === 50 && m.height === 25)
  }

  test("dHash: arithmetic expectation, re-encode robustness, dup pairs") {
    import Multimodal.{ImageIoCodec, MediaBlob}
    // expected hash from seed-bit arithmetic: transition bit k set iff
    // bit_{k+1}(seed) > bit_k(seed), replicated across the 8 columns
    def expected(seed: Long): Long = {
      var h = 0L
      (0 until 8).foreach { k =>
        if (((seed >> (k + 1)) & 1) > ((seed >> k) & 1))
          (0 until 8).foreach(x => h |= 1L << (k * 8 + x))
      }
      h
    }
    Seq(0L, 1L, 10L, 170L, 341L, 500L).foreach { seed =>
      val got = ImageIoCodec.dHash(ImageIoCodec.encodeBitRowPng(seed))
      assert(got === Some(expected(seed)), s"seed $seed")
    }
    // re-encoding robustness: the SAME pixels through a lossy JPEG still
    // hash identically (200-point band contrast ≫ JPEG artifacts) —
    // byte-level dedup would miss this pair, pixel-level dHash does not
    val png = ImageIoCodec.encodeBitRowPng(341L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    assert(ImageIoCodec.dHash(jbos.toByteArray) === Some(expected(341L)))
    // different content → different hash; sub-grid images → None
    assert(ImageIoCodec.dHash(ImageIoCodec.encodeBitRowPng(341L)) !==
      ImageIoCodec.dHash(ImageIoCodec.encodeBitRowPng(170L)))
    assert(ImageIoCodec.dHash(ImageIoCodec.encodeTestPng(4, 4)) === None)
    // distributed pair pipeline: a planted copy pairs with its source
    import spark.implicits._
    val blobs = spark.createDataset(Seq(
      MediaBlob(1L, "png", ImageIoCodec.encodeBitRowPng(10L)),
      MediaBlob(2L, "png", ImageIoCodec.encodeBitRowPng(170L)),
      MediaBlob(3L, "png", ImageIoCodec.encodeBitRowPng(10L)), // copy of 1
      MediaBlob(4L, "png", Array[Byte](1, 2, 3))))             // undecodable
    val pairs = Multimodal.dHashDupPairs(Multimodal.dHashBatch(blobs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 3L)))
    // hamming banding: radius <= 3 pairs found by pigeonhole (guaranteed,
    // not probabilistic); far hashes produce no pair even when one band
    // accidentally matches (the verify stage rejects them)
    val h0 = 0x00FF00FF00FF00FFL
    val near = spark.createDataset(Seq(
      Multimodal.MediaHash(1L, h0, valid = true),
      Multimodal.MediaHash(2L, h0 ^ 1L, valid = true),          // hamming 1
      Multimodal.MediaHash(3L, h0 ^ 0x0001000000010000L, valid = true), // 2, split bands
      Multimodal.MediaHash(4L, ~h0, valid = true),               // far (64)
      Multimodal.MediaHash(5L, h0 ^ 0x00000000000000F0L, valid = true), // 4 > radius
      Multimodal.MediaHash(6L, 0L, valid = false)))              // undecodable
    val nearPairs = Multimodal.dHashNearPairs(near)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(nearPairs === Set((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 3)))
  }

  test("ImageIoCodec decodes and rescales REAL png/jpeg pixels") {
    import Multimodal.ImageIoCodec
    // PNG round trip: encoded dims come back exactly
    val png = ImageIoCodec.encodeTestPng(37, 21)
    assert(ImageIoCodec.dims(png) === Some((37, 21)))
    // JPEG too (lossy pixels, exact dims)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    assert(ImageIoCodec.dims(jbos.toByteArray) === Some((37, 21)))
    // real resize: long side clamps, aspect preserved via same floor math
    val resized = ImageIoCodec.resizeBytes(png, 12).get
    assert(ImageIoCodec.dims(resized) === Some((12, (21 * (12.0 / 37)).toInt)))
    // never upscales
    val same = ImageIoCodec.resizeBytes(png, 100).get
    assert(ImageIoCodec.dims(same) === Some((37, 21)))
    // non-image bytes fall back to the stub's synthetic header
    val m = ImageIoCodec.decode("image", Array[Byte](64, 48, 0, 100))
    assert(m.width === 64 && m.height === 48 && m.durationMs === 100)
  }

  test("decodeAndResizeReal runs the pixel pipeline distributed") {
    import spark.implicits._
    import Multimodal.{ImageIoCodec, MediaBlob}
    val blobs = spark.range(0, 40).as[Long].map(id => MediaBlob(id, "png",
      ImageIoCodec.encodeTestPng((16 + id % 32).toInt, (8 + id % 16).toInt)))
      .repartition(4)
    val metas = Multimodal.decodeAndResizeReal(blobs, maxSide = 12)
      .collect().map(m => m.id -> m).toMap
    assert(metas.size === 40)
    (0L until 40L).foreach { id =>
      val (w, h) = (16 + id % 32, 8 + id % 16)
      val scale = 12.0 / w // w always the long side in this fixture
      assert(metas(id).width === (w * scale).toInt, s"id=$id")
      assert(metas(id).height === (h * scale).toInt, s"id=$id")
      assert(metas(id).valid && metas(id).nBytes > 0)
    }
  }

  test("WavCodec parses REAL wav headers; kind dispatch falls back to stub") {
    import Multimodal.WavCodec
    val wav = WavCodec.encodeTestWav(12000, 8000f) // 1.5 s
    val m = WavCodec.decode("wav", wav)
    assert(m.valid && m.durationMs === 1500)
    assert(m.nBytes === 44 + 12000 * 2) // canonical PCM header + frames
    // non-audio bytes fall back to the stub's synthetic header
    val fb = WavCodec.decode("audio", Array[Byte](64, 48, 0, 100))
    assert(fb.width === 64 && fb.durationMs === 100)
    // decodeBatchReal dispatches by kind distributed
    import spark.implicits._
    import Multimodal.{ImageIoCodec, MediaBlob}
    val blobs = Seq(
      MediaBlob(1L, "wav", wav),
      MediaBlob(2L, "png", ImageIoCodec.encodeTestPng(20, 10)),
      MediaBlob(3L, "video", Array[Byte](9, 7, 0, 50))).toDS().repartition(2)
    val metas = Multimodal.decodeBatchReal(blobs).collect().map(m => m.id -> m).toMap
    assert(metas(1L).durationMs === 1500)
    assert(metas(2L).width === 20 && metas(2L).height === 10)
    assert(metas(3L).width === 9 && metas(3L).durationMs === 50) // stub path
  }

  test("blobsFromText round-trips document bytes") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet").limit(10)
    val blobs = Multimodal.blobsFromText(d, "doc_id", "text", "text")
    val metas = Multimodal.decodeBatch(blobs).collect()
    assert(metas.length === 10)
    assert(metas.forall(_.valid))
    val texts = d.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(metas.forall(m => m.nBytes === texts(m.id).getBytes("UTF-8").length))
  }
}
