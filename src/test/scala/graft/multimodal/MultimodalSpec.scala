package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private val seed = "hello world!".getBytes("US-ASCII") // 12 bytes

  test("BMP round-trip: real header, stride padding, exact pixel mean") {
    val bytes = Multimodal.MediaSynth.bmp(seed)
    // 12 px * 3 B = 36, already 4-aligned; h = 12 % 8 + 1 = 5
    assert(bytes.length == 54 + 36 * 5)
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    val (w, h, f, mean) = Multimodal.MediaDecoder.decode("image", bytes)
    assert((w, h, f) == (12, 5, 1))
    val expected = seed.map(b => (b & 0xff).toDouble).sum / seed.length
    assert(mean == expected, s"$mean != $expected")
  }

  test("BMP stride padding is excluded from the mean") {
    val odd = "abcde".getBytes("US-ASCII") // 5 px -> 15 B row, stride 16
    val bytes = Multimodal.MediaSynth.bmp(odd)
    val (w, h, _, mean) = Multimodal.MediaDecoder.decode("image", bytes)
    assert(w == 5 && h == 6)
    assert(mean == odd.map(b => (b & 0xff).toDouble).sum / odd.length)
  }

  test("WAV round-trip: RIFF chunk walk, 16-bit samples, exact byte mean") {
    val bytes = Multimodal.MediaSynth.wav(seed)
    assert(bytes.length == 44 + 2 * seed.length)
    val (channels, bits, frames, mean) = Multimodal.MediaDecoder.decode("audio", bytes)
    assert((channels, bits, frames) == (1, 16, 12))
    assert(mean == seed.map(b => (b & 0xff).toDouble).sum / seed.length)
  }

  test("AVI round-trip: RIFF list walk, frame count cross-check, exact pixel mean") {
    val bytes = Multimodal.MediaSynth.avi(seed)
    // 12 px -> stride 36, frames = 12 % 4 + 2 = 2; fixed headers = 224 B
    assert(bytes.length == 224 + 2 * (8 + 36), s"len=${bytes.length}")
    assert(new String(bytes, 8, 4, "US-ASCII") == "AVI ")
    val (w, h, f, mean) = Multimodal.MediaDecoder.decode("video", bytes)
    assert((w, h, f) == (12, 1, 2))
    assert(mean == seed.map(b => (b & 0xff).toDouble).sum / seed.length)
    // stride padding excluded: odd width forces padded rows
    val odd = "abcde".getBytes("US-ASCII")
    val (w2, _, f2, mean2) = Multimodal.MediaDecoder.decode("video", Multimodal.MediaSynth.avi(odd))
    assert(w2 == 5 && f2 == 3)
    assert(mean2 == odd.map(b => (b & 0xff).toDouble).sum / odd.length)
  }

  test("malformed media fails loudly, never misparses") {
    intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.decode("image", "not a bitmap at all".getBytes)
    }
    intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.decode("audio", Array.fill[Byte](100)(7))
    }
    // truncated pixel payload
    val truncated = Multimodal.MediaSynth.bmp(seed).take(60)
    intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.decode("image", truncated)
    }
    intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.decode("video", "RIFFxxxxNOPE".getBytes("US-ASCII"))
    }
    // frame-count mismatch between avih and movi must fail the cross-check
    val avi = Multimodal.MediaSynth.avi(seed)
    val tampered = avi.clone()
    val bb = java.nio.ByteBuffer.wrap(tampered).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(12 + 12 + 8 + 16, 99) // avih dwTotalFrames
    intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.decode("video", tampered)
    }
  }

  test("non-24bpp or compressed video strf is rejected, never summed as RGB24") {
    val avi = Multimodal.MediaSynth.avi(seed)
    val strf = avi.sliding(4).indexWhere(_.sameElements("strf".getBytes("US-ASCII")))
    assert(strf > 0)
    // 32bpp: frame size require would still pass (stride >= w*3), but every
    // pixel walk would be misaligned — must be refused up front
    val bpp32 = avi.clone()
    java.nio.ByteBuffer.wrap(bpp32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(strf + 8 + 14, 32) // biBitCount
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.decode("video", bpp32)
    }
    assert(e1.getMessage.contains("biBitCount=32"))
    // BI_RLE8-compressed frames are not raw rows at all
    val rle = avi.clone()
    java.nio.ByteBuffer.wrap(rle).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(strf + 8 + 16, 1) // biCompression = BI_RLE8
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.decode("video", rle)
    }
    assert(e2.getMessage.contains("biCompression=1"))
  }

  test("distributed attach+decode recovers text statistics end-to-end") {
    import spark.implicits._
    val docs = Seq((0L, "spark window merge"), (1L, "hash join batch"),
      (2L, "stream group"), (3L, "row data"), (4L, "query filter sort"))
      .toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.attachBinary(docs))
      .collect().map(f => f.doc_id -> f).toMap
    // image docs (0, 3): width == text length, mean == mean ascii
    for (id <- Seq(0L, 3L)) {
      val t = docs.filter(col("doc_id") === id).head().getString(1)
      assert(feats(id).media_type == "image")
      assert(feats(id).width == t.length)
      assert(feats(id).decoded_mean ==
        t.getBytes("US-ASCII").map(b => (b & 0xff).toDouble).sum / t.length)
    }
    // audio docs (1, 4): frames == text length, 1 channel, 16 bits
    for (id <- Seq(1L, 4L)) {
      val t = docs.filter(col("doc_id") === id).head().getString(1)
      assert(feats(id).media_type == "audio")
      assert((feats(id).width, feats(id).height, feats(id).frames) == (1, 16, t.length))
    }
    // video doc (2): real AVI — width == text length, mean == mean ascii
    val t2 = docs.filter(col("doc_id") === 2L).head().getString(1)
    assert(feats(2L).media_type == "video")
    assert((feats(2L).width, feats(2L).height, feats(2L).frames) ==
      (t2.length, 1, t2.length % 4 + 2))
    assert(feats(2L).decoded_mean ==
      t2.getBytes("US-ASCII").map(b => (b & 0xff).toDouble).sum / t2.length)
  }
}
