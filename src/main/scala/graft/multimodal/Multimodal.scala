package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, flowing through typed Dataset partitions.
  *
  * The decode step is REAL for all three media classes — each is a pure
  * byte layout needing no codec library: BMP images, PCM WAV audio, and
  * uncompressed ('DIB ') AVI video. [[MediaDecoder]] parses the actual
  * headers and pixel/sample payloads; [[MediaSynth]] writes files with the
  * standard headers a third-party tool would accept. Swapping in a
  * compressed codec changes one match arm.
  *
  * Scale notes: decode runs per-partition (one decoder instance per task,
  * amortized over the batch), never per-row-lambda-per-field; binary columns
  * are never shuffled post-decode (features only).
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long, text: String, media_type: String, content: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      frames: Int,
      decoded_mean: Double)

  /** Media decoder interface: bytes -> (width, height, frames, mean). */
  trait Decoder extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Double)
  }

  /** Deterministic synthesis of REAL media files from seed bytes — the test
    * stand-in for reading actual blobs. Both formats are written with the
    * standard headers a third-party tool would accept.
    */
  object MediaSynth {
    /** 24-bit uncompressed BMP: width = |seed|, height = |seed| % 8 + 1,
      * every row the grayscale seed (pixel c = (s_c, s_c, s_c)), rows padded
      * to 4 bytes per the format. Mean over pixel channel bytes == mean of
      * the seed bytes (replicated rows and equal channels cancel).
      */
    def bmp(seed: Array[Byte]): Array[Byte] = {
      val w = seed.length
      val h = seed.length % 8 + 1
      val stride = (w * 3 + 3) / 4 * 4
      val dataSize = stride * h
      val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte)
        .putInt(54 + dataSize).putInt(0).putInt(54)                   // file header
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)      // BITMAPINFOHEADER
        .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) { val b = seed(c); buf.put(b).put(b).put(b); c += 1 }
        var p = w * 3
        while (p < stride) { buf.put(0.toByte); p += 1 }
        r += 1
      }
      buf.array()
    }

    /** PCM WAV, 16-bit mono 8000 Hz: sample i = (seed_i - 128) << 8, so the
      * decoded per-sample byte value round-trips exactly.
      */
    def wav(seed: Array[Byte]): Array[Byte] = {
      val dataLen = 2 * seed.length
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      seed.foreach(b => buf.putShort((((b & 0xff) - 128) << 8).toShort))
      buf.array()
    }

    /** Uncompressed ('DIB ') RGB24 AVI — video as a pure byte layout, no
      * codec: RIFF('AVI ') > LIST(hdrl){avih + LIST(strl){strh,strf}} +
      * LIST(movi){'00db' frames}. One video stream, width = |seed|,
      * height 1, frames = |seed| % 4 + 2, every frame the same BGR row
      * (pixel c = (s_c, s_c, s_c), rows padded to 4 bytes) — so the decoded
      * pixel mean equals the seed-byte mean, like the BMP arm.
      */
    def avi(seed: Array[Byte]): Array[Byte] = {
      val w = seed.length
      val h = 1
      val frames = seed.length % 4 + 2
      val stride = (w * 3 + 3) / 4 * 4
      val frameBytes = stride * h
      val moviSize = 4 + frames * (8 + frameBytes)     // 'movi' + chunks
      val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40)) // 'hdrl' avih strl
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize).put("AVI ".getBytes("US-ASCII"))
      // LIST hdrl
      buf.put("LIST".getBytes("US-ASCII")).putInt(hdrlSize).put("hdrl".getBytes("US-ASCII"))
      buf.put("avih".getBytes("US-ASCII")).putInt(56)
        .putInt(40000)                        // dwMicroSecPerFrame (25 fps)
        .putInt(frameBytes * 25).putInt(0).putInt(0)
        .putInt(frames).putInt(0).putInt(1)   // dwTotalFrames, dwInitialFrames, dwStreams
        .putInt(frameBytes).putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      //   LIST strl
      buf.put("LIST".getBytes("US-ASCII")).putInt(4 + 64 + 48).put("strl".getBytes("US-ASCII"))
      buf.put("strh".getBytes("US-ASCII")).putInt(56)
        .put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(25).putInt(0).putInt(frames) // dwScale/dwRate/dwStart/dwLength
        .putInt(frameBytes).putInt(-1).putInt(0)       // buffer, quality, sampleSize
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      buf.put("strf".getBytes("US-ASCII")).putInt(40)
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
      // LIST movi
      buf.put("LIST".getBytes("US-ASCII")).putInt(moviSize).put("movi".getBytes("US-ASCII"))
      var f = 0
      while (f < frames) {
        buf.put("00db".getBytes("US-ASCII")).putInt(frameBytes)
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) { val b = seed(c); buf.put(b).put(b).put(b); c += 1 }
          var p = w * 3
          while (p < stride) { buf.put(0.toByte); p += 1 }
          r += 1
        }
        f += 1
      }
      buf.array()
    }
  }

  /** REAL header+payload parsers for the byte-layout formats.
    *
    *  - image (BMP): signature, data offset, width/height/bpp from the
    *    BITMAPINFOHEADER; mean over pixel channel bytes, stride padding
    *    excluded. (width, height, 1, pixel mean)
    *  - audio (WAV): RIFF/WAVE chunk walk; fmt -> channels/rate/bits,
    *    data -> frame count; mean of per-sample (s >> 8) + 128 (the unsigned
    *    high byte). (channels, bitsPerSample, frames, sample-byte mean)
    *  - video (uncompressed AVI): RIFF/'AVI ' chunk walk; avih ->
    *    width/height/frame count (cross-checked against the counted movi
    *    chunks), '00db'/'00dc' frames -> pixel mean, stride padding
    *    excluded. (width, height, frames, pixel mean)
    *
    * Malformed input fails loudly (require), never silently misparses.
    */
  object MediaDecoder extends Decoder {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Double) =
      mediaType match {
        case "image" => decodeBmp(bytes)
        case "audio" => decodeWav(bytes)
        case "video" => decodeAvi(bytes)
        case other   => throw new IllegalArgumentException(s"unknown media type $other")
      }

    private def decodeBmp(bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
      val dataOffset = buf.getInt(10)
      val w = buf.getInt(18)
      val h = buf.getInt(22)
      val bpp = buf.getShort(28)
      require(bpp == 24, s"unsupported bpp $bpp")
      require(w > 0 && h != 0, s"bad dims ${w}x$h")
      val rows = math.abs(h)
      val stride = (w * 3 + 3) / 4 * 4
      require(bytes.length >= dataOffset + stride * rows, "truncated pixel data")
      var sum = 0L
      var r = 0
      while (r < rows) {
        val base = dataOffset + r * stride
        var c = 0
        while (c < w * 3) { sum += bytes(base + c) & 0xff; c += 1 }
        r += 1
      }
      (w, rows, 1, sum.toDouble / (w.toLong * rows * 3))
    }

    private def decodeWav(bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 44 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
      var pos = 12
      var channels = 0; var bits = 0; var dataOff = -1; var dataLen = 0
      while (pos + 8 <= bytes.length) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val size = buf.getInt(pos + 4)
        // a hostile/corrupt size field must fail loudly, not loop forever
        // or read past the buffer in the data pass (Long arithmetic: an Int
        // sum would wrap negative for size near Int.MaxValue and pass)
        require(size >= 0 && pos + 8L + size <= bytes.length, s"bad chunk size $size at $pos")
        id match {
          case "fmt " =>
            require(buf.getShort(pos + 8) == 1, "not PCM")
            channels = buf.getShort(pos + 10)
            bits = buf.getShort(pos + 22)
          case "data" => dataOff = pos + 8; dataLen = size
          case _ =>
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(channels > 0 && bits == 16 && dataOff >= 0, "missing fmt/data chunk")
      val blockAlign = channels * bits / 8
      val frames = dataLen / blockAlign
      var sum = 0L
      var i = 0
      while (i < frames * channels) {
        sum += (buf.getShort(dataOff + 2 * i) >> 8) + 128
        i += 1
      }
      (channels, bits, frames,
        if (frames == 0) 0.0 else sum.toDouble / (frames.toLong * channels))
    }

    private def decodeAvi(bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "AVI ", "not an AVI")
      var w = -1; var h = -1; var totalFrames = -1
      var counted = 0; var pixSum = 0L; var pixN = 0L
      // the pixel walk below assumes uncompressed 24bpp rows: that must be
      // PROVEN from the video stream's strf BITMAPINFOHEADER, not assumed —
      // a 'DIB ' AVI with 32bpp or RLE frames would otherwise pass the size
      // require and silently produce a wrong mean
      var nextStrfIsVideo = false; var videoStrfOk = false

      def fourcc(at: Int) = new String(bytes, at, 4, "US-ASCII")

      // walk the chunks of [from, to); LISTs recurse one level into their body
      def walk(from: Int, to: Int): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val id = fourcc(pos)
          val size = buf.getInt(pos + 4)
          // Long arithmetic: an Int sum wraps negative near Int.MaxValue
          require(size >= 0 && pos + 8L + size <= bytes.length, s"bad chunk size $size at $pos")
          if (id == "LIST") {
            require(size >= 4, "LIST without a type")
            walk(pos + 12, pos + 8 + size) // skip the 4-byte list type
          } else if (id == "avih") {
            require(size >= 56, "short avih")
            totalFrames = buf.getInt(pos + 8 + 16)
            w = buf.getInt(pos + 8 + 32)
            h = buf.getInt(pos + 8 + 36)
          } else if (id == "strh") {
            require(size >= 4, "short strh")
            nextStrfIsVideo = fourcc(pos + 8) == "vids"
          } else if (id == "strf" && nextStrfIsVideo) {
            nextStrfIsVideo = false
            require(size >= 40, "short video strf")
            val bitCount = buf.getShort(pos + 8 + 14)
            val compression = buf.getInt(pos + 8 + 16)
            require(compression == 0 && bitCount == 24,
              s"unsupported video format: biCompression=$compression biBitCount=$bitCount " +
                "(only uncompressed 24bpp RGB is decodable)")
            videoStrfOk = true
          } else if (id == "00db" || id == "00dc") {
            require(w > 0 && h != 0, "frame chunk before avih")
            require(videoStrfOk, "frame chunk before a validated video strf")
            val rows = math.abs(h)
            val stride = (w * 3 + 3) / 4 * 4
            require(size >= stride * rows, "truncated frame")
            var r = 0
            while (r < rows) {
              val base = pos + 8 + r * stride
              var c = 0
              while (c < w * 3) { pixSum += bytes(base + c) & 0xff; c += 1 }
              r += 1
            }
            pixN += w.toLong * rows * 3
            counted += 1
          }
          pos += 8 + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, bytes.length)
      require(w > 0 && h != 0 && totalFrames >= 0, "missing avih header")
      require(counted == totalFrames,
        s"avih says $totalFrames frames, movi has $counted")
      (w, math.abs(h), counted, if (pixN == 0) 0.0 else pixSum.toDouble / pixN)
    }
  }

  /** Attach a binary media column: REAL BMP / WAV / AVI bytes synthesized
    * deterministically from the document text, media_type from the id.
    * Generation is partition-wise and distributed — no driver-side data.
    */
  def attachBinary(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long"), col(text)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, t) =>
          val seed = t.getBytes("UTF-8")
          val mt = (docId % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          val content = mt match {
            case "image" => MediaSynth.bmp(seed)
            case "audio" => MediaSynth.wav(seed)
            case _       => MediaSynth.avi(seed)
          }
          MediaRow(docId, t, mt, content)
        }
      }.toDF()
  }

  /** Partition-wise decode: binary rows -> typed feature rows. */
  def extractFeatures(media: DataFrame, decoder: Decoder = MediaDecoder,
      id: String = "doc_id"): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // one decoder per partition — amortized setup, batch-shaped access
        val d = decoder
        it.map { case (docId, mt, bytes) =>
          val (w, h, f, mean) = d.decode(mt, bytes)
          MediaFeatures(docId, mt, bytes.length.toLong, w, h, f, mean)
        }
      }
  }
}
