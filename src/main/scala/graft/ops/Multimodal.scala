package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder brief): image/audio/video payloads
  * travel as opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as per-partition batch
  * kernels over the binary column (the Scala analog of `mapInPandas` — same
  * batch shape: one task processes an iterator of rows, vectorizable
  * libraries plug in per partition).
  *
  * ALL THREE modalities decode for real: IMAGE via the JDK's javax.imageio
  * ([[JdkImage]] decode / resample / channel stats), AUDIO via a
  * hand-rolled RIFF/WAVE PCM16 codec ([[Wav]]: decode / encode /
  * downsample / rms-peak stats), and VIDEO via TWO real codecs — a
  * hand-rolled animated-GIF codec ([[Gif]]: GIF-variant LZW, frame
  * delays, disposal, interlace, frame rendering) and a Motion-JPEG AVI
  * codec ([[graft.io.Avi]]: AVI RIFF container + per-frame JDK JPEG
  * decode, a TRUE bitstream format). `FakeCodec` remains only as the
  * documented stand-in for INTERFRAME-coded bitstreams (H.264/VP9 — no
  * such codec ships in this container); swapping it for javacv/ffmpeg is
  * a one-function change.
  */
object Multimodal {

  /** REAL image codec over the JDK's ImageIO (PNG/JPEG/BMP/GIF). */
  object JdkImage {
    def decode(payload: Array[Byte]): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }

    /** Deterministic synthetic PNG: pixel = f(id, x, y). */
    def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
          img.setRGB(x, y, (v << 16) | (((v * 3) % 256) << 8) | ((v * 5) % 256))
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** Real resample keeping aspect, bounded by maxSide; re-encoded PNG. */
    def resize(payload: Array[Byte], maxSide: Int): Array[Byte] = {
      val img = decode(payload)
      val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
      if (scale >= 1.0) return payload
      val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
        math.max(1, (img.getHeight * scale).toInt))
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = out.createGraphics()
      g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
      g.dispose()
      encodePng(out)
    }

    /** Mean R/G/B over the decoded pixels — the feature-extract stage with
      * a real decoder behind it. */
    def channelMeans(payload: Array[Byte]): Array[Double] = {
      val img = decode(payload)
      var (r, gSum, b) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          r += (p >> 16) & 0xFF; gSum += (p >> 8) & 0xFF; b += p & 0xFF
          x += 1
        }
        y += 1
      }
      val n = img.getWidth.toLong * img.getHeight
      Array(r.toDouble / n, gSum.toDouble / n, b.toDouble / n)
    }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType), StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("frames", IntegerType))))))

  /** STUB decoder — deterministic fake standing in for an image/video codec
    * (none ships in this sandbox). Header layout: bytes 0-3 width, 4-7
    * height, 8-11 frames (big-endian), rest = payload. */
  object FakeCodec {
    def decodeDims(payload: Array[Byte]): (Int, Int, Int) = {
      def be(off: Int) =
        ((payload(off) & 0xFF) << 24) | ((payload(off + 1) & 0xFF) << 16) |
          ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
      (be(0), be(4), be(8))
    }
    def encode(width: Int, height: Int, frames: Int, body: Array[Byte]): Array[Byte] = {
      val h = java.nio.ByteBuffer.allocate(12).putInt(width).putInt(height).putInt(frames)
      h.array() ++ body
    }
  }

  /** Deterministic synthetic media table derived from row ids. */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Long,
                     parts: Int = 8): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map { id =>
      val w = 64 + (id % 8).toInt * 16
      val h = 48 + (id % 5).toInt * 16
      val frames = 1 + (id % 4).toInt
      val body = Array.tabulate((id % 50).toInt + 10)(i => ((id * 31 + i) % 256).toByte)
      (id, if (id % 3 == 0) "video" else "image",
        FakeCodec.encode(w, h, frames, body))
    }.toDF("media_id", "kind", "payload")
  }

  /** Deterministic synthetic media table with REAL payloads for BOTH
    * modalities: PNG stills and animated-GIF video clips ([[Gif]]). */
  def syntheticMediaPng(spark: org.apache.spark.sql.SparkSession, n: Long,
                        parts: Int = 8): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map { id =>
      val w = 16 + (id % 8).toInt * 4
      val h = 12 + (id % 5).toInt * 4
      if (id % 3 == 0) (id, "video", syntheticGif(id, w, h))
      else (id, "image", JdkImage.syntheticPng(id, w, h))
    }.toDF("media_id", "kind", "payload")
  }

  /** Deterministic animated GIF: 2-5 frames of a block sweeping across a
    * striped background, 8-color palette derived from the id. */
  def syntheticGif(id: Long, w: Int, h: Int): Array[Byte] = {
    val palette = Array.tabulate(8) { i =>
      val v = ((id * 37 + i * 29) % 256).toInt
      (v << 16) | (((v * 3) % 256) << 8) | ((v * 7) % 256)
    }
    val nFrames = 2 + (id % 4).toInt
    val frames = (0 until nFrames).map { f =>
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val block = x >= (f * w / nFrames) && x < ((f + 1) * w / nFrames)
          px(y * w + x) = (if (block) 7 else (x + y + f) % 4).toByte
          x += 1
        }
        y += 1
      }
      (px, 2 + (id % 10).toInt) // per-frame delay in centiseconds
    }
    Gif.encode(w, h, palette, frames, interlace = id % 5 == 0)
  }

  /** Deterministic MJPEG AVI clip: `2 + id%4` solid-color JPEG frames
    * (color a pure hash of (id, frame)), fps ∈ {5, 10, 20} so frame
    * timestamps are exact centisecond integers. A TRUE bitstream video —
    * independent JPEG frames in the AVI RIFF container ([[graft.io.Avi]]),
    * decoded by the JDK's real JPEG codec. */
  def syntheticAvi(id: Long, w: Int, h: Int): Array[Byte] = {
    val nFrames = 2 + (id % 4).toInt
    val fps = 5 * (1 << (id % 3).toInt) // 5, 10, 20
    val frames = (0 until nFrames).map { f =>
      val v = ((id * 37 + f * 11) % 256).toInt
      val rgb = (v << 16) | (((v * 3) % 256) << 8) | ((v * 7) % 256)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      JdkImage.encodeJpeg(img)
    }
    graft.io.Avi.write(frames, w, h, fps)
  }

  /** REAL audio codec: RIFF/WAVE PCM16 little-endian (the dominant
    * uncompressed interchange format), hand-rolled over the public RIFF
    * spec — decode, encode, frame-decimating downsample, and per-channel
    * stats. Audio is now a REAL modality next to images; only video keeps
    * the documented fake. */
  object Wav {
    /** Mono/stereo PCM16 WAV bytes from interleaved samples. */
    def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
        .putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    /** (sampleRate, channels, interleaved samples). Walks RIFF chunks, so
      * extra chunks (LIST/fact) before `data` are fine. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE payload")
      var pos = 12
      var rate = -1; var channels = -1; var bits = -1
      var data: Array[Short] = null
      while (pos + 8 <= bytes.length && (rate < 0 || data == null)) {
        val tag = new String(bytes, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        tag match {
          case "fmt " =>
            require((buf.getShort(pos + 8) & 0xFFFF) == 1, "only PCM WAV supported")
            channels = buf.getShort(pos + 10) & 0xFFFF
            rate = buf.getInt(pos + 12)
            bits = buf.getShort(pos + 22) & 0xFFFF
            require(bits == 16, s"only 16-bit PCM supported (got $bits)")
          case "data" =>
            val n = len / 2
            data = new Array[Short](n)
            var i = 0
            while (i < n) { data(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
          case _ => // skip LIST/fact/...
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      require(rate > 0 && data != null, "missing fmt/data chunk")
      (rate, channels, data)
    }

    /** Keep every `factor`-th FRAME (all channels of it) and divide the
      * declared sample rate — the audio analog of image resampling. */
    def downsample(bytes: Array[Byte], factor: Int): Array[Byte] = {
      val (rate, ch, s) = decode(bytes)
      val frames = s.length / ch
      val kept = (0 until frames by factor).toArray
      val out = new Array[Short](kept.length * ch)
      var o = 0
      kept.foreach { f =>
        var c = 0
        while (c < ch) { out(o) = s(f * ch + c); o += 1; c += 1 }
      }
      encode(rate / factor, ch, out)
    }

    /** Per-channel (rms, peak) over normalized [-1, 1) samples plus the
      * clip duration in seconds. */
    def stats(bytes: Array[Byte]): (Double, Array[Double], Array[Double]) = {
      val (rate, ch, s) = decode(bytes)
      val frames = s.length / ch
      val sumSq = new Array[Double](ch)
      val peak = new Array[Double](ch)
      var i = 0
      while (i < s.length) {
        val c = i % ch
        val v = s(i) / 32768.0
        sumSq(c) += v * v
        if (math.abs(v) > peak(c)) peak(c) = math.abs(v)
        i += 1
      }
      val rms = sumSq.map(x => math.sqrt(x / math.max(frames, 1)))
      (frames.toDouble / rate, rms, peak)
    }
  }

  /** FEATURE stage for audio payloads: duration + per-channel rms/peak. */
  def audioStats(media: DataFrame): DataFrame = {
    val schema = media.schema
      .add("duration_s", DoubleType).add("rms", ArrayType(DoubleType))
      .add("peak", ArrayType(DoubleType))
    val pIdx = media.schema.fieldIndex("payload")
    val kIdx = media.schema.fieldIndex("kind")
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { it =>
      it.map { r =>
        if (r.getString(kIdx) == "audio") {
          val (dur, rms, peak) = Wav.stats(r.getAs[Array[Byte]](pIdx))
          Row.fromSeq(r.toSeq ++ Seq(dur, rms.toSeq, peak.toSeq))
        } else Row.fromSeq(r.toSeq ++ Seq(null, null, null))
      }
    }
  }

  /** DECODE stage with real codecs on every modality: stills via ImageIO
    * (frames = 1), video via the hand-rolled animated-GIF decoder
    * ([[Gif]], frames = real frame count); non-GIF video payloads fall
    * back to the documented fake (true bitstream codecs don't ship here). */
  def decodeMetaReal(media: DataFrame): DataFrame = {
    val schema = StructType(media.schema.fields :+ StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("frames", IntegerType)))))
    val pIdx = media.schema.fieldIndex("payload")
    val kIdx = media.schema.fieldIndex("kind")
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val meta = r.getString(kIdx) match {
          case "image" =>
            val img = JdkImage.decode(payload)
            Row(img.getWidth, img.getHeight, 1)
          case _ if Gif.isGif(payload) =>
            val g = Gif.decode(payload)
            Row(g.width, g.height, g.frames.length)
          case _ if graft.io.Avi.isAvi(payload) =>
            val v = graft.io.Avi.parse(payload)
            Row(v.width, v.height, v.frames.length)
          case _ =>
            val (w, h, f) = FakeCodec.decodeDims(payload)
            Row(w, h, f)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** FRAME-EXTRACT stage with a real video decoder: every `everyK`-th
    * frame of each GIF video row → one output row with the frame's
    * centisecond timestamp, mean R/G/B, and the frame re-encoded as PNG
    * (the training-pipeline "frame sample → still" path). Image rows pass
    * through as frame 0 of their own payload. */
  def extractFrames(media: DataFrame, everyK: Int): DataFrame = {
    require(everyK >= 1, "everyK must be >= 1")
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("kind", StringType),
      StructField("frame_idx", IntegerType), StructField("t_cs", IntegerType),
      StructField("rgb_mean", ArrayType(DoubleType)),
      StructField("frame_png", BinaryType)))
    val pIdx = media.schema.fieldIndex("payload")
    val kIdx = media.schema.fieldIndex("kind")
    val iIdx = media.schema.fieldIndex("media_id")
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(iIdx)
        val payload = r.getAs[Array[Byte]](pIdx)
        r.getString(kIdx) match {
          case "video" if Gif.isGif(payload) =>
            val g = Gif.decode(payload)
            val rgb = Gif.renderRgbFrames(g)
            val starts = g.frames.scanLeft(0)((t, f) => t + f.delayCs)
            (0 until g.frames.length by everyK).map { fi =>
              val px = rgb(fi)
              val img = new java.awt.image.BufferedImage(g.width, g.height,
                java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
              img.setRGB(0, 0, g.width, g.height, px, 0, g.width)
              var (sr, sg, sb) = (0L, 0L, 0L)
              px.foreach { p =>
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              }
              val n = px.length.toDouble
              Row(id, "video", fi, starts(fi),
                Seq(sr / n, sg / n, sb / n), JdkImage.encodePng(img))
            }
          case "video" if graft.io.Avi.isAvi(payload) =>
            // MJPEG: every frame is an independent JPEG — decode the
            // sampled ones with the real JDK codec, timestamp from the
            // container's dwMicroSecPerFrame (exact integer cs)
            val v = graft.io.Avi.parse(payload)
            (0 until v.frames.length by everyK).map { fi =>
              val jpeg = v.frames(fi)
              Row(id, "video", fi, v.timestampCs(fi),
                JdkImage.channelMeans(jpeg).toSeq,
                JdkImage.encodePng(JdkImage.decode(jpeg)))
            }
          case "image" =>
            Seq(Row(id, "image", 0, 0,
              JdkImage.channelMeans(payload).toSeq, payload))
          case _ => Seq.empty[Row]
        }
      }
    }
  }

  /** RESIZE stage with real payload rewrite for images (area-averaging
    * resample, PNG re-encode); video rows pass through untouched. */
  def resizePayload(media: DataFrame, maxSide: Int): DataFrame = {
    val pIdx = media.schema.fieldIndex("payload")
    val kIdx = media.schema.fieldIndex("kind")
    implicit val enc = org.apache.spark.sql.Encoders.row(media.schema)
    media.mapPartitions { it =>
      it.map { r =>
        if (r.getString(kIdx) == "image") {
          val resized = JdkImage.resize(r.getAs[Array[Byte]](pIdx), maxSide)
          Row.fromSeq(r.toSeq.updated(pIdx, resized))
        } else r
      }
    }
  }

  /** FEATURE stage with a real decoder: mean R/G/B per image payload. */
  def channelStats(media: DataFrame): DataFrame = {
    val schema = media.schema.add("rgb_mean", ArrayType(DoubleType))
    val pIdx = media.schema.fieldIndex("payload")
    val kIdx = media.schema.fieldIndex("kind")
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { it =>
      it.map { r =>
        val means =
          if (r.getString(kIdx) == "image")
            JdkImage.channelMeans(r.getAs[Array[Byte]](pIdx))
          else null
        Row.fromSeq(r.toSeq :+ means)
      }
    }
  }

  /** DECODE stage: binary payload → metadata struct (batch kernel over
    * partitions; the fake codec call is the swap point for a real one). */
  def decodeMeta(media: DataFrame): DataFrame = {
    val schema = StructType(media.schema.fields :+ StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("frames", IntegerType)))))
    val pIdx = media.schema.fieldIndex("payload")
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, f) = FakeCodec.decodeDims(r.getAs[Array[Byte]](pIdx))
        Row.fromSeq(r.toSeq :+ Row(w, h, f))
      }
    }
  }

  /** RESIZE stage: pure metadata transform (no payload rewrite needed for
    * bookkeeping pipelines); clamps to the target box keeping aspect. */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded.withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("meta.width"), col("meta.height"))))
      .withColumn("out_width", floor(col("meta.width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("meta.height") * col("scale")).cast("int"))
      .drop("scale")

  /** FRAME-SAMPLE stage: every k-th frame index per video row (explode),
    * images pass through with frame 0. */
  def sampleFrames(decoded: DataFrame, everyK: Int): DataFrame =
    decoded.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col("meta.frames") - 1, lit(0)), lit(everyK))))

  /** FEATURE stage: deterministic per-payload fingerprint over the body
    * bytes (stands in for an embedding extractor; batch shape identical). */
  def fingerprint(media: DataFrame): DataFrame = {
    val schema = media.schema.add("fp", LongType, nullable = false)
    val pIdx = media.schema.fieldIndex("payload")
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { it =>
      it.map { r =>
        val b = r.getAs[Array[Byte]](pIdx)
        var acc = 1125899906842597L % (1L << 56)
        var i = 12 // skip fake header
        while (i < b.length) { acc = (acc * 31 + (b(i) & 0xFF)) % (1L << 56); i += 1 }
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
  }
}
