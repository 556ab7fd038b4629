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
  * No image/audio codec exists in this container, so the DECODE step is a
  * clearly-marked deterministic fake (`FakeCodec`): it reads a tiny
  * fixed-layout header from the payload bytes. Everything around it —
  * schema, partitioning, batch iteration, metadata propagation — is real
  * and tested; swapping `FakeCodec` for javacv/ffmpeg is a one-function
  * change.
  */
object Multimodal {

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
