package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json extension): image/audio/video
  * payloads are opaque BINARY columns + typed metadata structs; decode /
  * feature-extract runs per partition so heavy native decoders (absent in
  * this container — the decode kernel is a clearly-marked deterministic
  * fake) are initialized once per partition, not per row.
  *
  * The Spark-side plumbing is real and tested: schema contract, batch
  * shape (mapPartitions with a per-partition "decoder" lifecycle), and
  * derived-metadata pushout. Swapping `FakeImageDecoder` for a JNI/FFI
  * decoder changes zero plan structure.
  *
  * Scale: a pure narrow transformation — no shuffle; binary payloads never
  * widen (metadata is extracted, payload dropped as early as possible so
  * downstream stages don't carry megabytes per row).
  */
object Multimodal {

  /** Decoder contract: bytes -> (width, height, channels, meanLuma). */
  trait ImageDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Double)
  }

  /** STUB (this container has no image codecs): a deterministic pure
    * function of the payload bytes with the same signature a libjpeg/FFI
    * decoder would have. */
  object FakeImageDecoder extends ImageDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val n = bytes.length
      val w = 16 + (n % 64)
      val h = 16 + ((n / 64) % 64)
      var s = 0L
      var i = 0
      while (i < n) { s += bytes(i) & 0xff; i += 1 }
      (w, h, 3, if (n == 0) 0.0 else s.toDouble / n / 255.0)
    }
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Frame sampling for video-shaped payloads: every `stride`-th
    * fixed-size chunk of the byte stream becomes one "frame" row
    * (id, frame_idx, frame_bytes). A real container demuxer replaces
    * `frameSize`/stride slicing with keyframe offsets — the Spark side
    * (generator fan-out, per-frame rows, payload dropped after slicing so
    * downstream never carries the full video) is what this pins.
    *
    * Scale: posexplode fan-out is a narrow op; output rows carry only
    * their own frame bytes, never the source payload.
    */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int,
                   stride: Int, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // loud parameter guards (the chunkDocs/concatChunk convention): a
    // zero stride is a modulo-by-zero deep inside the expression (ANSI
    // throws at runtime; non-ANSI silently drops every frame), and a
    // zero frameSize sends the chunk-count division through garbage
    require(frameSize > 0, s"sampleFrames: frameSize=$frameSize")
    require(stride > 0, s"sampleFrames: stride=$stride")
    // the binary column rides through quoted so dotted/spaced names work
    val b = s"`$binCol`"
    df.select(
        org.apache.spark.sql.functions.col(idCol),
        posexplode_outer(expr(
          s"""transform(
             |  filter(sequence(0, greatest(int(floor((octet_length($b) - 1) / $frameSize)), 0)),
             |    i -> i % $stride = 0 AND octet_length($b) > 0),
             |  i -> substring($b, i * $frameSize + 1, $frameSize))"""
            .stripMargin)).as(Seq("sample_idx", "frame_bytes")))
      .withColumnRenamed("sample_idx", "frame_idx")
  }

  /** Resize metadata derivation: target dimensions preserving aspect
    * ratio against a bounding box — pure arithmetic on the decoded
    * metadata struct (a real resize kernel consumes these numbers; the
    * plumbing keeps it a codegen'd projection, no UDF). */
  def withResizeTarget(df: DataFrame, metaCol: String, maxSide: Int,
                       outCol: String = "resize_to"): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = col(s"$metaCol.width").cast("double")
    val h = col(s"$metaCol.height").cast("double")
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(w, h))
    // clamp to 1: an extreme aspect ratio (10000×20 at maxSide 100)
    // would otherwise round the short side to 0 — an invalid target a
    // real resize kernel divides by
    df.withColumn(outCol, when(col(metaCol).isNotNull, struct(
      greatest(lit(1), round(w * scale).cast("int")).as("width"),
      greatest(lit(1), round(h * scale).cast("int")).as("height"))))
  }

  /** Decode a binary column into a metadata struct via mapPartitions:
    * per-partition decoder init (the real-codec lifecycle), row-at-a-time
    * decode, payload column preserved for downstream ops that need it. */
  def withImageMeta(df: DataFrame, binCol: String,
                    decoder: ImageDecoder = FakeImageDecoder,
                    outCol: String = "img_meta"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, metaSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      // per-partition decoder lifecycle: a native decoder would open its
      // context here and close it when the iterator is exhausted
      val d = decoder
      it.map { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        val meta = if (bytes == null) null else {
          val (w, h, c, l) = d.decode(bytes)
          Row(w, h, c, l)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }
}
