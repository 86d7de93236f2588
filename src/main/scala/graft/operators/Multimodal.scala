package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata structs, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schemas, partition-preserving mapPartitions
  * execution, batch shape, null handling — is real and tested. The codec
  * layer is STUBBED (this container ships no image/audio libraries): each
  * stub is deterministic from the payload bytes so tests are exact, and is
  * clearly marked. Swap [[MediaCodec]] for a real implementation (javax
  * imageio / ffmpeg bindings) without touching the operators.
  *
  * Scale notes: media payloads dominate row size, so operators never
  * shuffle payloads — all transforms are narrow; anything aggregate-shaped
  * (e.g. feature stats) first projects payloads away. Use
  * `spark.sql.files.maxPartitionBytes` to keep scan partitions bounded
  * when rows are multi-MB.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType)
  ))

  /** Codec seam. STUB implementations are deterministic in payload bytes. */
  trait MediaCodec extends Serializable {
    def imageDims(bytes: Array[Byte]): (Int, Int)
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    def embed(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB codec — no media libraries in this build. Dimensions are derived
    * deterministically from a payload hash; resize re-hashes; embed is a
    * seeded projection of payload bytes. Replace with a real codec for
    * production use (the operators are codec-agnostic).
    */
  object StubCodec extends MediaCodec {
    private def h64(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      h
    }
    override def imageDims(bytes: Array[Byte]): (Int, Int) = {
      val h = h64(bytes)
      (64 + java.lang.Math.floorMod(h, 960L).toInt, 64 + java.lang.Math.floorMod(h >>> 17, 960L).toInt)
    }
    override def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // ??? real implementation decodes + rescales; stub emits a
      // deterministic (w*h/64)-byte payload derived from the source hash
      val out = new Array[Byte](math.max(16, w * h / 64))
      var seed = h64(bytes) ^ (w.toLong << 32) ^ h.toLong
      var i = 0
      while (i < out.length) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        out(i) = (seed >>> 56).toByte
        i += 1
      }
      out
    }
    override def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      var seed = h64(bytes)
      var i = 0
      while (i < dim) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        v(i) = ((seed >>> 40).toInt / Int.MaxValue.toFloat)
        i += 1
      }
      v
    }
  }

  /** Attach decoded image metadata (format sniffed from magic bytes, dims
    * from the codec) to a binary `content` column.
    */
  def withImageMeta(df: DataFrame, contentCol: String = "content", codec: MediaCodec = StubCodec): DataFrame = {
    val metaUdf = udf(
      new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
        override def call(bytes: Array[Byte]): Row =
          if (bytes == null) null
          else {
            val fmt =
              if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') "png"
              else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
              else "unknown"
            val (w, h) = codec.imageDims(bytes)
            Row(fmt, w, h, 3)
          }
      },
      imageMetaSchema
    )
    df.withColumn("image_meta", metaUdf(col(contentCol)))
  }

  /** Resize payloads to (w, h) — narrow, partition-preserving. */
  def resizeImages(df: DataFrame, w: Int, h: Int, contentCol: String = "content",
      outCol: String = "resized", codec: MediaCodec = StubCodec): DataFrame = {
    val f = udf { (bytes: Array[Byte]) => Option(bytes).map(codec.resize(_, w, h)) }
    df.withColumn(outCol, f(col(contentCol)))
  }

  /** Media embedding column (the image twin of the text embedder). */
  def withMediaEmbedding(df: DataFrame, dim: Int = 64, contentCol: String = "content",
      outCol: String = "media_embedding", codec: MediaCodec = StubCodec): DataFrame = {
    val f = udf { (bytes: Array[Byte]) => Option(bytes).map(codec.embed(_, dim)) }
    df.withColumn(outCol, f(col(contentCol)))
  }

  /** Frame-sample a video payload: emit one row per sampled frame index
    * with a deterministic frame payload (STUB: frames are hash-derived
    * slices; a real codec extracts I-frames). `explode`-shaped — the
    * generator pattern for media.
    */
  def sampleFrames(df: DataFrame, everyNth: Int, maxFrames: Int,
      contentCol: String = "content", codec: MediaCodec = StubCodec): DataFrame = {
    require(everyNth > 0, s"sampleFrames: everyNth must be positive, got $everyNth")
    require(maxFrames > 0, s"sampleFrames: maxFrames must be positive, got $maxFrames")
    val framesUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[(Int, Array[Byte])]
      else {
        val nFrames = math.max(1, bytes.length / 1024)
        (0 until nFrames by everyNth).take(maxFrames).map { i =>
          (i, codec.resize(bytes ++ BigInt(i).toByteArray, 32, 32))
        }
      }
    }
    df.withColumn("frame", explode(framesUdf(col(contentCol))))
      .withColumn("frame_index", col("frame._1"))
      .withColumn("frame_bytes", col("frame._2"))
      .drop("frame")
  }
}
