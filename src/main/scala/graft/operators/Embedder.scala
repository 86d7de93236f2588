package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.EmbeddingConfig

/** Embedding provider abstraction, mirroring the reference's Embedder
  * (reference: src/transform/embedder.py:16-114): batched text → vector,
  * fixed dimension, provider selected by config. The reference's only
  * provider is OpenAI over HTTPS (embedder.py:51-58); this build is
  * zero-egress, so the default provider is a deterministic local
  * feature-hashing vectorizer. Determinism is load-bearing: it makes
  * vector-search results oracle-testable.
  *
  * Scale design: embedding is applied per-partition with internal batching
  * (`grouped(batchSize)`), exactly the reference's batch-of-100 HTTP pattern
  * (embedder.py:66-87) — a narrow transformation, no shuffle, and row
  * identity is preserved so no positional zip-join is ever needed
  * (the reference's zip at embedder.py:110-114 is avoided by construction,
  * SURVEY.md §2.3 J6).
  */
trait EmbeddingProvider extends Serializable {
  def dimension: Int

  /** Embed a batch of texts; must return one vector per input, in order. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]

  def embedOne(text: String): Array[Float] = embedBatch(Seq(text)).head
}

/** Deterministic local embedder: L2-normalized feature hashing of
  * lowercase word unigrams+bigrams into `dimension` buckets with a
  * sign hash (the classic hashing-trick vectorizer). Cosine similarity
  * between these vectors approximates lexical overlap, which gives
  * vector search meaningful (and fully reproducible) behavior offline.
  */
final case class HashingEmbedder(dimension: Int = 64) extends EmbeddingProvider {
  require(dimension > 0, s"embedding dimension must be positive, got $dimension")

  private def tokens(text: String): Seq[String] = {
    val words = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    words ++ words.sliding(2).filter(_.length == 2).map(_.mkString("_"))
  }

  // Stable 64-bit FNV-1a — not JVM hashCode, so vectors are stable across
  // Scala/JVM versions (important: they are persisted).
  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { text =>
      val v = new Array[Float](dimension)
      tokens(text).foreach { t =>
        val h = fnv1a(t)
        val bucket = java.lang.Math.floorMod(h, dimension.toLong).toInt
        val sign = if (((h >>> 32) & 1L) == 0L) 1.0f else -1.0f
        v(bucket) += sign
      }
      var norm = 0.0
      var i = 0
      while (i < dimension) { norm += v(i).toDouble * v(i); i += 1 }
      if (norm > 0) {
        val inv = (1.0 / math.sqrt(norm)).toFloat
        i = 0
        while (i < dimension) { v(i) *= inv; i += 1 }
      }
      v
    }
}

object Embedder {

  def provider(cfg: EmbeddingConfig): EmbeddingProvider = cfg.provider match {
    case "hashing" => HashingEmbedder(cfg.dimension)
    case other =>
      // The reference rejects unknown providers the same way
      // (src/transform/embedder.py:51-58).
      throw new IllegalArgumentException(
        s"Unsupported embedding provider: $other (offline build supports 'hashing')"
      )
  }

  /** Attach an `embedding: array<float>` column computed from `textCol`,
    * via mapPartitions with `cfg.batchSize` texts per provider call — the
    * reference's batch-of-100 HTTP pattern (embedder.py:66-87) made
    * partition-local. Row identity is preserved by construction (the
    * vector is appended to its own row), so no positional re-join exists
    * anywhere (SURVEY §2.3 J6). Null/absent text embeds to null.
    */
  def withEmbedding(
      df: DataFrame,
      textCol: String = "text",
      outCol: String = "embedding",
      cfg: EmbeddingConfig = EmbeddingConfig()
  ): DataFrame = {
    val p = provider(cfg)
    val batchSize = math.max(1, cfg.batchSize)
    // replace semantics: re-embedding a frame that already has outCol must
    // not produce a duplicate (ambiguous) column
    val base = if (df.columns.contains(outCol)) df.drop(outCol) else df
    val textIdx = base.schema.fieldIndex(textCol)
    val outSchema = base.schema.add(outCol, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType))
    base.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => if (r.isNullAt(textIdx)) null else r.getString(textIdx))
        // one provider call per batch; null slots bypass the provider
        val present = texts.filter(_ != null)
        val embedded = if (present.isEmpty) Iterator.empty else p.embedBatch(present).iterator
        batch.zip(texts).map { case (r, t) =>
          val vec = if (t == null) null else embedded.next().toSeq
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ vec)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
