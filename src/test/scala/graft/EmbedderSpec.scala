package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HashingEmbedder

class EmbedderSpec extends AnyFunSuite {
  private val e = HashingEmbedder(64)

  test("deterministic and dimension-stable") {
    val v1 = e.embedOne("the quick brown fox")
    val v2 = e.embedOne("the quick brown fox")
    assert(v1.toSeq == v2.toSeq)
    assert(v1.length == 64)
  }

  test("unit norm for non-empty text") {
    val v = e.embedOne("some text with several words")
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("empty text yields zero vector, no NaN") {
    val v = e.embedOne("")
    assert(v.forall(_ == 0.0f))
  }

  test("similar texts closer than dissimilar (hashing captures lexical overlap)") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot // unit vectors
    }
    val base = e.embedOne("spark sql query engine for big data")
    val near = e.embedOne("spark sql query engine for large data")
    val far = e.embedOne("banana apple orange fruit salad recipe")
    assert(cos(base, near) > cos(base, far))
  }

  test("withEmbedding: batched mapPartitions preserves row identity, handles nulls") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]), (3L, "gamma delta"))
      .toDF("id", "text")
    val out = graft.operators.Embedder
      .withEmbedding(df, "text", "embedding", EmbeddingConfig(batchSize = 2))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(2)))
      .toMap
    assert(out(1L).isDefined && out(3L).isDefined)
    assert(out(2L).isEmpty, "null text must embed to null")
    val direct = e.embedOne("alpha beta").toSeq
    val viaDf = graft.operators.Embedder
      .withEmbedding(df.where($"id" === 1), "text", "embedding", EmbeddingConfig(batchSize = 100))
      .head().getSeq[Float](2)
    assert(viaDf == direct, "batched path must equal per-text embedding")
  }

  test("batch preserves order and row identity") {
    val texts = Seq("a b c", "d e f", "a b c")
    val vs = e.embedBatch(texts)
    assert(vs.length == 3)
    assert(vs(0).toSeq == vs(2).toSeq)
    assert(vs(0).toSeq != vs(1).toSeq)
  }
}
