package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // two cleanly separated vocabularies: "good" docs vs "spam" docs
  private lazy val docs = Seq(
    (1L, "clear prose with careful argument and cited sources", 1),
    (2L, "careful analysis and clear cited argument in prose", 1),
    (3L, "sources cited and argument in clear careful prose", 1),
    (4L, "buy now cheap pills click here free winner", -1),
    (5L, "winner click free cheap pills buy here now now", -1),
    (6L, "free cheap winner pills click buy now here", -1)
  ).toDF("doc_id", "text", "y")

  test("fit + classify separates disjoint vocabularies perfectly") {
    val m = QualityClassifier.fitCentroid(docs, "doc_id", "text", col("y"), nFeatures = 64)
    assert(m.nPos == 3 && m.nNeg == 3)
    val out = QualityClassifier.classify(docs, "doc_id", "text", m)
      .select("doc_id", "pred").as[(Long, Int)].collect().toMap
    (1L to 3L).foreach(id => assert(out(id) == 1, s"doc $id should classify +1"))
    (4L to 6L).foreach(id => assert(out(id) == -1, s"doc $id should classify -1"))
  }

  test("generalizes: held-out docs from each vocabulary classify correctly") {
    val m = QualityClassifier.fitCentroid(docs, "doc_id", "text", col("y"), nFeatures = 64)
    val unseen = Seq(
      (10L, "prose with argument and sources"),
      (11L, "click pills free buy")
    ).toDF("doc_id", "text")
    val out = QualityClassifier.classify(unseen, "doc_id", "text", m)
      .select("doc_id", "pred").as[(Long, Int)].collect().toMap
    assert(out(10L) == 1 && out(11L) == -1)
  }

  test("token-less documents are scored by the centroid-norm term, not dropped") {
    val m = QualityClassifier.fitCentroid(docs, "doc_id", "text", col("y"), nFeatures = 64)
    val withEmpty = docs.select("doc_id", "text")
      .union(Seq((99L, "   ")).toDF("doc_id", "text"))
    val out = QualityClassifier.classify(withEmpty, "doc_id", "text", m)
    assert(out.count() == 7, "empty-text doc must still get a row")
    val empty = out.where(col("doc_id") === 99L).select("pred").as[Int].head()
    // gap for a zero vector = ||S+||^2*nn^2 - ||S-||^2*np^2; both classes have
    // equal counts and near-equal norms, so just assert it decided something
    assert(empty == 1 || empty == -1)
  }

  test("fit fails loudly on labels that are not +1/-1") {
    val bad = Seq((1L, "a b c", 0), (2L, "d e f", 1)).toDF("doc_id", "text", "y")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.fitCentroid(bad, "doc_id", "text", col("y"), nFeatures = 16)
    }
    assert(e.getMessage.contains("label must be +1/-1"))
  }

  test("fit fails loudly when a class is empty") {
    val onesided = Seq((1L, "a b c", 1), (2L, "d e f", 1)).toDF("doc_id", "text", "y")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.fitCentroid(onesided, "doc_id", "text", col("y"), nFeatures = 16)
    }
    assert(e.getMessage.contains("need both classes"))
  }

  test("featurize counts hashed unigrams with the shared FTS tokenization") {
    val one = Seq((1L, "Word word WORD other")).toDF("doc_id", "text")
    val rows = QualityClassifier.featurize(one, "doc_id", "text", nFeatures = 1024)
      .collect()
    assert(rows.map(_.getLong(2)).sorted.toSeq == Seq(1L, 3L),
      "lowercased 'word' x3 and 'other' x1 (FTS tokenization folds case)")
  }

  test("fitClassify trains only on the labeledWhere subset") {
    // labels OUTSIDE the subset are inverted garbage; if fit saw them the
    // separation would flip for the held-out half
    val withBadLabels = docs
      .withColumn("y2", when(col("doc_id") <= 3, col("y")).otherwise(col("y") * -1))
    val out = QualityClassifier.fitClassify(
      withBadLabels, "doc_id", "text",
      label = col("y"), labeledWhere = col("doc_id") <= 4,
      nFeatures = 64)
    val preds = out.select("doc_id", "pred").as[(Long, Int)].collect().toMap
    assert(preds(5L) == -1 && preds(6L) == -1,
      "docs 5/6 are spam-vocabulary and must classify -1 even though unlabeled")
  }
}
