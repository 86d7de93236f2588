package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat is on the mat and it is happy"),
      (2L, "der hund ist nicht mit der katze und das ist gut"),
      (3L, "le chat est dans la maison et les fleurs pour une fete"),
      (4L, "xyzzy qwerty plugh") // no stopwords
    ).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "und")
  }

  test("quality score ranks clean prose above garbage") {
    val df = Seq(
      (1L, "This is a perfectly reasonable paragraph of English text with normal words and sensible structure throughout the entire document body."),
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (3L, "x")
    ).toDF("id", "text")
    val s = df.select(col("id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) > s(2L))
    assert(s(1L) > s(3L))
  }

  test("bpe-ish token estimate: long words cost extra tokens") {
    val df = Seq(
      (1L, "short words only here"),
      (2L, "antidisestablishmentarianism supercalifragilistic")
    ).toDF("id", "text")
    val n = df.select(col("id"), TextAnalysis.bpeTokenEstimate(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(n(1L) == 4)
    assert(n(2L) > 2, s"long words should exceed word count, got ${n(2L)}")
  }

  test("fingerprint stable under duplicate text, differs across texts") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely different content in this document")
    ).toDF("id", "text")
    val fp = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("quality gate reasons mirror the reference threshold order") {
    val df = Seq(
      (1L, "word " * 30, 1), // 150 chars, 30 words -> ok
      (2L, "hi", 1), // low char density
      (3L, Seq.fill(30)("a" * 20).mkString(" "), 1) // 30 words of 20 chars: avg word len > 15
    ).toDF("id", "text", "pages")
    val got = df.select(
      col("id"),
      coalesce(TextFunctions.qualityFallbackReason(col("text"), col("pages")), lit("ok")).as("gate")
    ).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "ok")
    assert(got(2L) == "low_char_density")
    assert(got(3L) == "no_word_boundaries")
  }

  test("title cleanup matches the reference docstring examples") {
    val df = Seq(
      "EP001 Nutrition During Pregnancy.pdf",
      "FF633 COVID-19 and Pregnancy.pdf",
      "Guide_042022.pdf"
    ).toDF("f")
    val got = df.select(TextFunctions.titleFromFilename(col("f"))).as[String].collect().toSeq
    assert(got == Seq("Nutrition During Pregnancy", "COVID-19 and Pregnancy", "Guide"))
  }

  test("bigramLift ranks a true collocation above independent co-occurrences") {
    // "new york" always together (lift >> 1); "the cat/dog/car" spread out
    val docs = (1 to 30).map { i =>
      val filler = s"the ${Seq("cat", "dog", "car")(i % 3)} sat near item$i"
      (i.toLong, s"$filler new york $filler")
    }.toDF("id", "text")
    val out = TextAnalysis.bigramLift(docs, "text", minCount = 5, k = 5).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert((top.getAs[String]("w1"), top.getAs[String]("w2")) == ("new", "york"),
      out.map(r => (r.getString(0), r.getString(1), r.getAs[Double]("lift"))).mkString(";"))
    // lift of a perfect pair: c_ab=30, c_a=c_b=30 -> lift = N/30 > 1
    assert(top.getAs[Double]("lift") > 1.0)
    // single-word docs must not break the gram builder
    val tiny = Seq((1L, "word"), (2L, "")).toDF("id", "text")
    assert(TextAnalysis.bigramLift(tiny, "text", minCount = 1, k = 5).count() == 0)
  }

  test("vocabCoverage ranks by count then word; cum_frac reaches the corpus total") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("id", "text")
    // counts: a=3, b=2, c=1; total 6
    val out = TextAnalysis.vocabCoverage(docs, "text", k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1, "a", 3L, 3.0 / 6),
      (2, "b", 2L, 5.0 / 6),
      (3, "c", 1L, 1.0)
    ), out.mkString(";"))
    // k larger than the vocabulary truncates cleanly
    assert(TextAnalysis.vocabCoverage(docs, "text", k = 100).count() == 3)
  }
}
