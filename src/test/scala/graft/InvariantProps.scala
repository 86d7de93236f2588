package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.{Chunker, HashingEmbedder}

/** ScalaCheck property suite (runs under sbt test via the native
  * ScalaCheck framework): invariants of the pure-Scala operators that the
  * example-based specs can't sweep.
  */
object InvariantProps extends Properties("graft.invariants") {

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val mdGen: Gen[String] = for {
    pre <- textGen
    s1 <- textGen
    s2 <- textGen
  } yield s"$pre\n# H1\n$s1\n## H2\n$s2"

  property("recursiveSplit: every chunk within size; none empty") =
    forAll(textGen, Gen.chooseNum(32, 256)) { (text, size) =>
      val chunks = Chunker.recursiveSplit(text, size, size / 8)
      chunks.forall(c => c.length <= size && c.trim.nonEmpty)
    }

  property("recursiveSplit: every chunk is a contiguous substring; first is a prefix") =
    forAll(textGen) { text =>
      val chunks = Chunker.recursiveSplit(text, 96, 12)
      Prop.all(
        chunks.forall(text.contains(_)),
        chunks.isEmpty || text.trim.startsWith(chunks.head)
      )
    }

  property("chunk: dense indices, constant totalChunks, first chunk starts section") =
    forAll(mdGen) { md =>
      val cs = Chunker.chunk(md, ChunkingConfig(chunkSize = 128, chunkOverlap = 16))
      Prop.all(
        cs.map(_.chunkIndex) == cs.indices.toSeq,
        cs.forall(_.totalChunks == cs.length),
        cs.isEmpty || cs.head.isSectionStart
      )
    }

  property("chunk: header metadata only from headers present in the doc") =
    forAll(mdGen) { md =>
      val cs = Chunker.chunk(md)
      cs.forall(c => c.h1.forall(_ == "H1") && c.h2.forall(_ == "H2"))
    }

  property("embedder: deterministic, unit-norm or zero, fixed dimension") =
    forAll(textGen, Gen.oneOf(16, 32, 64)) { (text, dim) =>
      val e = HashingEmbedder(dim)
      val v1 = e.embedOne(text)
      val v2 = e.embedOne(text)
      val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
      Prop.all(
        v1.toSeq == v2.toSeq,
        v1.length == dim,
        norm == 0.0 || math.abs(norm - 1.0) < 1e-4
      )
    }

  property("token estimate: matches python int(words*1.3) and is monotone in words") =
    forAll(textGen) { text =>
      val words = text.split("\\s+").count(_.nonEmpty)
      Chunker.estimateTokens(text) == (words * 1.3).toInt
    }

  property("TopKBy heap semantics == sort-take on random data (pure heap logic)") = {
    val entriesGen = Gen.chooseNum(0, 60).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0.0, 10.0), Gen.chooseNum(0L, 20L)))
    }
    forAll(entriesGen, Gen.chooseNum(1, 8)) { (entries, k) =>
      // drive the aggregate buffer directly: update then eval
      val agg = graft.plans.TopKBy(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0, org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.catalyst.expressions.BoundReference(1, org.apache.spark.sql.types.LongType, nullable = false),
        k
      )
      val buf = entries.foldLeft(agg.createAggregationBuffer()) { (b, e) =>
        agg.update(b, org.apache.spark.sql.catalyst.InternalRow(e._1, e._2))
      }
      val got = agg.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val gotIds = (0 until got.numElements()).map(i => got.getStruct(i, 2).getLong(1))
      val expected = entries.sortBy { case (s, i) => (-s, i) }.take(k).map(_._2)
      gotIds == expected
    }
  }

  // ---- PDF writer/parser round-trip ------------------------------------

  private val pdfLine: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val pdfPage: Gen[Seq[graft.pdf.PdfGen.Run]] = for {
    nLines <- Gen.chooseNum(1, 6)
    lines <- Gen.listOfN(nLines, pdfLine)
  } yield lines.map(graft.pdf.PdfGen.Run(_))

  property("pdf round-trip: page count exact, every line recovered, compression-invariant") =
    forAll(Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, pdfPage)), Gen.oneOf(true, false)) {
      (pages, compress) =>
        val bytes = graft.pdf.PdfGen.pdf(pages, compress = compress)
        val doc = graft.sources.pdf.PdfParser.parse(bytes)
        val md = graft.sources.pdf.PdfText.extractMarkdown(doc)
        Prop.all(
          doc.pageCount == pages.length,
          pages.flatten.forall(r => md.contains(r.text))
        )
    }
}
