package graft.operators

import scala.collection.mutable.{ArrayBuffer, ListBuffer}
import graft.ChunkingConfig

/** Hybrid chunking — markdown-structure-aware splitting followed by
  * recursive character splitting of oversized sections.
  *
  * Reimplements, from its documented/observable behavior, the reference's
  * chunker (reference: src/transform/chunker.py:16-146) which composes
  * LangChain's `MarkdownHeaderTextSplitter` (strip_headers=False) and
  * `RecursiveCharacterTextSplitter` (chunk_size=512 chars, overlap=50,
  * separator cascade). Pure Scala, no Spark dependency: chunking is a
  * per-document narrow transformation, so the distributed form is simply
  * `Dataset.flatMap(Chunker.chunk(...))` — no shuffle, scales linearly with
  * input splits on any cluster size.
  */
object Chunker {

  /** One markdown section with its header-stack metadata. */
  final case class Section(
      content: String,
      h1: Option[String],
      h2: Option[String],
      h3: Option[String]
  )

  /** One produced chunk (pre-embedding). */
  final case class TextChunk(
      text: String,
      h1: Option[String],
      h2: Option[String],
      h3: Option[String],
      chunkIndex: Int,
      totalChunks: Int,
      isSectionStart: Boolean,
      tokenCount: Int
  )

  /** Rough token estimate: whitespace words x 1.3
    * (reference: src/transform/chunker.py:124-126).
    */
  def estimateTokens(text: String): Int = {
    // explicit ws class (TextFunctions.Ws): keep driver-side token math
    // identical to the column-side/oracle word counting
    val words = text.split("[" + graft.functions.TextFunctions.WsChars + "]+").count(_.nonEmpty)
    (words * 1.3).toInt
  }

  // ---------------------------------------------------------------------
  // Level 1: markdown header splitting
  // ---------------------------------------------------------------------

  /** Split markdown into header-delimited sections, tracking the (h1,h2,h3)
    * header stack; header lines are kept in content (strip_headers=False in
    * the reference, src/transform/chunker.py:29). Fenced code blocks
    * (``` / ~~~) are treated as opaque content.
    */
  def splitByHeaders(
      text: String,
      headers: Seq[(String, String)] = Seq("#" -> "h1", "##" -> "h2", "###" -> "h3")
  ): Seq[Section] = {
    // sorted longest-prefix-first so "##" matches before "#"
    val headerDefs = headers.sortBy(-_._1.length)

    final case class Block(content: String, meta: Map[String, String])
    val blocks = ListBuffer.empty[Block]
    val currentContent = ListBuffer.empty[String]
    var currentMeta = Map.empty[String, String]
    // active header stack as (level, name, value)
    var headerStack = List.empty[(Int, String, String)]
    var activeMeta = Map.empty[String, String]
    var inCodeBlock = false
    var fence = ""

    def flush(): Unit = {
      if (currentContent.nonEmpty) {
        blocks += Block(currentContent.mkString("\n"), currentMeta)
        currentContent.clear()
      }
    }

    for (rawLine <- text.split("\n", -1)) {
      // parity note: the reference's splitter strips EVERY line (including
      // inside code fences) before accumulating — "opaque" means fence
      // content can't introduce headers/sections, not that indentation is
      // preserved. Intentionally matched here.
      val line = rawLine.trim
      if (!inCodeBlock) {
        if (line.startsWith("```") && line.sliding(3).count(_ == "```") == 1) {
          inCodeBlock = true; fence = "```"
        } else if (line.startsWith("~~~")) {
          inCodeBlock = true; fence = "~~~"
        }
      } else if (line.startsWith(fence)) {
        inCodeBlock = false; fence = ""
      }

      if (inCodeBlock || (fence.isEmpty && line.startsWith("~~~"))) {
        currentContent += line
      } else {
        headerDefs.find { case (sep, _) =>
          line.startsWith(sep) &&
          (line.length == sep.length || line.charAt(sep.length) == ' ')
        } match {
          case Some((sep, name)) =>
            val level = sep.count(_ == '#')
            // pop headers at same-or-deeper level
            headerStack.takeWhile(_._1 >= level).foreach { popped =>
              activeMeta -= popped._2
            }
            headerStack = headerStack.dropWhile(_._1 >= level)
            val value = line.substring(sep.length).trim
            headerStack = (level, name, value) :: headerStack
            activeMeta += (name -> value)
            flush()
            currentContent += line // keep header in content
          case None =>
            if (line.nonEmpty) currentContent += line
            else flush()
        }
      }
      currentMeta = activeMeta
    }
    flush()

    // Aggregate contiguous blocks with identical metadata; also merge a
    // header-only block into the deeper-metadata block that follows it
    // (matching the reference splitter's aggregation of "# H1" directly
    // followed by "## H2" when headers are kept in content).
    val aggregated = ListBuffer.empty[Block]
    for (b <- blocks) {
      if (aggregated.nonEmpty && aggregated.last.meta == b.meta) {
        val last = aggregated.remove(aggregated.length - 1)
        aggregated += Block(last.content + "  \n" + b.content, last.meta)
      } else if (
        aggregated.nonEmpty &&
        aggregated.last.meta != b.meta &&
        aggregated.last.meta.size < b.meta.size &&
        aggregated.last.content.split("\n").lastOption.exists(_.startsWith("#"))
      ) {
        val last = aggregated.remove(aggregated.length - 1)
        aggregated += Block(last.content + "  \n" + b.content, b.meta)
      } else {
        aggregated += b
      }
    }

    aggregated.map { b =>
      Section(b.content, b.meta.get("h1"), b.meta.get("h2"), b.meta.get("h3"))
    }.toSeq
  }

  // ---------------------------------------------------------------------
  // Level 2: recursive character splitting
  // ---------------------------------------------------------------------

  /** Separator cascade (reference: src/transform/chunker.py:36-46). */
  val DefaultSeparators: Seq[String] =
    Seq("\n\n", "\n", ". ", "? ", "! ", "; ", ", ", " ", "")

  /** Recursive character splitter with merge-and-overlap, matching the
    * classic recursive-splitter algorithm the reference configures
    * (chunk_size in characters, keep-separator-at-start, strip-whitespace
    * on join). See src/transform/chunker.py:33-48.
    */
  def recursiveSplit(
      text: String,
      chunkSize: Int = 512,
      chunkOverlap: Int = 50,
      separators: Seq[String] = DefaultSeparators
  ): Seq[String] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(chunkOverlap >= 0 && chunkOverlap < chunkSize,
      s"chunkOverlap must be in [0, chunkSize), got $chunkOverlap for size $chunkSize")

    def splitWithSeparator(t: String, sep: String): Seq[String] =
      if (sep.isEmpty) t.map(_.toString)
      else {
        // split keeping the separator attached to the start of the
        // following piece: "a. b. c" on ". " -> ["a", ". b", ". c"]
        val parts = ArrayBuffer.empty[String]
        var idx = 0
        var prevEnd = 0
        var first = true
        while ({ idx = t.indexOf(sep, prevEnd); idx >= 0 }) {
          val piece =
            if (first) t.substring(0, idx)
            else t.substring(prevEnd - sep.length, idx)
          parts += piece
          prevEnd = idx + sep.length
          first = false
        }
        parts += (if (first) t else t.substring(prevEnd - sep.length))
        parts.filter(_.nonEmpty).toSeq
      }

    def mergeSplits(splits: Seq[String]): Seq[String] = {
      val docs = ListBuffer.empty[String]
      var current = List.empty[String] // reversed accumulation
      var total = 0
      def joined(parts: List[String]): Option[String] = {
        val t = parts.reverse.mkString("").trim
        if (t.isEmpty) None else Some(t)
      }
      for (d <- splits) {
        val len = d.length
        if (total + len > chunkSize && current.nonEmpty) {
          joined(current).foreach(docs += _)
          // pop from the front until within overlap AND adding d fits
          while (total > chunkOverlap ||
                 (total + len > chunkSize && total > 0)) {
            total -= current.last.length
            current = current.dropRight(1)
          }
        }
        current = d :: current
        total += len
      }
      joined(current).foreach(docs += _)
      docs.toSeq
    }

    def split(t: String, seps: Seq[String]): Seq[String] = {
      val (sep, remaining) = seps.zipWithIndex
        .collectFirst {
          case (s, i) if s.isEmpty       => (s, Seq.empty[String])
          case (s, i) if t.contains(s)   => (s, seps.drop(i + 1))
        }
        .getOrElse(("", Seq.empty[String]))

      val pieces = splitWithSeparator(t, sep)
      val out = ListBuffer.empty[String]
      val good = ListBuffer.empty[String]
      for (p <- pieces) {
        if (p.length < chunkSize) good += p
        else {
          if (good.nonEmpty) { out ++= mergeSplits(good.toSeq); good.clear() }
          if (remaining.isEmpty) out += p
          else out ++= split(p, remaining)
        }
      }
      if (good.nonEmpty) out ++= mergeSplits(good.toSeq)
      out.toSeq
    }

    split(text, separators)
  }

  // ---------------------------------------------------------------------
  // Composition: the hybrid chunker
  // ---------------------------------------------------------------------

  /** Chunk one document's markdown. Sections longer than 1.5 x chunkSize are
    * recursively re-split (reference: src/transform/chunker.py:90);
    * whitespace-only candidates are dropped (chunker.py:93,97-98);
    * chunk_index is the dense ordinal over the whole document and
    * total_chunks is stamped on every chunk (chunker.py:107,113-115).
    */
  def chunk(text: String, cfg: ChunkingConfig = ChunkingConfig()): Seq[TextChunk] = {
    val sections = splitByHeaders(text, cfg.markdownHeaders)
    val out = ListBuffer.empty[TextChunk]
    for (section <- sections) {
      val subTexts =
        if (section.content.length > cfg.chunkSize * 1.5)
          recursiveSplit(section.content, cfg.chunkSize, cfg.chunkOverlap)
        else if (section.content.trim.nonEmpty) Seq(section.content)
        else Seq.empty
      for ((sub, i) <- subTexts.zipWithIndex if sub.trim.nonEmpty) {
        out += TextChunk(
          text = sub.trim,
          h1 = section.h1,
          h2 = section.h2,
          h3 = section.h3,
          chunkIndex = out.length,
          totalChunks = 0,
          isSectionStart = i == 0,
          tokenCount = estimateTokens(sub)
        )
      }
    }
    val n = out.length
    out.map(_.copy(totalChunks = n)).toSeq
  }
}
