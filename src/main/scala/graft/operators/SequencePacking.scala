package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Sequence packing for LLM pretraining pipelines: lay documents out into
  * fixed token-budget training sequences.
  *
  * Two standard models:
  *
  *   - [[assignSequences]] — concat-then-chunk (GPT-style): within each
  *     group, documents are concatenated in id order and the stream is cut
  *     every `budget` tokens; a document belongs to the sequence where its
  *     start offset falls (documents may straddle a cut — that is the
  *     point of this model). Pure window algebra: one shuffle on the group
  *     key, exactly SQL-expressible (oracle-checked).
  *
  *   - [[packGreedy]] — strict-budget NEXT-fit: bins NEVER exceed the
  *     budget (an oversized document gets a bin alone); only the current
  *     bin is considered, closed bins are never revisited — the streaming
  *     variant (first-fit would need all open bins in memory and packs
  *     somewhat denser; next-fit is the standard single-pass trade).
  *     Greedy packing is inherently sequential, so it runs partition-local
  *     via mapPartitions: deterministic given deterministic partitioning
  *     (sort-within-partitions on id), bins are per-partition (bin ids
  *     are (partition, local-index) pairs — no global coordination, which
  *     is what makes it scale).
  */
object SequencePacking {

  /** Concat-then-chunk sequence assignment. Adds `seq_index` (0-based
    * sequence number within the group) and `start_offset` (token offset of
    * the document within its group's stream).
    */
  def assignSequences(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokenCol: String,
      budget: Int
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("start_offset", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("seq_index", floor(col("start_offset") / budget).cast("long"))
  }

  /** Length-bucketed batch assignment: group documents of similar token
    * length into fixed-size batches so per-batch padding (batch_max -
    * doc_len summed) stays small — the dynamic-batching trick for
    * efficient fine-tuning/inference, as a deterministic batch layout.
    *
    * Documents are ranked by (tokens, id) — a total order — and cut into
    * `nBuckets` equal-population buckets (bucket = (rank-1)*nBuckets/n);
    * within a bucket, consecutive runs of `batchSize` docs (same ordering)
    * form a batch. Every step is integer arithmetic on exact ranks:
    * deterministic, partition-invariant, oracle-exact.
    *
    * DISTRIBUTED rank (ADVICE r4): the global rank is
    * [[Ranks.withGlobalRank]]'s two-pass range-partition rank — never an
    * unpartitioned window's single-task sort.
    * The in-bucket position needs no second window either: bucket b
    * starts at global rank ceil(b*n/nBuckets)+1, so the position is pure
    * arithmetic on the global rank.
    *
    * Returns the input + (bucket, batch_id, batch_seq): batch_id unique
    * within bucket, batch_seq = position inside the batch.
    */
  def lengthBucketBatches(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      nBuckets: Int,
      batchSize: Int,
      partitions: Int = 0
  ): DataFrame = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    require(batchSize >= 1, s"need batchSize >= 1, got $batchSize")
    val (ranked, n0) = Ranks.withGlobalRank(
      df, Seq(col(tokenCol), col(idCol)), "_rk", partitions)
    val n = math.max(n0, 1L)
    ranked
      .withColumn("bucket", expr(s"((_rk - 1) * $nBuckets) div ${n}L"))
      // first rank of bucket b is ceil(b*n/nBuckets) + 1
      .withColumn("_bk", col("_rk") - expr(s"(bucket * ${n}L + ${nBuckets - 1}) div $nBuckets"))
      .withColumn("batch_id", expr(s"(_bk - 1) div $batchSize"))
      .withColumn("batch_seq", expr(s"(_bk - 1) % $batchSize"))
      .drop("_rk", "_bk")
  }

  /** Strict-budget greedy next-fit packing (see class doc). Returns
    * (id, tokens, bin_id) with `bin_id` unique across the frame
    * (partition-prefixed). Every bin's token sum is <= budget unless it
    * holds a single oversized document.
    */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      partitions: Int = 0
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val prepared0 = df.select(col(idCol).cast("long").as("id"), col(tokenCol).cast("long").as("tokens"))
    val prepared =
      (if (partitions > 0) prepared0.repartitionByRange(partitions, col("id")) else prepared0)
        .sortWithinPartitions("id")
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("tokens", LongType),
      StructField("bin_id", LongType)
    ))
    prepared.mapPartitions { rows =>
      // bin ids are (partitionId << 32 | local bin index): globally unique
      // with zero cross-partition coordination
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var binIdx = -1L
      var binTokens = budget.toLong + 1 // forces a fresh bin on the first row
      rows.map { r =>
        val tokens = r.getLong(1)
        if (binTokens + tokens > budget) { binIdx += 1; binTokens = 0L }
        binTokens += tokens
        Row(r.getLong(0), tokens, (pid << 32) | binIdx)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** [[packGreedy]] that MATERIALIZES the training sequences: the same
    * strict-budget next-fit recurrence over `(id, tokenCol)`, but each
    * output row is a whole bin carrying the CONCATENATION of its
    * documents' `idsCol` arrays in pack order — the packed `input_ids`
    * a trainer reads directly, closing the gap between budget-packing
    * documents and feeding a training job (VERDICT r13 #1). Returns
    * `(bin_id, n_docs, bin_tokens, input_ids, doc_ids, doc_lens)`; bin
    * boundaries are bit-identical to [[packGreedy]] on the same input
    * (spec-pinned), and `input_ids` is exactly the per-doc encoder
    * output ([[TextAnalysis.bpeEncodeIds]] et al.) concatenated in id
    * order.
    *
    * `doc_ids`/`doc_lens` are the per-document BOUNDARY metadata in
    * pack order: `doc_lens(i)` is the length of document `doc_ids(i)`'s
    * segment inside `input_ids` (its ids-array size — `sum(doc_lens) ==
    * size(input_ids)` always). A trainer derives the cross-document
    * attention mask / position-id resets from the lens; provenance
    * (which packed sequence carries document X — the takedown question)
    * reads straight off `doc_ids`.
    *
    * Scale shape: the packGreedy contract — one range partition + local
    * sort, then a single partition-local pass; each emitted row buffers
    * only the CURRENT bin (bounded by `budget` ids, except a lone
    * oversized document), closed bins stream out immediately. No
    * cross-partition coordination: bin ids stay (partition << 32 |
    * local index).
    *
    * `sepId` (VERDICT r14 #4): when set, an end-of-text separator id is
    * appended AFTER each document's segment — the GPT-style packing
    * convention loaders expect. The separator is COUNTED: it bills
    * against the budget (a doc needs `n_tokens + 1` free slots to enter
    * a bin) and is reflected in `doc_lens` (each entry is the segment
    * length INCLUDING its separator), so `bin_tokens == sum(doc_lens) ==
    * size(input_ids)` still holds by construction — [[positionIds]]
    * gives the separator the last position of its document, and
    * [[retractFromShards]]' lens slicing removes a victim's separator
    * with its segment, both with zero special-casing. The default (no
    * separator) is bit-identical to the historical behavior.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      idsCol: String,
      budget: Int,
      partitions: Int = 0,
      sepId: Option[Long] = None
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val prepared0 = df.select(
      col(idCol).cast("long").as("id"),
      col(tokenCol).cast("long").as("tokens"),
      col(idsCol).cast("array<long>").as("ids"))
    val prepared =
      (if (partitions > 0) prepared0.repartitionByRange(partitions, col("id")) else prepared0)
        .sortWithinPartitions("id")
    val outSchema = StructType(Seq(
      StructField("bin_id", LongType),
      StructField("n_docs", LongType),
      StructField("bin_tokens", LongType),
      StructField("input_ids", ArrayType(LongType)),
      StructField("doc_ids", ArrayType(LongType)),
      StructField("doc_lens", ArrayType(LongType))
    ))
    val sepCost = if (sepId.isDefined) 1L else 0L
    prepared.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      val src = rows.buffered
      new Iterator[Row] {
        private var binIdx = -1L
        def hasNext: Boolean = src.hasNext
        def next(): Row = {
          binIdx += 1
          var nDocs = 0L
          var binTokens = 0L
          val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
          val docIds = scala.collection.mutable.ArrayBuffer.empty[Long]
          val docLens = scala.collection.mutable.ArrayBuffer.empty[Long]
          var full = false
          while (!full && src.hasNext) {
            // the separator bills against the budget with its document
            val tokens = src.head.getLong(1) + sepCost
            // next-fit: the first doc always enters (an oversized doc
            // sits alone); after that, close on overflow — the exact
            // packGreedy boundary rule
            if (nDocs > 0L && binTokens + tokens > budget) full = true
            else {
              val r = src.next()
              nDocs += 1
              binTokens += tokens
              val docSeg = Option(r.getSeq[Long](2)).getOrElse(Seq.empty)
              ids ++= docSeg
              sepId.foreach(ids += _)
              docIds += r.getLong(0)
              docLens += docSeg.length.toLong + sepCost
            }
          }
          Row((pid << 32) | binIdx, nDocs, binTokens, ids.toSeq,
            docIds.toSeq, docLens.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** `position_ids` for a packed sequence: 0..len-1 PER DOCUMENT,
    * concatenated in pack order — the third trainer tensor after
    * `input_ids` and the boundary metadata (positions reset at every
    * document boundary, which is how a trainer masks cross-document
    * attention in packed batches). Pure column algebra over `doc_lens`
    * (flatten ∘ transform ∘ sequence): codegen-friendly, no UDF, no
    * shuffle — `size(result) == size(input_ids)` by construction.
    * Zero-length segments contribute nothing (guarded: an unguarded
    * `sequence(0, -1)` would emit a DESCENDING two-element array).
    */
  def positionIds(docLens: Column): Column =
    flatten(transform(docLens, l =>
      when(l > 0L, sequence(lit(0L), l - 1L))
        .otherwise(array().cast("array<bigint>"))))

  /** Portable content digest of one packed bin: the first 8 md5
    * nibbles of `bin_id || ':' || csv(input_ids)` as a 32-bit integer
    * (the [[Sampling.hashBucket]] nibble-arithmetic convention, so the
    * DuckDB oracle computes the identical value with no engine-specific
    * hash). 32 bits leaves 31 bits of headroom before a per-shard SUM
    * could overflow a long — room for 2 billion bins per manifest row,
    * far past any real shard (a 100 TB corpus in 1024 shards is ~24M
    * bins each).
    */
  private[graft] def binDigest: Column = {
    val pre = concat(
      col("bin_id").cast("string"), lit(":"),
      concat_ws(",", col("input_ids").cast("array<string>")))
    graft.functions.TextFunctions.bindOnce(
      md5(pre),
      h =>
        (1 to 8).map { k =>
          val c = ascii(substring(h, k, 1))
          (when(c >= 97, c - 87).otherwise(c - 48)).cast("long") *
            lit(1L << ((8 - k) * 4))
        }.reduce(_ + _))
  }

  /** The LAST MILE of the training-data pipeline: lay [[packSequences]]
    * output onto disk as training shards a data loader reads, plus the
    * manifest that certifies them. Rows land under
    * `path/data/shard=N/` (parquet, `shard = bin_id % nShards` — pure
    * arithmetic on the deterministic bin ids, so the layout is
    * reproducible run-to-run and needs no extra shuffle beyond the
    * partitioned write's own file routing). The manifest —
    * `(shard, n_bins, n_docs, n_tokens, digest)` with `digest` a
    * per-shard sum of [[binDigest]] — is computed by READING BACK the
    * written files (certifying what landed, not what was planned) and
    * written to `path/manifest`; the returned frame is the reloaded
    * manifest. A loader checks its shard's row counts/token totals/
    * digest against the manifest before training; any lost, duplicated,
    * or bit-flipped bin breaks the sum.
    *
    * Scale shape: one partitioned write of the packed rows, one
    * read-back aggregation grouped on `nShards` keys (bounded output),
    * one tiny manifest write. Nothing driver-sided beyond the manifest
    * row handful.
    *
    * An `epoch-shuffled` loader layout is one composition away: run
    * [[TrainingOrder.shuffled]] over the bins (`idCol = "bin_id"`, the
    * epoch as the seed) and pass `shardCol = "shard"` — the export then
    * lands each loader worker's pseudorandom, reproducible slice as its
    * own partition directory instead of the default `bin_id % nShards`.
    *
    * Beyond `data` and `manifest`, the export writes two small
    * sidecars (VERDICT r14 #1/#2):
    *   - `path/docs` — the DOCUMENT-MEMBERSHIP INDEX `(doc_id, shard)`,
    *     partitioned by shard like the data. [[retractFromShards]]
    *     resolves its affected shards from this index (index-scale: one
    *     row per document) instead of scanning every bin's `doc_ids`
    *     arrays across the whole corpus — the difference between a
    *     takedown whose discovery cost is O(corpus) and one that is
    *     O(documents). Maintained by [[appendShards]] (appends) and by
    *     retraction itself (affected partitions rewritten).
    *   - `path/meta` — the append ledger `(batch_key, next_after)`:
    *     `max(next_after)` is the store's next free bin id (bin ids of
    *     incremental appends must not collide with existing bins), and
    *     the batch keys are [[appendShards]]' replay guard. The export
    *     stamps the reserved key `"-"`.
    * Write order: data, docs, meta, manifest LAST — a manifest row set
    * is only ever visible over a fully-landed store.
    */
  def exportShards(
      packed: DataFrame,
      path: String,
      nShards: Int,
      shardCol: String = "",
      stampKey: String = "-",
      ttlMs: Long = graft.sources.StoreLease.DefaultTtlMs
  ): DataFrame = {
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    graft.sources.StoreLease.withRenewableLease(path, "export", ttlMs) { lease =>
      exportShardsImpl(packed, path, nShards, shardCol, stampKey, lease)
    }
  }

  private def exportShardsImpl(
      packed: DataFrame,
      path: String,
      nShards: Int,
      shardCol: String,
      stampKey: String,
      lease: graft.sources.LeaseProtocol.Held
  ): DataFrame = {
    val spark = packed.sparkSession
    val sharded =
      if (shardCol.isEmpty)
        packed.withColumn("shard", pmod(col("bin_id"), lit(nShards.toLong)))
      else {
        require(packed.columns.contains(shardCol),
          s"exportShards: shardCol '$shardCol' not in ${packed.columns.mkString(",")}")
        val w = packed.withColumn("shard", col(shardCol).cast("long"))
        if (shardCol == "shard") w else w.drop(shardCol)
      }
    // a (re-)export is the FOUNDING act: its content is authoritative, so
    // takedown tombstones from the store's previous life are reset (the
    // documented big-purge path is exactly "re-export from the retained
    // corpus" — stale tombstones must not scrub deliberately re-included
    // documents out of later appends)
    graft.sources.Catalog.deleteRecursively(java.nio.file.Paths.get(s"$path/tombstones"))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$path/pending"))
    sharded
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/data")
    // the data write is the verb's long pole — heartbeat before the
    // certify/sidecar tail so a corpus-scale export outlives any fixed ttl
    lease.renew()
    val written = spark.read.parquet(s"$path/data")
    docsIndexOf(written)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/docs")
    val nextBin = written.agg(coalesce(max("bin_id") + 1L, lit(0L))).head().getLong(0)
    import spark.implicits._
    // `stampKey` lets the CREATING batch identify itself in the ledger
    // (default "-", the plain-export stamp): a streamed ingest whose
    // first micro-batch creates the store passes its replay key here, so
    // a crash-replay of that batch short-circuits in appendShards
    // instead of appending the store's own founding content again.
    // `n_shards` records the CONFIGURED layout: the manifest only holds
    // rows for shards that received bins, so a founding batch smaller
    // than the layout would otherwise make every later append derive a
    // shrunken modulus and break the export-parity contract.
    Seq((stampKey, nextBin, nShards.toLong)).toDF("batch_key", "next_after", "n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    manifestOf(written).write.mode("overwrite").parquet(s"$path/manifest")
    spark.read.parquet(s"$path/manifest")
  }

  /** The per-shard certification aggregation every store verb shares:
    * `(shard, n_bins, n_docs, n_tokens, digest)` over packed rows.
    */
  /** Run one bounded action per shard with up to `maxInFlight` in flight
    * (guide §2.6: Spark happily runs several jobs at once; per-shard
    * swap/proof jobs were serialized only because the loop called them
    * sequentially, so the verb's wall was driver job-turnaround x shards).
    * Per-shard publishes stay independent and bounded exactly as in the
    * sequential loop (each swap holds its own per-target lease; the store
    * lease's renew is serialized per Held). After a failure, not-yet-
    * started shards are skipped; already-running shards finish their own
    * publish (each is content-preserving and individually proven). The
    * FIRST failure is rethrown after all in-flight work settles.
    */
  private def forEachShardConcurrently(shards: Seq[Long], maxInFlight: Int = 3)(
      f: Long => Unit): Unit = {
    if (shards.lengthCompare(1) <= 0) { shards.foreach(f); return }
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxInFlight, shards.size))
    try {
      val futures = shards.map { sh =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit =
            if (failed.get() == null) {
              try f(sh)
              catch { case t: Throwable => failed.compareAndSet(null, t); throw t }
            }
        })
      }
      futures.foreach(fu => try fu.get() catch { case _: Throwable => () })
      val t = failed.get()
      if (t != null) throw t
    } finally pool.shutdown()
  }

  private def manifestOf(data: DataFrame): DataFrame =
    data
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_bins"),
        sum("n_docs").as("n_docs"),
        sum("bin_tokens").as("n_tokens"),
        sum(binDigest).as("digest"))

  /** The document-membership rows of packed data: one `(doc_id, shard)`
    * row per document (next-fit packs a document into exactly one bin).
    */
  private def docsIndexOf(data: DataFrame): DataFrame =
    data.select(explode(col("doc_ids")).as("doc_id"), col("shard").cast("long").as("shard"))

  /** Loader-side certification of an [[exportShards]] directory:
    * recompute every shard's manifest row from the files on disk and
    * compare against the stored manifest. Returns one row per shard —
    * `(shard, ok, n_bins, n_docs, n_tokens, digest, a_bins, a_docs,
    * a_tokens, a_digest)` with the stored (`n_*`/`digest`) and actual
    * (`a_*`) sides kept so a mismatch says WHAT diverged; `ok` is false
    * for any count/digest drift, a shard present only in the manifest
    * (files lost), or files present with no manifest row. A training
    * job runs this before reading; a bit flip, a lost parquet part, or
    * a stale manifest all surface here instead of as silent training
    * corruption.
    */
  def verifyShards(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val stored = spark.read.parquet(s"$path/manifest")
    val actual = spark.read.parquet(s"$path/data")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("a_bins"),
        sum("n_docs").as("a_docs"),
        sum("bin_tokens").as("a_tokens"),
        sum(binDigest).as("a_digest"))
    stored.join(actual, Seq("shard"), "full_outer")
      .select(
        col("shard"),
        coalesce(
          col("n_bins") === col("a_bins") &&
            col("n_docs") === col("a_docs") &&
            col("n_tokens") === col("a_tokens") &&
            col("digest") === col("a_digest"),
          lit(false)).as("ok"),
        col("n_bins"), col("n_docs"), col("n_tokens"), col("digest"),
        col("a_bins"), col("a_docs"), col("a_tokens"), col("a_digest"))
      .orderBy("shard")
  }

  /** Certify the DOCUMENT-MEMBERSHIP INDEX against the data — the
    * read-side counterpart of [[verifyShards]] for takedown discovery:
    * a retraction trusts `path/docs` to name every shard carrying a
    * doomed document, so an audit verb proves that trust at maintenance
    * cadence. Recomputes `(doc_id, shard)` membership from every bin's
    * `doc_ids` (the full scan the index exists to avoid — this is the
    * audit, not the discovery path) and full-outer compares with the
    * index. Returns ONLY the mismatched rows,
    * `(doc_id, shard, in_data, in_index)`; empty = the index is exact.
    * The crash-window analysis makes the two directions asymmetric:
    * `in_data=false` (stale EXTRA index row — a crash between a
    * retraction's data and index swaps) costs only a superset discovery
    * and self-heals on the next touching rewrite; `in_index=false`
    * (MISSING row) would make an index-resolved takedown skip that
    * document's shard — the state this verb exists to surface (fix:
    * re-export, or rebuild the index from data). Read-only: no lease.
    */
  def verifyDocsIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): DataFrame = {
    spark.catalog.refreshByPath(s"$path/data")
    spark.catalog.refreshByPath(s"$path/docs")
    val fromData = docsIndexOf(spark.read.parquet(s"$path/data"))
      .distinct().withColumn("in_data", lit(true))
    val fromIndex = spark.read.parquet(s"$path/docs")
      .select(col("doc_id"), col("shard").cast("long").as("shard"))
      .distinct().withColumn("in_index", lit(true))
    fromData.join(fromIndex, Seq("doc_id", "shard"), "full_outer")
      .where(col("in_data").isNull || col("in_index").isNull)
      .select(col("doc_id"), col("shard"),
        coalesce(col("in_data"), lit(false)).as("in_data"),
        coalesce(col("in_index"), lit(false)).as("in_index"))
      .orderBy("doc_id", "shard")
  }

  /** Recompute the manifest from the shard files as they are NOW and
    * swap it in — [[exportShards]]' certify step alone, no data
    * rewrite. This is the recovery verb for a crash that interrupts
    * [[retractFromShards]] between its per-shard swaps and its manifest
    * splice: the rewritten shard then fails [[verifyShards]] (correctly
    * — the manifest IS stale), and a retraction re-run cannot fix it
    * (the victim is already gone, so no shard looks affected).
    * Re-certifying from the files restores the green state; returns the
    * reloaded manifest.
    */
  def recertifyShards(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ttlMs: Long = graft.sources.StoreLease.DefaultTtlMs
  ): DataFrame =
    graft.sources.StoreLease.withRenewableLease(path, "recertify", ttlMs) { lease =>
      recertifyShardsImpl(spark, path, lease)
    }

  private def recertifyShardsImpl(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      lease: graft.sources.LeaseProtocol.Held
  ): DataFrame = {
    val manifest = manifestOf(spark.read.parquet(s"$path/data")).localCheckpoint()
    // the full-store certification scan is this verb's long pole —
    // heartbeat before the swap
    lease.renew()
    try {
      // Catalog.swapIn tolerates an ABSENT manifest (a crash inside a
      // previous swap's two-move window leaves none) — this verb must be
      // able to RECOVER from that state, not throw on its own first move
      graft.sources.Catalog.swapIn(java.nio.file.Paths.get(s"$path/manifest"), Seq(lease)) { tmp =>
        manifest.write.mode("overwrite").parquet(tmp.toString)
      }
    } finally {
      graft.util.Checkpoints.release(
        graft.util.Checkpoints.pinnedRddIds(manifest), spark)
    }
    spark.catalog.refreshByPath(s"$path/manifest")
    spark.read.parquet(s"$path/manifest")
  }

  /** Surgical takedown inside EXPORTED training shards — the delete
    * verb's last mile: remove the given documents' segments from every
    * packed bin that carries them WITHOUT re-exporting the corpus. The
    * `doc_ids`/`doc_lens` boundary metadata makes the retraction exact:
    * each affected bin's `input_ids` is re-assembled from the kept
    * documents' offset slices, bins emptied entirely are dropped, and
    * ONLY the affected `shard=N` directories are rewritten (a takedown
    * touching 3 of 1024 shards rewrites 3 — the partition layout is the
    * unit of mutation, swapped atomically per shard under the
    * temp-write-and-move convention). The manifest is then re-certified
    * by reading back exactly the rewritten shards (partition-pruned)
    * and splicing those rows over the stored ones.
    *
    * DISCOVERY is index-resolved (VERDICT r14 #2): affected shards come
    * from the `path/docs` membership index — one row per document, so a
    * weekly takedown against a 100 TB store reads document-count rows,
    * not every bin's `doc_ids` column — with the full-scan fallback only
    * for stores exported before the index existed. The index's affected
    * partitions are rewritten alongside the data (doomed entries
    * removed), keeping it exact; a crash between the data swap and the
    * index swap leaves stale index entries whose only cost is a
    * superset discovery on a re-run (the rewrite then finds nothing to
    * remove and converges).
    *
    * Loud guards: the takedown list is driver-bounded (it is a legal
    * request, not a dataset); an affected bin whose `bin_tokens` does
    * not equal `sum(doc_lens)` is refused — that bin was packed with a
    * token accounting other than its id-stream lengths, and slicing by
    * lens would silently mis-count what remains.
    *
    * Returns the number of document segments removed (0 = no shard
    * carried any of the ids; nothing touched). Each shard swap is
    * atomic, but the cascade as a whole is not: a crash between the
    * swaps and the manifest splice leaves the rewritten shard failing
    * [[verifyShards]] (the manifest is genuinely stale) — run
    * [[recertifyShards]] to restore the green state; content can never
    * resurrect (the rewritten files simply no longer hold the victim).
    */
  def retractFromShards(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      docIds: Seq[Long],
      ttlMs: Long = graft.sources.StoreLease.DefaultTtlMs
  ): Long =
    graft.sources.StoreLease.withRenewableLease(path, "retract", ttlMs) { lease =>
      retractFromShardsImpl(spark, path, docIds, lease)
    }

  /** [[retractFromShards]] without the writer lease — the internal form
    * [[appendShards]] calls to finish a crashed-takedown double fault
    * while it ALREADY holds the store's lease (a lease is per-store, not
    * re-entrant; nesting the public verb would deadlock-by-loud-failure
    * against our own hold).
    */
  private def retractFromShardsImpl(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      docIds: Seq[Long],
      lease: graft.sources.LeaseProtocol.Held
  ): Long = {
    require(docIds.nonEmpty, "retractFromShards: pass at least one document id")
    require(docIds.length <= 10000,
      s"retractFromShards: ${docIds.length} ids — past the 10k takedown-request bound " +
        "(the doomed list becomes a per-row array literal; a larger purge " +
        "should re-export from the retained corpus instead)")
    // tombstone FIRST (the streaming convention): record the takedown
    // intent before any discovery or rewrite, so a crashed append's bins
    // re-landing on replay — or a plain re-arrival of the same documents
    // in a later batch — can never resurrect the content: [[appendShards]]
    // scrubs every batch against this table before its ledger commits.
    // Duplicate rows from re-runs are fine; readers distinct().
    locally {
      import spark.implicits._
      docIds.distinct.toDF("doc_id")
        .coalesce(1).write.mode("append").parquet(s"$path/tombstones")
    }
    val doomed = docIds.toSet
    val affectedShards = affectedShardsFor(spark, path, docIds)
    if (affectedShards.isEmpty) return 0L

    // (kept input_ids, kept doc_ids, kept doc_lens, removed segments) per
    // bin — walking the lens offsets; UDF is fine here: retraction is a
    // rare administrative rewrite over a few shards, not a hot path
    val retract = udf { (ids: Seq[Long], dids: Seq[Long], lens: Seq[Long], binTokens: Long) =>
      if (lens.sum != binTokens)
        throw new IllegalArgumentException(
          s"retractFromShards: bin_tokens $binTokens != sum(doc_lens) ${lens.sum} — " +
            "this bin was packed by a token accounting other than its id stream; " +
            "retraction by lens slicing would mis-count. Re-export instead.")
      val keptIds = Seq.newBuilder[Long]
      val keptDids = Seq.newBuilder[Long]
      val keptLens = Seq.newBuilder[Long]
      var off = 0
      var removed = 0L
      dids.indices.foreach { i =>
        val l = lens(i).toInt
        if (doomed.contains(dids(i))) removed += 1L
        else {
          keptIds ++= ids.slice(off, off + l)
          keptDids += dids(i)
          keptLens += lens(i)
        }
        off += l
      }
      (keptIds.result(), keptDids.result(), keptLens.result(), removed)
    }

    val affected = spark.read.parquet(s"$path/data")
      .where(col("shard").isin(affectedShards: _*))
    val rebuilt = affected
      .withColumn("_r", retract(col("input_ids"), col("doc_ids"), col("doc_lens"), col("bin_tokens")))
      .select(
        col("bin_id"),
        size(col("_r._2")).cast("long").as("n_docs"),
        aggregate(col("_r._3"), lit(0L), (a, x) => a + x).as("bin_tokens"),
        col("_r._1").as("input_ids"),
        col("_r._2").as("doc_ids"),
        col("_r._3").as("doc_lens"),
        col("shard").cast("long").as("shard"),
        col("_r._4").as("_removed"))

    // the whole affected slice is bounded by the shards being rewritten;
    // pin it so the per-shard writes below don't re-run the UDF pass and
    // don't re-read directories mid-swap
    val pinned = rebuilt.localCheckpoint()
    try {
      // coalesce: a re-run healing a crashed takedown can find the affected
      // shard's rows already gone (the crash lost or already-rewrote them) —
      // an empty slice sums to null, and the heal must report 0, not NPE
      val removed = pinned.agg(coalesce(sum("_removed"), lit(0L))).head().getLong(0)
      val kept = pinned.where(col("n_docs") > 0L).drop("_removed")

      // overlapped per-shard publish jobs (r19, guide §2.6 — the
      // compactShards shape): independent swaps, store-lease renew
      // serialized per Held
      forEachShardConcurrently(affectedShards) { sh =>
        // per-shard heartbeat: a takedown touching many shards at 100 TB
        // outlives any fixed ttl; renewal keeps the lease honest instead
        // of forcing the operator to hand-tune ttlMs per corpus size
        lease.renew()
        graft.sources.Catalog.swapIn(
          java.nio.file.Paths.get(s"$path/data/shard=$sh"), Seq(lease)) { tmp =>
          kept.where(col("shard") === sh).drop("shard")
            .write.mode("overwrite").parquet(tmp.toString)
        }
      }

      // maintain the document-membership index: the affected shards'
      // partitions lose their doomed entries, swapped with the same
      // per-partition convention as the data (absent on a pre-index
      // store — nothing to maintain, discovery already fell back)
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/docs"))) {
        // ONE pinned read of the affected partitions (r18, the
        // compactShards shape): the per-shard read+localCheckpoint paid a
        // listing and a materialization job per shard for rows the swap
        // below still publishes one bounded directory at a time
        spark.catalog.refreshByPath(s"$path/docs")
        val keptAll = spark.read.parquet(s"$path/docs")
          .where(col("shard").isin(affectedShards: _*) &&
            !col("doc_id").isin(docIds.distinct: _*))
          .localCheckpoint() // materialize before the swaps unlink the sources
        try {
          forEachShardConcurrently(affectedShards) { sh =>
            lease.renew()
            graft.sources.Catalog.swapIn(
              java.nio.file.Paths.get(s"$path/docs/shard=$sh"), Seq(lease)) { tmp =>
              keptAll.where(col("shard") === sh).drop("shard")
                .write.mode("overwrite").parquet(tmp.toString)
            }
          }
        } finally {
          graft.util.Checkpoints.release(
            graft.util.Checkpoints.pinnedRddIds(keptAll), spark)
        }
      }

      // re-certify by reading back EXACTLY the rewritten shards
      // (partition-pruned scan) and splicing over the stored manifest
      spliceManifest(spark, path, affectedShards, lease)
      removed
    } finally {
      graft.util.Checkpoints.release(
        graft.util.Checkpoints.pinnedRddIds(pinned), spark)
    }
  }

  /** Incremental shard refresh (VERDICT r14 #1): land a NEW batch of
    * packed bins into an EXISTING [[exportShards]] store without
    * re-exporting the corpus — the last seam between a continuously
    * ingesting stream (`input_ids_stream` → [[packSequences]] over the
    * batch) and the trainer's loader. O(batch) everywhere: the batch's
    * bins are rebased onto fresh ids, appended into their `shard=N`
    * directories, the membership index and the append ledger grow by
    * the batch, and the manifest refresh is ADDITIVE — every manifest
    * field is a sum, so the update reads back only the batch's landed
    * bins (row-group stats skip every pre-append file) and adds their
    * per-shard contribution onto the stored rows, arbitrated by a
    * metadata-only row-count probe so a crash-replay can never
    * double-add. A full-shard digest recompute never happens on the
    * append path (a batch spreading bins across all N shards would
    * otherwise re-read the whole store per append).
    *
    * Bin-id REBASE: the store's next free id comes from the `path/meta`
    * ledger (`max(next_after)`), and the batch's bins are renumbered
    * `base + rank - 1` in bin-id order ([[Ranks.withGlobalRank]] — a
    * distributed rank, never a single-task window), so appended ids are
    * dense, deterministic, and can never collide with existing bins.
    * Shard assignment stays `bin_id % nShards` with `nShards` read off
    * the manifest — new bins spread across the existing layout.
    *
    * REPLAY is a no-op at two levels (the streaming verbs' contract):
    * a `batchKey` already in the ledger means the append fully
    * committed (the ledger row is written LAST) — immediate return; a
    * crashed attempt (no ledger row) is healed by re-running the SAME
    * batch — landed bins are detected by `bin_id >= base` (parquet
    * row-group stats skip pre-append files) and skipped, missing index
    * rows are backfilled, and the additive manifest splice applies the
    * batch's delta exactly once (the row-count probe tells an
    * already-spliced shard from a pre-splice one). TAKEDOWNS WIN over
    * appends: before the ledger commits, the batch is scrubbed against
    * the store's tombstone table ([[retractFromShards]] records every
    * takedown there FIRST), so neither a crashed batch replaying after
    * a mid-window retraction nor a later re-arrival of deleted content
    * can resurrect it ([[exportShards]] resets the tombstones — a
    * re-export's content is authoritative). Single-writer, like every
    * store verb here — and since r16 that is a CHECKED invariant, not a
    * docstring convention: every mutating verb runs under the store's
    * [[graft.sources.StoreLease]] (loud failure on a live second writer,
    * loud steal of a crashed holder's expired lease). A DIFFERENT batch
    * must still not start while a crashed append awaits replay (under
    * streaming's in-order redelivery it cannot).
    *
    * Parity contract (oracle-pinned by q_shard_append): export(A) then
    * appendShards(B) is byte-identical — data, manifest, digests — to
    * exportShards(A ∪ rebase(B)) in one shot.
    *
    * Returns the number of bins actually appended (0 = full replay or
    * empty batch).
    */
  def appendShards(
      packed: DataFrame,
      path: String,
      batchKey: String,
      ttlMs: Long = graft.sources.StoreLease.DefaultTtlMs
  ): Long = {
    require(batchKey != "-",
      "appendShards: batch_key \"-\" is reserved for the exportShards stamp")
    graft.sources.StoreLease.withRenewableLease(path, "append", ttlMs) { lease =>
      appendShardsImpl(packed, path, batchKey, lease)
    }
  }

  private def appendShardsImpl(
      packed: DataFrame,
      path: String,
      batchKey: String,
      lease: graft.sources.LeaseProtocol.Held
  ): Long = {
    val spark = packed.sparkSession
    // one-time upgrade of a store exported before the sidecars existed:
    // bootstrap the ledger from a bin_id scan and the membership index
    // from a full doc_ids derive — paid once, then every append is O(batch)
    // layout derivation for stores that predate the recorded `n_shards`
    // (legacy upgrade only — best available: the occupied shards; a
    // founding batch narrower than the configured layout genuinely lost
    // that information). New stores read the layout off the ledger.
    def occupiedShards(): Long = spark.read.parquet(s"$path/data")
      .agg(coalesce(max("shard").cast("long") + 1L, lit(0L))).head().getLong(0)
    import spark.implicits._
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/meta"))) {
      val nextBin = spark.read.parquet(s"$path/data")
        .agg(coalesce(max("bin_id") + 1L, lit(0L))).head().getLong(0)
      Seq(("-", nextBin, occupiedShards())).toDF("batch_key", "next_after", "n_shards")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    } else {
      spark.catalog.refreshByPath(s"$path/meta")
      if (!spark.read.parquet(s"$path/meta").columns.contains("n_shards")) {
        // one-time ledger upgrade: rewrite the (tiny) ledger with the
        // layout column so later rows never mix schemas in the directory
        val legacy = spark.read.parquet(s"$path/meta")
          .withColumn("n_shards", lit(occupiedShards())).localCheckpoint()
        try {
          graft.sources.Catalog.swapIn(java.nio.file.Paths.get(s"$path/meta"), Seq(lease)) { tmp =>
            legacy.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          }
        } finally {
          graft.util.Checkpoints.release(
            graft.util.Checkpoints.pinnedRddIds(legacy), spark)
        }
      }
    }
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/docs")))
      docsIndexOf(spark.read.parquet(s"$path/data"))
        .write.mode("overwrite").partitionBy("shard").parquet(s"$path/docs")
    spark.catalog.refreshByPath(s"$path/meta")
    val meta = spark.read.parquet(s"$path/meta")
    val pending = java.nio.file.Paths.get(s"$path/pending")
    if (!meta.where(col("batch_key") === batchKey).isEmpty) {
      // committed replay: also clear a marker left by a crash between the
      // ledger append and the marker delete — but ONLY when the marker's
      // recorded base sits BELOW the ledger tip, i.e. its own write window
      // verifiably committed (strict in-order single-writer: a committed
      // append with next_after past the marker's base means that window
      // was consumed and ledgered). A marker at/past the tip belongs to a
      // LATER crashed append (ADVICE r15): deleting it would disable the
      // unledgered-tail takedown scan and the double-fault heal that
      // marker gates, so it stays. An unreadable marker is kept too — the
      // cost of keeping is one spurious tail scan; of a wrong delete, a
      // silently missed takedown.
      if (java.nio.file.Files.exists(pending)) {
        val tip = meta.agg(max("next_after")).head().getLong(0)
        val markerBase =
          try java.nio.file.Files.readString(pending).trim.toLong
          catch { case _: Exception => Long.MaxValue }
        if (markerBase < tip) java.nio.file.Files.deleteIfExists(pending)
      }
      return 0L
    }
    val base = meta.agg(max("next_after")).head().getLong(0)
    // the CONFIGURED layout, recorded at export time — never derived from
    // the manifest, whose rows only cover shards that received bins (an
    // emptied store has none at all; a narrow founding batch covers few)
    val nShards = meta.agg(max("n_shards")).head().getLong(0)
    require(nShards > 0L,
      s"appendShards: store at $path records no shard layout (emptied " +
        "legacy store) — re-append after re-exporting it")

    // finish any takedown that crashed mid-rewrite over a PREVIOUS
    // attempt's landed bins BEFORE this append touches anything: the
    // double-fault window (append crashed unledgered, then the takedown
    // wrote its tombstone but crashed before the shard rewrite) leaves a
    // landed bin still carrying a tombstoned doc; the replay's
    // pre-landing scrub only sees bins it is about to land, so complete
    // the retraction here — idempotent, and BEFORE the append's own
    // writes, so the append's crash analysis never reasons about a
    // half-applied takedown. Bounded by the unledgered tail (one batch),
    // and GATED on the pending marker: a landed-unledgered tail can only
    // exist if a previous attempt crashed, and the marker survives
    // exactly those crashes — a healthy append never pays this scan.
    if (java.nio.file.Files.exists(pending) &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/tombstones"))) {
      spark.catalog.refreshByPath(s"$path/tombstones")
      spark.catalog.refreshByPath(s"$path/data")
      val leftover = spark.read.parquet(s"$path/data")
        .where(col("bin_id") >= base)
        .select(explode(col("doc_ids")).as("doc_id"))
        .join(spark.read.parquet(s"$path/tombstones").select("doc_id").distinct(),
          Seq("doc_id"), "left_semi")
        .distinct().collect().map(_.getLong(0)).toSeq
      leftover.grouped(10000).foreach(g => retractFromShardsImpl(spark, path, g, lease))
    }
    // the PENDING marker brackets every append's write window: written
    // before the first byte lands, deleted after the ledger commits. Its
    // presence is the cheap "a crashed append may have left an unledgered
    // tail" signal — takedown discovery scans the tail only while it
    // exists, keeping the healthy takedown path strictly index-resolved.
    java.nio.file.Files.writeString(pending, base.toString)

    val (ranked, m) = Ranks.withGlobalRank(packed, Seq(col("bin_id")), "_rk", 0)
    var appended = 0L
    if (m > 0L) {
      val rebased = ranked
        .withColumn("bin_id", col("_rk") - 1L + lit(base)).drop("_rk")
        .withColumn("shard", pmod(col("bin_id"), lit(nShards)))
      spark.catalog.refreshByPath(s"$path/data")
      val landed = spark.read.parquet(s"$path/data")
        .where(col("bin_id") >= base).select("bin_id")
      // resurrection scrub BEFORE landing (the tombstone contract): slice
      // tombstoned documents out of the batch's bins — lens slicing, bin
      // ids kept (they were consumed by the rank above), emptied bins
      // dropped — so deleted content never reaches the store at all. No
      // store mutation happens inside the append, which is what keeps
      // the crash-replay heal sound: a replay re-scrubs identically (the
      // tombstone table only grows) and the landed state is always the
      // scrubbed state. A takedown arriving while a crashed batch's bins
      // sit unledgered is [[retractFromShards]]' job — its discovery
      // scans the unledgered bin tail directly (see [[affectedShardsFor]]).
      val scrubSrc = rebased.join(landed, Seq("bin_id"), "left_anti")
      val scrubbed =
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/tombstones"))) {
          spark.catalog.refreshByPath(s"$path/tombstones")
          sliceDoomed(scrubSrc, spark.read.parquet(s"$path/tombstones"))
        } else scrubSrc
      // pin: the append below extends the very directory this anti-join
      // reads — materialize before writing, never re-read mid-append
      val toAppend = scrubbed.localCheckpoint()
      // toAppend's eager checkpoint cut the lineage to withGlobalRank's
      // internal range-partition pin — release it NOW: this verb runs
      // once per micro-batch on a stream, and a weeks-long deployment
      // must not accumulate one pinned RDD per append
      graft.util.Checkpoints.release(
        graft.util.Checkpoints.pinnedRddIds(ranked), spark)
      try {
        appended = toAppend.count()
        toAppend.write.mode("append").partitionBy("shard").parquet(s"$path/data")
        // per-batch heartbeat after the data append (the batch's long
        // pole): the index backfill + manifest splice stay protected even
        // when a large batch's landing alone approaches the ttl
        lease.renew()

        // membership-index backfill over ALL of this batch's landed bins
        // (not just toAppend): a crash between a prior attempt's data and
        // docs appends left index rows missing — the re-run restores them
        spark.catalog.refreshByPath(s"$path/data")
        val batchData = spark.read.parquet(s"$path/data").where(col("bin_id") >= base)
        // keyed on (doc_id, shard) — NOT doc_id alone: nothing forbids a
        // batch re-carrying a doc_id the store already holds elsewhere,
        // and dropping its NEW shard's membership row would make a later
        // index-resolved takedown miss that copy. (doc_id, shard) still
        // collapses the crash-replay duplicate exactly.
        val batchDocs = docsIndexOf(batchData).distinct()
        spark.catalog.refreshByPath(s"$path/docs")
        val alreadyIndexed = spark.read.parquet(s"$path/docs")
          .select(col("doc_id"), col("shard").cast("long").as("shard"))
          .join(broadcast(batchDocs), Seq("doc_id", "shard"), "left_semi")
        batchDocs.join(broadcast(alreadyIndexed), Seq("doc_id", "shard"), "left_anti")
          .write.mode("append").partitionBy("shard").parquet(s"$path/docs")

        // O(batch) manifest refresh: every manifest field is a SUM, so the
        // batch's contribution is a read-back over ONLY its landed bins
        // (bin_id >= base — parquet row-group stats skip every pre-append
        // file) added onto the stored rows. NEVER a full-shard digest
        // recompute: a batch whose bins spread across all N shards would
        // otherwise re-read the whole store on every append. Exactly-once
        // under crash-replay without the ledger: a metadata-only row count
        // per affected shard (count(*) reads parquet footers, not data)
        // arbitrates whether the stored row is pre-splice (stored + delta
        // == on disk -> add), post-splice (stored == on disk -> skip), or
        // neither (a foreign mutation crashed mid-flight -> loud, run
        // recertifyShards).
        val delta = manifestOf(batchData).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
          .toMap
        val affected = delta.keys.toSeq.sorted
        val onDisk = spark.read.parquet(s"$path/data")
          .where(col("shard").isin(affected: _*))
          .groupBy(col("shard").cast("long").as("shard")).count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        spark.catalog.refreshByPath(s"$path/manifest")
        val storedAll = spark.read.parquet(s"$path/manifest")
        val storedAffected = storedAll.where(col("shard").isin(affected: _*)).collect()
          .map(r => r.getAs[Long]("shard") ->
            ((r.getAs[Long]("n_bins"), r.getAs[Long]("n_docs"),
              r.getAs[Long]("n_tokens"), r.getAs[Long]("digest"))))
          .toMap
        val spliced = affected.map { sh =>
          val d = delta(sh)
          val st = storedAffected.getOrElse(sh, (0L, 0L, 0L, 0L))
          val disk = onDisk.getOrElse(sh, 0L)
          val row =
            if (st._1 == disk) st // a crashed prior attempt already spliced this shard
            else if (st._1 + d._1 == disk)
              (st._1 + d._1, st._2 + d._2, st._3 + d._3, st._4 + d._4)
            else
              throw new IllegalStateException(
                s"appendShards: shard $sh has $disk bins on disk but the manifest " +
                  s"records ${st._1} and this batch adds ${d._1} — the store was " +
                  "mutated outside the append/retract protocol; run recertifyShards")
          (sh, row._1, row._2, row._3, row._4)
        }
        import spark.implicits._
        val untouched = storedAll.where(!col("shard").isin(affected: _*)).localCheckpoint()
        try {
          graft.sources.Catalog.swapIn(java.nio.file.Paths.get(s"$path/manifest"), Seq(lease)) { tmp =>
            untouched
              .unionByName(spliced.toDF("shard", "n_bins", "n_docs", "n_tokens", "digest"))
              .write.mode("overwrite").parquet(tmp.toString)
          }
        } finally {
          graft.util.Checkpoints.release(
            graft.util.Checkpoints.pinnedRddIds(untouched), spark)
        }
        spark.catalog.refreshByPath(s"$path/manifest")
      } finally {
        graft.util.Checkpoints.release(
          graft.util.Checkpoints.pinnedRddIds(toAppend), spark)
      }
    } else {
      // nothing to append, but the rank helper's internal pin still exists
      graft.util.Checkpoints.release(
        graft.util.Checkpoints.pinnedRddIds(ranked), spark)
    }

    // ledger row LAST: its presence certifies the whole append committed.
    // next_after advances by the FULL batch size even when bins were
    // dropped as a crashed attempt's replays — those ids were consumed.
    Seq((batchKey, base + m, nShards)).toDF("batch_key", "next_after", "n_shards")
      .coalesce(1).write.mode("append").parquet(s"$path/meta")
    java.nio.file.Files.deleteIfExists(pending)
    appended
  }

  /** Loader-facing CERTIFIED read of one shard (VERDICT r14 #6):
    * recompute the shard's counts/token total/digest from its files
    * (partition-pruned read) and compare against the stored manifest row
    * BEFORE handing rows back — certification is the default read path,
    * not an opt-in composition of [[verifyShards]]. LOUD on any drift
    * (lost/duplicated/corrupted bin, missing manifest row, empty shard):
    * a training job fails at read time instead of training on corrupt
    * data. Returns the shard's packed rows.
    */
  def readShard(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      shard: Long
  ): DataFrame = {
    spark.catalog.refreshByPath(s"$path/manifest")
    val stored = spark.read.parquet(s"$path/manifest")
      .where(col("shard") === shard).collect()
    require(stored.length == 1,
      s"readShard: shard $shard has ${stored.length} manifest rows at $path — " +
        "an uncertified shard must not be read (run recertifyShards if the " +
        "store crashed mid-mutation)")
    spark.catalog.refreshByPath(s"$path/data")
    val rows = spark.read.parquet(s"$path/data").where(col("shard") === shard)
    val actual = manifestOf(rows).collect()
    require(actual.length == 1,
      s"readShard: shard $shard has a manifest row but no data files at $path")
    val (s0, a0) = (stored(0), actual(0))
    Seq("n_bins", "n_docs", "n_tokens", "digest").foreach { f =>
      val (sv, av) = (s0.getAs[Long](f), a0.getAs[Long](f))
      require(sv == av,
        s"readShard: shard $shard FAILS certification — $f is $av on disk but " +
          s"$sv in the manifest; the shard is lost, duplicated, stale, or " +
          "corrupted. Refusing to serve it to a loader.")
    }
    rows
  }

  /** Small-file compaction for an [[exportShards]] store under append
    * cadence: every [[appendShards]] lands one new parquet file per
    * affected `shard=N` directory plus one ledger file, so a stream at
    * micro-batch cadence grows file counts linearly — the classic
    * small-files tax on every later scan (footers, task setup, row-group
    * fragmentation). This verb rewrites each named shard's data and
    * membership-index partitions into `filesPerShard` files and folds
    * the append ledger into one file, all through the
    * [[graft.sources.Catalog.swapIn]] swap — CONTENT-IDENTICAL by
    * construction, which the manifest proves: the stored row is compared
    * against a digest recompute of the rewritten files before the swap
    * is considered done (compaction must never be able to lose a bin
    * silently; any mismatch raises and the store is left on the
    * already-swapped rewrite for recertifyShards to adjudicate).
    * Ledger rows are all RETAINED (batch keys are the replay guard
    * forever; they are tiny — one row per batch ever appended).
    *
    * Run at maintenance cadence like
    * [[TextAnalysis.compactWordHistogram]] / `Pipeline.gcImages`.
    * Returns the number of data files removed by the rewrite.
    *
    * Lease lifetime: the writer lease renews BETWEEN shards, so a
    * full-store compaction outlives any fixed ttl cleanly; `ttlMs` only
    * needs raising when a SINGLE shard's rewrite can exceed it (shards
    * sized in the hundreds of GB — prefer more, smaller shards).
    */
  def compactShards(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      shards: Seq[Long] = Seq.empty,
      filesPerShard: Int = 1,
      ttlMs: Long = graft.sources.StoreLease.DefaultTtlMs
  ): Long = {
    require(filesPerShard >= 1, s"need filesPerShard >= 1, got $filesPerShard")
    graft.sources.StoreLease.withRenewableLease(path, "compact", ttlMs) { lease =>
      compactShardsImpl(spark, path, shards, filesPerShard, lease)
    }
  }

  private def compactShardsImpl(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      shards: Seq[Long],
      filesPerShard: Int,
      lease: graft.sources.LeaseProtocol.Held
  ): Long = {
    spark.catalog.refreshByPath(s"$path/manifest")
    val stored = spark.read.parquet(s"$path/manifest")
      .collect().map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("n_bins"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("digest")))).toMap
    val targets = if (shards.nonEmpty) shards else stored.keys.toSeq.sorted
    // ONE pinned read of the target shards' rows (r18): the per-shard
    // read+localCheckpoint paid a directory listing and a materialization
    // job PER SHARD — N jobs whose driver turnaround dominated the verb's
    // wall (52 stages, 0.5 s of executor work, 3.3 s wall at bench
    // scale). All slices come from the same pre-compaction snapshot the
    // per-shard reads saw (compaction preserves content, and the swap
    // below publishes per shard exactly as before — the bounded
    // per-shard publish window at 100 TB is unchanged). The pin's
    // storage is target-shards-sized, the same bound the sequential
    // per-shard pins reached one at a time.
    targets.foreach { sh =>
      require(new java.io.File(s"$path/data/shard=$sh").isDirectory,
        s"compactShards: no data directory for shard $sh")
    }
    spark.catalog.refreshByPath(s"$path/data")
    val allRows = spark.read.parquet(s"$path/data")
      .where(col("shard").isin(targets: _*))
      .localCheckpoint() // materialize before the swaps unlink the sources
    val removedAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    try {
      // overlapped per-shard jobs (r19, guide §2.6): each shard's
      // swap+proof is independent — its own swap lease, its own scoped
      // proof scan — and the sequential loop's wall was driver
      // job-turnaround x shards, not executor work
      forEachShardConcurrently(targets) { sh =>
        // per-shard heartbeat: a full-store compaction at 100 TB is the
        // canonical >ttl verb (r16 verdict #2) — renewal at each shard
        // keeps the lease live without hand-tuned ttls
        lease.renew()
        val dataDir = new java.io.File(s"$path/data/shard=$sh")
        val before = dataDir.listFiles().count(_.getName.endsWith(".parquet"))
        graft.sources.Catalog.swapIn(dataDir.toPath, Seq(lease)) { tmp =>
          allRows.where(col("shard") === sh).drop("shard")
            .repartition(filesPerShard).write.mode("overwrite").parquet(tmp.toString)
        }
        // prove content identity against the manifest BEFORE declaring
        // done — reading back EXACTLY the rewritten shard's directory (a
        // scoped scan; the old whole-dir read relisted every shard per
        // proof)
        spark.catalog.refreshByPath(s"$path/data/shard=$sh")
        val re = manifestOf(
          spark.read.parquet(s"$path/data/shard=$sh").withColumn("shard", lit(sh)))
          .collect()
        val want = stored.getOrElse(sh,
          throw new IllegalStateException(
            s"compactShards: shard $sh has data but no manifest row; run recertifyShards first"))
        require(re.length == 1 &&
          (re(0).getLong(1), re(0).getLong(2), re(0).getLong(3), re(0).getLong(4)) == want,
          s"compactShards: shard $sh digest drifted across the rewrite — " +
            "refusing to certify; run recertifyShards to adjudicate")
        val after = dataDir.listFiles().count(_.getName.endsWith(".parquet"))
        removedAcc.addAndGet((before - after).toLong)
      }
    } finally {
      graft.util.Checkpoints.release(
        graft.util.Checkpoints.pinnedRddIds(allRows), spark)
    }
    // the membership index's matching partitions get the same treatment
    // (and the same one-pinned-read shape as the data side)
    val docsTargets = targets.filter(sh => new java.io.File(s"$path/docs/shard=$sh").isDirectory)
    if (docsTargets.nonEmpty) {
      spark.catalog.refreshByPath(s"$path/docs")
      val allIdx = spark.read.parquet(s"$path/docs")
        .where(col("shard").isin(docsTargets: _*))
        .localCheckpoint()
      try {
        forEachShardConcurrently(docsTargets) { sh =>
          lease.renew()
          graft.sources.Catalog.swapIn(
            java.nio.file.Paths.get(s"$path/docs/shard=$sh"), Seq(lease)) { tmp =>
            allIdx.where(col("shard") === sh).drop("shard")
              .repartition(filesPerShard).write.mode("overwrite").parquet(tmp.toString)
          }
        }
      } finally {
        graft.util.Checkpoints.release(
          graft.util.Checkpoints.pinnedRddIds(allIdx), spark)
      }
    }
    // fold the append ledger into one file (all rows retained)
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/meta"))) {
      spark.catalog.refreshByPath(s"$path/meta")
      val ledger = spark.read.parquet(s"$path/meta").localCheckpoint()
      try {
        graft.sources.Catalog.swapIn(java.nio.file.Paths.get(s"$path/meta"), Seq(lease)) { tmp =>
          ledger.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        }
      } finally {
        graft.util.Checkpoints.release(
          graft.util.Checkpoints.pinnedRddIds(ledger), spark)
      }
    }
    // and the tombstone table: retractions (and scrub re-appends) add one
    // tiny file per call, and every append's scrub scans this table — fold
    // it to its distinct doc_ids in one file. It IS a set; the duplicate
    // rows carry no information.
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/tombstones"))) {
      spark.catalog.refreshByPath(s"$path/tombstones")
      val tomb = spark.read.parquet(s"$path/tombstones").distinct().localCheckpoint()
      try {
        graft.sources.Catalog.swapIn(java.nio.file.Paths.get(s"$path/tombstones"), Seq(lease)) { tmp =>
          tomb.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        }
      } finally {
        graft.util.Checkpoints.release(
          graft.util.Checkpoints.pinnedRddIds(tomb), spark)
      }
      spark.catalog.refreshByPath(s"$path/tombstones")
    }
    removedAcc.get()
  }

  /** Slice every tombstoned document's segment out of `bins` — the
    * pre-landing scrub of [[appendShards]]: bins keep their ids (those
    * were consumed by the batch's rank), kept segments keep their order,
    * counts/token totals shrink by exactly the doomed contribution, and
    * bins emptied entirely are dropped. Bins carrying no doomed doc pass
    * through BYTE-IDENTICAL (they never enter the slice). Join-driven —
    * the doomed set is never collected by this code, and the per-bin
    * doomed-list join is left to the planner (AQE broadcasts it when the
    * intersection is small — the overwhelmingly common case — and falls
    * back to a shuffle join for a pathological purge-sized batch instead
    * of forcing a driver-sized broadcast build).
    */
  private def sliceDoomed(bins: DataFrame, tombstones: DataFrame): DataFrame = {
    val doomedPerBin = bins
      .select(col("bin_id"), explode(col("doc_ids")).as("doc_id"))
      .join(tombstones.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
      .groupBy("bin_id").agg(collect_set("doc_id").as("_doomed"))
    val joined = bins.join(doomedPerBin, Seq("bin_id"), "left")
    val clean = joined.where(col("_doomed").isNull).drop("_doomed")
    val slice = udf { (ids: Seq[Long], dids: Seq[Long], lens: Seq[Long],
        binTokens: Long, doomed: Seq[Long]) =>
      if (lens.sum != binTokens)
        throw new IllegalArgumentException(
          s"sliceDoomed: bin_tokens $binTokens != sum(doc_lens) ${lens.sum} — " +
            "this bin was packed by a token accounting other than its id stream")
      val dset = doomed.toSet
      val keptIds = Seq.newBuilder[Long]
      val keptDids = Seq.newBuilder[Long]
      val keptLens = Seq.newBuilder[Long]
      var off = 0
      dids.indices.foreach { i =>
        val l = lens(i).toInt
        if (!dset.contains(dids(i))) {
          keptIds ++= ids.slice(off, off + l)
          keptDids += dids(i)
          keptLens += lens(i)
        }
        off += l
      }
      (keptIds.result(), keptDids.result(), keptLens.result())
    }
    val scrubbed = joined.where(col("_doomed").isNotNull)
      .withColumn("_r", slice(col("input_ids"), col("doc_ids"), col("doc_lens"),
        col("bin_tokens"), col("_doomed")))
      .select(
        col("bin_id"),
        size(col("_r._2")).cast("long").as("n_docs"),
        aggregate(col("_r._3"), lit(0L), (a, x) => a + x).as("bin_tokens"),
        col("_r._1").as("input_ids"),
        col("_r._2").as("doc_ids"),
        col("_r._3").as("doc_lens"),
        col("shard"))
      .where(col("n_docs") > 0L)
    clean.unionByName(scrubbed)
  }

  /** Which shards carry any of `docIds` — the takedown DISCOVERY step.
    * Resolved from the `path/docs` membership index when present
    * (index-scale: one row per document, never the corpus) and measured
    * flat as the corpus grows (ScaleRehearsal's retract leg), UNIONED
    * with a row-group-pruned scan of the unledgered bin tail (bins a
    * crashed append landed before its index backfill — empty in the
    * healthy steady state); falls back to the full `arrays_overlap`
    * scan over every bin's `doc_ids` for stores exported before the
    * index existed.
    */
  private[graft] def affectedShardsFor(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      docIds: Seq[Long]
  ): IndexedSeq[Long] = {
    val viaIndex = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/docs"))
    val shards =
      if (viaIndex) {
        spark.catalog.refreshByPath(s"$path/docs") // the index mutates by swap
        val indexed = spark.read.parquet(s"$path/docs")
          .where(col("doc_id").isin(docIds.distinct: _*))
          .select(col("shard").cast("long"))
        // PLUS the unledgered tail: a crashed append's landed bins have
        // no index rows yet (the backfill runs after the data append),
        // but their ids sit at/past the ledger's next_after — a
        // row-group-pruned tail scan keeps a mid-crash-window takedown
        // exact instead of silently missing the landed copy. GATED on
        // the pending marker (written before an append's first byte,
        // deleted after its ledger commit): a healthy store never pays
        // even the file-listing for this scan — discovery stays strictly
        // index-resolved unless an append verifiably crashed mid-window.
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/pending")) &&
            java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/meta"))) {
          spark.catalog.refreshByPath(s"$path/meta")
          val next = spark.read.parquet(s"$path/meta")
            .agg(max("next_after")).head().getLong(0)
          val doomedArr = array(docIds.distinct.map(lit(_)): _*)
          spark.catalog.refreshByPath(s"$path/data")
          indexed.unionByName(
            spark.read.parquet(s"$path/data")
              .where(col("bin_id") >= next && arrays_overlap(col("doc_ids"), doomedArr))
              .select(col("shard").cast("long")))
        } else indexed
      } else {
        val doomedArr = array(docIds.distinct.map(lit(_)): _*)
        spark.read.parquet(s"$path/data")
          .where(arrays_overlap(col("doc_ids"), doomedArr))
          .select(col("shard").cast("long"))
      }
    shards.distinct().collect().map(_.getLong(0)).sorted.toIndexedSeq
  }

  /** Recompute `shards`' manifest rows from the files on disk
    * (partition-pruned read) and splice them over the stored manifest —
    * the shared certification tail of [[retractFromShards]] and
    * [[appendShards]], committed through [[graft.sources.Catalog.swapIn]].
    */
  private def spliceManifest(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      shards: Seq[Long],
      lease: graft.sources.LeaseProtocol.Held
  ): Unit = {
    spark.catalog.refreshByPath(s"$path/data")
    val recert = manifestOf(
      spark.read.parquet(s"$path/data").where(col("shard").isin(shards: _*)))
    spark.catalog.refreshByPath(s"$path/manifest")
    val untouched = spark.read.parquet(s"$path/manifest")
      .where(!col("shard").isin(shards: _*))
    val merged = untouched.unionByName(recert).localCheckpoint()
    try {
      graft.sources.Catalog.swapIn(java.nio.file.Paths.get(s"$path/manifest"), Seq(lease)) { tmp =>
        merged.write.mode("overwrite").parquet(tmp.toString)
      }
    } finally {
      graft.util.Checkpoints.release(
        graft.util.Checkpoints.pinnedRddIds(merged), spark)
    }
    spark.catalog.refreshByPath(s"$path/manifest")
  }
}
