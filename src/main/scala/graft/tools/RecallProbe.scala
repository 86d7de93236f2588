package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorSearch

/** ANN recall measurement harness (VERDICT r8 #5): mean recall@10 vs the
  * exact cosine answer over the first 20 query vectors, swept across IVF
  * sizings (nLists x nProbe x Lloyd iterations x seed) and SimHash-LSH
  * Hamming radii, plus a cell-purity readout (rows and distinct labels
  * per learned cell — the structure-alignment diagnostic).
  *
  * This is how the sf0.1 operating points in SCALE.md and the floors in
  * VectorFunctionsSpec were chosen: recall is the one correctness
  * property the DuckDB oracle can't see, so it is MEASURED per corpus,
  * never assumed. Run against any sf dir:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.RecallProbe"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queryIds = 0L until 20L
    val queries = emb.where(col("vec_id").isin(queryIds: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val exactSets = queryIds.map { qid =>
      qid -> VectorSearch.topK(emb, "embedding", queries(qid), 10, col("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap
    def recallOf(fetch: Long => Set[Long]): Double =
      queryIds.map(qid => (exactSets(qid) & fetch(qid)).size / 10.0).sum / queryIds.size

    // the probe sweeps iterations (beyond buildIvf's default 5) to show
    // the recall plateau is a data property (no macro-structure), not an
    // under-converged quantizer — through the SAME buildIvf code path the
    // production queries use, so the probe can never measure a
    // differently-assembled index than the one it is choosing operating
    // points for
    def buildIters(nLists: Int, iters: Int, seed: Long): VectorSearch.IvfIndex =
      VectorSearch.buildIvf(emb, "embedding", nLists, seed, maxIter = iters)
    for (nLists <- Seq(8, 10, 16); iters <- Seq(5, 20); nProbe <- Seq(4, 5, 6)) {
      val ivf = buildIters(nLists, iters, 42L)
      val r = recallOf { qid =>
        ivf.annTopK(queries(qid), 10, col("vec_id"), nProbe = nProbe)
          .select("vec_id").collect().map(_.getLong(0)).toSet }
      ivf.indexed.unpersist()
      println(f"[probe] IVF nLists=$nLists iters=$iters nProbe=$nProbe recall=$r%.3f")
    }
    val lsh = VectorSearch.SimHashLsh(nBits = 16, dim = queries(0L).length)
    val indexed = lsh.withSignature(emb, "embedding").persist()
    for (h <- Seq(6, 8, 10)) {
      val r = recallOf { qid =>
        lsh.annTopK(indexed, "embedding", queries(qid), 10, col("vec_id"), maxHamming = h)
          .select("vec_id").collect().map(_.getLong(0)).toSet }
      println(f"[probe] LSH nBits=16 maxHamming=$h recall=$r%.3f")
    }
    indexed.unpersist()
    // structure diagnostic: a cell carrying every label means k-means
    // found no separable macro-structure — recall then tracks the scan
    // fraction nProbe/nLists rather than cluster alignment
    val ivf = buildIters(10, 5, 42L)
    ivf.indexed.groupBy("ivf_cell")
      .agg(count(lit(1)).as("n"), countDistinct(col("label")).as("nlab"))
      .orderBy("ivf_cell").collect()
      .foreach(r => println(s"[probe] cell=${r.get(0)} n=${r.get(1)} labels=${r.get(2)}"))
    ivf.indexed.unpersist()
    spark.stop()
  }
}
