package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorSearch

/** Scratch: IVF recall vs quantizer settings. */
object Prof5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queryIds = 0L until 20L
    val queries = emb.where(col("vec_id").isin(queryIds: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val exactSets = queryIds.map { qid =>
      qid -> VectorSearch.topK(emb, "embedding", queries(qid), 10, col("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    for (nLists <- Seq(8, 10, 16); iters <- Seq(5); init <- Seq("k-means||"); nProbe <- Seq(2, 4, 6)) {
      val withVec = emb.withColumn("_v", array_to_vector(col("embedding").cast("array<double>")))
      val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(iters)
        .setInitMode(init).setFeaturesCol("_v").setPredictionCol("ivf_cell").fit(withVec)
      val ivf = VectorSearch.IvfIndex(model.transform(withVec).drop("_v").persist(),
        model.clusterCenters.map(_.toArray), "embedding")
      val rec = queryIds.map { qid =>
        val approx = ivf.annTopK(queries(qid), 10, col("vec_id"), nProbe = nProbe)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (exactSets(qid) & approx).size / 10.0
      }
      println(f"[prof5] nLists=$nLists iters=$iters init=$init nProbe=$nProbe recall=${rec.sum / rec.size}%.3f")
      ivf.indexed.unpersist()
    }
  }
}
