package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbour: a k-means coarse quantizer
  * (Lloyd iterations as pure DataFrame ops — no MLlib, no driver-side
  * math beyond the k centroid rows) partitions vectors into inverted
  * lists; queries probe the `nProbe` nearest lists only.
  *
  * Scale shape: assignment is a broadcast join against k centroid rows +
  * one min_by aggregation; centroid update is posexplode + per-dimension
  * mean (k*dims tiny aggregate); search touches nProbe/k of the corpus.
  */
object IvfAnn {
  import PipelineOps.{asDouble, cosine}

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, v) => s + v)

  /** Lloyd k-means over (id, vec double array) -> (cid, centroid). */
  def kmeans(vectors: DataFrame, id: Column, vec: Column,
      k: Int, iters: Int = 5): DataFrame = {
    val v = vectors.select(id.as("__vid"), asDouble(vec).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic seed: k rows by hash order
    var centroids = v.withColumn("__h", TextOps.hash32(col("__vid").cast("string")))
      .orderBy(col("__h")).limit(k)
      .select((row_number().over(Window.orderBy(col("__h"))) - 1).as("__cid"),
        col("__v").as("__cv"))
    for (_ <- 1 to iters) {
      val assigned = v.crossJoin(broadcast(centroids))
        .withColumn("__d", sqDist(col("__v"), col("__cv")))
        .groupBy(col("__vid"))
        .agg(min_by(col("__cid"), col("__d")).as("__cid"), first(col("__v")).as("__v"))
      val updated = assigned
        .select(col("__cid"), posexplode(col("__v")))
        .groupBy(col("__cid"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("__cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("__cid"), transform(col("ps"), p => p.getField("m")).as("__cnew"))
      // a cluster that lost every member keeps its previous centroid
      centroids = centroids.join(updated, Seq("__cid"), "left")
        .select(col("__cid"), coalesce(col("__cnew"), col("__cv")).as("__cv"))
    }
    centroids.select(col("__cid").as("centroid_id"), col("__cv").as("centroid"))
  }

  /** Approximate top-k neighbours: probe the nProbe nearest inverted
    * lists. Output: query_id, cand_id, rank, sim (cosine). */
  def search(vectors: DataFrame, queries: DataFrame,
      vid: Column, vvec: Column, qid: Column, qvec: Column,
      centroids: DataFrame, nProbe: Int, topK: Int): DataFrame = {
    val corpus = vectors.select(vid.as("cand_id"), asDouble(vvec).as("cv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__d", sqDist(col("cv"), col("centroid")))
      .groupBy(col("cand_id"))
      .agg(min_by(col("centroid_id"), col("__d")).as("list_id"), first(col("cv")).as("cv"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("__d"), col("centroid_id"))
    val probes = queries.select(qid.as("query_id"), asDouble(qvec).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__d", sqDist(col("qv"), col("centroid")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("list_id"))
    val wTop = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    probes.join(corpus, "list_id")
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("cand_id"), col("rank"), col("sim"))
  }
}
