package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbour: a k-means coarse quantizer
  * (Lloyd iterations) partitions vectors into inverted lists; queries
  * probe the `nProbe` nearest lists only.
  *
  * Scale shape: the centroid table is k x dims doubles — small enough to
  * ship as a literal into a map-only `sd_argmin_sqdist` projection, so
  * each Lloyd iteration is one scan + one (cid, dim) partial-aggregated
  * mean. No crossJoin, no k-fold row duplication, no shuffle for
  * assignment; the only shuffled data is the k*dims running means.
  * Search touches nProbe/k of the corpus via an equi-join on list id.
  */
object IvfAnn {
  import PipelineOps.{asDouble, cosine}

  private def sqDist(a: Column, b: Column): Column = call_function("sd_sqdist", a, b)

  private def centroidLit(cents: Array[Array[Double]]): Column =
    typedlit(cents.map(_.toSeq).toSeq)

  /** Per-dimension means of `v` grouped by `cidCol`: Array(cid -> centroid),
    * one aggregation (k*dims cells). */
  private def meansByCluster(assigned: DataFrame, dims: Int): Map[Int, Array[Double]] =
    assigned.select(col("__cid"), posexplode(col("__v")))
      .groupBy(col("__cid"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        val c = new Array[Double](dims)
        rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
        cid -> c
      }

  /** Lloyd k-means over (id, vec double array) -> (centroid_id, centroid). */
  def kmeans(vectors: DataFrame, id: Column, vec: Column,
      k: Int, iters: Int = 5): DataFrame = {
    val spark = vectors.sparkSession
    val v = vectors.select(id.as("__vid"), asDouble(vec).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic seed: k rows by hash order
    val seed: Array[Array[Double]] = v
      .withColumn("__h", TextOps.hash32(col("__vid").cast("string")))
      .orderBy(col("__h")).limit(k)
      .select(col("__v")).collect()
      .map(_.getSeq[Double](0).toArray)
    var cents = seed
    val dims = if (seed.nonEmpty) seed(0).length else 0
    for (_ <- 1 to iters) {
      val assigned = v.withColumn("__cid",
        call_function("sd_argmin_sqdist", col("__v"), centroidLit(cents)))
      val updated = meansByCluster(assigned, dims)
      // a cluster that lost every member keeps its previous centroid
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i))).toArray
    }
    v.unpersist()
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("centroid_id",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)))))
  }

  /** Approximate top-k neighbours: probe the nProbe nearest inverted
    * lists. Output: query_id, cand_id, rank, sim (cosine). */
  def search(vectors: DataFrame, queries: DataFrame,
      vid: Column, vvec: Column, qid: Column, qvec: Column,
      centroids: DataFrame, nProbe: Int, topK: Int): DataFrame = {
    val cents: Array[Array[Double]] = centroids
      .orderBy(col("centroid_id"))
      .select(col("centroid")).collect()
      .map(_.getSeq[Double](0).toArray)
    // corpus list assignment: map-only argmin projection
    val corpus = vectors.select(vid.as("cand_id"), asDouble(vvec).as("cv"))
      .withColumn("list_id", call_function("sd_argmin_sqdist", col("cv"), centroidLit(cents)))
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
