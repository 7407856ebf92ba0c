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

  /** k-means|| seeding (Bahmani et al., VLDB'12) — the scale path for the
    * initial centroids: instead of k arbitrary rows, oversample points
    * with probability proportional to their squared distance from the
    * current candidate set (`l` per round, `rounds` scans), weight the
    * candidates by how many points they attract, and reduce to k with a
    * driver-local weighted k-means++ (candidates are O(rounds*l) — tiny).
    * Sampling is deterministic: the md5-derived per-row hash plays the
    * uniform draw, so the same input always seeds identically.
    */
  private[pipeline] def kmeansParInit(v: DataFrame, k: Int,
      rounds: Int = 3, lOver: Int = 0): Array[Array[Double]] = {
    val l = if (lOver > 0) lOver else 2 * k
    // first candidate: the row with the smallest hash (any deterministic pick)
    var cands: Array[Array[Double]] = v
      .withColumn("__h", TextOps.hash32(col("__vid").cast("string")))
      .orderBy(col("__h"), col("__vid")).limit(1)
      .select(col("__v")).collect().map(_.getSeq[Double](0).toArray)
    for (r <- 1 to rounds) {
      val d2 = call_function("sd_min_sqdist", col("__v"), centroidLit(cands))
      val phi = v.select(sum(d2).as("s")).collect()(0).getDouble(0)
      if (phi > 0) {
        // P(pick) = min(1, l*d2/phi); uniform draw = hash32(vid, round)/2^31
        val draw = (TextOps.hash32(concat_ws("_", col("__vid").cast("string"),
          lit(r.toString))).cast("double") + 1.0) / 2147483648.0
        val picked = v.filter(draw * phi < d2 * l)
          .select(col("__v")).collect().map(_.getSeq[Double](0).toArray)
        cands = cands ++ picked
      }
    }
    if (cands.length <= k) return cands
    // weights: points attracted per candidate
    val wts = v.select(call_function("sd_argmin_sqdist",
        col("__v"), centroidLit(cands)).as("c"))
      .groupBy("c").count().collect()
      .map(r0 => r0.getInt(0) -> r0.getLong(1)).toMap
    val w = cands.indices.map(i => wts.getOrElse(i, 0L).toDouble max 1.0).toArray
    // driver-local weighted k-means++ over the candidate set
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val out = scala.collection.mutable.ArrayBuffer(cands(w.indices.maxBy(w)))
    val minD = cands.map(c => sq(c, out(0)))
    while (out.length < k) {
      // deterministic ++: take the candidate with max weighted distance
      // (coincident leftovers are still admitted to always reach k)
      val next = cands.indices.maxBy(i => minD(i) * w(i))
      out += cands(next)
      cands.indices.foreach(i => minD(i) = math.min(minD(i), sq(cands(i), out.last)))
    }
    out.toArray
  }

  /** Lloyd k-means over (id, vec double array) -> (centroid_id, centroid).
    * init: "parallel" (k-means||, default) or "hash" (first k rows by
    * hash order — the cheapest deterministic seed). */
  def kmeans(vectors: DataFrame, id: Column, vec: Column,
      k: Int, iters: Int = 5, init: String = "hash"): DataFrame = {
    val spark = vectors.sparkSession
    val v = vectors.select(id.as("__vid"), asDouble(vec).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed: Array[Array[Double]] =
      if (init == "parallel") kmeansParInit(v, k)
      else v
        .withColumn("__h", TextOps.hash32(col("__vid").cast("string")))
        .orderBy(col("__h"), col("__vid")).limit(k)
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

  /** Smallest nProbe whose measured recall@topK on a query sample meets
    * `recallTarget`: doubles nProbe (1,2,4,...) until the IVF result
    * covers >= target fraction of the sample's exact brute-force top-k.
    * The sample should be small (tens of queries) — the exact pass is one
    * broadcast of the sample against the corpus; each probe trial touches
    * ~nProbe/k of the corpus. Returns maxProbe if the target is never met.
    */
  def tuneNProbe(vectors: DataFrame, sampleQueries: DataFrame,
      vid: Column, vvec: Column, qid: Column, qvec: Column,
      centroids: DataFrame, topK: Int, recallTarget: Double,
      maxProbe: Int = 64): Int = {
    // exact pass broadcasts the SAMPLE against the corpus (cosineTopK
    // broadcasts the corpus — right for a baseline, wrong side here)
    val q = sampleQueries.select(qid.as("query_id"), asDouble(qvec).as("qv"))
    val c = vectors.select(vid.as("cand_id"), asDouble(vvec).as("cv"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    val exact = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("cand_id"))
      .collect().map(r => (r.get(0), r.get(1))).toSet
    if (exact.isEmpty) return 1
    var nProbe = 1
    while (nProbe <= maxProbe) {
      val got = search(vectors, sampleQueries, vid, vvec, qid, qvec,
          centroids, nProbe, topK)
        .select(col("query_id"), col("cand_id"))
        .collect().map(r => (r.get(0), r.get(1))).toSet
      val recall = got.intersect(exact).size.toDouble / exact.size
      if (recall >= recallTarget) return nProbe
      nProbe *= 2
    }
    maxProbe
  }

  /** Approximate top-k neighbours: probe the nProbe nearest inverted
    * lists. Output: query_id, cand_id, rank, sim (cosine).
    *
    * `listVec`, when given, supplies (corpus, query) columns used ONLY for
    * list assignment and probe selection — e.g. a deterministic integer
    * quantization of the embedding (see [[quantized]]) so clustering is
    * bit-reproducible — while `sim` is still computed on the original
    * vectors. */
  def search(vectors: DataFrame, queries: DataFrame,
      vid: Column, vvec: Column, qid: Column, qvec: Column,
      centroids: DataFrame, nProbe: Int, topK: Int,
      listVec: Option[(Column, Column)] = None): DataFrame = {
    val cents: Array[Array[Double]] = centroids
      .orderBy(col("centroid_id"))
      .select(col("centroid")).collect()
      .map(_.getSeq[Double](0).toArray)
    val (corpusLv, queryLv) = listVec match {
      case Some((cv, qv)) => (asDouble(cv), asDouble(qv))
      case None => (asDouble(vvec), asDouble(qvec))
    }
    // corpus list assignment: map-only argmin projection
    val corpus = vectors.select(vid.as("cand_id"), asDouble(vvec).as("cv"),
        corpusLv.as("clv"))
      .withColumn("list_id", call_function("sd_argmin_sqdist", col("clv"), centroidLit(cents)))
      .drop("clv")
    val wProbe = Window.partitionBy("query_id").orderBy(col("__d"), col("centroid_id"))
    val probes = queries.select(qid.as("query_id"), asDouble(qvec).as("qv"),
        queryLv.as("qlv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__d", sqDist(col("qlv"), col("centroid")))
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

  /** Deterministic integer quantization of a float/double vector: each
    * component becomes floor(x * 2^20 + 0.5) as an integer-valued DOUBLE.
    * Integer-valued inputs make every float aggregation in [[kmeans]]
    * exact (partial sums stay below 2^53), so clustering is reproducible
    * across partitionings AND across engines — the property that lets the
    * IVF gate query carry a DuckDB oracle. */
  def quantized(vec: Column, scaleBits: Int = 20): Column =
    transform(vec, x => floor(x.cast("double") * lit(math.pow(2.0, scaleBits)) + lit(0.5)))
}
