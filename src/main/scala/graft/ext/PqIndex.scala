package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FloatVecDot.float_dot

/** Product-quantization (PQ) approximate-nearest-neighbor index — the
  * memory-side scale path next to [[IvfIndex]]'s cluster pruning
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — the FAISS design).
  *
  * Train: split the `dim`-dimensional space into `m` subspaces and fit
  * `k` k-means centroids per subspace (on a seeded sample) → codebooks.
  * Encode: each vector becomes `m` small ints (nearest sub-centroid per
  * subspace) plus one precomputed reconstruction norm — at m=4, k=16 a
  * 64-dim float vector (256 bytes) compresses to ~20 bytes, the
  * difference between an in-memory candidate scan and a disk-bound one
  * at 100 TB.
  * Search (ADC — asymmetric distance computation): a query scores a
  * candidate by summing `m` codebook dot-product LOOKUPS instead of a
  * `dim`-wide multiply — all as codegen'd literal-array expressions, no
  * UDF, no shuffle on the corpus beyond the final bounded top-k — then
  * exactly re-ranks the `oversample`-widened shortlist with true
  * cosines (the standard PQ + re-rank recipe).
  *
  * Scale shape: candidate scoring reads only the codes column; the true
  * embeddings are touched just for the ≤ oversample·topK shortlist per
  * query (a semi-join against the corpus). Both top-k stages are the
  * bounded-heap [[graft.functions.TopKAgg]] — map-side partials, no
  * per-query reducer funnel.
  */
object PqIndex {

  /** codebooks(i)(j) = centroid j of subspace i; subDim = dim / m. */
  final case class Model(codebooks: Array[Array[Array[Float]]], dim: Int) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def subDim: Int = dim / m
  }

  /** Fit per-subspace codebooks on a seeded sample (k-means needs only a
    * representative sample to place centroids — same argument as
    * [[IvfIndex.train]]). */
  def train(emb: DataFrame, dim: Int, m: Int = 4, k: Int = 16,
      seed: Long = 42L, maxIter: Int = 20,
      maxTrainVectors: Long = 100000L): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val n = emb.count()
    val sampled =
      if (n > maxTrainVectors)
        emb.sample(withReplacement = false, maxTrainVectors.toDouble / n, seed)
      else emb
    // one cached pass feeds all m sub-trainings; managed directly (not
    // via CacheScope) because train() completes its own actions here —
    // a CacheScope.releaseAll() would also drain caches the CALLER
    // registered on this thread and still expects alive
    val subs = sampled.select(
      (0 until m).map(i =>
        slice(col("embedding"), i * subDim + 1, subDim).as(s"sub_$i")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val books = (0 until m).map { i =>
        val feats = subs.select(
          array_to_vector(col(s"sub_$i").cast("array<double>")).as("features"))
        new KMeans().setK(k).setSeed(seed + i).setMaxIter(maxIter)
          .fit(feats).clusterCenters.map(_.toArray.map(_.toFloat))
      }.toArray
      Model(books, dim)
    } finally { subs.unpersist(); () }
  }

  private def centroidLit(c: Array[Float]): Column =
    array(c.map(v => lit(v)): _*)

  /** argmin_j |sub - c_j|² = argmin_j (|c_j|² − 2·sub·c_j), codegen'd. */
  private def nearestCode(sub: Column, book: Array[Array[Float]]): Column = {
    val dists = book.map { c =>
      val n2 = c.map(v => v.toDouble * v).sum
      lit(n2) - lit(2.0) * float_dot(sub, centroidLit(c))
    }
    val arr = array(dists: _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  /** Encode: add `codes` (array<int>, one per subspace) and the
    * reconstruction norm `recon_norm` (computable from the codes alone —
    * stored so search never touches the raw vector). */
  def encode(emb: DataFrame, model: Model): DataFrame = {
    val coded = emb.withColumn("codes", array(
      (0 until model.m).map { i =>
        nearestCode(
          slice(col("embedding"), i * model.subDim + 1, model.subDim),
          model.codebooks(i))
      }: _*))
    val normSq = (0 until model.m).map { i =>
      val norms = model.codebooks(i).map(c => c.map(v => v.toDouble * v).sum)
      element_at(array(norms.map(lit(_)): _*),
        element_at(col("codes"), i + 1) + 1)
    }.reduce(_ + _)
    coded.withColumn("recon_norm", sqrt(normSq))
  }

  /** ADC approximate cosine of a query embedding vs a candidate's codes:
    * Σ_i dot(q_sub_i, codebook_i[code_i]) / (|q| · recon_norm). The
    * per-subspace lookup is an `element_at` into the literal array of
    * the 16 possible dot products — each computed once per (query,
    * subspace) by codegen, not per candidate pair. */
  private def adcCosine(qEmb: Column, codes: Column, reconNorm: Column,
      model: Model): Column = {
    val dotApprox = (0 until model.m).map { i =>
      val sub = slice(qEmb, i * model.subDim + 1, model.subDim)
      val lookups = array(model.codebooks(i).map(c =>
        float_dot(sub, centroidLit(c))): _*)
      element_at(lookups, element_at(codes, i + 1) + 1)
    }.reduce(_ + _)
    round(dotApprox / (sqrt(float_dot(qEmb, qEmb)) * reconNorm), 6)
  }

  /** IVF+PQ combined search — the full FAISS IVFPQ shape: coarse cluster
    * pruning cuts the candidate set by ~nlist/nprobe, then ADC code
    * scoring avoids touching any pruned-in candidate's raw vector, and
    * only the oversampled shortlist is exactly re-ranked. At 100 TB the
    * corpus is co-partitioned by `cluster` and each probe reads a few
    * partitions' code columns — the two prunings compose multiplicatively. */
  def searchWithIvf(emb: DataFrame, ivf: IvfIndex.Model, pq: Model,
      queryPred: Column, k: Int, nprobe: Int = 2,
      oversample: Int = 4): DataFrame = {
    val coded = encode(IvfIndex.index(emb, ivf), pq)
      .select(col("vec_id").as("neighbor_id"), col("cluster"),
        col("codes"), col("recon_norm"))
    val queries = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(IvfIndex.probeCentroids(col("embedding"), ivf, nprobe))
          .as("cluster"))
    val approx = coded.join(broadcast(queries), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        adcCosine(col("q_emb"), col("codes"), col("recon_norm"), pq))
    val shortlist = Similarity.topKPerQuery(approx, k * oversample)
      .select(col("query_id"), col("neighbor_id"))
    val exact = shortlist
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb")), Seq("neighbor_id"))
      .join(broadcast(emb.filter(queryPred)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_emb"))), Seq("query_id"))
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("n_emb")))
    Similarity.topKPerQuery(exact, k)
  }

  /** PQ top-k search with exact re-rank: ADC-score every candidate's
    * CODES (cheap), keep the top `oversample·k` per query map-side, then
    * re-rank only that shortlist with true cosines. Output matches the
    * exact path's schema and determinism (6-dp rounding, vec_id
    * tie-break). */
  def search(emb: DataFrame, model: Model, queryPred: Column, k: Int,
      oversample: Int = 4): DataFrame = {
    val coded = encode(emb, model)
      .select(col("vec_id").as("neighbor_id"), col("codes"),
        col("recon_norm"))
    val queries = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val approx = coded.join(broadcast(queries),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        adcCosine(col("q_emb"), col("codes"), col("recon_norm"), model))
    val shortlist = Similarity.topKPerQuery(approx, k * oversample)
      .select(col("query_id"), col("neighbor_id"))
    val exact = shortlist
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb")), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("n_emb")))
    Similarity.topKPerQuery(exact, k)
  }
}
