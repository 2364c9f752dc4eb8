package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FloatVecDot.float_dot

/** IVF (inverted-file) approximate-nearest-neighbor index — the
  * cluster-pruned scale path next to [[Similarity.lshTopK]]'s sign-bucket
  * family (SURVEY.md §2.10).
  *
  * Train: k-means over (a sample of) the corpus → `nlist` centroids.
  * Index: one pass assigning every vector to its nearest centroid — the
  * cluster id becomes the partition/shuffle key. Search: a query probes
  * only its `nprobe` nearest centroids' clusters, cutting candidates by
  * ~nlist/nprobe; at cluster scale the corpus is co-partitioned by
  * `cluster`, so a probe touches only those partitions.
  *
  * Centroids are tiny (nlist × dim floats) and broadcast as literals into
  * a codegen'd argmin-of-[[float_dot]] expression — assignment is one
  * narrow projection, no shuffle, no UDF.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Float]]) {
    def nlist: Int = centroids.length
  }

  /** Train centroids with ml.KMeans (seeded → reproducible for a fixed
    * input partitioning). Corpora above `maxTrainVectors` are seeded-sampled
    * down first: k-means needs only a representative sample to place
    * `nlist` centroids, and fitting the FULL corpus would make the trainer
    * itself the dominant job at 100 TB. The index/search contract already
    * tolerates approximate centroids (any centroid set partitions the
    * corpus; quality degrades gracefully), so sampling changes recall by
    * ~nothing and cost by |corpus|/maxTrainVectors. */
  def train(emb: DataFrame, nlist: Int, seed: Long = 42L,
      maxIter: Int = 20, maxTrainVectors: Long = 100000L): Model = {
    val n = emb.count()
    val sampled =
      if (n > maxTrainVectors)
        emb.sample(withReplacement = false, maxTrainVectors.toDouble / n, seed)
      else emb
    val feats = sampled.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
    val model = km.fit(feats)
    Model(model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Literal column for one centroid — one ARRAY<FLOAT> Literal (a single
    * referenced object in generated code), never `array(lit, lit, ...)`
    * whose inline CreateArray stores grow codegen linearly in nlist·dim
    * (see [[PqIndex]]: the IVFPQ composition crossed janino's 64 KB
    * method limit and silently fell back to interpreted execution). */
  private def centroidLit(c: Array[Float]): Column = typedLit(c)

  /** Index of the centroid with max cosine (≡ min angular distance) —
    * argmax over nlist codegen'd dot products. */
  private def centroidSim(emb: Column, c: Array[Float]): Column =
    float_dot(emb, centroidLit(c)) / (sqrt(float_dot(emb, emb)) *
      lit(math.sqrt(c.map(v => v.toDouble * v).sum)))

  def nearestCentroid(emb: Column, m: Model): Column = {
    val sims = m.centroids.map(c => centroidSim(emb, c))
    val simArr = array(sims: _*)
    (array_position(simArr, array_max(simArr)) - 1).cast("int")
  }

  /** `nprobe` nearest centroid ids for a query vector, as an array. */
  def probeCentroids(emb: Column, m: Model, nprobe: Int): Column = {
    val sims = m.centroids.zipWithIndex.map { case (c, i) =>
      struct(centroidSim(emb, c).as("sim"), lit(i).as("idx"))
    }
    slice(
      transform(reverse(array_sort(array(sims: _*))), s => s.getField("idx")),
      1, nprobe)
  }

  /** Assign every corpus vector its cluster id (the indexing pass). */
  def index(emb: DataFrame, m: Model): DataFrame =
    emb.withColumn("cluster", nearestCentroid(col("embedding"), m))

  /** IVF top-k search: queries probe `nprobe` clusters, cosine-rank within
    * the probed candidates (6-dp rounding + vec_id tie-break, like the
    * exact path). */
  def search(emb: DataFrame, m: Model, queryPred: Column, k: Int,
      nprobe: Int = 2): DataFrame = {
    val indexed = index(emb, m)
    val corpus = indexed.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("cluster"))
    val queries = indexed.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(probeCentroids(col("embedding"), m, nprobe)).as("cluster"))
    val scored = corpus.join(broadcast(queries), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("n_emb")))
    Similarity.topKPerQuery(scored, k)
  }
}
