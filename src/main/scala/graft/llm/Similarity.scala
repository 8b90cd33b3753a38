package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star component) over
  * `array<float>` columns like the `embeddings` fixture.
  *
  * Two paths, per the brief:
  *   - [[bruteForceTopK]] — the exactness baseline: broadcast the (small)
  *     query set against all candidates. Linear in candidates, never a
  *     shuffled cross-join; the right plan when |queries| is dimension-sized.
  *   - [[lshTopK]] — the scale path: `BucketedRandomProjectionLSH` over
  *     L2-normalized vectors (Euclidean on unit vectors is monotone in
  *     cosine: ‖a−b‖² = 2−2·cos), so candidate generation is bucket-local
  *     and only candidates get exact re-ranking.
  */
object Similarity {

  /** Integer-quantized dot product — the oracle-parity trick for floats.
    *
    * float×float is EXACT in double (24-bit mantissas ⇒ ≤48-bit product),
    * and `floor(product · 10¹²)` is one deterministic IEEE rounding — so
    * summing the resulting longs is order-independent and bit-identical in
    * any engine, unlike a double dot product whose low bits depend on
    * summation order. Preserves ranking to a quantization error of
    * dim × 10⁻¹² — far below embedding noise. */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => floor(x.cast("double") * y.cast("double") * lit(1e12))),
      lit(0L),
      (acc, v) => acc + v)

  /** Exact double dot product (sequential fold, deterministic within Spark). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force top-k by quantized dot product: every query row against
    * every candidate row, queries broadcast (the query set must be small —
    * this is the correctness baseline and the final re-rank primitive).
    * Ties broken by candidate id ⇒ total deterministic order. */
  def bruteForceTopK(
      queries: DataFrame,   // (q_id, q_emb)
      candidates: DataFrame, // (n_id, n_emb)
      k: Int): DataFrame = {
    val scored = candidates
      .join(broadcast(queries), col("q_id") =!= col("n_id"))
      // native fused expression — bit-identical to quantizedDot (tested),
      // no per-row zip_with allocation in the innermost loop
      .withColumn("dot_q", graft.exprapi.quantizedDotFast(col("q_emb"), col("n_emb")))
    graft.ops.Relational
      .groupedTopK(scored, Seq("q_id"), "dot_q", "n_id", k, descending = true)
      .select(col("q_id"), col("n_id"), col("dot_q"), col("rank").cast("long").as("rank"))
  }

  /** Scale path: cosine ANN via bucketed random projections.
    *
    * Normalizes to unit length, fits `BucketedRandomProjectionLSH` (fixed
    * seed), and runs `approxSimilarityJoin` within a Euclidean threshold
    * derived from `minCosine` (d² = 2−2·cos). Bucket-local joins only —
    * the all-pairs product never materializes. Output: candidate pairs with
    * exact cosine, for downstream top-k re-ranking. */
  def lshTopK(
      embeddings: DataFrame, // (vec_id, embedding: array<float>)
      minCosine: Double = 0.5,
      bucketLength: Double = 1.0,
      numHashTables: Int = 3): DataFrame = {
    import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, Normalizer}
    import org.apache.spark.ml.functions.array_to_vector

    val vecs = embeddings.select(
      col("vec_id"),
      array_to_vector(col("embedding").cast("array<double>")).as("raw"))
    val unit = new Normalizer().setInputCol("raw").setOutputCol("v").setP(2.0)
      .transform(vecs).select(col("vec_id"), col("v"))

    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("v").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(unit)
    val maxDist = math.sqrt(math.max(0.0, 2.0 - 2.0 * minCosine))

    model.approxSimilarityJoin(unit, unit, maxDist, "dist")
      .select(
        col("datasetA.vec_id").as("a_id"),
        col("datasetB.vec_id").as("b_id"),
        (lit(1.0) - col("dist") * col("dist") / 2.0).as("cosine"))
      .filter(col("a_id") < col("b_id"))
  }

  /** Scale path #2: cosine IVF (inverted-file) top-k.
    *
    * Coarse quantizer = KMeans over unit vectors (`nlist` cells, fixed
    * seed); every candidate is assigned to its nearest cell ONCE; a query
    * probes only its `nprobe` highest-affinity cells and exact-re-ranks
    * within them. Work per query drops from |candidates| to
    * ~|candidates|·nprobe/nlist. The cell assignment is the partition key
    * at scale — candidates can be written bucketed by cell so a probe reads
    * only its cells' files (partition pruning); centroids are always tiny
    * and broadcast.
    *
    * Returns (q_id, n_id, dot_q, rank) like [[bruteForceTopK]] — same
    * quantized scoring, so results are comparable (recall measured in
    * tests). Requires unit-normalized scoring to make IVF's euclidean
    * cells align with dot ranking, so vectors are L2-normalized inside. */
  def ivfTopK(
      queries: DataFrame,   // (q_id, q_emb: array<float>)
      candidates: DataFrame, // (n_id, n_emb: array<float>)
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.feature.Normalizer
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

    def unitArr(raw: Column): Column = vector_to_array(raw).cast("array<float>")

    val candVec = new Normalizer().setInputCol("rawv").setOutputCol("v").setP(2.0)
      .transform(candidates.withColumn("rawv",
        array_to_vector(col("n_emb").cast("array<double>"))))
    val km = new KMeans().setK(nlist).setSeed(42L).setFeaturesCol("v")
      .setPredictionCol("cell").fit(candVec)
    val cells = km.transform(candVec)
      .select(col("n_id"), col("cell"), unitArr(col("v")).as("n_unit"))

    // centroid table: nlist rows — broadcast everywhere
    val spark = candidates.sparkSession
    import spark.implicits._
    val centroids = km.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toDF("cell", "c_arr")

    val qUnit = new Normalizer().setInputCol("rawv").setOutputCol("v").setP(2.0)
      .transform(queries.withColumn("rawv",
        array_to_vector(col("q_emb").cast("array<double>"))))
      .select(col("q_id"), unitArr(col("v")).as("q_unit"))

    // nprobe highest-affinity cells per query (tiny cross product)
    val probes = graft.ops.Relational.groupedTopK(
      qUnit.crossJoin(broadcast(centroids))
        .withColumn("aff", graft.exprapi.quantizedDotFast(col("q_unit"), col("c_arr"))),
      Seq("q_id"), "aff", "cell", nprobe)
      .select(col("q_id"), col("q_unit"), col("cell"))

    // exact re-rank within probed cells only
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("dot_q", graft.exprapi.quantizedDotFast(col("q_unit"), col("n_unit")))
    graft.ops.Relational
      .groupedTopK(scored, Seq("q_id"), "dot_q", "n_id", k)
      .select(col("q_id"), col("n_id"), col("dot_q"), col("rank").cast("long").as("rank"))
  }
}
