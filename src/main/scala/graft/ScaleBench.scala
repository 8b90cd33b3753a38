package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Three-point scale evidence for the kernels that carry the 100 TB claim
  * (round-13 VERDICT next #3): the per-round slope tables stop at sf0.1,
  * which is two-point extrapolation. This main stages a deterministic ~10×
  * blow-up of `documents`/`embeddings` (md5-derived variants of the sf0.1
  * fixtures — no new fixture generation) and times the headline
  * dedup/ANN/CC/substring kernels at sf0.01 → sf0.1 → sf1-equivalent, so
  * each kernel gets TWO slope segments; a second segment much steeper than
  * the first is the super-linear smoking gun the two-point table can hide.
  *
  * Blow-up construction (variant i = 1..9 of each sf0.1 row):
  *   - documents: doc_id offset by i·10⁸; every whitespace token remapped
  *     to substr(md5(token‖i), 1, 8). Token remapping preserves document
  *     lengths, token counts, and WITHIN-copy duplicate structure (two
  *     docs that were near-dups stay near-dups in every copy — the dup
  *     RATE matches the original corpus), while making cross-copy texts
  *     unrelated (no artificial 10-way clusters that would quadratically
  *     distort bucket sizes).
  *   - embeddings: vec_id offset; the vector rotated left by i positions —
  *     norms and coordinate distribution preserved, neighborhoods
  *     decorrelated across copies.
  *
  * Also measures the persisted banded-hamming index probe at 1× and 10×
  * index size with a FIXED probe batch: the layout claim is that a probe
  * lists only its touched (band, kb) directories, so probe cost must grow
  * with the touched fraction's row count only — not with directory COUNT.
  *
  * Prints one JSON line; results are recorded in BASELINE.md.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val src = "/root/testdata/sf0.1"
    val root = new java.io.File("target/tmp/sf1equiv").getAbsolutePath
    stage(spark, src, root)

    // warmup outside the timed runs (session + codegen + parquet reader)
    try {
      spark.range(1000).selectExpr("sum(id) AS s")
        .write.format("noop").mode("overwrite").save()
      Tables.documents(spark, src).limit(100)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    def timeMinOf2(fn: => DataFrame): Double = {
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def r3(v: Double): Double = math.round(v * 1000.0) / 1000.0

    val kernels = Seq(
      "q16_near_dedup", "q24_near_dedup_fast", "q43_dup_clusters",
      "q94_ivfpq_serving", "q100_semantic_dedup", "q398_cross_doc_substrings")
    val points = Seq(
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> src,
      "sf1eq" -> root)

    val rows = kernels.map { k =>
      val times = points.map { case (name, dir) =>
        // per-point artifact namespace: fit/serve splits persist under
        // the preds tag, and mixing points would let one point's index
        // serve another's probe
        sys.props("graft.preds.tag") = s"scale_${name.replace(".", "_")}"
        name -> timeMinOf2(SparkEntry.queries(k)(spark, dir))
      }
      val t = times.toMap
      val s1 = t("sf0.1") / t("sf0.01")
      val s2 = t("sf1eq") / t("sf0.1")
      k -> (t, r3(s1), r3(s2))
    }
    sys.props.remove("graft.preds.tag")

    // hamming-index probe vs index size, fixed 300-signature probe batch
    val probeTimes = Seq(3000L, 30000L).map { n =>
      val path = s"$root/hamidx_$n"
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        val sigs = spark.range(0, n).select(col("id"),
          xxhash64(concat(lit("idx"), col("id"))).as("sig"))
        graft.llm.Dedup.writeHammingIndex(sigs, "id", "sig", path,
          bands = 8, kbBuckets = 64)
      }
      val qb = spark.range(0, 300).select(col("id").as("qid"),
        xxhash64(concat(lit("probe"), col("id"))).as("sig"))
      n -> timeMinOf2(graft.llm.Dedup.probeHammingIndex(
        spark, path, qb, "qid", "sig", hamMax = 7,
        bands = 8, kbBuckets = 64))
    }

    // WORK-DRIVER counts per point (round-14 slope adjudication): the
    // steep q435/q451/q462/q468 slopes are hypothesized to track LSH
    // candidate-pair growth (Σ bucket² before the cap bites), not
    // operator inefficiency — counting the pairs and clusters at each
    // point turns that from a hypothesis into a recorded ratio.
    val work = points.map { case (name, dir) =>
      val docs = Tables.documents(spark, dir)
      val pairs = graft.llm.Dedup.candidatePairs(
        graft.llm.Dedup.bandBuckets(docs, "doc_id", "text",
          numHashes = 6, bands = 3, shingleWidth = 3), "doc_id")
        .localCheckpoint(true)
      val nPairs = pairs.count()
      val clusters = graft.llm.Dedup.dupClusters(pairs)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_clusters"), max(col("sz")).as("max_sz"))
        .head()
      (name, nPairs, clusters.getLong(0), clusters.getLong(1))
    }
    val workJson = work.map { case (n, p, c, m) =>
      s""""$n":{"cand_pairs":$p,"clusters":$c,"max_cluster":$m}"""
    }.mkString("{", ",", "}")

    val kernelJson = rows.map { case (k, (t, s1, s2)) =>
      s""""$k":{"sf001":${r3(t("sf0.01"))},"sf01":${r3(t("sf0.1"))},""" +
        s""""sf1eq":${r3(t("sf1eq"))},"slope1":$s1,"slope2":$s2}"""
    }.mkString("{", ",", "}")
    val probeJson = probeTimes.map { case (n, s) => s""""n$n":${r3(s)}""" }
      .mkString("{", ",", s""","ratio":${
        r3(probeTimes(1)._2 / probeTimes(0)._2)}}""")
    println(s"""{"metric":"scale3","kernels":$kernelJson,"work":$workJson,"hamming_probe":$probeJson}""")
    spark.stop()
  }

  /** Idempotent staging of the sf1-equivalent directory: 10× documents and
    * embeddings plus symlinks to the untouched sf0.1 tables. */
  private def stage(spark: SparkSession, src: String, root: String): Unit = {
    val marker = new java.io.File(root, "_STAGED")
    if (marker.exists()) return
    new java.io.File(root).mkdirs()

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docVariants = (0 until 10).map { i =>
      if (i == 0) docs
      else docs.select(
        (col("doc_id") + lit(i * 100000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => substring(md5(concat(t, lit(i.toString))), 1, 8)), " ")
          .as("text"),
        col("lang"), col("source"),
        length(array_join(transform(split(col("text"), " "),
          t => substring(md5(concat(t, lit(i.toString))), 1, 8)), " "))
          .cast("long").as("n_chars"))
    }
    docVariants.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$root/documents.parquet")

    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val embVariants = (0 until 10).map { i =>
      if (i == 0) embs
      else embs.select(
        (col("vec_id") + lit(i * 100000000L)).as("vec_id"),
        expr(s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
          s"slice(embedding, 1, $i))").as("embedding"),
        col("label"))
    }
    embVariants.reduce(_ unionByName _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$root/embeddings.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      val link = java.nio.file.Paths.get(root, s"$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(src, s"$t.parquet"))
    }
    java.nio.file.Files.writeString(marker.toPath, "staged\n")
  }
}
