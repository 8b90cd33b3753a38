package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantizedDot HOF and native quantized_dot are bit-identical on fixture vectors") {
    val e = Tables.embeddings(spark, TestSpark.sf).limit(50)
    val pairs = e.select($"vec_id".as("a_id"), $"embedding".as("a"))
      .crossJoin(e.select($"vec_id".as("b_id"), $"embedding".as("b")).limit(10))
    val diff = pairs
      .withColumn("hof", Similarity.quantizedDot($"a", $"b"))
      .withColumn("native", graft.exprapi.quantizedDotFast($"a", $"b"))
      .filter($"hof" =!= $"native")
      .count()
    assert(diff === 0L, "native expression must match the HOF formulation exactly")
  }

  test("quantized_dot: nulls and length mismatch yield NULL, not garbage") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      (Seq(1.0f), Seq(3.0f, 4.0f))
    ).toDF("a", "b")
    val got = df.select(graft.exprapi.quantizedDotFast($"a", $"b").as("d"))
      .as[Option[Long]].collect()
    assert(got(0) === Some(math.floor(3.0 * 1e12).toLong + math.floor(8.0 * 1e12).toLong))
    assert(got(1) === None)
  }

  test("bruteForceTopK: rank-1 neighbor is the true argmax (independent recomputation)") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val queries = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val cands = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val topk = Similarity.bruteForceTopK(queries, cands, k = 3).cache()

    assert(topk.groupBy($"q_id").count().filter($"count" > 3).count() === 0)
    // rank 1 matches a from-scratch max over the full product
    val best = cands.join(broadcast(queries), $"q_id" =!= $"n_id")
      .withColumn("d", Similarity.quantizedDot($"q_emb", $"n_emb"))
      .groupBy($"q_id").agg(max($"d").as("best"))
    val bad = topk.filter($"rank" === 1).join(best, "q_id")
      .filter($"dot_q" =!= $"best").count()
    assert(bad === 0)
    topk.unpersist()
  }

  test("cosine is 1 for identical vectors, -1 for opposite") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(-1.0f, -2.0f, -3.0f))).toDF("a", "b")
    val (same, opp) = df.select(
      Similarity.cosine($"a", $"a").as("s"), Similarity.cosine($"a", $"b").as("o"))
      .as[(Double, Double)].head()
    assert(math.abs(same - 1.0) < 1e-12)
    assert(math.abs(opp + 1.0) < 1e-12)
  }

  test("int8_dot: exact integer dot, SQL-registered, null/mismatch contract") {
    val df = Seq(
      (Seq(1.toByte, (-2).toByte, 127.toByte), Seq(3.toByte, 4.toByte, (-128).toByte)),
      (Seq(1.toByte), Seq(3.toByte, 4.toByte))
    ).toDF("a", "b")
    val got = df.select(graft.exprapi.int8Dot($"a", $"b").as("d"))
      .as[Option[Long]].collect()
    assert(got(0) === Some(3L - 8L + 127L * -128L))
    assert(got(1) === None)
    // SQL surface via GraftExtensions
    df.limit(1).createOrReplaceTempView("i8t")
    val sql = spark.sql("SELECT int8_dot(a, b) AS d FROM i8t").as[Long].head()
    assert(sql === 3L - 8L + 127L * -128L)
  }

  test("quantizeInt8Global: values within [-127,127], int8 top-k recalls float top-k") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val q8 = Similarity.quantizeInt8Global(e)
    val outOfRange = q8.select(explode($"qv").as("v"))
      .filter($"v" > 127 || $"v" < -127).count()
    assert(outOfRange === 0L)

    val k = 5
    val int8 = Similarity.bruteForceTopKInt8(
      q8.filter($"vec_id" % 100 === 0).select($"vec_id".as("q_id"), $"qv"),
      q8.select($"vec_id".as("n_id"), $"qv".as("cv")), k)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val float = Similarity.bruteForceTopK(
      e.filter($"vec_id" % 100 === 0).select($"vec_id".as("q_id"), $"embedding".as("q_emb")),
      e.select($"vec_id".as("n_id"), $"embedding".as("n_emb")), k)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = float.intersect(int8).size.toDouble / float.size
    assert(recall >= 0.6, s"int8 top-$k recall $recall vs float ground truth")
    assert(int8.size === float.size)
  }

  test("int8NearDupPairs: integer predicate brackets float cosine at the threshold") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val tau = 0.4 // tau2E4 = 1600
    val got = Similarity.int8NearDupPairs(emb, tau2E4 = 1600L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (id, v) => id -> v.map(_.toDouble).toArray }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val eps = 0.05 // int8 floor-quantization tolerance band around tau
    for ((ia, va) <- vecs; (ib, vb) <- vecs if ia < ib) {
      val c = cos(va, vb)
      if (c >= tau + eps)
        assert(got.contains((ia, ib)), s"pair ($ia,$ib) cos=$c must be found")
      if (c < tau - eps)
        assert(!got.contains((ia, ib)), s"pair ($ia,$ib) cos=$c must be excluded")
    }
    assert(got.nonEmpty, "fixture corpus must contain near-dup pairs at tau=0.4")
  }

  test("ivfTopK: probed-cell top-k overlaps exhaustive cosine top-k (recall)") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val queries = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val cands = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val k = 5
    val ivf = Similarity.ivfTopK(queries, cands, k, nlist = 16, nprobe = 8)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    // exhaustive cosine ground truth (cosine is normalization-invariant)
    val truth = graft.ops.Relational.groupedTopK(
        cands.join(broadcast(queries), $"q_id" =!= $"n_id")
          .withColumn("cos", Similarity.cosine($"q_emb", $"n_emb")),
        Seq("q_id"), "cos", "n_id", k)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = truth.intersect(ivf).size.toDouble / truth.size
    assert(recall >= 0.5, s"IVF recall $recall below floor (nprobe=8/nlist=16)")
    // shape: k rows per query, no self-matches
    assert(ivf.size === truth.size)
    assert(!ivf.exists { case (q, n) => q == n })
  }

  test("fitIvfIndex: one index serves multiple probe batches (no refit) and matches the one-shot form") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val cands = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val idx = Similarity.fitIvfIndex(cands, nlist = 16)
    // the index is materialized + persisted at fit time: probes are pure plan
    assert(idx.cells.storageLevel.useMemory, "index cells must be persisted")
    assert(idx.centroids.count() === 16L)

    val q1 = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val q2 = e.filter($"vec_id" % 100 === 7)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val r1 = Similarity.ivfProbe(idx, q1, k = 5, nprobe = 8)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val r2 = Similarity.ivfProbe(idx, q2, k = 5, nprobe = 8)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(r1.nonEmpty && r2.nonEmpty)
    assert(r1.map(_._1).intersect(r2.map(_._1)).isEmpty, "distinct query batches")
    // same seed ⇒ the one-shot convenience form returns the same pairs
    val oneShot = Similarity.ivfTopK(q1, cands, k = 5, nlist = 16, nprobe = 8)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(r1 === oneShot, "probe over a held index must equal the one-shot form")

    // the q28 candidate/re-rank split returns the IDENTICAL frame: same
    // candidates, same quantized dots, same top-k tie-break — persisting
    // the split's artifacts changes what is checkable, never the answer
    val split = Similarity.exactRerankFromUnits(
      Similarity.unitVectors(e),
      Similarity.ivfCandidatePairs(idx, q1, nprobe = 8), k = 5)
      .select($"q_id", $"n_id", $"dot_q", $"rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val probe = Similarity.ivfProbe(idx, q1, k = 5, nprobe = 8)
      .select($"q_id", $"n_id", $"dot_q", $"rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(split === probe, "candidate/re-rank split must equal ivfProbe exactly")
    idx.unpersist()
  }

  test("writeIvfIndex/loadIvfIndex: disk round-trip probes identically; cell predicate prunes the scan") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val cands = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val idx = Similarity.fitIvfIndex(cands, nlist = 16)
    val dir = "target/tmp/ivf_index_rt"
    Similarity.writeIvfIndex(idx, dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    assert(loaded.nlist === idx.nlist)
    assert(loaded.cells.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "loaded index must serve from disk, not re-materialize in memory")

    val queries = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val mem = Similarity.ivfProbe(idx, queries, k = 5, nprobe = 8)
      .select($"q_id", $"n_id", $"rank").as[(Long, Long, Long)].collect().toSet
    val disk = Similarity.ivfProbe(loaded, queries, k = 5, nprobe = 8)
      .select($"q_id", $"n_id", $"rank").as[(Long, Long, Long)].collect().toSet
    assert(mem === disk, "disk-served probe must equal in-memory probe, rank for rank")

    // the serving layout's point: a cell predicate reaches the scan as a
    // PARTITION filter — a 2-cell read touches 2/nlist of the files
    val pruned = loaded.cells.filter($"cell".isin(0, 1))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("cell"),
      s"cell predicate must prune partitions at the scan:\n$scan")
    idx.unpersist()
  }

  test("writeIvfPqIndex/loadIvfPqIndex: disk round-trip probes identically; " +
      "dynamic partition pruning reads only the probed cells") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val cands = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val idx = Similarity.fitIvfPqIndex(cands, nlist = 16, m = 8, kc = 16)
    val dir = "target/tmp/ivfpq_index_rt"
    Similarity.writeIvfPqIndex(idx, dir)
    val loaded = Similarity.loadIvfPqIndex(spark, dir)
    assert(loaded.nlist === idx.nlist && loaded.m === idx.m &&
      loaded.kc === idx.kc && loaded.subDim === idx.subDim)
    assert(loaded.codebook.toSeq === idx.codebook.toSeq,
      "codebook must round-trip bit-exact")
    assert(loaded.entries.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "loaded index must serve from disk, not re-materialize in memory")

    val queries = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val mem = Similarity.ivfPqProbe(idx, queries, cands, k = 5, nprobe = 4)
      .select($"q_id", $"n_id", $"rank").as[(Long, Long, Long)].collect().toSet
    val disk = Similarity.ivfPqProbe(loaded, queries, cands, k = 5, nprobe = 4)
      .select($"q_id", $"n_id", $"rank").as[(Long, Long, Long)].collect().toSet
    assert(mem === disk, "disk-served probe must equal in-memory probe, rank for rank")
    idx.unpersist()

    // THE serving claim: a probe against the persisted layout reads only
    // its nprobe cells' files. One query × nprobe=2 ⇒ the entries scan,
    // pruned at RUNTIME by dynamic partition pruning from the broadcast
    // probe side, must open ≤ 2 of the 16 cell directories.
    val oneQ = e.filter($"vec_id" === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val probed = Similarity.ivfPqProbe(loaded, oneQ, cands, k = 5, nprobe = 2)
    probed.write.format("noop").mode("overwrite").save() // finalize AQE
    val entriesScans = fileScans(probed.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("ivfpq_index_rt/entries")))
    assert(entriesScans.nonEmpty, "probe plan must scan the persisted entries")
    val scan = entriesScans.head
    assert(scan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"entries scan must carry a dynamic partition filter on cell, got: " +
        s"${scan.partitionFilters}")
    val partsRead = scan.metrics("numPartitions").value
    assert(partsRead <= 2,
      s"nprobe=2 probe must read <= 2 of 16 cell partitions, read $partsRead")
  }

  test("appendToIvfPqIndex: new vectors served without refit; existing entry files untouched") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val base = e.filter($"vec_id" % 10 =!= 0)
      .select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val late = e.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val dir = s"target/tmp/ivfpq_append_${System.nanoTime()}"
    val idx = Similarity.fitIvfPqIndex(base, nlist = 8, m = 8, kc = 16,
      persistEntries = false)
    Similarity.writeIvfPqIndex(idx, dir)

    def cellFiles(): Map[String, Set[String]] =
      new java.io.File(s"$dir/entries").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(d => d.getName ->
          d.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet)
        .toMap
    val before = cellFiles()

    val appended = Similarity.appendToIvfPqIndex(spark, dir, late)
      .as[(Long, Int)].collect().toMap
    assert(appended.keySet === late.select($"n_id").as[Long].collect().toSet,
      "every late vector must be routed and appended exactly once")

    // append-only: every pre-existing file survives byte-named; new files
    // appear ONLY in the cells the late vectors were routed to
    val after = cellFiles()
    before.foreach { case (d, files) =>
      assert(files.subsetOf(after(d)), s"append must not rewrite $d") }
    val grown = after.keySet.filter(d =>
      after(d) != before.getOrElse(d, Set.empty[String]))
    val routedCells = appended.values.map(c => s"cell=$c").toSet
    assert(grown === routedCells,
      s"new files in $grown but late vectors routed to $routedCells")

    // the reloaded index serves the union; a query duplicating a late
    // vector must retrieve it at rank 1 (identical unit vector => max dot)
    val loaded = Similarity.loadIvfPqIndex(spark, dir)
    assert(loaded.entries.select($"n_id").as[Long].collect().toSet ===
      e.select($"vec_id").as[Long].collect().toSet)
    val lateId = appended.keySet.min
    val probe = e.filter($"vec_id" === lateId)
      .select(lit(-1L).as("q_id"), $"embedding".as("q_emb"))
    val all = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val top = Similarity.ivfPqProbe(loaded, probe, all, k = 3, nprobe = 2)
      .filter($"rank" === 1).select($"n_id").as[Long].head()
    assert(top === lateId,
      s"query cloning appended vector $lateId must retrieve it first, got $top")
  }

  test("ivfPqShortlist + exactRerankFromUnits == ivfPqProbe (the persistable serving split)") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val cands = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val idx = Similarity.fitIvfPqIndex(cands, nlist = 16, m = 8, kc = 16)
    val queries = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val oneShot = Similarity.ivfPqProbe(idx, queries, cands, k = 5, nprobe = 4)
      .select($"q_id", $"n_id", $"dot_q", $"rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val sl = Similarity.ivfPqShortlist(idx, queries, k = 5, nprobe = 4)
    val split = Similarity.exactRerankFromUnits(Similarity.unitVectors(e), sl, k = 5)
      .select($"q_id", $"n_id", $"dot_q", $"rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(split === oneShot,
      "the persistable shortlist/re-rank split must reproduce the one-shot " +
        "probe score-for-score, rank-for-rank")
    idx.unpersist()
  }

  /** Collect FileSourceScanExec leaves through AQE wrappers and reused
    * query stages. */
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(s.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans)
  }

  test("autoBits tracks corpus size; candidate count scales ~ C(n,2)·(1-(1-2^-bits)^tables)") {
    // formula + clamps
    assert(Similarity.autoBits(500, 256) === 1)
    assert(Similarity.autoBits(1L << 20, 256) === 12)
    assert(Similarity.autoBits(100, 256) === 1, "clamped low")
    assert(Similarity.autoBits(Long.MaxValue, 1) === 24, "clamped high")

    val e = Tables.embeddings(spark, TestSpark.sf)
    val n = e.count()
    val allPairs = n * (n - 1) / 2
    val tables = 4
    def expectFrac(bits: Int) = 1.0 - math.pow(1.0 - math.pow(2.0, -bits.toDouble), tables)
    val c2 = Similarity.signLshCandidates(e, bits = 2, tables = tables).count()
    val c4 = Similarity.signLshCandidates(e, bits = 4, tables = tables).count()
    // more bits ⇒ geometrically fewer candidates, tracking the random-bucket
    // expectation within a generous constant (fixture vectors are near-random)
    assert(c4 < c2, s"candidates must shrink with bits: bits=2→$c2, bits=4→$c4")
    assert(c2 <= allPairs * expectFrac(2) * 3 && c2 >= allPairs * expectFrac(2) / 3,
      s"bits=2: $c2 outside 3× band of ${(allPairs * expectFrac(2)).toLong}")
    assert(c4 <= allPairs * expectFrac(4) * 3 && c4 >= allPairs * expectFrac(4) / 3,
      s"bits=4: $c4 outside 3× band of ${(allPairs * expectFrac(4)).toLong}")
  }

  test("lshCosinePairs: bucketed candidates agree with brute force above the cosine floor (recall)") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    // fixture embeddings are near-random (max pairwise cosine ≈ 0.48 at
    // sf0.001), so anchor the test at 0.3 where real pairs exist — an
    // empty-truth test would be vacuous
    val minCos = 0.3
    val a = e.select($"vec_id".as("a_id"), $"embedding".as("a"))
    val b = e.select($"vec_id".as("b_id"), $"embedding".as("b"))
    val truth = a.join(b, $"a_id" < $"b_id")
      .withColumn("cos", Similarity.cosine($"a", $"b"))
      .filter($"cos" >= minCos)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "test must not be vacuous — lower minCos if fixtures changed")

    val lsh = Similarity.lshCosinePairs(e, minCosine = minCos, bits = 2, tables = 8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet

    val recall = truth.intersect(lsh).size.toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall too low (truth=${truth.size}, lsh=${lsh.size})")
    assert(lsh.forall { case (x, y) => x < y }, "each pair once, no self pairs")
    // exact re-score post-filters every candidate, so precision is exact
    assert(lsh.subsetOf(truth), "no pair below the cosine floor may appear")

    // the LSH structural guarantee: candidate generation must prune — the
    // verified join may never see the full n²/2 product
    val nDocs = e.count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val cands = Similarity.lshCosinePairs(e, minCosine = -1.0, bits = 4, tables = 4).count()
    assert(cands < allPairs / 2,
      s"bits=4/tables=4 candidates $cands not ≪ all-pairs $allPairs")
  }

  test("pqTopK: ADC shortlist + exact re-rank recalls exhaustive cosine top-k") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val queries = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val cands = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val k = 5
    val pq = Similarity.pqTopK(queries, cands, k, m = 8, kc = 16, rerankFactor = 8)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val truth = graft.ops.Relational.groupedTopK(
        cands.join(broadcast(queries), $"q_id" =!= $"n_id")
          .withColumn("cos", Similarity.cosine($"q_emb", $"n_emb")),
        Seq("q_id"), "cos", "n_id", k)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = truth.intersect(pq).size.toDouble / truth.size
    assert(recall >= 0.5, s"PQ recall $recall below floor (m=8/kc=16/rerank=8)")
    assert(pq.size === truth.size, "k rows per query")
    assert(!pq.exists { case (q, n) => q == n })
  }

  test("fitPqIndex: codes are valid and deterministic; one index serves repeated probes") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val cands = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val idx = Similarity.fitPqIndex(cands, m = 8, kc = 16)
    assert(idx.codes.storageLevel.useMemory, "index codes must be persisted")
    assert(idx.subDim === 8) // dim 64 / m 8
    assert(idx.codebook.length === 8 * 16 * 8)
    val codes = idx.codes.select($"codes").as[Seq[Int]].collect()
    assert(codes.length.toLong === cands.count())
    assert(codes.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
    // refit with the same seed reproduces the codebook bit-for-bit
    val idx2 = Similarity.fitPqIndex(cands, m = 8, kc = 16, persistCodes = false)
    assert(idx.codebook.toSeq === idx2.codebook.toSeq)

    val q1 = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val q2 = e.filter($"vec_id" % 100 === 50)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    // two probe batches against ONE index; probe results must match the
    // one-shot form (same seed ⇒ same codebooks ⇒ same shortlists)
    val r1 = Similarity.pqProbe(idx, q1, cands, k = 5, rerankFactor = 8)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val r2 = Similarity.pqProbe(idx, q2, cands, k = 5, rerankFactor = 8)
    assert(r2.count() > 0)
    val oneShot = Similarity.pqTopK(q1, cands, k = 5, m = 8, kc = 16, rerankFactor = 8)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(r1 === oneShot)

    // q57's shortlist/re-rank split returns the IDENTICAL frame to the
    // fused probe (same ADC shortlist, same dots, same tie-break)
    val split = Similarity.exactRerankFromUnits(
      Similarity.unitVectors(e),
      Similarity.pqShortlist(idx, q1, k = 5, rerankFactor = 8), k = 5)
      .select($"q_id", $"n_id", $"dot_q", $"rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val fused = Similarity.pqProbe(idx, q1, cands, k = 5, rerankFactor = 8)
      .select($"q_id", $"n_id", $"dot_q", $"rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(split === fused, "pqShortlist + exactRerankFromUnits must equal pqProbe exactly")
    idx.unpersist()
  }

  test("ivfPqProbe: composed cell-prune + ADC scan recalls exhaustive truth; index reused across batches") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val cands = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val queries = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val k = 5
    val idx = Similarity.fitIvfPqIndex(cands, nlist = 16, m = 8, kc = 16)
    assert(idx.entries.storageLevel.useMemory, "index entries must be persisted")
    assert(idx.entries.columns.toSet === Set("n_id", "cell", "codes"))

    val got = Similarity.ivfPqProbe(idx, queries, cands, k, nprobe = 8, rerankFactor = 8)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val truth = graft.ops.Relational.groupedTopK(
        cands.join(broadcast(queries), $"q_id" =!= $"n_id")
          .withColumn("cos", Similarity.cosine($"q_emb", $"n_emb")),
        Seq("q_id"), "cos", "n_id", k)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.4, s"IVFPQ recall $recall below floor (both quantizers lossy)")
    assert(!got.exists { case (q, n) => q == n })
    // same index, second batch — pure plan, no refit
    val q2 = e.filter($"vec_id" % 100 === 50)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    assert(Similarity.ivfPqProbe(idx, q2, cands, k).count() > 0)
    idx.unpersist()
  }

  test("writePqIndex/loadPqIndex: disk round-trip rebuilds the codebook exactly and probes identically") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val cands = e.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val idx = Similarity.fitPqIndex(cands, m = 8, kc = 16)
    val dir = "target/tmp/pq_index_rt"
    Similarity.writePqIndex(idx, dir)
    val loaded = Similarity.loadPqIndex(spark, dir)
    assert(loaded.m === idx.m && loaded.kc === idx.kc && loaded.subDim === idx.subDim)
    assert(loaded.codebook.toSeq === idx.codebook.toSeq,
      "codebook floats must round-trip bit-exactly")
    assert(loaded.codes.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "loaded codes must stay a lazy compressed scan")

    val queries = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val mem = Similarity.pqProbe(idx, queries, cands, k = 5)
      .select($"q_id", $"n_id", $"rank").as[(Long, Long, Long)].collect().toSet
    val disk = Similarity.pqProbe(loaded, queries, cands, k = 5)
      .select($"q_id", $"n_id", $"rank").as[(Long, Long, Long)].collect().toSet
    assert(mem === disk, "disk-served PQ probe must equal in-memory probe, rank for rank")
    idx.unpersist()
  }

  test("PQ kernels: null discipline on mismatched dims/codes; ADC approximates the true dot") {
    val cb = Array.tabulate(2 * 2 * 2)(_.toFloat) // m=2, kc=2, subDim=2
    val enc = graft.expr.PqOps.encode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0.1f, 0.2f, 0.3f)),
      cb, 2, 2, 2)
    assert(enc === null, "wrong input dim must yield NULL, not garbage codes")
    val tab = graft.expr.PqOps.adcTable(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0.1f, 0.2f, 0.3f, 0.4f)),
      cb, 2, 2, 2)
    assert(tab.numElements() === 4)
    val badCodes = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0, 5))
    assert(graft.expr.PqOps.adcDot(tab, badCodes, 2) === null, "out-of-range code → NULL")
    // ADC score == sum of the query-centroid partial dots the codes select:
    // reconstruct from the codebook and compare
    val q = Array(0.1f, 0.2f, 0.3f, 0.4f)
    val codes = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1, 0))
    val got = graft.expr.PqOps.adcDot(
      graft.expr.PqOps.adcTable(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(q), cb, 2, 2, 2),
      codes, 2)
    // subspace 0 centroid 1 = cb[2..3] = (2,3); subspace 1 centroid 0 = cb[4..5] = (4,5)
    val expect = (0.1f.toDouble * 2 + 0.2f.toDouble * 3).toFloat.toDouble +
      (0.3f.toDouble * 4 + 0.4f.toDouble * 5).toFloat.toDouble
    assert(math.abs(got - expect) < 1e-12, s"got $got expect $expect")
  }

  test("lshCosinePairs / signLshCandidates: empty input yields empty result, not NPE") {
    val empty = Tables.embeddings(spark, TestSpark.sf).filter(lit(false))
    val pairs = Similarity.lshCosinePairs(empty, minCosine = 0.0)
    assert(pairs.count() === 0L)
    assert(pairs.columns.contains("a_id") && pairs.columns.contains("b_id"))
    assert(Similarity.signLshCandidates(empty, bits = 4).count() === 0L)
  }

  test("embeddingOutliers: planted far vector ranks first in its group, k bound holds") {
    val base = Array.fill(8)(0.1f)
    val near = (1L to 5L).map(i => (i, base.updated(0, 0.1f + i * 0.001f).toSeq))
    val far = Seq((9L, Array.fill(8)(0.9f).toSeq))           // the planted outlier
    val other = (20L to 23L).map(i => (i, Array.fill(8)(0.5f).toSeq))
    val emb = (near ++ far ++ other).toDF("doc_id", "embedding")
      .select($"doc_id", $"embedding".cast("array<float>"))
    val labels = ((1L to 5L) :+ 9L).map(i => (i, "a")) ++ (20L to 23L).map(i => (i, "b"))
    val got = Similarity.embeddingOutliers(
        emb, labels.toDF("doc_id", "lang"), "doc_id", "embedding", "lang", k = 2)
      .select($"lang", $"doc_id", $"dist_q")
      .as[(String, Long, Long)].collect()
    val aTop = got.filter(_._1 == "a").sortBy(-_._3)
    assert(aTop.length === 2 && aTop.head._2 === 9L,
      s"planted outlier must rank first in group a: ${aTop.toSeq}")
    // group b is 4 identical vectors: centroid == every vector, distance 0
    val b = got.filter(_._1 == "b")
    assert(b.length === 2 && b.forall(_._3 === 0L), s"identical group: ${b.toSeq}")
  }

  test("sparseCosinePairs: identical docs score ~1, disjoint docs never pair, maxDF gates stopwords") {
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta the the"),
      (2L, "alpha beta gamma delta alpha beta the the"), // identical to 1
      (3L, "alpha beta gamma delta epsilon zeta the"),   // overlapping
      (4L, "omega psi chi phi upsilon tau the"),         // disjoint content words
      (5L, "unrelated totally different words here the")
    ).toDF("doc_id", "text")
    // maxDF=4 drops 'the' (df=5) — the stopword postings list never joins
    val got = Similarity.sparseCosinePairs(docs, "doc_id", "text",
        minCosine = 0.0, minDF = 1L, maxDF = 4L)
      .select($"a_id", $"b_id", $"cosine")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-9, s"identical docs: ${got((1L, 2L))}")
    assert(got.keys.forall { case (a, b) => a < b })
    assert(!got.contains((1L, 4L)) && !got.contains((2L, 4L)),
      s"docs sharing only the gated stopword must not pair: ${got.keys}")
    val overlap = got((1L, 3L))
    assert(overlap > 0.3 && overlap < 1.0, s"partial overlap mid-range: $overlap")
    // threshold filters
    val strict = Similarity.sparseCosinePairs(docs, "doc_id", "text",
        minCosine = 0.99, minDF = 1L, maxDF = 4L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(strict === Set((1L, 2L)), s"only the identical pair survives 0.99: $strict")
  }

  test("randomSignProjection: sketch equals driver-side matvec; signs are ±1, deterministic, ~balanced") {
    val e = Tables.embeddings(spark, TestSpark.sf).limit(20).cache()
    val k = 8
    val got = Similarity.randomSignProjection(e, k)
      .select($"vec_id", $"j", $"p").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size === 20 * k)
    // independent recomputation: same global scale, same floor, plain loops
    val raw = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val g = raw.flatMap(_._2.map(x => math.abs(x))).max.toDouble / 127.0
    val signs = Similarity.signMatrix(k, raw.head._2.size)
    for ((id, emb) <- raw; j <- 0 until k) {
      val q = emb.map(x => math.floor(x.toDouble / g).toLong)
      val want = q.zip(signs(j)).map { case (x, s) => x * s }.sum
      assert(got((id, j.toLong)) === want, s"vec $id dim $j")
    }
    // the matrix itself: pure function of (seed, j, i), values only ±1,
    // and no row is wildly unbalanced (md5 parity ~ coin flips)
    assert(signs === Similarity.signMatrix(k, raw.head._2.size))
    assert(signs.flatten.forall(s => s == 1L || s == -1L))
    val worst = signs.map(r => math.abs(r.sum)).max
    assert(worst < raw.head._2.size,
      s"a constant sign row would be a degenerate projection (|sum|=$worst)")
  }

  test("q187 shortlist serving: recall floor vs the dense vocab² baseline " +
      "(retained here as the recall truth, never in the served plan)") {
    import org.apache.spark.sql.functions._
    // run the registered query: fits word2vec, persists unit vectors +
    // LSH candidates, returns the shortlist top-3
    val got = graft.queries.MlQueries.queries("q187_word2vec")(
        spark, TestSpark.sf)
      .select($"w1", $"w2", $"rk").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.nonEmpty)
    // dense baseline over the SAME persisted unit vectors — the recall
    // truth the shortlist is measured against (the q17/q137 contract)
    val v = spark.read.parquet(
      graft.queries.QueryShared.predsPath("q187_w2v"))
    val dense = v.select($"word".as("w1"), $"u".as("u1"))
      .crossJoin(v.select($"word".as("w2"), $"u".as("u2")))
      .filter($"w1" =!= $"w2")
      .select($"w1", $"w2",
        graft.exprapi.quantizedDotFast($"u1", $"u2").as("sim_q"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"w1").orderBy($"sim_q".desc, $"w2".asc)))
      .filter($"rk" <= 3)
      .select($"w1", $"w2").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val recall = got.intersect(dense).size.toDouble / dense.size
    assert(recall >= 0.6,
      f"shortlist top-3 recall $recall%.3f below the 0.6 floor " +
        f"(|shortlist|=${got.size}, |dense|=${dense.size})")
  }

  test("q186 ALS shortlist serving: recall floor vs the dense item-by-user " +
      "baseline (retained HERE as the recall truth, never in the served " +
      "plan — round-10 VERDICT weak #1)") {
    import org.apache.spark.sql.functions._
    // run the registered query: fits ALS, persists factors + the IVF
    // cross-domain shortlist, returns the re-ranked top-3 per user
    val got = graft.queries.MlQueries.queries("q186_als_recs")(
        spark, TestSpark.sf)
      .select($"user", $"item", $"rk").collect()
      .map(r => (r.get(0), r.get(1))).toSet
    assert(got.nonEmpty)
    // dense scoring over the SAME persisted raw factors — the recall
    // truth the MIPS-augmented IVF shortlist is measured against
    val uf = spark.read.parquet(
        graft.queries.QueryShared.predsPath("q186_userf"))
      .filter($"id" % 50 === 0)
      .select($"id".as("user"), $"features".as("ufeat"))
    val itf = spark.read.parquet(
        graft.queries.QueryShared.predsPath("q186_itemf"))
      .select($"id".as("item"), $"features".as("ifeat"))
    val dense = itf.crossJoin(broadcast(uf))
      .select($"user", $"item",
        graft.exprapi.quantizedDotFast($"ufeat", $"ifeat").as("score_q"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user").orderBy($"score_q".desc, $"item".asc)))
      .filter($"rk" <= 3)
      .select($"user", $"item").collect()
      .map(r => (r.get(0), r.get(1))).toSet
    val recall = got.intersect(dense).size.toDouble / dense.size
    assert(recall >= 0.6,
      f"ALS shortlist top-3 recall $recall%.3f below the 0.6 floor " +
        f"(|shortlist|=${got.size}, |dense|=${dense.size})")
  }

  test("q489 filtered ANN: every neighbor shares the query's label; " +
      "recall floor vs the exact same-label brute force") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q489_filtered_ann")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4)))
    assert(rows.nonEmpty)
    val e = Tables.embeddings(spark, TestSpark.sf)
    val labelOf = e.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (q, n, _, lab) =>
      assert(labelOf(q) === lab, s"query $q label column wrong")
      assert(labelOf(n) === lab,
        s"neighbor $n of query $q violates the label predicate")
    }
    // recall vs exact: brute-force top-5 restricted to the query's label
    val qs = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val scored = e.select(col("vec_id").as("n_id"),
        col("embedding").as("n_emb"), col("label").as("n_label"))
      .join(broadcast(qs),
        col("q_id") =!= col("n_id") && col("q_label") === col("n_label"))
      .withColumn("dot_q",
        graft.exprapi.quantizedDotFast(col("q_emb"), col("n_emb")))
    val exactSet = graft.ops.Relational
      .groupedTopK(scored, Seq("q_id"), "dot_q", "n_id", 5)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val gotSet = rows.map(t => (t._1, t._2)).toSet
    val recall = gotSet.count(exactSet).toDouble / math.max(exactSet.size, 1)
    assert(recall >= 0.4,
      f"filtered-ANN recall $recall%.3f below the 0.4 floor " +
        f"(nprobe=4 of nlist=16; |got|=${gotSet.size}, |exact|=${exactSet.size})")
  }

  // shared by the q490/q491 differential recomputes: the exact integer
  // dot formula (the quantized_dot contract proven native==HOF above)
  private def specDot(a: Array[Float], b: Array[Float]): Long =
    a.indices.map(i =>
      math.floor(a(i).toDouble * b(i).toDouble * 1e12).toLong).sum

  private def readUnits(name: String): Map[Long, Array[Float]] =
    spark.read.parquet(graft.queries.QueryShared.predsPath(name))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def readCands(name: String): Array[(Long, Long)] =
    spark.read.parquet(graft.queries.QueryShared.predsPath(name))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("q490 RRF hybrid: full differential — both legs and the fusion " +
      "recomputed independently driver-side match the engine exactly") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q490_rrf_hybrid")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.nonEmpty)
    // vector leg from the persisted artifacts (independent rerank impl)
    val units = readUnits("q490_units")
    val rankV: Map[(Long, Long), Long] =
      readCands("q490_cands").groupBy(_._1).flatMap { case (q, ps) =>
        ps.map { case (_, n) => (n, specDot(units(q), units(n))) }
          .sortBy { case (n, d) => (-d, n) }.take(10).zipWithIndex
          .map { case ((n, _), i) => (q, n) -> (i + 1).toLong }
      }
    // lexical leg from the raw documents (independent inverted index)
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq.distinct)
    val dfCount = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length }
    val rare = dfCount.filter { case (_, c) => c >= 2 && c <= 20 }.keySet
    val post = docs.map { case (id, ts) => id -> ts.filter(rare) }
    val rankL: Map[(Long, Long), Long] =
      post.filter(_._1 % 50 == 0).flatMap { case (q, qt) =>
        val qset = qt.toSet
        post.filter { case (n, _) => n != q }
          .map { case (n, nt) => (n, nt.count(qset).toLong) }
          .filter(_._2 > 0)
          .sortBy { case (n, sh) => (-sh, n) }.take(10).zipWithIndex
          .map { case ((n, _), i) => (q, n) -> (i + 1).toLong }
      }.toMap
    val want = (rankV.keySet ++ rankL.keySet).toSeq.map { case (q, n) =>
        val s =
          rankV.get((q, n)).map(r => 1000000000L / (60L + r)).getOrElse(0L) +
          rankL.get((q, n)).map(r => 1000000000L / (60L + r)).getOrElse(0L)
        (q, n, s)
      }.groupBy(_._1).flatMap { case (_, xs) =>
        xs.sortBy { case (_, n, s) => (-s, n) }.take(5).zipWithIndex
          .map { case ((q, n, s), i) => (q, n, s, (i + 1).toLong) }
      }.toSet
    assert(got === want,
      s"RRF differential mismatch: engine-only=${(got -- want).take(3)} " +
        s"spec-only=${(want -- got).take(3)}")
  }

  test("q491 MMR: the greedy diversified selection recomputed " +
      "independently from the persisted artifacts matches exactly") {
    val got = SparkEntry.queries("q491_mmr_rerank")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.nonEmpty)
    val units = readUnits("q491_units")
    val want = readCands("q491_cands").groupBy(_._1)
      .flatMap { case (q, ps) =>
        val rel = ps.map { case (_, n) => n -> specDot(units(q), units(n)) }
          .sortBy { case (n, d) => (-d, n) }.take(10)
        val relMap = rel.toMap
        var selected = List.empty[Long]
        val out = scala.collection.mutable.Buffer.empty[(Long, Long, Long, Long)]
        for (step <- 1 to 3) {
          val remaining = rel.map(_._1).filterNot(selected.contains)
          if (remaining.nonEmpty) {
            val scored = remaining.map { c =>
              val mmr =
                if (selected.isEmpty) 7L * relMap(c)
                else 7L * relMap(c) -
                  3L * selected.map(sid => specDot(units(c), units(sid))).max
              (c, mmr)
            }
            val (best, mmr) = scored.sortBy { case (c, m) => (-m, c) }.head
            out += ((q, best, step.toLong, mmr))
            selected = selected :+ best
          }
        }
        out
      }.toSet
    assert(got === want,
      s"MMR differential mismatch: engine-only=${(got -- want).take(3)} " +
        s"spec-only=${(want -- got).take(3)}")
    // the diversity term must actually bind somewhere: at least one
    // query's step-2/3 pick differs from plain relevance order
    val relOrder = readCands("q491_cands").groupBy(_._1).flatMap {
      case (q, ps) =>
        ps.map { case (_, n) => n -> specDot(units(q), units(n)) }
          .sortBy { case (n, d) => (-d, n) }.take(3).zipWithIndex
          .map { case ((n, _), i) => (q, n, (i + 1).toLong) }.toSeq
    }.toSet
    val mmrPicks = got.map(t => (t._1, t._2, t._3))
    assert(mmrPicks.exists(p => !relOrder.contains(p)),
      "MMR selected exactly the relevance order everywhere — diversity " +
        "term never bound, λ staging suspect")
  }

  test("q497 semantic decontamination: top-1 and flag recomputed from " +
      "the persisted artifacts; planted contamination caught at 100%") {
    val rows = SparkEntry.queries("q497_semantic_decon")(spark, TestSpark.sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.nonEmpty)
    val units = readUnits("q497_units")
    val want = readCands("q497_cands").groupBy(_._1).map { case (q, ps) =>
      val (n, d) = ps.map { case (_, n) => (n, specDot(units(q), units(n))) }
        .minBy { case (n, d) => (-d, n) }
      q -> ((n, d, if (d >= 950000000000L) 1L else 0L))
    }
    assert(rows === want,
      "engine top-1/flag must equal the independent recompute")
    // planted copies (id offset 2e6) must ALL be flagged — the positive
    // control: a copy's unit vector is bit-identical to its original's,
    // so its integer self-dot is within `dim` of 1e12 and clears 0.95
    val planted = rows.keys.filter(_ >= 2000000L)
    assert(planted.nonEmpty, "planted control set must be non-empty")
    planted.foreach { q =>
      val (_, d, f) = rows(q)
      assert(f === 1L, s"planted contaminant $q escaped the screen")
      assert(d >= 950000000000L, s"planted contaminant $q dot $d")
    }
    // flag consistency everywhere
    rows.foreach { case (q, (_, d, f)) =>
      assert(f === (if (d >= 950000000000L) 1L else 0L), s"flag law at $q")
    }
  }

  test("q501 streamed hybrid retrieval equals the q490 batch path " +
      "end-to-end (streamed == one-shot law)") {
    def rows(name: String) =
      SparkEntry.queries(name)(spark, TestSpark.sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val batch = rows("q490_rrf_hybrid")
    val streamed = rows("q501_hybrid_stream")
    assert(streamed === batch,
      s"streamed-only=${(streamed -- batch).take(3)} " +
        s"batch-only=${(batch -- streamed).take(3)}")
    // and the streamed candidate log equals the one-shot probe set
    val streamedCands = readCands("q501_cands").toSet
    val batchCands = readCands("q490_cands").toSet
    assert(streamedCands === batchCands,
      "drained per-batch probes must equal the one-shot candidate set")
  }

  test("q506 shadow compare: agreement numbers recomputed independently " +
      "from the persisted artifacts; bounds hold") {
    val rows = SparkEntry.queries("q506_index_shadow")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.nonEmpty)
    val units = readUnits("q506_units")
    def top5(name: String): Map[Long, Set[Long]] =
      readCands(name).groupBy(_._1).map { case (q, ps) =>
        q -> ps.map { case (_, n) => (n, specDot(units(q), units(n))) }
          .sortBy { case (n, d) => (-d, n) }.take(5).map(_._1).toSet
      }
    val a = top5("q506_cands_a")
    val b = top5("q506_sl_b")
    assert(rows.keySet === (a.keySet ++ b.keySet))
    rows.foreach { case (q, (na, nb, nboth, ppm)) =>
      val sa = a.getOrElse(q, Set.empty)
      val sb = b.getOrElse(q, Set.empty)
      assert(na === sa.size.toLong, s"$q n_a")
      assert(nb === sb.size.toLong, s"$q n_b")
      assert(nboth === (sa & sb).size.toLong, s"$q n_both")
      assert(ppm === nboth * 1000000L / math.max(na, 1L), s"$q ppm")
      assert(na <= 5 && nb <= 5 && nboth <= math.min(na, nb), s"$q bounds")
    }
    // the canary must be informative on the fixture: indices agree on
    // SOMETHING and disagree on something (else the compare is vacuous)
    assert(rows.values.exists(_._3 > 0), "some agreement expected")
    assert(rows.values.exists(v => v._3 < math.min(v._1, v._2)) ||
      rows.values.exists(v => v._1 != v._2),
      "quantized candidate index should diverge somewhere at top-5")
  }
}
