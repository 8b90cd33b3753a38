package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packOffsets: offsets are the exact prefix sums, chunks span correctly") {
    // token counts 3, 5, 0, 4, 10 → offsets 0,3,8,8,12; budget 4
    val docs = Seq(
      (10L, "a b c"),
      (11L, "a b c d e"),
      (12L, ""),
      (13L, "a b c d"),
      (14L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    val out = Packing.packOffsets(docs, "doc_id",
        size(graft.text.TextOps.tokens($"text")).cast("long"), budget = 4L,
        bucketWidth = 2L) // force multiple buckets: 10-11 | 12-13 | 14
      .select($"doc_id", $"n_tok", $"start_off", $"end_off", $"first_seq", $"last_seq")
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out === Array(
      (10L, 3L, 0L, 3L, 0L, 0L),   // tokens [0,3) → chunk 0 only
      (11L, 5L, 3L, 8L, 0L, 1L),   // [3,8) straddles the 4-boundary
      (12L, 0L, 8L, 8L, 2L, 2L),   // zero-token doc pinned at its offset
      (13L, 4L, 8L, 12L, 2L, 2L),  // [8,12) exactly fills chunk 2
      (14L, 10L, 12L, 22L, 3L, 5L) // [12,22) spans chunks 3..5
    ))
  }

  test("packOffsets: bucketed decomposition equals the naive global window") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", size(graft.text.TextOps.tokens($"text")).cast("long").as("n_tok"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = docs
      .withColumn("end_off", sum($"n_tok").over(w))
      .select($"doc_id", ($"end_off" - $"n_tok").as("start_off"), $"end_off")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val bucketed = Packing.packOffsets(docs, "doc_id", $"n_tok",
        budget = 512L, bucketWidth = 100L)
      .select($"doc_id", $"start_off", $"end_off")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(bucketed === naive)
  }

  test("chunkOccupancy: doc counts and started tokens roll up exactly") {
    val docs = Seq(
      (1L, 3L), (2L, 5L), (3L, 4L) // offsets 0,3,8; budget 4 → first_seq 0,0,2
    ).toDF("doc_id", "n")
    val occ = Packing.chunkOccupancy(
        Packing.packOffsets(docs, "doc_id", $"n", budget = 4L))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(occ === Array((0L, 2L, 8L), (2L, 1L, 4L)))
  }

  test("slidingChunks: coverage, overlap, trailing partial, empty doc emits nothing") {
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens, chunk 4 / stride 2 → starts 1,3,5
      (2L, "x y"),           // shorter than one chunk → single chunk
      (3L, "")               // empty → nothing
    ).toDF("doc_id", "text")
    val got = Packing.slidingChunks(docs, "doc_id",
        graft.text.TextOps.tokens($"text"), chunkSize = 4, stride = 2)
      .select($"doc_id", $"chunk_id", $"start", $"n_tok", $"chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(got === Array(
      (1L, 0L, 1L, 4L, "a b c d"),
      (1L, 1L, 3L, 4L, "c d e f"),
      (1L, 2L, 5L, 3L, "e f g"),  // trailing partial reaches the doc end
      (2L, 0L, 1L, 2L, "x y")
    ))
    // every token position is covered by at least one chunk
    val covered = got.filter(_._1 == 1L)
      .flatMap(r => r._3 until (r._3 + r._4)).toSet
    assert(covered === (1L to 7L).toSet)
    intercept[IllegalArgumentException](
      Packing.slidingChunks(docs, "doc_id", col("text"), 4, 5)) // stride > chunk
  }

  test("tokenBudgetSample: greedy fill in md5 order, ≤1-doc overshoot, partition-invariant") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val nTok = size(graft.text.TextOps.tokens($"text")).cast("long")
    val budget = 1000L
    val picked = Packing.tokenBudgetSample(docs, "lang", "doc_id", nTok, budget)
      .as[(Long, String, Long, Long)].collect()
    val byLang = picked.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val total = rows.map(_._3).sum
      val maxDoc = rows.map(_._3).max
      assert(total < budget + maxDoc,
        s"$lang overshoots by more than one doc: total=$total")
      // every admitted doc was admitted because the PRIOR cumsum < budget
      rows.foreach { case (_, _, n, cum) => assert(cum - n < budget) }
    }
    // deterministic under repartitioning
    val again = Packing.tokenBudgetSample(
        docs.repartition(7), "lang", "doc_id", nTok, budget)
      .select($"doc_id").as[Long].collect().toSet
    assert(again === picked.map(_._1).toSet)
  }

  test("packOffsets: randomized streams — bucketed always equals the naive window") {
    for (seed <- Seq(3, 41)) {
      val rnd = new scala.util.Random(seed)
      // sparse, non-contiguous ids; heavy-tailed token counts incl. zeros
      val rows = (1 to 300).map { _ =>
        (rnd.nextInt(100000).toLong,
          if (rnd.nextInt(10) == 0) 0L else rnd.nextInt(5000).toLong)
      }.distinctBy(_._1)
      val df = rows.toDF("doc_id", "n_tok").repartition(1 + seed % 7)
      val w = org.apache.spark.sql.expressions.Window.orderBy($"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val naive = df.withColumn("end_off", sum($"n_tok").over(w))
        .select($"doc_id", ($"end_off" - $"n_tok").as("start_off"), $"end_off")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val bucketed = Packing.packOffsets(df, "doc_id", $"n_tok",
          budget = 1 + rnd.nextInt(4096), bucketWidth = 1 + rnd.nextInt(5000))
        .select($"doc_id", $"start_off", $"end_off")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(bucketed === naive, s"seed=$seed")
    }
  }

  test("packOffsets: argument guards") {
    val d = Seq((1L, 1L)).toDF("doc_id", "n")
    intercept[IllegalArgumentException](Packing.packOffsets(d, "doc_id", $"n", 0L))
    intercept[IllegalArgumentException](
      Packing.packOffsets(d, "doc_id", $"n", 4L, bucketWidth = 0L))
  }
}
