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

  test("packOffsets: argument guards") {
    val d = Seq((1L, 1L)).toDF("doc_id", "n")
    intercept[IllegalArgumentException](Packing.packOffsets(d, "doc_id", $"n", 0L))
    intercept[IllegalArgumentException](
      Packing.packOffsets(d, "doc_id", $"n", 4L, bucketWidth = 0L))
  }
}
