package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("pageRankInt: hub outranks leaves, symmetric vertices tie exactly, mass is conserved-ish") {
    // star: 1 is the hub of 2,3,4 — plus a detached symmetric pair 5–6
    val scores = Graph
      .pageRankInt(undirected(1L -> 2L, 1L -> 3L, 1L -> 4L, 5L -> 6L), iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(scores.size === 6)
    assert(scores(1L) > scores(2L), "hub must outrank a leaf")
    assert(scores(2L) === scores(3L) && scores(3L) === scores(4L),
      "symmetric leaves must tie EXACTLY (integer recurrence, no float drift)")
    assert(scores(5L) === scores(6L), "detached pair symmetric")
    // integer truncation only ever loses mass; nothing can exceed the unit
    assert(scores.values.sum <= 1000000000000L)
    assert(scores.values.forall(_ > 0L))
  }

  test("pageRankInt: k-regular graph is the uniform fixpoint") {
    // 4-cycle: every vertex degree 2 — scores stay exactly uniform at
    // every iteration, so any iteration count gives the same answer
    val cycle = undirected(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    val r3 = Graph.pageRankInt(cycle, iters = 3).as[(Long, Long)].collect().toMap
    val r7 = Graph.pageRankInt(cycle, iters = 7).as[(Long, Long)].collect().toMap
    assert(r3.values.toSet.size === 1, "regular graph must be uniform")
    assert(r3 === r7, "uniform fixpoint is iteration-count-invariant")
  }

  test("pageRankInt: argument guards") {
    val e = undirected(1L -> 2L)
    assertThrows[IllegalArgumentException](Graph.pageRankInt(e, iters = 0))
    assertThrows[IllegalArgumentException](Graph.pageRankInt(e, dampingPct = 101))
    assertThrows[IllegalArgumentException](Graph.pageRankInt(e, scaleUnit = 10L))
  }
}
