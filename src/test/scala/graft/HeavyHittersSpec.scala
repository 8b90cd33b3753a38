package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed stream: "hot" 600×, "warm" 250×, 150 distinct cold singletons
  private def stream = (
    Seq.fill(600)("hot") ++ Seq.fill(250)("warm") ++
      (1 to 150).map(i => s"cold_$i")
  ).toDF("v")

  private def exact(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] = {
    val n = df.count()
    df.groupBy($"v").count().as[(String, Long)].collect()
      .filter { case (_, c) => c * k > n }.toMap
  }

  test("heavyHitters: exact result under any partitioning, several k") {
    for (parts <- Seq(1, 7, 32); k <- Seq(2, 5, 50)) {
      val df = stream.repartition(parts)
      val got = Relational.heavyHitters(df, "v", k)
        .as[(String, Long)].collect().toMap
      assert(got === exact(df, k), s"parts=$parts k=$k")
    }
  }

  test("misra_gries sketch: ≤ k candidates, superset of true > N/(k+1) hitters") {
    val k = 5
    val df = stream.repartition(11)
    val cands = df.select(graft.exprapi.misraGries($"v", k).as("mg"))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(cands.size <= k, s"sketch must hold <= k items, got $cands")
    val n = df.count()
    val mustHave = exact(df, k + 1).keySet // freq > N/(k+1)
    assert(mustHave.subsetOf(cands.map(_._1).toSet),
      s"guarantee violated: $mustHave not in ${cands.map(_._1)}")
    // lower bounds never exceed true counts
    val truth = df.groupBy($"v").count().as[(String, Long)].collect().toMap
    cands.foreach { case (item, lb) =>
      assert(lb <= truth(item), s"lb $lb exceeds true count for $item")
    }
  }

  test("heavyHitters: randomized zipf-ish streams stay exact across seeds and layouts") {
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish: item i drawn with probability ∝ 1/(i+1)
      val items = (0 until 2000).map { _ =>
        val r = rnd.nextDouble()
        val i = math.min((1.0 / (1.0 - r * 0.97) - 1.0).toInt, 40)
        s"it_$i"
      }
      val df = items.toDF("v").repartition(1 + seed % 5)
      for (k <- Seq(3, 10)) {
        val got = Relational.heavyHitters(df, "v", k)
          .as[(String, Long)].collect().toMap
        assert(got === exact(df, k), s"seed=$seed k=$k")
      }
    }
  }

  test("heavyHitters: uniform input below threshold returns empty; empty input safe") {
    val uniform = (1 to 100).map(i => s"u_$i").toDF("v")
    assert(Relational.heavyHitters(uniform, "v", 50).count() === 0L)
    val empty = uniform.filter(lit(false))
    val out = Relational.heavyHitters(empty, "v", 10)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("v", "cnt"))
  }

  test("heavyHitters: recount scan filters to candidates before the groupBy") {
    // parquet-backed input so the candidate filter stays a physical node
    // (over a LocalRelation it constant-folds into the scan)
    val toks = Tables.documents(spark, TestSpark.sf)
      .select(explode(graft.text.TextOps.tokens($"text")).as("v"))
    val plan = Relational.heavyHitters(toks, "v", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains(" IN ") || plan.contains("INSET") || plan.contains("in("),
      s"expected candidate IN-filter in the recount scan:\n$plan")
  }

  test("misra_gries: argument and type guards") {
    intercept[IllegalArgumentException](
      stream.select(graft.exprapi.misraGries($"v", 0)).head)
    intercept[org.apache.spark.sql.AnalysisException](
      Seq(1, 2).toDF("x").select(graft.exprapi.misraGries($"x", 3)).head)
  }
}
