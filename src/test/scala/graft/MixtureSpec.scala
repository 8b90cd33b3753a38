package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Mixture

class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("temperatureAllocation: sqrt flattening, exact budget, deterministic remainders") {
    // en is 100x fr by tokens; sqrt temperature must compress that to 10x
    val docs = Seq.tabulate(100)(i => ("en", 1000L)) ++
      Seq(("fr", 1000L)) ++ Seq(("de", 4000L))
    val df = docs.toDF("lang", "n_tok")
    val out = Mixture.temperatureAllocation(df, "lang", col("n_tok"), budget = 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap

    assert(out("en")._1 === 100000L && out("fr")._1 === 1000L)
    assert(out.values.map(_._2).sum === 1000L,
      "largest-remainder rounding must hit the budget exactly")
    val en = out("en")._2.toDouble; val fr = out("fr")._2.toDouble
    assert(en / fr > 9.0 && en / fr < 11.0,
      s"sqrt temperature: 100x tokens -> ~10x allocation, got ${en / fr}")
    assert(out("de")._2 > out("fr")._2, "4x tokens -> 2x weight -> more budget")
  }

  test("temperatureAllocation is partition-invariant") {
    val df = (1 to 500).map(i => (s"g${i % 7}", (i % 13 + 1).toLong * 10))
      .toDF("g", "t")
    val a = Mixture.temperatureAllocation(df, "g", col("t"), 997L)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    val b = Mixture.temperatureAllocation(df.repartition(11), "g", col("t"), 997L)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(a === b)
    assert(a.toSeq.map(_._2).sum === 997L)
  }
}
