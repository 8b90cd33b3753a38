package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the scale properties the engine is designed around,
  * pinned as assertions so a refactor that silently de-optimizes a plan
  * (drops a broadcast, widens a scan, introduces a nested-loop join) fails
  * CI instead of surfacing as a 100× regression on a real cluster. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def executed(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("q12 parquet scan prunes to exactly the consumed columns (doc_id, text)") {
    val plan = executed(SparkEntry.queries("q12_token_stats")(spark, TestSpark.sf))
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(reads.contains("doc_id") && reads.contains("text"),
      s"expected doc_id+text in scan schema:\n$reads")
    assert(!reads.contains("lang") && !reads.contains("source") && !reads.contains("n_chars"),
      s"scan reads columns the query never consumes:\n$reads")
  }

  test("q03 dimension rollup broadcasts nation and region (no shuffled dim join)") {
    val plan = executed(SparkEntry.queries("q03_dims_rollup")(spark, TestSpark.sf))
    assert(plan.contains("BroadcastHashJoin"), s"dims must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"dimension joins must not shuffle both sides:\n$plan")
  }

  test("no query plan contains a cartesian or broadcast-nested-loop join") {
    // the two join strategies that are quadratic at scale; every graft
    // operator is designed to avoid them (grain cells, LSH buckets, equi
    // keys). ML-fit queries are exercised via their featurize plans only —
    // fitting models per audited query would dominate suite time.
    val audited = Seq("q02_label_join", "q04_theta_pairs", "q05_cust_orders",
      "q09_semi_join", "q10_anti_join", "q16_near_dedup", "q24_near_dedup_fast",
      "q25_sim_lsh", "q30_asof_join", "q31_range_join", "q34_lang_bigrams",
      "q35_winnow", "q36_winnow_fast", "q40_simhash_dups", "q41_csv_roundtrip",
      "q44_hash_split", "q45_jaccard_dedup")
    audited.foreach { name =>
      val plan = executed(SparkEntry.queries(name)(spark, TestSpark.sf))
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian product")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name has a nested-loop join")
    }
  }

  test("q01 aggregation is map-side partial (partial_ before the exchange)") {
    val plan = executed(SparkEntry.queries("q01_pricing_summary")(spark, TestSpark.sf))
    assert(plan.contains("partial_"),
      s"pricing summary must partial-aggregate before the shuffle:\n$plan")
  }

  test("q16 signature aggregation hash-aggregates (numeric minima, no SortAggregate)") {
    val plan = executed(SparkEntry.queries("q16_near_dedup")(spark, TestSpark.sf))
    assert(!plan.contains("SortAggregate"),
      s"60-bit numeric minhash minima must stay in a hash-agg buffer:\n$plan")
  }
}
