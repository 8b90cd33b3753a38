package graft

import org.apache.spark.sql.SparkSession

/** Session façade for the graft engine.
  *
  * The reference ran spark-shell 2.4 with hand-tuned cluster shapes
  * (`mergers_acquisitions_code/acq_etl_code.scala:1` — 64 executors ×16 GB;
  * `lr.scala:1-2`). We encode the engine-wide defaults once instead:
  *   - AQE on (runtime join re-plan + skew-join splitting — the upgrade the
  *     reference's theta self-join `predictions.scala:37` needs at scale),
  *   - UTC session time zone (oracle parity for date/timestamp arithmetic),
  *   - shuffle partitions sized for the local harness (32 cores), NOT the
  *     200 default. On a real cluster this is `cores × executors × 2-3`.
  */
object GraftSession {

  def builder(
      master: String = "local[32]",
      appName: String = "graft",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      // keep managed-table data out of the repo root (bucketed tables etc.)
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def build(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply graft defaults to an externally-created session (e.g. the
    * driver-owned sessions in Verify/Bench). Runtime-settable confs only. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
