package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-sequence packing by stream chunking: concatenate the corpus
  * token stream in a deterministic document order and cut it every
  * `budget` tokens (the GPT-style pretraining layout — documents may span
  * chunk boundaries; the EOD token between docs is the trainer's concern,
  * not the planner's). The engine's job is the offset arithmetic: each
  * document's [start, end) token offsets in the concatenated stream and
  * the first/last training sequence it lands in.
  *
  * Scale design: the naive formulation is a global-order window cumsum —
  * `sum(n_tok) over (order by id)` with NO partition clause, which Spark
  * executes by moving EVERY row to a single partition (the "No Partition
  * Defined for Window operation" trap): a non-starter at 100 TB. This
  * implementation is the standard two-phase scan instead:
  *
  *   1. coarse range-bucket the id space (`bucket = floor(id / width)`),
  *      cumsum WITHIN each bucket (parallel window, bounded partitions);
  *   2. aggregate one total per bucket (tiny frame), exclusive-prefix-sum
  *      those totals in a single-partition window over the TINY frame
  *      only, and broadcast-join the bucket base offsets back.
  *
  * Every row is touched in exactly two parallel passes (bucket window +
  * base-offset add); the only single-partition work is over the bucket
  * totals (n/width rows). Results are bit-identical to the global-window
  * form — the oracle states the naive formulation and hash-matches.
  */
object Packing {

  /** Per-document offsets and chunk assignment for stream packing.
    *
    * @param docs     input frame
    * @param idCol    numeric unique id defining the deterministic
    *                 concatenation order (range-bucketed for parallelism,
    *                 so it must be numeric — the corpus-wide layout must
    *                 not depend on partitioning)
    * @param nTok     per-document token count (LONG column expression)
    * @param budget   tokens per training sequence (e.g. 2048/4096/8192)
    * @param bucketWidth id-range width of one cumsum bucket; partitions
    *                 the window work. ~10⁵–10⁶ at production scale.
    * @return (idCol, n_tok, start_off, end_off, first_seq, last_seq) —
    *         `first_seq`/`last_seq` are the chunk ids of the document's
    *         first and last token; zero-token docs sit at their offset
    *         with `last_seq = first_seq` (they occupy no tokens but are
    *         pinned to the chunk at their start offset).
    */
  def packOffsets(
      docs: DataFrame,
      idCol: String,
      nTok: Column,
      budget: Long,
      bucketWidth: Long = 1000L): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val id = col(idCol)
    val base = docs.select(id, nTok.cast("long").as("n_tok"))
      .withColumn("bucket", floor(id / lit(bucketWidth)))

    // phase 1: cumsum within each id-range bucket (parallel)
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(id)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val local = base.withColumn("local_end", sum(col("n_tok")).over(wIn))

    // phase 2: exclusive prefix over the per-bucket totals — the single-
    // partition window touches only n/bucketWidth rows, then broadcasts
    val wTot = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bases = base.groupBy(col("bucket"))
      .agg(sum(col("n_tok")).as("bucket_tok"))
      .select(col("bucket"),
        coalesce(sum(col("bucket_tok")).over(wTot), lit(0L)).as("bucket_base"))

    local.join(broadcast(bases), "bucket")
      .select(id, col("n_tok"),
        (col("bucket_base") + col("local_end") - col("n_tok")).as("start_off"),
        (col("bucket_base") + col("local_end")).as("end_off"))
      .withColumn("first_seq", floor(col("start_off") / lit(budget)))
      .withColumn("last_seq",
        greatest(floor((col("end_off") - 1) / lit(budget)), col("first_seq")))
  }

  /** Per-sequence occupancy roll-up over [[packOffsets]]: how many docs
    * START in each chunk and how many tokens of the chunk they contribute
    * — the packing-quality diagnostic (a chunk dominated by one doc vs
    * fragmented across many). Pure hash agg over the offsets frame. */
  def chunkOccupancy(offsets: DataFrame): DataFrame =
    offsets.groupBy(col("first_seq").as("seq_id"))
      .agg(count(lit(1)).as("n_docs_starting"),
        sum(col("n_tok")).as("tok_started"))
}
