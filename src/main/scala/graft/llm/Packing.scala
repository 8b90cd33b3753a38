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

  /** Sliding-window chunking of each document's token stream — the
    * retrieval-corpus shape (RAG prep): windows of `chunkSize` tokens
    * every `stride` tokens, so consecutive chunks overlap by
    * `chunkSize − stride`. Chunks are emitted until the last window's end
    * reaches the document end (the final chunk may be shorter); empty
    * documents emit nothing. Pure per-document projection + generator —
    * no shuffle at any scale; the chunk count per doc is
    * 1 + ⌈max(n−chunkSize, 0) / stride⌉.
    *
    * @return (idCol, chunk_id 0-based, start 1-based token offset,
    *          n_tok actual window length, chunk_text space-joined) */
  def slidingChunks(
      docs: DataFrame,
      idCol: String,
      tokens: Column,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    val base = docs.select(col(idCol), tokens.as("ts"))
      .withColumn("n", size(col("ts")))
      .filter(col("n") > 0)
    val lastK = ceil((col("n") - lit(chunkSize)).cast("double") / lit(stride))
      .cast("long")
    base
      .withColumn("chunk_id",
        explode(sequence(lit(0L), greatest(lastK, lit(0L)))))
      .withColumn("start", (col("chunk_id") * lit(stride) + 1).cast("long"))
      .select(col(idCol), col("chunk_id"), col("start"),
        size(slice(col("ts"), col("start").cast("int"), lit(chunkSize)))
          .cast("long").as("n_tok"),
        array_join(slice(col("ts"), col("start").cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Per-stratum token-budget fill — the corpus-mixing primitive: admit
    * each stratum's documents in deterministic md5-of-key order until the
    * stratum's token budget is exhausted ("2 M tokens of German, 1 M of
    * French, ..." — a token RECIPE, where [[graft.ops.Relational.stratifiedHashSample]]
    * is a rate recipe). A document is admitted iff the tokens consumed
    * BEFORE it are under budget, so the realized total overshoots by at
    * most one document — the standard greedy contract, and a pure function
    * of (key, stratum, budget): identical selection on any cluster,
    * partitioning, or engine.
    *
    * One window per stratum (cumsum in hash order). With few strata the
    * window parallelism is the stratum count — for stratum-free global
    * budgeting at scale use [[packOffsets]]'s two-phase decomposition
    * instead. */
  def tokenBudgetSample(
      docs: DataFrame,
      stratumCol: String,
      keyCol: String,
      nTok: Column,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs.select(col(keyCol), col(stratumCol), nTok.cast("long").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") - col("n_tok") < budget)
  }
}
