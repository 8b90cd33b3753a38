package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-centroid (Rocchio) classification over embedding columns —
  * the supervised sibling of the IVF cell assignment in
  * [[graft.llm.Similarity]]: class centroids from labeled vectors, then
  * every vector classifies to its nearest centroid by exact integer
  * squared distance.
  *
  * Portability recipe: dims quantize to OFFSET-POSITIVE micro-units
  * (`round((x + offset)·10⁶)` — the constant offset cancels in every
  * distance difference, and keeping values non-negative makes Spark's
  * truncating `div` and DuckDB's flooring `//` agree on the centroid
  * mean), centroids are floor-averaged per (label, dim), and the
  * distance is a BIGINT `zip_with`/`aggregate` fold — codegen'd array
  * math, no UDF, no float anywhere. Argmin breaks ties by label.
  *
  * Scale shape: the fit is a dims×labels aggregate whose output is tiny
  * (|labels|·|dims| rows → |labels| packed arrays); the serve attaches
  * that table to every vector through a BROADCAST hash join on a
  * constant-valued but non-foldable key (Catalyst would fold a literal
  * key's equality away into a nested-loop plan), so the corpus streams
  * once and nothing is quadratic in it.
  */
object Centroid {

  /** The shared fit+score pipeline: per-vector rows scored against every
    * centroid, argmin row marked `rn = 1`. [[classify]] and
    * [[assignCells]] are both one projection away. */
  private def scored(
      emb: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      offset: Double): DataFrame = {
    val q = emb.select(col(idCol), col(labelCol).cast("long").as("label"),
      transform(col(vecCol),
        x => round((x.cast("double") + lit(offset)) * 1e6).cast("long"))
        .as("q"))
    val cent = q
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("nv"))
      .withColumn("c", expr("sv div nv"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cvec"))
      .select(col("label").as("c_label"), col("cvec"))
    // _k is constant 0 yet non-foldable (depends on a column) so the
    // plan stays a BroadcastHashJoin; coalesce maps a NULL (or
    // non-castable) id to 0 too — without it a NULL id made a NULL join
    // key and the row silently vanished from the classification output
    q.withColumn("_k",
        pmod(coalesce(col(idCol).cast("long"), lit(0L)), lit(1L)).cast("int"))
      .join(broadcast(cent
          .withColumn("_k", pmod(coalesce(col("c_label"), lit(0L)),
            lit(1L)).cast("int"))),
        Seq("_k"))
      .withColumn("dist2",
        aggregate(zip_with(col("q"), col("cvec"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x))
      // a ragged vector (length != centroid dim) folds to a NULL dist2 —
      // which would sort FIRST under asc-nulls-first and silently
      // "classify" to the lowest label; exclude it instead (corrupt
      // input visible by absence, the decoder-family contract)
      .filter(col("dist2").isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("dist2"), col("c_label"))))
  }

  def classify(
      emb: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      offset: Double = 1024.0): DataFrame =
    scored(emb, idCol, labelCol, vecCol, offset)
      .filter(col("rn") === 1)
      .select(col(idCol), col("label"), col("c_label").as("pred_label"),
        col("dist2"))

  /** Cell assignment for BLOCKING (hard-negative mining, semantic
    * grouping): each vector with its nearest-centroid cell AND its
    * quantized dims retained, so downstream within-cell pair work can
    * compute exact integer distances without re-deriving the
    * quantization. Same argmin/tie-break as [[classify]]. */
  def assignCells(
      emb: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      offset: Double = 1024.0): DataFrame =
    scored(emb, idCol, labelCol, vecCol, offset)
      .filter(col("rn") === 1)
      .select(col(idCol), col("label"), col("c_label").as("cell"), col("q"))

  /** Cell-size cap with the drop made OBSERVABLE — the family's "no
    * silent caps" rule ([[graft.llm.Dedup.oversizedCells]],
    * simhash's dropped-bucket frame): returns (rows of cells within
    * `maxCellSize`, one `(cell, cell_size)` row per cell the cap
    * dropped). At scale a hot cell silently vanishing from a
    * hard-negative training set is invisible in the output; counting the
    * dropped side makes the recall loss a monitorable quantity, and the
    * diagnostics are lazy — the caller pays only if it executes them. */
  def capCellsWithDiagnostics(
      cells: DataFrame, maxCellSize: Int): (DataFrame, DataFrame) = {
    val counted = cells.withColumn("cn",
      count(lit(1)).over(Window.partitionBy(col("cell"))))
    (counted.filter(col("cn") <= maxCellSize).drop("cn"),
      counted.filter(col("cn") > maxCellSize)
        .groupBy(col("cell"))
        .agg(max(col("cn")).as("cell_size")))
  }
}
