package graft.multimodal

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star component): image/audio/video as
  * opaque `binary` columns with typed metadata, plus the Spark-side
  * machinery — schema, batch shapes, partitioning, frame sampling — that a
  * real decode stage plugs into.
  *
  * IMPORTANT — the DECODE STEP IS A STUB. This container has no image/audio
  * codecs, so [[decodeStub]] derives deterministic fake features from the
  * bytes (hash-seeded). Everything AROUND the stub is real and tested: the
  * asset schema, binary-column handling (substring slicing, hashing,
  * length), batch featurization shape (fixed-width `array<double>`), and
  * frame-sample explode. Swapping [[decodeStub]] for a codec-backed
  * implementation (e.g. a Pandas-UDF / mapInPandas stage on a PySpark
  * deployment, or a JNI decoder here) changes no schema and no plan shape.
  */
object Multimodal {

  /** Asset table schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("declared_w", IntegerType),
      StructField("declared_h", IntegerType))), nullable = true)))

  /** Deterministic synthetic assets (seeded by id) — stands in for a real
    * binary ingest so the plumbing is testable offline. Payload bytes are
    * repeated md5 blocks of the id: reproducible, incompressible-ish, and
    * size-controllable. */
  def syntheticAssets(spark: SparkSession, n: Int, payloadBlocks: Int = 8): DataFrame =
    spark.range(n.toLong).select(
      col("id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("modality"),
      to_binary(concat_ws("",
        (0 until payloadBlocks).map(b => md5(concat(col("id"), lit(s"_$b")))): _*),
        lit("hex")).as("content"),
      struct(
        lit("synthetic").as("source"),
        lit(64).as("declared_w"),
        lit(64).as("declared_h")).as("meta"))

  /** STUB decode: deterministic pseudo-features from the payload bytes.
    * Real implementation would decode pixels/samples here; the stub keeps
    * the exact output contract (fixed-width `array<double>`, one row per
    * asset, values in [0,1)) while deriving values from `xxhash64` of the
    * bytes + a per-dimension salt. Pure projection — embarrassingly
    * parallel at any scale, no shuffle. */
  def decodeStub(assets: DataFrame, dims: Int = 16): DataFrame =
    assets.withColumn("features",
      transform(sequence(lit(1), lit(dims)),
        i => (pmod(xxhash64(col("content"), i), lit(100000L)).cast("double") / 100000.0)))

  /** STUB resize: the byte-plumbing of an image/video resize stage with
    * the real output contract — a `resized` binary of EXACTLY `w·h·3`
    * bytes (RGB24 shape) and meta updated to the target dimensions — while
    * the pixel math is stubbed (deterministic bytes derived by tiling the
    * md5 of the payload; a codec-backed implementation swaps in without
    * touching schema or plan shape). Pure projection, no shuffle. */
  def resizeStub(assets: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val hexNeeded = w * h * 3 * 2
    val reps = (hexNeeded + 31) / 32 // md5 hex is 32 chars per block
    assets
      .withColumn("resized",
        to_binary(substring(repeat(md5(col("content")), reps), 1, hexNeeded),
          lit("hex")))
      .withColumn("meta", struct(
        col("meta.source").as("source"),
        lit(w).as("declared_w"),
        lit(h).as("declared_h")))
  }

  /** Byte-range frame sampling: every `stride`-th window of `frameSize`
    * bytes, exploded to one row per frame — the batch shape for per-frame
    * feature extraction (video keyframes, audio windows). Binary substring
    * is a codegen'd expression; the explode fans out WITHIN partitions, so
    * parallelism follows the input partitioning. */
  def sampleFrames(assets: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    val nFrames = greatest(
      floor((length(col("content")) - frameSize) / stride) + 1, lit(0L))
    assets
      .select(col("asset_id"), col("modality"), col("content"),
        explode(sequence(lit(0L), nFrames - 1)).as("frame_no"))
      .select(col("asset_id"), col("modality"), col("frame_no"),
        expr(s"substring(content, cast(frame_no * $stride + 1 as int), $frameSize)")
          .as("frame_bytes"))
  }

  /** Per-modality feature batches: decode + fixed-width features, grouped
    * stats as the sanity surface (count, avg feature norm). */
  def featureStats(assets: DataFrame, dims: Int = 16): DataFrame =
    decodeStub(assets, dims)
      .select(col("modality"),
        aggregate(col("features"), lit(0.0), (acc, x) => acc + x * x).as("sq"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_assets"), avg(sqrt(col("sq"))).as("avg_feature_norm"))
}
