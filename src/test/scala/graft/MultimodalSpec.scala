package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("syntheticAssets: deterministic, schema-conformant, 16-byte md5 blocks") {
    val a1 = Multimodal.syntheticAssets(spark, 9)
    val a2 = Multimodal.syntheticAssets(spark, 9)
    assert(a1.schema === a2.schema)
    val lens = a1.select(length($"content").as("l")).distinct().as[Int].collect()
    assert(lens.toSeq === Seq(8 * 16), "8 blocks x 16 md5 bytes")
    val c1 = a1.select($"asset_id", md5($"content")).as[(Long, String)].collect().toMap
    val c2 = a2.select($"asset_id", md5($"content")).as[(Long, String)].collect().toMap
    assert(c1 === c2, "payloads must be reproducible")
    val mods = a1.select($"modality").distinct().as[String].collect().toSet
    assert(mods === Set("image", "audio", "video"))
  }

  test("decodeStub: fixed-width features in [0,1), deterministic (STUB contract)") {
    val feats = Multimodal.decodeStub(Multimodal.syntheticAssets(spark, 6), dims = 12)
      .select($"asset_id", $"features").as[(Long, Seq[Double])].collect().toMap
    assert(feats.values.forall(_.length === 12))
    assert(feats.values.flatten.forall(v => v >= 0.0 && v < 1.0))
    val again = Multimodal.decodeStub(Multimodal.syntheticAssets(spark, 6), dims = 12)
      .select($"asset_id", $"features").as[(Long, Seq[Double])].collect().toMap
    assert(feats === again)
  }

  test("sampleFrames: correct frame count, size, and byte content") {
    val assets = Multimodal.syntheticAssets(spark, 2) // 128-byte payloads
    val frames = Multimodal.sampleFrames(assets, frameSize = 32, stride = 32)
    val perAsset = frames.groupBy($"asset_id").count().as[(Long, Long)].collect().toMap
    assert(perAsset.values.forall(_ === 4L), "128/32 = 4 non-overlapping frames")
    assert(frames.select(length($"frame_bytes")).distinct().as[Int].collect().toSeq === Seq(32))
    // overlapping stride
    val overlapped = Multimodal.sampleFrames(assets, frameSize = 32, stride = 16)
    assert(overlapped.groupBy($"asset_id").count().as[(Long, Long)].collect()
      .forall(_._2 === 7L), "(128-32)/16+1 = 7")
    // frame 0 equals the payload's first 32 bytes
    val f0 = frames.filter($"asset_id" === 0 && $"frame_no" === 0)
      .select(md5($"frame_bytes")).as[String].head()
    val direct = assets.filter($"asset_id" === 0)
      .select(md5(expr("substring(content, 1, 32)"))).as[String].head()
    assert(f0 === direct)
  }

  test("resizeStub: exact w*h*3 output bytes, meta updated, deterministic (STUB contract)") {
    val out = Multimodal.resizeStub(Multimodal.syntheticAssets(spark, 5), w = 4, h = 3)
    val lens = out.select(length($"resized")).distinct().as[Int].collect().toSeq
    assert(lens === Seq(4 * 3 * 3), "RGB24 byte budget must be exact")
    val dims = out.select($"meta.declared_w", $"meta.declared_h")
      .distinct().as[(Int, Int)].collect().toSeq
    assert(dims === Seq((4, 3)))
    val a = out.select($"asset_id", md5($"resized")).as[(Long, String)].collect().toMap
    val b = Multimodal.resizeStub(Multimodal.syntheticAssets(spark, 5), 4, 3)
      .select($"asset_id", md5($"resized")).as[(Long, String)].collect().toMap
    assert(a === b)
    // modality and payload untouched
    assert(out.columns.contains("content") && out.columns.contains("modality"))
  }

  test("featureStats: one row per modality, positive norms") {
    val stats = Multimodal.featureStats(Multimodal.syntheticAssets(spark, 30))
      .as[(String, Long, Double)].collect()
    assert(stats.length === 3)
    assert(stats.map(_._2).sum === 30)
    assert(stats.forall(_._3 > 0.0))
  }
}
