package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("syntheticAssets: deterministic, schema-conformant; images are real BMPs") {
    val a1 = Multimodal.syntheticAssets(spark, 9)
    val a2 = Multimodal.syntheticAssets(spark, 9)
    assert(a1.schema === a2.schema)
    val lens = a1.select($"modality", length($"content").as("l"))
      .distinct().as[(String, Int)].collect().toMap
    assert(lens("audio") === 8 * 16, "8 blocks x 16 md5 bytes")
    assert(lens("video") === 8 * 16)
    assert(lens("image") === 54 + 8 * 6 * 3, "54-byte BMP header + RGB24 pixels")
    val c1 = a1.select($"asset_id", md5($"content")).as[(Long, String)].collect().toMap
    val c2 = a2.select($"asset_id", md5($"content")).as[(Long, String)].collect().toMap
    assert(c1 === c2, "payloads must be reproducible")
    val mods = a1.select($"modality").distinct().as[String].collect().toSet
    assert(mods === Set("image", "audio", "video"))
  }

  test("bmp_decode: golden bytes — bottom-up row flip, padding, BGR→RGB, invalid→NULL") {
    // 2x2 top-down RGB: (255,0,0) (0,255,0) / (0,0,255) (10,20,30)
    val rgb = Array[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 10, 20, 30)
    val bmp = graft.expr.BmpDecode.encode(2, 2, rgb)
    // the encoder writes bottom-up rows with 2-byte padding (2*3=6 → 8)
    assert(bmp.length === 54 + 2 * 8)
    val decoded = graft.expr.BmpDecode.compute(bmp)
    assert(decoded != null)
    assert(decoded.getInt(0) === 2 && decoded.getInt(1) === 2)
    assert(decoded.getBinary(2).toSeq === rgb.toSeq, "decode(encode(x)) == x")

    // expression path incl. null for non-BMP payloads
    val df = Seq(
      (1L, bmp), (2L, Array[Byte](1, 2, 3)), (3L, "BMnot-a-real-header-x".getBytes)
    ).toDF("id", "content")
    val got = df.select($"id", graft.exprapi.bmpDecode($"content").as("img"))
      .select($"id", $"img".isNull.as("bad"), $"img.w", $"img.h")
      .as[(Long, Boolean, Option[Int], Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((false, Some(2), Some(2))))
    assert(got(2L)._1 === true)
    assert(got(3L)._1 === true)
    // channel means over the golden pixels: r=(255+10)/4, g=(255+20)/4, b=(255+30)/4
    val means = df.filter($"id" === 1)
      .select(graft.exprapi.rgbMeans(graft.exprapi.bmpDecode($"content")("rgb")).as("m"))
      .as[Seq[Double]].head()
    assert(means.take(3) === Seq(265.0 / 4, 275.0 / 4, 285.0 / 4))
    val wantLuma = (299L * 265 + 587L * 275 + 114L * 285).toDouble / (1000.0 * 4)
    assert(math.abs(means(3) - wantLuma) < 1e-12)
  }

  test("decodeFeatures: REAL decode on every image asset; stub only for audio/video") {
    val out = Multimodal.decodeFeatures(Multimodal.syntheticAssets(spark, 30))
    val images = out.filter($"modality" === "image")
    assert(images.filter($"img".isNull).count() === 0,
      "every synthetic image must decode as a real BMP")
    val dims = images.select($"img.w", $"img.h").distinct().as[(Int, Int)].collect().toSeq
    assert(dims === Seq((Multimodal.SyntheticImageW, Multimodal.SyntheticImageH)))
    // image features are channel means of real pixels: 4 values in [0,255]
    val feats = images.select($"features").as[Seq[Double]].collect()
    assert(feats.forall(f => f.length === 4 && f.forall(v => v >= 0.0 && v <= 255.0)))
    // non-image features keep the declared stub contract
    val stub = out.filter($"modality" =!= "image").select($"features").as[Seq[Double]].collect()
    assert(stub.forall(f => f.length === 16 && f.forall(v => v >= 0.0 && v < 1.0)))
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
    // audio/video assets keep the 128-byte md5 payloads
    val assets = Multimodal.syntheticAssets(spark, 6).filter($"modality" =!= "image")
    val frames = Multimodal.sampleFrames(assets, frameSize = 32, stride = 32)
    val perAsset = frames.groupBy($"asset_id").count().as[(Long, Long)].collect().toMap
    assert(perAsset.values.forall(_ === 4L), "128/32 = 4 non-overlapping frames")
    assert(frames.select(length($"frame_bytes")).distinct().as[Int].collect().toSeq === Seq(32))
    // overlapping stride
    val overlapped = Multimodal.sampleFrames(assets, frameSize = 32, stride = 16)
    assert(overlapped.groupBy($"asset_id").count().as[(Long, Long)].collect()
      .forall(_._2 === 7L), "(128-32)/16+1 = 7")
    // frame 0 equals the payload's first 32 bytes
    val f0 = frames.filter($"asset_id" === 1 && $"frame_no" === 0)
      .select(md5($"frame_bytes")).as[String].head()
    val direct = assets.filter($"asset_id" === 1)
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

  test("featureStats: one row per modality, every image decoded, positive norms") {
    val stats = Multimodal.featureStats(Multimodal.syntheticAssets(spark, 30))
      .as[(String, Long, Long, Double)].collect()
    assert(stats.length === 3)
    assert(stats.map(_._2).sum === 30)
    assert(stats.forall(_._4 > 0.0))
    val byMod = stats.map(s => s._1 -> s).toMap
    assert(byMod("image")._3 === byMod("image")._2, "n_decoded == n_assets for images")
    assert(byMod("audio")._3 === 0L && byMod("video")._3 === 0L)
  }
}
