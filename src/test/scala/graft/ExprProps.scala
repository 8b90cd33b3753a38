package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.expr.{Int8DotProduct, MinHashSignature, QuantizedDotProduct, SimHash64, WinnowFingerprints, WordShingles}

/** Property-based checks (SURVEY §5.4) of the native expressions' compute
  * kernels as PURE functions — no SparkSession, so hundreds of generated
  * cases run in milliseconds. Column-level equivalence with the HOF
  * formulations is covered separately in the suite specs.
  */
object ExprProps extends Properties("graft.expr") {

  private val token: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val tokens: Gen[List[String]] = Gen.listOfN(30, token).flatMap(l =>
    Gen.choose(0, 30).map(l.take))

  private def arr(ts: Seq[String]) =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])
  private def strings(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  private def longs(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[Long] =
    (0 until a.numElements()).map(a.getLong)

  // --- word_shingles ------------------------------------------------------

  property("word_shingles == sliding-window model") =
    forAll(tokens, Gen.choose(1, 5)) { (ts, w) =>
      val got = strings(WordShingles.compute(arr(ts), w))
      val want = if (ts.length < w) Seq.empty
        else ts.sliding(w).map(_.mkString(" ")).toSeq
      got == want
    }

  // --- minhash_sig --------------------------------------------------------

  property("minhash_sig: length k, shuffle-invariant, deterministic") =
    forAll(tokens, Gen.choose(1, 12), Gen.choose(0L, Long.MaxValue)) { (ts, k, seed) =>
      val a = longs(MinHashSignature.compute(arr(ts), k))
      val shuffled = new scala.util.Random(seed).shuffle(ts)
      val b = longs(MinHashSignature.compute(arr(shuffled), k))
      a.length == k && a == b
    }

  property("minhash_sig: adding elements never increases any minimum") =
    forAll(tokens, token, Gen.choose(1, 8)) { (ts, extra, k) =>
      val base = longs(MinHashSignature.compute(arr(ts), k))
      val more = longs(MinHashSignature.compute(arr(ts :+ extra), k))
      base.zip(more).forall { case (b, m) => m <= b }
    }

  // --- simhash64 ----------------------------------------------------------

  property("simhash64: deterministic; hamming(a,a)=0; bounded by 64") =
    forAll(tokens, tokens) { (a, b) =>
      val ha = SimHash64.compute(arr(a))
      val hb = SimHash64.compute(arr(b))
      SimHash64.compute(arr(a)) == ha &&
        SimHash64.hamming(ha, ha) == 0 &&
        SimHash64.hamming(ha, hb) >= 0 && SimHash64.hamming(ha, hb) <= 64
    }

  // --- quantized_dot ------------------------------------------------------

  private val floats: Gen[List[Float]] =
    Gen.listOfN(16, Gen.choose(-4.0f, 4.0f))

  property("quantized_dot == per-element floor model (order-free, exact)") =
    forAll(floats, floats) { (a, b) =>
      val ad = new GenericArrayData(a.toArray[Any])
      val bd = new GenericArrayData(b.toArray[Any])
      val got = QuantizedDotProduct.compute(ad, bd)
      val want = a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e12).toLong }.sum
      got != null && got.longValue == want
    }

  property("quantized_dot: length mismatch is null") =
    forAll(floats, Gen.choose(0, 15)) { (a, n) =>
      val ad = new GenericArrayData(a.toArray[Any])
      val bd = new GenericArrayData(a.take(n).toArray[Any])
      QuantizedDotProduct.compute(ad, bd) == null
    }

  // --- int8_dot -----------------------------------------------------------

  private val bytes: Gen[List[Byte]] =
    Gen.listOfN(16, Gen.choose(-127, 127).map(_.toByte))

  property("int8_dot == integer sum-of-products; symmetric") =
    forAll(bytes, bytes) { (a, b) =>
      val ad = new GenericArrayData(a.toArray[Any])
      val bd = new GenericArrayData(b.toArray[Any])
      val got = Int8DotProduct.compute(ad, bd)
      val want = a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
      got != null && got.longValue == want &&
        Int8DotProduct.compute(bd, ad).longValue == want
    }

  // --- winnow_fps ---------------------------------------------------------

  private val asciiText: Gen[String] =
    Gen.listOfN(80, Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.const(' ')))
      .map(_.mkString)

  private def fps(s: String, k: Int, w: Int): Set[Long] = {
    val a = WinnowFingerprints.compute(UTF8String.fromString(s), k, w)
    (0 until a.numElements()).map(a.getLong).toSet
  }

  property("winnow_fps: deterministic; short input empty; nonempty past k+w-1") =
    forAll(asciiText, Gen.choose(2, 8), Gen.choose(1, 5)) { (s, k, w) =>
      val a = fps(s, k, w)
      a == fps(s, k, w) &&
        (s.length >= k + w - 1) == a.nonEmpty
    }

  property("winnow_fps guarantee: shared substring >= k+w-1 chars => shared fingerprint") =
    forAll(asciiText, asciiText, asciiText, Gen.choose(2, 6), Gen.choose(1, 4)) {
      (prefixA, prefixB, shared0, k, w) =>
        // pad the shared block to the guarantee length
        val shared = (shared0 + "zqxjvzqxjvzqxjv").take(math.max(k + w - 1, shared0.length))
        val a = fps(prefixA + shared, k, w)
        val b = fps(prefixB + shared, k, w)
        a.intersect(b).nonEmpty
    }

  // --- media decoders (BMP / WAV / Y4M round-trips + fuzz) ----------------

  private val rawBytes: Gen[Array[Byte]] =
    Gen.choose(0, 256).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127))
      .map(_.map(_.toByte).toArray))

  property("bmp_decode(encode(w,h,rgb)) round-trips exactly") =
    forAll(Gen.choose(1, 9), Gen.choose(1, 9), Gen.long) { (w, h, seed) =>
      val rgb = Array.tabulate[Byte](w * h * 3)(i => ((seed + i * 31) & 0xff).toByte)
      val row = expr.BmpDecode.compute(expr.BmpDecode.encode(w, h, rgb))
      row != null && row.getInt(0) == w && row.getInt(1) == h &&
        row.getBinary(2).toSeq == rgb.toSeq
    }

  property("wav_decode(encode(ch,rate,pcm)) round-trips exactly") =
    forAll(Gen.choose(1, 4), Gen.choose(8000, 48000), Gen.choose(0, 40), Gen.long) {
      (ch, rate, frames, seed) =>
        val pcm = Array.tabulate[Byte](frames * ch * 2)(i => ((seed ^ (i * 131)) & 0xff).toByte)
        val row = expr.WavDecode.compute(expr.WavDecode.encode(ch, rate, pcm))
        // zero frames is a legal (empty) data chunk — decodes with n_samples=0
        row != null && row.getInt(0) == ch && row.getInt(1) == rate &&
          row.getInt(2) == frames && row.getBinary(3).toSeq == pcm.toSeq
    }

  property("y4m_decode(encode(w,h,f,y)) round-trips exactly") =
    forAll(Gen.choose(1, 8), Gen.choose(1, 8), Gen.choose(1, 4), Gen.long) {
      (w, h, f, seed) =>
        val y = Array.tabulate[Byte](f * w * h)(i => ((seed + i * 17) & 0xff).toByte)
        val row = expr.Y4mDecode.compute(expr.Y4mDecode.encode(w, h, f, y))
        row != null && row.getInt(0) == w && row.getInt(1) == h &&
          row.getInt(2) == f && row.getBinary(3).toSeq == y.toSeq
    }

  property("decoders never throw on arbitrary bytes (reject, don't crash)") =
    forAll(rawBytes) { bytes =>
      expr.BmpDecode.compute(bytes) // any result ok — must not throw
      expr.WavDecode.compute(bytes)
      expr.Y4mDecode.compute(bytes)
      true
    }

  // --- porter_stem / bpe_encode kernels on arbitrary unicode --------------

  private val anyString: Gen[String] = Gen.oneOf(
    Gen.alphaLowerStr,
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.choose(0, 0x10FFFF).suchThat(cp =>
      Character.isValidCodePoint(cp) && !Character.isSurrogate(cp.toChar)))
      .map(_.flatMap(Character.toChars(_).toSeq).mkString))

  property("porter_stem: never throws, never lengthens, stable on its own output domain") =
    forAll(anyString) { s =>
      val out = expr.PorterStem.stem(s)
      out != null && out.length <= math.max(s.length, 2)
    }

  property("porter_stem: total on adversarial 'y' runs (no stack overflow)") = {
    // a 200k-'y' token overflows a recursive cons(i) = !cons(i-1); the
    // iterative parity walk must stay total with any prefix
    Seq("y" * 200000, "a" + "y" * 200000, "b" + "y" * 200000)
      .forall(w => expr.PorterStem.stem(w) != null)
  }

  property("bpe_encode: concatenated units reconstruct the input exactly (any merges)") =
    forAll(anyString, Gen.listOf(Gen.zip(Gen.alphaLowerStr, Gen.alphaLowerStr))) {
      (s, merges) =>
        val ranks = new java.util.HashMap[String, Integer]
        merges.zipWithIndex.foreach { case ((a, b), i) =>
          ranks.putIfAbsent(expr.BpeEncode.pairKey(a, b), Integer.valueOf(i))
        }
        val out = expr.BpeEncode.compute(arr(Seq(s)), ranks)
        // merging only ever FUSES adjacent units — the byte stream is invariant
        strings(out).mkString == s
    }

  // --- label rule (P7: the 1-year window, acq_etl_code.scala:96) ----------

  property("label window [0,365) matches the reference IF-rule at boundaries") =
    forAll(Gen.choose(-1000, 1000)) { diff =>
      val engine = diff >= 0 && diff < 365
      val reference = if (diff < 365 && diff >= 0) 1 else 0 // IF(diff<365 AND diff>=0,1,0)
      engine == (reference == 1) &&
        !(diff == 365 && engine) && !(diff == -1 && engine) &&
        (diff != 0 || engine) && (diff != 364 || engine)
    }
}
