package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage of the FULL SQL-string surface: every expression
  * registered by [[GraftExtensions]] must be callable by name from
  * `spark.sql` with correctly-typed arguments and produce a sane value.
  * (Per-function semantics are pinned in their own suites/props; this
  * guards the registration layer itself — a rename, arity change, or
  * missed injection breaks here first.) */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("the zero-config scalar functions all resolve and evaluate via spark.sql") {
    val row = spark.sql(
      """SELECT
        |  fold_accents('Café naïve')           AS fa,
        |  word_shingles(array('a','b','c'), 2)            AS ws,
        |  minhash_sig(array('x','y'), 4)                  AS mh,
        |  simhash64(array('x','y'))                       AS sh,
        |  quantized_dot(array(CAST(0.5 AS FLOAT)), array(CAST(0.5 AS FLOAT))) AS qd,
        |  winnow_fps('abcdefghij', 3, 4)                  AS wf,
        |  porter_stem(array('running'))                   AS ps,
        |  int8_dot(array(CAST(2 AS TINYINT)), array(CAST(3 AS TINYINT))) AS i8,
        |  bmp_decode(unhex('00'))                         AS bad_bmp,
        |  jpeg_decode(unhex('00'))                        AS bad_jpeg,
        |  wav_decode(unhex('00'))                         AS bad_wav,
        |  y4m_decode(unhex('00'))                         AS bad_y4m,
        |  rgb_means(unhex('FF8000'))                      AS rgb,
        |  pcm_stats(unhex('0040'))                        AS pcm,
        |  byte_stats(unhex('00FF'))                       AS bs
        |""".stripMargin).head()

    assert(row.getString(row.fieldIndex("fa")) === "Cafe naive")
    assert(row.getSeq[String](row.fieldIndex("ws")) === Seq("a b", "b c"))
    assert(row.getSeq[Long](row.fieldIndex("mh")).length === 4)
    assert(!row.isNullAt(row.fieldIndex("sh")))
    assert(!row.isNullAt(row.fieldIndex("qd")))
    assert(row.getSeq[Long](row.fieldIndex("wf")).nonEmpty)
    assert(row.getSeq[String](row.fieldIndex("ps")) === Seq("run"))
    assert(row.getLong(row.fieldIndex("i8")) === 6L)
    // decoders reject garbage as NULL through the SQL path too
    assert(row.isNullAt(row.fieldIndex("bad_bmp")))
    assert(row.isNullAt(row.fieldIndex("bad_jpeg")))
    assert(row.isNullAt(row.fieldIndex("bad_wav")))
    assert(row.isNullAt(row.fieldIndex("bad_y4m")))
    // feature heads over one pixel / one sample / two bytes
    assert(row.getSeq[Double](row.fieldIndex("rgb")).take(3) === Seq(255.0, 128.0, 0.0))
    assert(row.getSeq[Double](row.fieldIndex("pcm"))(2) === 16384.0 / 32768.0)
    assert(row.getSeq[Double](row.fieldIndex("bs")) === Seq(0.5, 0.5, 0.0, 1.0))
  }

  test("wrong arity raises the declared usage error, not a resolution miss") {
    val e = intercept[Exception](spark.sql("SELECT winnow_fps('abc', 3)").head())
    assert(e.getMessage.contains("winnow_fps"), s"got: ${e.getMessage}")
  }

  test("rgb_resize resolves and resizes through the SQL surface") {
    val out = spark.sql(
      "SELECT rgb_resize(unhex('FF0000'), 1, 1, 2, 2) AS r").head().getAs[Array[Byte]](0)
    assert(out.toSeq === Seq[Byte](
      0xFF.toByte, 0, 0, 0xFF.toByte, 0, 0, 0xFF.toByte, 0, 0, 0xFF.toByte, 0, 0))
  }

  test("misra_gries aggregates through the SQL surface") {
    val rows = spark.sql(
      """SELECT misra_gries(v, 2) AS mg FROM (
        |  SELECT explode(array('a','a','a','b','c','a')) AS v
        |)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.size <= 2)
    assert(rows.map(_._1).contains("a"),
      s"the > N/(k+1) item must survive the sketch, got $rows")
  }
}
