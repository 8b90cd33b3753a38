package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

class WarcSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def record(typ: String, uri: String, payload: Array[Byte],
      extra: String = ""): Array[Byte] = {
    val h = s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"WARC-Record-ID: <urn:test:$typ>\r\n$extra" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    h.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private val crlfPayload =
    "line1\r\n\r\nWARC/1.0\r\nnot a real header\r\n".getBytes(UTF_8)
  private val unicodePayload = "héllo wörld — ünïcode".getBytes(UTF_8)

  private def goldenFile: Array[Byte] =
    record("warcinfo", "", "software: graft-test\r\n".getBytes(UTF_8)) ++
      record("request", "https://x.test/a",
        "GET /a HTTP/1.1\r\n".getBytes(UTF_8)) ++
      record("response", "https://x.test/a", crlfPayload) ++
      record("response", "https://x.test/b", unicodePayload)

  test("parseWarc: Content-Length-driven scan survives WARC magic inside a payload") {
    val recs = Warc.parseWarc(goldenFile)
    assert(recs.map(_.warc_type) === Seq("warcinfo", "request", "response", "response"))
    val resp = recs.filter(_.warc_type == "response")
    assert(resp.map(_.target_uri) === Seq("https://x.test/a", "https://x.test/b"))
    assert(resp(0).payload === crlfPayload,
      "payload containing CRLFs and a fake WARC/1.0 magic must round-trip exactly")
    assert(new String(resp(1).payload, UTF_8) === "héllo wörld — ünïcode",
      "Content-Length is octets, so multi-byte UTF-8 must slice exactly")
  }

  test("parseWarc: multi-member per-record gzip (the crawl layout) inflates transparently") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    // one gzip member PER RECORD, concatenated — Common Crawl's layout
    val members = Seq(
      record("response", "https://x.test/a", crlfPayload),
      record("response", "https://x.test/b", unicodePayload))
    val bytes = members.map(gz).reduce(_ ++ _)
    val recs = Warc.parseWarc(bytes)
    assert(recs.map(_.target_uri) === Seq("https://x.test/a", "https://x.test/b"))
    assert(recs(1).payload === unicodePayload)
  }

  test("parseWarc: truncated record is skipped, later records still parse") {
    val truncated = record("response", "https://x.test/cut",
      "0123456789".getBytes(UTF_8)).dropRight(14) // cut into the payload
    val recs = Warc.parseWarc(
      truncated ++ record("response", "https://x.test/ok", "fine".getBytes(UTF_8)))
    assert(recs.map(_.target_uri) === Seq("https://x.test/ok"))
  }

  test("writeWarc -> warcRecords round trip preserves uri, octet length, and text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "plain ascii"),
      (2L, "embedded\r\n\r\nWARC/1.0\r\nmagic"),
      (3L, "ünïcode – payload")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    Warc.writeWarc(
      docs.selectExpr("concat('https://corpus.local/doc/', doc_id) AS uri", "text"),
      "uri", "text", dir)
    val back = Warc.warcRecords(s, dir)
      .filter($"warc_type" === "response")
      .selectExpr(
        "CAST(regexp_extract(target_uri, '([0-9]+)$', 1) AS BIGINT) AS doc_id",
        "payload_text AS text", "CAST(octet_length(payload) AS BIGINT) AS n_bytes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val expected = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(1).getBytes(UTF_8).length.toLong))
    assert(back.sortBy(_._1).map(t => (t._1, t._2)) ===
      expected.sortBy(_._1).map(t => (t._1, t._2)))
    assert(back.sortBy(_._1).map(_._3) === expected.sortBy(_._1).map(_._3))
  }
}
