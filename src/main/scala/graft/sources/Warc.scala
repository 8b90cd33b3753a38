package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC 1.0) source and sink — the ingestion format of
  * web-scale corpora (Common Crawl ships ~100 TB per snapshot as WARC).
  *
  * Parsing is Content-Length-driven: a record's payload is read as the
  * exact declared octet count, so payloads may contain CRLFs, header-like
  * lines, or other `WARC/1.0` magic without confusing the scan — the
  * parser only searches for the next record AFTER the declared payload.
  * Gzip inputs (including the multi-member per-record gzip real crawls
  * use) are detected by magic bytes and inflated transparently.
  *
  * Scale shape: the WARC file is the unit of parallelism (one task per
  * file, the same contract binaryFile gives S1's corpus scan) — a crawl
  * snapshot is millions of ~1 GB files, so a 1000-executor cluster
  * saturates without any record-level splitting. Parsing is a pure
  * per-file projection: no shuffle, no state, nothing on the driver.
  *
  * The sink emits spec-shaped `response` records over a text column
  * (`Content-Length` = UTF-8 octet length); arbitrary-binary payload
  * writing would need a raw byte sink, which the parquet `binary` column
  * path already covers better (SURVEY §multimodal).
  */
object Warc {

  /** One parsed WARC record; `payload` is the exact declared octet span. */
  final case class WarcRecord(
      warc_type: String,
      target_uri: String,
      record_id: String,
      content_type: String,
      payload: Array[Byte])

  private val Magic = "WARC/1.0".getBytes(StandardCharsets.US_ASCII)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Inflate a (possibly multi-member) gzip stream — `GZIPInputStream`
    * reads concatenated members to EOF, which is exactly the per-record
    * gzip layout crawl archives use. */
  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b), 64 * 1024)
    val out = new ByteArrayOutputStream(math.max(b.length * 4, 64 * 1024))
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }

  /** Parse every record in one WARC file's bytes. Tolerant of arbitrary
    * bytes between records (the spec's two trailing CRLFs, a text sink's
    * extra LF, or leading garbage): scanning always resynchronizes on the
    * next `WARC/1.0` magic after the previous record's declared payload.
    * A record with a malformed header block or a truncated payload is
    * skipped rather than thrown — crawl archives contain both. */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    val data = if (isGzip(bytes)) gunzip(bytes) else bytes
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = indexOf(data, Magic, 0)
    while (pos >= 0) {
      val headerEnd = indexOf(data, "\r\n\r\n".getBytes(StandardCharsets.US_ASCII), pos)
      if (headerEnd < 0) { pos = -1 }
      else {
        val header = new String(data, pos, headerEnd - pos, StandardCharsets.ISO_8859_1)
        val fields = header.split("\r\n").drop(1).flatMap { line =>
          val i = line.indexOf(':')
          if (i <= 0) None
          else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
        }.toMap
        val bodyStart = headerEnd + 4
        // a record is accepted only if the declared payload fits AND is
        // followed by the spec's CRLF trailer (or EOF) — without the
        // trailer check, a mid-stream truncation makes the NEXT record's
        // bytes masquerade as this record's payload and both are lost
        def trailerOk(end: Long): Boolean =
          end == data.length ||
            (end + 2 <= data.length &&
              data(end.toInt) == '\r' && data(end.toInt + 1) == '\n')
        fields.get("content-length").flatMap(s => s.toLongOption) match {
          case Some(len) if bodyStart + len <= data.length && trailerOk(bodyStart + len) =>
            out += WarcRecord(
              fields.getOrElse("warc-type", ""),
              fields.getOrElse("warc-target-uri", ""),
              fields.getOrElse("warc-record-id", ""),
              fields.getOrElse("content-type", ""),
              java.util.Arrays.copyOfRange(data, bodyStart, bodyStart + len.toInt))
            pos = indexOf(data, Magic, bodyStart + len.toInt)
          case _ =>
            // malformed or truncated: resynchronize past this magic
            pos = indexOf(data, Magic, pos + Magic.length)
        }
      }
    }
    out.toSeq
  }

  /** All records of every WARC file under `path` as a DataFrame:
    * `(path, warc_type, target_uri, record_id, content_type, payload,
    * payload_text)`. `payload_text` is the UTF-8 decode — binary payloads
    * keep their exact bytes in `payload`. */
  def warcRecords(spark: SparkSession, path: String,
      glob: String = "part-*"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseWarc(bytes).map(r => (p, r.warc_type, r.target_uri, r.record_id,
          r.content_type, r.payload, new String(r.payload, StandardCharsets.UTF_8)))
      }
      .toDF("path", "warc_type", "target_uri", "record_id", "content_type",
        "payload", "payload_text")
  }

  /** Write `(uriCol, textCol)` rows as WARC 1.0 `response` records, one
    * task per partition, through the text sink (records are
    * `\r\n\r\n`-terminated per spec; the sink's record separator adds one
    * extra LF, which [[parseWarc]]'s resynchronizing scan ignores).
    * Record IDs are deterministic (`urn:md5:` of the URI), and the date
    * is fixed — re-running the sink on the same input produces
    * byte-identical records, which is what makes a WARC round trip
    * oracle-checkable. */
  def writeWarc(df: DataFrame, uriCol: String, textCol: String,
      path: String): Unit = {
    val rec = concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: response\r\n"),
      lit("WARC-Target-URI: "), col(uriCol), lit("\r\n"),
      lit("WARC-Record-ID: <urn:md5:"), md5(col(uriCol).cast("binary")),
      lit(">\r\n"),
      lit("WARC-Date: 2020-01-01T00:00:00Z\r\n"),
      lit("Content-Type: text/plain\r\n"),
      lit("Content-Length: "), octet_length(col(textCol)).cast("string"),
      lit("\r\n\r\n"),
      col(textCol), lit("\r\n"))
    df.select(rec.as("value")).write.mode("overwrite").text(path)
  }
}
