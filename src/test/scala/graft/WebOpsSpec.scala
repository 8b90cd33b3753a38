package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.web.WebOps

class WebOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run1(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("x").select(c.as("y")).collect()(0).getString(0)

  test("htmlToText: scripts/styles/comments stripped, tags to spaces, entities decoded, ws collapsed") {
    val html = """<html><!-- note --><head><title>T</title>
      |<style>p { color: red }</style></head>
      |<body><h1>Head</h1><p>a &amp; b &lt;tag&gt; c&#39;s &quot;q&quot;&nbsp;end</p>
      |<script>var s = "<p>not text</p>";</script></body></html>""".stripMargin
    assert(run1(WebOps.htmlToText(col("x")), html) ===
      """T Head a & b <tag> c's "q" end""")
  }

  test("htmlToText(escapeHtml(t)) wrapped in tags round-trips ws-collapsed text") {
    val t = "5 < 6 && 7 > 2, \"quotes\" stay"
    val wrapped = Seq(t).toDF("t")
      .select(concat(lit("<body><p>"), WebOps.escapeHtml(col("t")),
        lit("</p></body>")).as("x"))
      .select(WebOps.htmlToText(col("x")).as("y")).collect()(0).getString(0)
    assert(wrapped === t)
  }

  test("normalizeUrl: case, www, default port, fragment, tracking params") {
    val f = WebOps.normalizeUrl(col("x"))
    assert(run1(f, "HTTPS://WWW.Ex.COM:443/p/1?utm_source=feed&id=2&utm_c=x#frag") ===
      "https://ex.com/p/1?id=2")
    assert(run1(f, "http://ex.com:80/a?fbclid=abc") === "http://ex.com/a")
    assert(run1(f, "https://sub.ex.co.uk/a/b?x=1&gclid=z&y=2") ===
      "https://sub.ex.co.uk/a/b?x=1&y=2")
    assert(run1(f, "https://ex.com/plain") === "https://ex.com/plain")
    assert(run1(f, "https://ex.com/?utm_only=1") === "https://ex.com/")
  }

  test("registrableDomain: eTLD+1 with second-level public suffixes") {
    val f = WebOps.registrableDomain(col("x"))
    assert(run1(f, "https://a.b.ex.com/x") === "ex.com")
    assert(run1(f, "https://news.site.co.uk/x?q=1") === "site.co.uk")
    assert(run1(f, "https://ex.org/") === "ex.org")
    assert(run1(f, "https://deep.sub.gov.au/x") === "sub.gov.au")
  }
}
