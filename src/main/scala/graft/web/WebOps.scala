package graft.web

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus curation column functions: HTML→text extraction, URL
  * normalization, and registrable-domain grouping — the operators between
  * a WARC scan ([[graft.sources.Warc]]) and the text-quality /
  * dedup stages of a crawl-derived training corpus (the C4 / RefinedWeb
  * shape: extract text, canonicalize URLs, cap documents per domain).
  *
  * Everything here is a pure `Column => Column` projection built from
  * codegen'd built-ins — no UDFs, no shuffle, pushes through the scan like
  * any scalar expression. The regex dialect is kept to the RE2-safe
  * subset ((?is) inline flags, lazy quantifiers, non-capturing groups, no
  * backreferences in patterns OR replacements), so every function has a
  * bit-identical DuckDB spelling for the oracle.
  */
object WebOps {

  /** Extract readable text from HTML: drop comments, `<script>`/`<style>`
    * blocks (their CONTENT is not text — they must go before tag
    * stripping), strip remaining tags to a space, decode the six
    * most-common entities (`&amp;` last, or it would re-introduce
    * entities), collapse whitespace. This is the deterministic
    * trafilatura-lite step of crawl pipelines — boilerplate *scoring*
    * (nav/footer removal) is a separate quality signal, not part of the
    * mechanical extraction. */
  def htmlToText(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComments, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val unescaped = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"
    ).foldLeft(noTags) { case (acc, (ent, ch)) => replace(acc, lit(ent), lit(ch)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Escape text INTO html (fixture synthesis + the inverse contract of
    * [[htmlToText]]'s entity decode): `&` first, or the escapes would be
    * double-escaped. */
  def escapeHtml(text: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(text) { case (acc, (ch, ent)) => replace(acc, lit(ch), lit(ent)) }

  /** Canonicalize a URL for dedup/grouping: lowercase scheme and host,
    * strip a `www.` prefix, default ports, the fragment, and tracking
    * parameters (`utm_*`, `fbclid`, `gclid`), then tidy dangling `?`/`&`.
    * Two crawls of the same page under tracking-decorated URLs
    * canonicalize to one key — this runs BEFORE exact URL dedup the same
    * way accent folding runs before text dedup.
    *
    * No backreference replacements: tracking params are removed in two
    * passes (param-followed-by-`&` keeps the leading delimiter for the
    * next param; trailing param takes its delimiter with it). */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = regexp_replace(
      regexp_replace(hostport, ":(80|443)$", ""), "^www\\.", "")
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    val noTrack = regexp_replace(
      regexp_replace(rest, "(?:utm_[^&=]*|fbclid|gclid)=[^&]*&", ""),
      "[?&](?:utm_[^&=]*|fbclid|gclid)=[^&]*$", "")
    val tidy = regexp_replace(noTrack, "\\?$", "")
    concat(scheme, lit("://"), host, tidy)
  }

  /** Second-level public suffixes that make the registrable domain three
    * labels instead of two (a bundled slice of the public-suffix list —
    * the full list is a data file swap, not a code change). */
  private val SecondLevelSuffix =
    "(?:co|com|org|net|ac|gov|edu)\\.(?:uk|au|jp|br|in|nz|za)"

  /** The registrable domain (eTLD+1) of a normalized URL's host: the unit
    * crawl pipelines cap, rate, and reputation-score by. `foo.co.uk` →
    * three labels, `foo.com` → two. */
  def registrableDomain(url: Column): Column = {
    val host = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1)
    val threeLabel = regexp_extract(host, "([^.]+\\." + SecondLevelSuffix + ")$", 1)
    when(threeLabel =!= "", threeLabel)
      .otherwise(regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
  }
}
