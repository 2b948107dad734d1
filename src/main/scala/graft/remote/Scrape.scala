package graft.remote

/** S17 — HTML scrape utilities (reference fdaApprovals/index.js:13-105:
  * parse5 DOM walk filtering `<a href>` links + html-to-text extraction
  * and an announcement-year regex).
  *
  * Regex-tier extraction (no HTML parser dependency): sufficient for the
  * reference's use — link harvesting and rough text for year/title
  * matching, never structured DOM queries.
  */
object Scrape {

  private val HrefRe = """(?is)<a\b[^>]*?href\s*=\s*["']([^"']+)["']""".r
  private val TagRe = """(?s)<[^>]+>""".r
  private val ScriptRe = """(?is)<(script|style)\b.*?</\1>""".r
  private val YearRe = """\b(19|20)\d{2}\b""".r

  /** All href targets, optionally filtered by a substring (the reference
    * filters announcement links by URL pattern).
    */
  def links(html: String, containing: String = ""): Seq[String] =
    HrefRe.findAllMatchIn(ScriptRe.replaceAllIn(html, " "))
      .map(_.group(1)).filter(_.contains(containing)).toSeq

  /** Tag-stripped, whitespace-squashed visible text. */
  def text(html: String): String =
    TagRe.replaceAllIn(ScriptRe.replaceAllIn(html, " "), " ")
      // &amp; decodes LAST: decoding it first would double-decode
      // escaped entities ("&amp;lt;" must yield "&lt;", not "<")
      .replaceAll("&lt;", "<").replaceAll("&gt;", ">").replaceAll("&amp;", "&")
      .replaceAll("\\s+", " ").trim

  /** Consensus year: the year mentioned most often in the text
    * (fdaApprovals/index.js:90-103 takes the announcement-year consensus).
    */
  def consensusYear(html: String): Option[Int] = {
    val years = YearRe.findAllIn(text(html)).toSeq
    if (years.isEmpty) None
    else Some(years.groupBy(identity).toSeq
      .maxBy { case (y, g) => (g.size, -y.toInt) }._1.toInt)
  }
}
