package graft.ingest

import java.util.regex.Pattern

/** Deterministic html -> text extraction (SURVEY.md §7.0.6). This is the
  * frozen per-row invariant of the corpus: the synthesizer constructs html
  * such that `extract(html) == text` byte-identically (tested per row).
  *
  * Spec (applied in this exact order):
  *  1. drop <script ...>...</script> and <style ...>...</style> blocks
  *     (case-insensitive, non-greedy, spanning newlines);
  *  2. drop HTML comments <!-- ... -->;
  *  3. replace every remaining tag <...> with a single space;
  *  4. decode entities: &amp; &lt; &gt; &quot; &apos; &#39; &nbsp; and
  *     numeric (decimal &#NNN; / hex &#xHH;) -- after tag stripping, so
  *     decoded '<'/'>' are never re-parsed as tags;
  *  5. collapse all whitespace runs to one ASCII space and trim.
  */
object TextExtract {

  private val ScriptStyle = Pattern.compile(
    "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>")
  private val Comment = Pattern.compile("(?s)<!--.*?-->")
  private val Tag = Pattern.compile("<[^>]*>")
  private val NumericDec = Pattern.compile("&#(\\d{1,7});")
  private val NumericHex = Pattern.compile("&#[xX]([0-9a-fA-F]{1,6});")
  private val Whitespace = Pattern.compile("\\s+")

  def extract(html: String): String = {
    var s = ScriptStyle.matcher(html).replaceAll("")
    s = Comment.matcher(s).replaceAll("")
    s = Tag.matcher(s).replaceAll(" ")
    s = decodeEntities(s)
    s = Whitespace.matcher(s).replaceAll(" ")
    s.trim
  }

  private def decodeEntities(s: String): String = {
    var r = s
    r = replaceNumeric(r)
    r = r.replace("&nbsp;", " ")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&#39;", "'")
      .replace("&amp;", "&") // last, so "&amp;lt;" -> "&lt;" (literal)
    r
  }

  private def replaceNumeric(s: String): String = {
    val afterDec = {
      val m = NumericDec.matcher(s)
      val sb = new java.lang.StringBuilder
      while (m.find()) {
        val cp = java.lang.Long.parseLong(m.group(1))
        val rep = if (cp > 0 && cp <= Character.MAX_CODE_POINT)
          new String(Character.toChars(cp.toInt)) else ""
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
      }
      m.appendTail(sb)
      sb.toString
    }
    val m = NumericHex.matcher(afterDec)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val cp = java.lang.Long.parseLong(m.group(1), 16)
      val rep = if (cp > 0 && cp <= Character.MAX_CODE_POINT)
        new String(Character.toChars(cp.toInt)) else ""
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }
}
