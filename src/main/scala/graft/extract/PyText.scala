package graft.extract

/**
 * Python-string-semantics helpers.
 *
 * The reference extractor is CPython `re` + `str.strip()` over unicode
 * strings (e.g. /root/reference/Converters/computers/dcm.py:9-29,
 * iTuens.py:5-21, computer.py:45-56). Java's `String.trim` and default
 * `\s` are ASCII-only, so byte-identical parity requires reproducing
 * Python's whitespace class explicitly (SURVEY.md §7.5 risk 1).
 */
object PyText {

  /** Exactly the characters CPython's `str.isspace()` / unicode `\s` treat
    * as whitespace: ASCII ws, information separators, NEL, NBSP, and the
    * Unicode Zs/Zl/Zp space separators. */
  def isPySpace(c: Char): Boolean = c match {
    case ' ' | '\t' | '\n' | '\u000B' | '\f' | '\r' => true
    case '\u001C' | '\u001D' | '\u001E' | '\u001F' | '\u0085' => true
    case _ =>
      val t = Character.getType(c)
      t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
      t == Character.PARAGRAPH_SEPARATOR
  }

  /** Regex character-class body matching Python's `\s` on `str`. */
  val WS: String =
    "\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\u1680\\u2000-\\u200A" +
    "\\u2028\\u2029\\u202F\\u205F\\u3000"

  /** Python `str.strip()` (no args): strip Python-whitespace both ends. */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Python `str.strip(chars)`: strip any of `chars` from both ends. */
  def strip(s: String, chars: String): String = {
    var i = 0
    var j = s.length
    while (i < j && chars.indexOf(s.charAt(i)) >= 0) i += 1
    while (j > i && chars.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(i, j)
  }

  /** Python `re.sub(r'\s+', ' ', s)` with unicode semantics. */
  def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var inWs = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isPySpace(c)) { if (!inWs) sb.append(' '); inWs = true }
      else { sb.append(c); inWs = false }
      i += 1
    }
    sb.toString
  }
}
