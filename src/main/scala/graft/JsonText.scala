package graft

/** Minimal JSON string quoting shared by every artifact writer ([[Verify]],
  * [[Bench]], [[tools.VerifyOne]]): escapes backslash, quote, and ALL
  * control characters (< 0x20) — a stray tab/CR/ESC in builder-authored SQL
  * or an exception message would otherwise make the driver's `json.load`
  * fail and silently void the round's artifact. One implementation so the
  * escapers cannot drift (round-6 self-review: Bench had grown a partial
  * hand copy).
  */
object JsonText {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
