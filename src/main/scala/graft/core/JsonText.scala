package graft.core

/** The one JSON string escaper for driver-parsed artifacts (Verify's
  * oracle_sql.json / query_names.json, Bench's error lines). Backslash,
  * quote, and ALL control chars (<0x20) are escaped — a tab or CR in
  * builder-authored SQL would otherwise make the driver's json.load fail
  * and silently zero the round's correctness. Two hand-rolled escapers
  * drifted once (Bench flattened control chars to spaces); shared so the
  * semantics cannot fork again.
  */
object JsonText {
  /** `s` as a quoted JSON string literal. */
  def escape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
