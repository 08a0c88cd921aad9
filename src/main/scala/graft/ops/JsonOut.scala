package graft.ops

/** The one JSON string-escape used by every artifact-writing main
  * (Verify's oracle dump, ImporterMain's K6 result line): backslash,
  * quote, and ALL control chars (<0x20). Hand-interpolating a db name
  * or builder-authored SQL into JSON without it emits an unparseable
  * artifact the moment the value carries a quote (r15 VERDICT #5). */
object JsonOut {
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
