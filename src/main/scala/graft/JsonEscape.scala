package graft

/** JSON string-body escaping for the hand-built one-line JSON artifacts
  * the opt-in mains print (Bench totals, Verify oracle/error dumps,
  * ReferenceAls result line). Strings that ride in those lines but are
  * NOT identifier-safe by construction — env/args-controlled paths,
  * builder-authored SQL, exception text — must pass through here: a
  * quote, backslash, or control char would otherwise corrupt both the
  * stdout line and the durable file (ADVICE r12). One shared definition
  * so the three sites cannot drift.
  *
  * Escapes the JSON-mandatory set exactly: backslash, double quote, and
  * all control chars below 0x20 (common ones as their two-char short
  * forms, the rest as \\u00XX). Everything else — including non-ASCII —
  * passes through; the artifacts are written and read as UTF-8.
  */
private[graft] object JsonEscape {
  /** Escaped string BODY (no surrounding quotes — callers add them,
    * matching the interpolation style at each site). */
  def str(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }
}
