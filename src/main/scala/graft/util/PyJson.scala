package graft.util

/** Minimal JSON encoder reproducing Python's
  * `json.dumps(obj, ensure_ascii=True)` byte format, which is the
  * reference's JSONL line format (reference: parser.py:294,316-321;
  * docs/output-contract.md:156-227 mandates ensure_ascii + LF endings).
  *
  * Rules matched:
  *  - separators `", "` and `": "` (Python defaults without indent)
  *  - `"` and `\` escaped; \b \t \n \f \r short escapes
  *  - every char outside 0x20..0x7E emitted as lowercase `\uXXXX`
  *    (UTF-16 code units, so astral chars become surrogate pairs —
  *    exactly like CPython's C encoder)
  *
  * Used by the per-thread JSONL sink so routed files are byte-equal to
  * the reference, and by tests that diff golden parsed.jsonl files.
  */
object PyJson {

  def str(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case _ =>
          if (c < 0x20 || c > 0x7e) sb.append(f"\\u${c.toInt}%04x")
          else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  def strOrNull(s: String): String = if (s == null) "null" else str(s)

  def arr(xs: Seq[String]): String =
    xs.map(str).mkString("[", ", ", "]")

  /** One already-encoded key/value object with Python separators. */
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${str(k)}: $v" }.mkString("{", ", ", "}")
}
