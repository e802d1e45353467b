package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Stage-[1] artifact writers: the reference persists three files from its
  * HTTP run (/root/reference/src/http_client.py:121 `datos.json`, :135
  * `datos.xml`, :167 `titulo.html`). The writes are driver-side by design —
  * each artifact is one small response body, not a dataset; Spark carries
  * the fetch/extraction (sources/HttpIngest.scala), not the file IO.
  */
object HttpArtifacts {

  def writeText(path: Path, content: String): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.write(path, content.getBytes(StandardCharsets.UTF_8))
  }

  /** `json.dump(..., ensure_ascii=False, indent=2)` fidelity
    * (http_client.py:33-36): 2-space indent, `"k": v` separators, key order
    * preserved (Jackson ObjectNode iterates insertion order), non-ASCII
    * kept raw. Numeric literals render via Jackson's canonical form — the
    * `/get` payload the reference saves contains only strings and objects,
    * so the byte-level contract holds where the reference exercises it.
    */
  def prettyJson(raw: String): String = {
    val sb = new StringBuilder
    render(new ObjectMapper().readTree(raw), 0, sb)
    sb.toString
  }

  private def render(n: JsonNode, depth: Int, sb: StringBuilder): Unit = {
    val pad = "  " * (depth + 1)
    val close = "  " * depth
    if (n.isObject) {
      if (!n.fields().hasNext) { sb.append("{}"); return }
      sb.append("{\n")
      val it = n.fields()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb.append(",\n")
        first = false
        sb.append(pad).append(quote(e.getKey)).append(": ")
        render(e.getValue, depth + 1, sb)
      }
      sb.append("\n").append(close).append("}")
    } else if (n.isArray) {
      if (n.size() == 0) { sb.append("[]"); return }
      sb.append("[\n")
      var i = 0
      while (i < n.size()) {
        if (i > 0) sb.append(",\n")
        sb.append(pad)
        render(n.get(i), depth + 1, sb)
        i += 1
      }
      sb.append("\n").append(close).append("]")
    } else if (n.isTextual) sb.append(quote(n.asText()))
    else sb.append(n.toString) // numbers / booleans / null: compact literals
  }

  /** Python-style string escaping under ensure_ascii=False: short escapes
    * for the common controls, \\u00xx for the rest, everything else raw. */
  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case '\b'          => sb.append("\\b")
      case '\f'          => sb.append("\\f")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append("\"").toString
  }
}
