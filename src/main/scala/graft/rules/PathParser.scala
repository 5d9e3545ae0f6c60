package graft.rules

/** Dot-path parser: `a.b.c`, with bracket-quoted segments for keys that
  * contain dots or quotes — `a["x.y"].z`, escapes `\"` and `\\` inside
  * quotes (reference: crates/rulemorph/src/path.rs:28-183 semantics).
  */
object PathParser {

  final case class PathError(message: String) extends RuntimeException(message)

  /** Token-aware path form: keys vs numeric `[i]` indexes are distinct
    * (the reference's PathToken, path.rs) — object-only consumers
    * (object_unflatten) reject Index tokens. */
  sealed trait PToken
  final case class PKey(key: String) extends PToken
  final case class PIdx(index: Int) extends PToken

  def parseTokens(path: String): Seq[PToken] = {
    if (path.isEmpty) return Nil
    val out = Seq.newBuilder[PToken]
    val n = path.length
    var i = 0
    var expectSegment = true
    while (i < n) {
      path.charAt(i) match {
        case '[' if i + 1 < n && path.charAt(i + 1).isDigit =>
          var j = i + 1
          while (j < n && path.charAt(j).isDigit) j += 1
          if (j >= n || path.charAt(j) != ']')
            throw PathError(s"expected ']' after index in path: $path")
          out += PIdx(path.substring(i + 1, j).toInt)
          i = j + 1
          expectSegment = false
        case '[' =>
          if (i + 1 >= n || path.charAt(i + 1) != '"')
            throw PathError(s"expected '\"' after '[' in path: $path")
          i += 2
          val sb = new StringBuilder
          var closed = false
          while (i < n && !closed) {
            path.charAt(i) match {
              case '\\' if i + 1 < n =>
                sb.append(path.charAt(i + 1)); i += 2
              case '"' => closed = true; i += 1
              case c => sb.append(c); i += 1
            }
          }
          if (!closed) throw PathError(s"unterminated quoted segment in path: $path")
          if (i >= n || path.charAt(i) != ']')
            throw PathError(s"expected ']' after quoted segment in path: $path")
          i += 1
          out += PKey(sb.toString)
          expectSegment = false
        case '.' =>
          if (expectSegment) throw PathError(s"empty segment in path: $path")
          i += 1
          expectSegment = true
        case _ =>
          val start = i
          while (i < n && path.charAt(i) != '.' && path.charAt(i) != '[') i += 1
          if (i == start) throw PathError(s"empty segment in path: $path")
          out += PKey(path.substring(start, i))
          expectSegment = false
      }
    }
    if (expectSegment) throw PathError(s"trailing '.' in path: $path")
    out.result()
  }

  /** The reference's format_path_tokens (transform.rs:5118-5150): keys are
    * bracket-quoted IFF they contain a dot; quoted and index segments join
    * without a leading dot. Used by object_flatten to build flat keys. */
  def formatTokens(tokens: Seq[PToken]): String = {
    val sb = new StringBuilder
    for (t <- tokens) t match {
      case PKey(key) if key.contains('.') =>
        sb.append("[\"")
          .append(key.replace("\\", "\\\\").replace("\"", "\\\""))
          .append("\"]")
      case PKey(key) =>
        if (sb.nonEmpty) sb.append('.')
        sb.append(key)
      case PIdx(i) =>
        sb.append('[').append(i).append(']')
    }
    sb.toString
  }

  def parse(path: String): Seq[String] = {
    if (path.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    val n = path.length
    var i = 0
    var expectSegment = true
    while (i < n) {
      path.charAt(i) match {
        case '[' if i + 1 < n && path.charAt(i + 1).isDigit =>
          // numeric index segment: items[0] → segment "0"
          var j = i + 1
          while (j < n && path.charAt(j).isDigit) j += 1
          if (j >= n || path.charAt(j) != ']')
            throw PathError(s"expected ']' after index in path: $path")
          out += path.substring(i + 1, j)
          i = j + 1
          expectSegment = false
        case '[' =>
          if (i + 1 >= n || path.charAt(i + 1) != '"')
            throw PathError(s"expected '\"' after '[' in path: $path")
          i += 2
          val sb = new StringBuilder
          var closed = false
          while (i < n && !closed) {
            path.charAt(i) match {
              case '\\' if i + 1 < n =>
                sb.append(path.charAt(i + 1)); i += 2
              case '"' => closed = true; i += 1
              case c => sb.append(c); i += 1
            }
          }
          if (!closed) throw PathError(s"unterminated quoted segment in path: $path")
          if (i >= n || path.charAt(i) != ']')
            throw PathError(s"expected ']' after quoted segment in path: $path")
          i += 1
          out += sb.toString
          expectSegment = false
        case '.' =>
          if (expectSegment) throw PathError(s"empty segment in path: $path")
          i += 1
          expectSegment = true
        case _ =>
          val start = i
          while (i < n && path.charAt(i) != '.' && path.charAt(i) != '[') i += 1
          if (i == start) throw PathError(s"empty segment in path: $path")
          out += path.substring(start, i)
          expectSegment = false
      }
    }
    if (expectSegment) throw PathError(s"trailing '.' in path: $path")
    out.result()
  }

  /** Render a path back to its canonical dotted form (quoting segments that
    * need it). */
  def render(path: Seq[String]): String =
    path.map { seg =>
      if (seg.exists(c => c == '.' || c == '"' || c == '[' || c == ']'))
        "[\"" + seg.replace("\\", "\\\\").replace("\"", "\\\"") + "\"]"
      else seg
    }.mkString(".")
}
