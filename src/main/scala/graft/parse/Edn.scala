package graft.parse

import graft.model.CommandMap

/** Minimal EDN reader for the subset the reference uses
  * (maps, vectors, keywords, strings, numbers, symbols/booleans —
  * reference `index.clj` / `~/.db_config`, src/db_loader.clj:67-84,269-292).
  *
  * Driver-side only: sidecar files are tiny (one per log folder), so parsing
  * happens on the driver and the result is broadcast into the uuid join (J6).
  */
object Edn {

  sealed trait Value
  final case class EMap(entries: Vector[(Value, Value)]) extends Value
  final case class EVector(items: Vector[Value]) extends Value
  final case class EKeyword(name: String) extends Value
  final case class EString(value: String) extends Value
  final case class ENumber(value: String) extends Value
  final case class ESymbol(name: String) extends Value

  /** Render any EDN value as the plain string the EAV tables store. */
  def render(v: Value): String = v match {
    case EMap(es) => es.map { case (k, vv) => s"${render(k)} ${render(vv)}" }
      .mkString("{", ", ", "}")
    case EVector(is) => is.map(render).mkString("[", " ", "]")
    case EKeyword(n) => n
    case EString(s)  => s
    case ENumber(n)  => n
    case ESymbol(n)  => n
  }

  final class ParseError(msg: String) extends RuntimeException(msg)

  def parse(input: String): Value = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    // trailing garbage (or a second value) means the file is corrupt —
    // silently returning the first value would hide it
    if (!p.atEnd) throw new ParseError(
      s"trailing content after EDN value at offset ${p.offset}")
    v
  }

  private final class Parser(s: String) {
    private var i = 0

    def atEnd: Boolean = i >= s.length
    def offset: Int = i

    def skipWs(): Unit = {
      while (i < s.length && (s(i).isWhitespace || s(i) == ',' || s(i) == ';')) {
        if (s(i) == ';') { while (i < s.length && s(i) != '\n') i += 1 }
        else i += 1
      }
    }

    def parseValue(): Value = {
      skipWs()
      if (i >= s.length) throw new ParseError("unexpected end of input")
      s(i) match {
        case '{' => i += 1; parseMap()
        case '[' => i += 1; parseVector()
        case '"' => i += 1; parseString()
        case ':' => i += 1; EKeyword(readToken())
        case c if c.isDigit || c == '-' && i + 1 < s.length && s(i + 1).isDigit =>
          ENumber(readToken())
        case _ => ESymbol(readToken())
      }
    }

    private def parseMap(): EMap = {
      val es = Vector.newBuilder[(Value, Value)]
      skipWs()
      while (i < s.length && s(i) != '}') {
        val k = parseValue()
        val v = parseValue()
        es += ((k, v))
        skipWs()
      }
      if (i >= s.length) throw new ParseError("unterminated map")
      i += 1
      EMap(es.result())
    }

    private def parseVector(): EVector = {
      val is = Vector.newBuilder[Value]
      skipWs()
      while (i < s.length && s(i) != ']') {
        is += parseValue()
        skipWs()
      }
      if (i >= s.length) throw new ParseError("unterminated vector")
      i += 1
      EVector(is.result())
    }

    private def parseString(): EString = {
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\' && i + 1 < s.length) {
          i += 1
          sb += (s(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case c => c
          })
        } else sb += s(i)
        i += 1
      }
      if (i >= s.length) throw new ParseError("unterminated string")
      i += 1
      EString(sb.result())
    }

    private def readToken(): String = {
      val start = i
      while (i < s.length && !s(i).isWhitespace &&
        !",{}[]();\"".contains(s(i))) i += 1
      if (i == start) throw new ParseError(s"empty token at $start")
      s.substring(start, i)
    }
  }

  /** Read `{:command-maps [{:uuid …, :argmap {k v, …}}]}` into CommandMaps
    * (reference src/db_loader.clj:273-276).
    */
  def commandMaps(edn: String): Vector[CommandMap] = parse(edn) match {
    case EMap(entries) =>
      entries.collectFirst { case (EKeyword("command-maps"), EVector(cms)) => cms }
        .getOrElse(Vector.empty)
        .collect { case EMap(cm) =>
          val uuid = cm.collectFirst { case (EKeyword("uuid"), v) => render(v) }
          val argmap = cm.collectFirst { case (EKeyword("argmap"), EMap(am)) =>
            am.map { case (k, v) => render(k) -> render(v) }.toMap
          }
          CommandMap(uuid.getOrElse(""), argmap.getOrElse(Map.empty))
        }
        .filter(_.uuid.nonEmpty)
    case _ => Vector.empty
  }
}
