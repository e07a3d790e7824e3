package graft.functions

import scala.collection.mutable

/** Parser for the reference's canonical wire format: one event per line as a
  * Python list literal `['Topic', <payload>, 'ISO-ts']` (produced by
  * `fastf1_livetiming`, parsed with `ast.literal_eval` in the reference —
  * /root/reference/monitor_weather.py:181-197, /root/reference/main.py:283-287).
  *
  * This is the one genuinely non-SQL codec in the system (SURVEY §2.2 P1):
  * Python repr differs from JSON in quoting (single quotes), booleans
  * (`True`/`False`), `None`, tuples, and string escapes. We parse the
  * literal directly (recursive descent, no regex games) and re-render the
  * payload as strict JSON so everything downstream is plain
  * `from_json(payload, schema)` — built-in, codegen'd, pushdown-friendly.
  *
  * Performance posture: the parser allocates one StringBuilder per line and
  * runs as a deterministic Scala UDF applied *after* a cheap native
  * `startswith` topic prefilter where possible, so at 100 TB the expensive
  * parse only touches lines that survive pushed-down pruning.
  */
object PyLiteral {

  /** Parsed wire event: topic, payload rendered as JSON (or the raw string
    * for base64 `.z` payloads), event timestamp string.
    */
  final case class WireEvent(topic: String, payload: String, ts: String)

  /** Parse one wire line. Returns null on malformed input (T13 semantics:
    * malformed lines are skipped, counted, never fatal).
    */
  def parseLine(line: String): WireEvent = {
    if (line == null) return null
    val t = line.trim
    if (t.isEmpty || t.charAt(0) != '[') return null
    try {
      val p = new Parser(t)
      p.skipWs()
      val v = p.parseValue()
      p.skipWs()
      if (!p.atEnd) return null
      v match {
        case l: List[_] if l.length == 3 =>
          val topic = l.head match { case s: String => s; case _ => return null }
          val ts = l(2) match { case s: String => s; case _ => return null }
          val payload = l(1) match {
            case s: String => s // .z topics: base64 string, keep raw
            case other     => renderJson(other)
          }
          WireEvent(topic, payload, ts)
        case _ => null
      }
    } catch {
      // ParseError for structural issues; NonFatal as the totality backstop
      // (e.g. malformed \x escapes) — wire lines are untrusted (T13)
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** Convert a full Python literal to a JSON string, null if malformed. */
  def toJson(pyLiteral: String): String = {
    if (pyLiteral == null) return null
    try {
      val p = new Parser(pyLiteral.trim)
      p.skipWs()
      val v = p.parseValue()
      p.skipWs()
      if (!p.atEnd) null else renderJson(v)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  private final class ParseError extends RuntimeException(null, null, false, false)

  /** Recursive-descent parser over Python literal syntax: strings (single or
    * double quoted, standard escapes), ints, floats, True/False/None, lists,
    * tuples, dicts. Mirrors the subset `ast.literal_eval` accepts that the
    * wire format actually uses.
    */
  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def skipWs(): Unit = while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    private def fail(): Nothing = throw new ParseError
    private def peek: Char = if (i < s.length) s.charAt(i) else fail()
    private def next(): Char = { val c = peek; i += 1; c }
    private def expect(c: Char): Unit = if (next() != c) fail()

    def parseValue(): Any = {
      skipWs()
      peek match {
        case '\'' | '"'        => parseString()
        case '{'               => parseDict()
        case '[' | '('         => parseSeq()
        case c if c == 'T'     => literal("True", java.lang.Boolean.TRUE)
        case c if c == 'F'     => literal("False", java.lang.Boolean.FALSE)
        case c if c == 'N'     => literal("None", null)
        case c if c == '-' || c == '+' || c.isDigit || c == '.' => parseNumber()
        case _                 => fail()
      }
    }

    private def literal(word: String, v: Any): Any = {
      if (!s.startsWith(word, i)) fail()
      i += word.length
      v
    }

    private def parseString(): String = {
      val quote = next()
      if (quote != '\'' && quote != '"') fail()
      val sb = new StringBuilder
      while (true) {
        if (atEnd) fail()
        val c = next()
        if (c == quote) return sb.toString()
        else if (c == '\\') {
          val e = next()
          e match {
            case 'n'  => sb.append('\n')
            case 't'  => sb.append('\t')
            case 'r'  => sb.append('\r')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case '0'  => sb.append('\u0000')
            case '\\' => sb.append('\\')
            case '\'' => sb.append('\'')
            case '"'  => sb.append('"')
            case 'x' =>
              val h = s.substring(i, math.min(i + 2, s.length)); i += 2
              sb.append(Integer.parseInt(h, 16).toChar)
            case 'u' =>
              val h = s.substring(i, math.min(i + 4, s.length)); i += 4
              sb.append(Integer.parseInt(h, 16).toChar)
            case other => sb.append('\\').append(other) // python keeps unknown escapes
          }
        } else sb.append(c)
      }
      sb.toString()
    }

    private def parseNumber(): Any = {
      val start = i
      if (peek == '-' || peek == '+') i += 1
      var isFloat = false
      while (!atEnd && (peek.isDigit || peek == '.' || peek == 'e' || peek == 'E' ||
          ((peek == '-' || peek == '+') && (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) {
        if (peek == '.' || peek == 'e' || peek == 'E') isFloat = true
        i += 1
      }
      val tok = s.substring(start, i)
      if (tok.isEmpty || tok == "-" || tok == "+") fail()
      try {
        if (isFloat) java.lang.Double.parseDouble(tok)
        else java.lang.Long.parseLong(tok)
      } catch { case _: NumberFormatException => fail() }
    }

    private def parseSeq(): List[Any] = {
      val open = next()
      val close = if (open == '[') ']' else ')'
      val buf = mutable.ListBuffer.empty[Any]
      skipWs()
      if (!atEnd && peek == close) { i += 1; return buf.toList }
      while (true) {
        buf += parseValue()
        skipWs()
        next() match {
          case `close` => return buf.toList
          case ','     => skipWs(); if (!atEnd && peek == close) { i += 1; return buf.toList }
          case _       => fail()
        }
      }
      buf.toList
    }

    private def parseDict(): mutable.LinkedHashMap[Any, Any] = {
      expect('{')
      val m = mutable.LinkedHashMap.empty[Any, Any]
      skipWs()
      if (!atEnd && peek == '}') { i += 1; return m }
      while (true) {
        val k = parseValue()
        skipWs(); expect(':')
        val v = parseValue()
        m.put(k, v)
        skipWs()
        next() match {
          case '}' => return m
          case ',' => skipWs(); if (!atEnd && peek == '}') { i += 1; return m }
          case _   => fail()
        }
      }
      m
    }
  }

  /** Render a parsed Python value as strict JSON. Dict keys become strings
    * (the wire format only uses string/int keys).
    */
  def renderJson(v: Any): String = {
    val sb = new StringBuilder(64)
    render(v, sb)
    sb.toString()
  }

  private def render(v: Any, sb: StringBuilder): Unit = v match {
    case null                 => sb.append("null")
    case b: java.lang.Boolean => sb.append(if (b) "true" else "false")
    case l: java.lang.Long    => sb.append(l.toString)
    case d: java.lang.Double  =>
      if (d.isNaN || d.isInfinite) sb.append("null") else sb.append(d.toString)
    case s: String            => renderString(s, sb)
    case l: List[_]           =>
      sb.append('[')
      var first = true
      l.foreach { e => if (!first) sb.append(','); render(e, sb); first = false }
      sb.append(']')
    case m: mutable.LinkedHashMap[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, value) =>
        if (!first) sb.append(',')
        renderString(String.valueOf(k), sb)
        sb.append(':')
        render(value, sb)
        first = false
      }
      sb.append('}')
    case other => renderString(String.valueOf(other), sb)
  }

  private def renderString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    var j = 0
    while (j < s.length) {
      val c = s.charAt(j)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case ctrl if ctrl < ' ' => sb.append(f"\\u${ctrl.toInt}%04x")
        case ok   => sb.append(ok)
      }
      j += 1
    }
    sb.append('"')
  }
}
