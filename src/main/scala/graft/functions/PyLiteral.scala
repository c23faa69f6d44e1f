package graft.functions

/** Minimal Python-literal parser mirroring the subset of
  * `ast.literal_eval` the reference's output parsers rely on
  * (reference: ner/llm_ner/prompt_techniques/pt_discussion.py:54,
  * pt_get_entities.py:57, pt_tagger.py:103, pt_filing.py:64,
  * confidence_checker.py:29). Supports strings (single/double quoted,
  * common escapes), ints, floats, True/False/None, tuples, lists,
  * dicts and sets, with arbitrary nesting. Any syntax error yields
  * `None` — callers fall back to empty results exactly like the
  * reference's `except: named_entities = []` blocks.
  */
sealed trait Py
object Py {
  final case class S(v: String) extends Py
  final case class I(v: Long) extends Py
  final case class F(v: Double) extends Py
  final case class B(v: Boolean) extends Py
  case object N extends Py
  /** list, tuple or set — the parsers only care about element access + length */
  final case class Seq_(items: Vector[Py]) extends Py
  final case class Dict(items: Vector[(Py, Py)]) extends Py {
    /** Python dict semantics: first-occurrence order, last value wins. */
    def pyItems: Vector[(Py, Py)] = {
      val last = items.toMap
      items.map(_._1).distinct.map(k => (k, last(k)))
    }
  }
}

object PyLiteral {
  def parse(s: String): Option[Py] =
    try {
      val p = new Parser(s)
      val v = p.value()
      p.skipWs()
      if (p.atEnd) Some(v) else None
    } catch { case _: Exception => None }

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def peek: Char = { if (atEnd) fail(); s.charAt(i) }
    private def fail(): Nothing = throw new IllegalArgumentException(s"bad literal at $i")
    private def expect(c: Char): Unit = { if (atEnd || s.charAt(i) != c) fail(); i += 1 }

    def value(): Py = {
      skipWs()
      peek match {
        case '\'' | '"'                         => Py.S(string())
        case '['                                => seq(']')
        case '('                                => tuple()
        case '{'                                => dictOrSet()
        case c if c.isDigit || c == '-' || c == '+' || c == '.' => number()
        case 'T' => keyword("True"); Py.B(true)
        case 'F' => keyword("False"); Py.B(false)
        case 'N' => keyword("None"); Py.N
        case _   => fail()
      }
    }

    private def keyword(k: String): Unit = {
      if (!s.startsWith(k, i)) fail()
      i += k.length
    }

    private def string(): String = {
      val quote = peek; i += 1
      val sb = new StringBuilder
      while (true) {
        if (atEnd) fail()
        val c = s.charAt(i)
        if (c == quote) { i += 1; return sb.toString }
        else if (c == '\\') {
          i += 1
          if (atEnd) fail()
          val e = s.charAt(i); i += 1
          e match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case '0' => sb += '\u0000'
            case '\\' => sb += '\\'
            case '\'' => sb += '\''
            case '"' => sb += '"'
            case 'x' =>
              if (i + 2 > s.length) fail()
              sb += Integer.parseInt(s.substring(i, i + 2), 16).toChar; i += 2
            case 'u' =>
              if (i + 4 > s.length) fail()
              sb += Integer.parseInt(s.substring(i, i + 4), 16).toChar; i += 4
            case other => sb += '\\'; sb += other // Python keeps unknown escapes
          }
        } else { sb += c; i += 1 }
      }
      sb.toString
    }

    private def number(): Py = {
      val start = i
      if (peek == '-' || peek == '+') i += 1
      var isFloat = false
      while (!atEnd && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
             s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
             ((s.charAt(i) == '-' || s.charAt(i) == '+') && i > start &&
              (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) {
        if (s.charAt(i) == '.' || s.charAt(i) == 'e' || s.charAt(i) == 'E') isFloat = true
        i += 1
      }
      val tok = s.substring(start, i)
      if (tok.isEmpty || tok == "-" || tok == "+") fail()
      if (isFloat) Py.F(tok.toDouble) else Py.I(tok.toLong)
    }

    private def seq(close: Char): Py = {
      i += 1 // consume open
      val items = Vector.newBuilder[Py]
      skipWs()
      if (!atEnd && peek == close) { i += 1; return Py.Seq_(items.result()) }
      var done = false
      while (!done) {
        items += value()
        skipWs()
        peek match {
          case ',' => i += 1; skipWs(); if (!atEnd && peek == close) { i += 1; done = true }
          case `close` => i += 1; done = true
          case _ => fail()
        }
      }
      Py.Seq_(items.result())
    }

    /** `(a)` is just a parenthesised scalar in Python; `(a,)`/(a, b) are tuples. */
    private def tuple(): Py = {
      i += 1
      skipWs()
      if (!atEnd && peek == ')') { i += 1; return Py.Seq_(Vector.empty) }
      val first = value()
      skipWs()
      peek match {
        case ')' => i += 1; first
        case ',' =>
          val items = Vector.newBuilder[Py]
          items += first
          var done = false
          while (!done) {
            i += 1 // consume comma
            skipWs()
            if (!atEnd && peek == ')') { i += 1; done = true }
            else {
              items += value()
              skipWs()
              peek match {
                case ')' => i += 1; done = true
                case ',' => ()
                case _   => fail()
              }
            }
          }
          Py.Seq_(items.result())
        case _ => fail()
      }
    }

    private def dictOrSet(): Py = {
      i += 1
      skipWs()
      if (!atEnd && peek == '}') { i += 1; return Py.Dict(Vector.empty) }
      val first = value()
      skipWs()
      if (!atEnd && peek == ':') { // dict
        val items = Vector.newBuilder[(Py, Py)]
        i += 1
        items += ((first, value()))
        skipWs()
        var done = false
        while (!done) {
          peek match {
            case '}' => i += 1; done = true
            case ',' =>
              i += 1; skipWs()
              if (!atEnd && peek == '}') { i += 1; done = true }
              else {
                val k = value(); skipWs(); expect(':')
                items += ((k, value())); skipWs()
              }
            case _ => fail()
          }
        }
        Py.Dict(items.result())
      } else { // set
        val items = Vector.newBuilder[Py]
        items += first
        var done = false
        while (!done) {
          peek match {
            case '}' => i += 1; done = true
            case ',' =>
              i += 1; skipWs()
              if (!atEnd && peek == '}') { i += 1; done = true }
              else { items += value(); skipWs() }
            case _ => fail()
          }
        }
        Py.Seq_(items.result())
      }
    }
  }
}
