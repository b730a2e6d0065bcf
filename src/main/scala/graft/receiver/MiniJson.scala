package graft.receiver

/** Minimal JSON value model + parser + canonical re-serializer for the mock
  * receiver (test harness only — the engine itself never parses JSON on the
  * driver; Spark sources do that distributed).
  *
  * The receiver must INDEPENDENTLY recompute chunk checksums from the parsed
  * payload (SURVEY.md §2 A25 — the reference's mock re-serializes the parsed
  * records with the same canonical form,
  * `tests/pim_core_mock_test/services/chunk_data_integrity_validator.py:48-54`).
  * A dependency-free parser keeps that round-trip honest: wire bytes →
  * parsed values → canonical bytes → sha256 must reproduce the sender's hash.
  */
object MiniJson {

  sealed trait JVal
  case object JNull extends JVal
  final case class JBool(v: Boolean) extends JVal
  final case class JNum(raw: String) extends JVal // lexical form preserved
  final case class JStr(v: String) extends JVal
  final case class JArr(vs: Vector[JVal]) extends JVal
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal {
    def get(key: String): Option[JVal] = fields.find(_._1 == key).map(_._2)
  }

  def parse(s: String): JVal = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  /** Canonical serialization matching graft.canon.CanonicalJson: key-sorted
    * objects, minimal escapes, numbers re-emitted canonically. */
  def canonical(v: JVal): String = {
    val sb = new java.lang.StringBuilder(64)
    writeCanonical(sb, v)
    sb.toString
  }

  /** Render a record array into one builder — the receiver re-renders every
    * chunk's records for the checksum recompute, so this avoids a String per
    * record plus a mkString copy of the whole ~MB payload. */
  def canonicalAll(vs: Seq[JVal], sizeHint: Int): String = {
    val sb = new java.lang.StringBuilder(sizeHint)
    sb.append('[')
    val it = vs.iterator
    var first = true
    while (it.hasNext) {
      if (!first) sb.append(',')
      writeCanonical(sb, it.next())
      first = false
    }
    sb.append(']')
    sb.toString
  }

  private def writeCanonical(sb: java.lang.StringBuilder, v: JVal): Unit = v match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(b)
    case JNum(raw) => sb.append(canonicalNumber(raw))
    case JStr(s) => writeString(sb, s)
    case JArr(vs) =>
      sb.append('[')
      var i = 0
      while (i < vs.length) {
        if (i > 0) sb.append(',')
        writeCanonical(sb, vs(i))
        i += 1
      }
      sb.append(']')
    case JObj(fields) =>
      // key-sorted without the sortBy tuple/Vector churn: objects are small
      // (typical record ≈ 17 fields), so insertion sort on an index array
      sb.append('{')
      val n = fields.length
      val idx = new Array[Int](n)
      var i = 0
      while (i < n) { idx(i) = i; i += 1 }
      i = 1
      while (i < n) {
        val v0 = idx(i)
        val k0 = fields(v0)._1
        var j = i - 1
        while (j >= 0 && fields(idx(j))._1.compareTo(k0) > 0) {
          idx(j + 1) = idx(j); j -= 1
        }
        idx(j + 1) = v0
        i += 1
      }
      i = 0
      while (i < n) {
        if (i > 0) sb.append(',')
        val (k, x) = fields(idx(i))
        writeString(sb, k)
        sb.append(':')
        writeCanonical(sb, x)
        i += 1
      }
      sb.append('}')
  }

  /** Numbers keep their received lexical form verbatim. The sender's
    * CanonicalJson already emits each number in ONE canonical lexeme per
    * value (integers plain, decimals via toPlainString, doubles via Java
    * shortest repr) — re-normalizing here through Double would corrupt
    * decimal lexemes ("19.9900" → "19.99", "0.00001" → "1.0E-5") and break
    * the independent checksum recompute byte parity. */
  private def canonicalNumber(raw: String): String = raw

  private def writeString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    // bulk fast path: most strings need no escaping — append whole runs
    // instead of char-at-a-time (this is the receiver's per-record hot loop)
    var i = 0
    var runStart = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' || c == '\\' || c < ' ') {
        if (i > runStart) sb.append(s, runStart, i)
        c match {
          case '"' => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case '\b' => sb.append("\\b")
          case '\f' => sb.append("\\f")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case _ => sb.append(f"\\u${c.toInt}%04x")
        }
        runStart = i + 1
      }
      i += 1
    }
    if (i > runStart) sb.append(s, runStart, i)
    sb.append('"')
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && (s.charAt(pos) == ' ' || s.charAt(pos) == '\n' ||
        s.charAt(pos) == '\r' || s.charAt(pos) == '\t')) pos += 1

    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }

    def parseValue(): JVal = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JStr(parseString())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case _ => parseNumber()
      }
    }

    private def literal(lit: String): Unit = {
      require(s.regionMatches(pos, lit, 0, lit.length), s"bad literal at $pos")
      pos += lit.length
    }

    private def parseObject(): JObj = {
      expect('{'); skipWs()
      val buf = Vector.newBuilder[(String, JVal)]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return JObj(Vector.empty) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        val v = parseValue()
        buf += (k -> v)
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(buf.result())
    }

    private def parseArray(): JArr = {
      expect('['); skipWs()
      val buf = Vector.newBuilder[JVal]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return JArr(Vector.empty) }
      var done = false
      while (!done) {
        buf += parseValue()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(buf.result())
    }

    private def parseString(): String = {
      expect('"')
      // fast path: escape-free string → one substring, no per-char copy
      var i = pos
      while (i < s.length && { val c = s.charAt(i); c != '"' && c != '\\' }) i += 1
      require(i < s.length, s"unterminated string at ${pos - 1}")
      if (s.charAt(i) == '"') {
        val r = s.substring(pos, i)
        pos = i + 1
        return r
      }
      val sb = new java.lang.StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb.append(c)
        pos += 1
      }
      pos += 1
      sb.toString
    }

    private def parseNumber(): JNum = {
      val start = pos
      if (!eof && s.charAt(pos) == '-') pos += 1
      while (!eof && (s.charAt(pos).isDigit || "+-.eE".contains(s.charAt(pos)))) pos += 1
      require(pos > start, s"bad number at $start")
      JNum(s.substring(start, pos))
    }
  }
}
