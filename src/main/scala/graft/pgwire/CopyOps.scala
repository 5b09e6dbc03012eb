package graft.pgwire

/** COPY statement parsing and the text/CSV data formats (pg docs
  * §COPY + protocol §55.2.6). Parity-PLUS surface: the reference has
  * no CopyIn/CopyOut handling at all, but every real pg client
  * workflow (psql `\copy`, ETL loaders) leans on COPY, so the server
  * speaks it: `COPY ... TO STDOUT` streams encoded rows as CopyData
  * messages, `COPY <table> FROM STDIN` ingests them.
  *
  * Scale note: COPY is by protocol definition a single client socket
  * stream — the driver-side path here is inherent to the protocol,
  * not a distributed-operator shortcut. Bulk data belongs in the file
  * sources; COPY FROM guards its buffer (256 MiB) and says so.
  */
object CopyOps {

  /** Parsed COPY statement. `source` is Left(subquery-SQL) for
    * `COPY (SELECT ...) TO STDOUT`, Right(table) otherwise.
    */
  final case class CopySpec(
      source: Either[String, String],
      cols: Seq[String],
      fromStdin: Boolean,
      csv: Boolean,
      delimiter: Char,
      nullStr: String,
      header: Boolean,
      binary: Boolean = false)

  private val headRe = "(?is)^\\s*COPY\\s+(.*)$".r

  /** Parse a statement; None when it isn't COPY at all. Malformed or
    * unsupported COPY forms throw PgException (42601 / 0A000), exactly
    * as pg reports them.
    */
  def parse(stmt: String): Option[CopySpec] = stmt match {
    case headRe(rest0) => Some(parseBody(stmt, rest0))
    case _ => None
  }

  private def syntaxErr(stmt: String): Nothing =
    throw PgException("42601", s"syntax error in COPY statement: $stmt")

  private def parseBody(stmt: String, rest0: String): CopySpec = {
    var rest = rest0.trim
    // relation: parenthesized query or (possibly quoted/qualified) name
    val (source, cols) =
      if (rest.startsWith("(")) {
        val close = matchingParen(rest, 0)
        if (close < 0) syntaxErr(stmt)
        val q = rest.substring(1, close).trim
        rest = rest.substring(close + 1).trim
        (Left(q), Nil)
      } else {
        val m = "^([\\w$.\"]+)\\s*".r.findFirstMatchIn(rest).getOrElse(syntaxErr(stmt))
        var name = m.group(1)
        if (name.startsWith("\"") && name.endsWith("\"") && name.length > 1)
          name = name.substring(1, name.length - 1)
        rest = rest.substring(m.end).trim
        val columns =
          if (rest.startsWith("(")) {
            val close = matchingParen(rest, 0)
            if (close < 0) syntaxErr(stmt)
            val cs = rest.substring(1, close).split(",").map(_.trim)
              .map(c => if (c.startsWith("\"") && c.endsWith("\"")) c.substring(1, c.length - 1) else c)
              .toSeq
            rest = rest.substring(close + 1).trim
            cs
          } else Nil
        (Right(name), columns)
      }
    // direction
    val dirM = "(?is)^(TO|FROM)\\s+(STDOUT|STDIN|'[^']*'|\\S+)\\s*".r
      .findFirstMatchIn(rest).getOrElse(syntaxErr(stmt))
    val to = dirM.group(1).equalsIgnoreCase("TO")
    val target = dirM.group(2).toUpperCase
    rest = rest.substring(dirM.end).trim
    if (to && target != "STDOUT")
      throw PgException("0A000", "COPY TO a server-side file is not supported; use TO STDOUT")
    if (!to && target != "STDIN")
      throw PgException("0A000", "COPY FROM a server-side file is not supported; use FROM STDIN")
    if (!to && source.isLeft)
      syntaxErr(stmt) // pg: COPY (query) FROM is invalid
    // options
    var csv = false
    var binary = false
    var delim: Option[Char] = None
    var nul: Option[String] = None
    var header = false
    if (rest.toUpperCase.startsWith("WITH")) rest = rest.substring(4).trim
    if (rest.startsWith("(")) {
      val close = matchingParen(rest, 0)
      if (close < 0) syntaxErr(stmt)
      splitTop(rest.substring(1, close)).foreach { item =>
        val kv = item.trim.split("\\s+", 2)
        val key = kv(0).toUpperCase
        val value = if (kv.length > 1) kv(1).trim else ""
        def unq(s: String): String =
          if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
            s.substring(1, s.length - 1).replace("''", "'")
          else s
        key match {
          case "FORMAT" => value.toLowerCase match {
            case "csv" => csv = true
            case "text" => csv = false
            case "binary" => binary = true
            case other => throw PgException("22023", s"""COPY format "$other" not recognized""")
          }
          case "DELIMITER" =>
            val d = unq(value)
            if (d.length != 1) throw PgException("22023", "COPY delimiter must be a single character")
            delim = Some(d.charAt(0))
          case "NULL" => nul = Some(unq(value))
          case "HEADER" => header = value.isEmpty ||
            Seq("true", "on", "1").contains(value.toLowerCase)
          case "QUOTE" | "ESCAPE" | "ENCODING" | "FREEZE" | "FORCE_QUOTE" |
               "FORCE_NOT_NULL" | "FORCE_NULL" =>
            throw PgException("0A000", s"COPY option $key is not supported")
          case other => throw PgException("42601", s"option \"$other\" not recognized")
        }
      }
      rest = rest.substring(close + 1).trim
      if (rest.nonEmpty && rest != ";") syntaxErr(stmt)
    } else if (rest.nonEmpty) {
      // legacy option words: [BINARY] DELIMITER 'c' NULL 's' CSV [HEADER]
      val toks = legacyToks(rest)
      var i = 0
      while (i < toks.length) {
        toks(i).toUpperCase match {
          case "BINARY" => binary = true; i += 1
          case "CSV" => csv = true; i += 1
          case "HEADER" => header = true; i += 1
          case "DELIMITER" =>
            val j = if (i + 1 < toks.length && toks(i + 1).equalsIgnoreCase("AS")) i + 2 else i + 1
            if (j >= toks.length) syntaxErr(stmt)
            val d = stripQ(toks(j))
            if (d.length != 1) throw PgException("22023", "COPY delimiter must be a single character")
            delim = Some(d.charAt(0)); i = j + 1
          case "NULL" =>
            val j = if (i + 1 < toks.length && toks(i + 1).equalsIgnoreCase("AS")) i + 2 else i + 1
            if (j >= toks.length) syntaxErr(stmt)
            nul = Some(stripQ(toks(j))); i = j + 1
          case ";" => i += 1
          case _ => syntaxErr(stmt)
        }
      }
    }
    // pg rejects the text/csv knobs in BINARY mode (42601)
    if (binary) {
      if (csv) syntaxErr(stmt)
      if (delim.nonEmpty)
        throw PgException("42601", "cannot specify DELIMITER in BINARY mode")
      if (nul.nonEmpty)
        throw PgException("42601", "cannot specify NULL in BINARY mode")
      if (header)
        throw PgException("42601", "cannot specify HEADER in BINARY mode")
    }
    CopySpec(source, cols, fromStdin = !to, csv = csv,
      delimiter = delim.getOrElse(if (csv) ',' else '\t'),
      nullStr = nul.getOrElse(if (csv) "" else "\\N"),
      header = header, binary = binary)
  }

  private def stripQ(s: String): String =
    if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      s.substring(1, s.length - 1).replace("''", "'") else s

  private def legacyToks(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder("'")
        i += 1
        var done = false
        while (i < s.length && !done) {
          if (s.charAt(i) == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
            sb.append("''"); i += 2
          } else if (s.charAt(i) == '\'') { sb.append('\''); i += 1; done = true }
          else { sb.append(s.charAt(i)); i += 1 }
        }
        out += sb.toString
      } else {
        val st = i
        while (i < s.length && !s.charAt(i).isWhitespace && s.charAt(i) != '\'') i += 1
        out += s.substring(st, i)
      }
    }
    out.result()
  }

  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var st = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(st, i); st = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(st)
    out.result()
  }

  // ---- data format: encode ------------------------------------------------

  /** One COPY text-format line from already-text-encoded fields. */
  def encodeTextLine(fields: Seq[Option[String]], spec: CopySpec): String = {
    val sb = new StringBuilder
    fields.zipWithIndex.foreach { case (f, i) =>
      if (i > 0) sb.append(spec.delimiter)
      f match {
        case None => sb.append(spec.nullStr)
        case Some(v) =>
          v.foreach {
            case '\\' => sb.append("\\\\")
            case '\n' => sb.append("\\n")
            case '\r' => sb.append("\\r")
            case '\t' => sb.append("\\t")
            case c if c == spec.delimiter => sb.append('\\').append(c)
            case c => sb.append(c)
          }
      }
    }
    sb.append('\n')
    sb.toString
  }

  /** One COPY csv-format line. */
  def encodeCsvLine(fields: Seq[Option[String]], spec: CopySpec): String = {
    val sb = new StringBuilder
    fields.zipWithIndex.foreach { case (f, i) =>
      if (i > 0) sb.append(spec.delimiter)
      f match {
        case None => sb.append(spec.nullStr)
        case Some(v) =>
          // pg quotes an empty string ONLY when it would collide with
          // the null marker (default NULL '' — live-pg-pinned in
          // CopyParitySpec); any field equal to the marker quotes too
          val needsQuote = v == spec.nullStr ||
            v.exists(c => c == spec.delimiter || c == '"' || c == '\n' || c == '\r')
          if (needsQuote) sb.append('"').append(v.replace("\"", "\"\"")).append('"')
          else sb.append(v)
      }
    }
    sb.append('\n')
    sb.toString
  }

  def encodeLine(fields: Seq[Option[String]], spec: CopySpec): String =
    if (spec.csv) encodeCsvLine(fields, spec) else encodeTextLine(fields, spec)

  // ---- binary format (pg docs §COPY: PGCOPY signature, int32 flags,
  // int32 extension, then int16-field-count tuples of (int32 len,
  // bytes) fields in the wire binary encodings, int16 -1 trailer) ----

  /** The 11-byte PGCOPY\n\377\r\n\0 file signature. */
  val BinarySignature: Array[Byte] =
    Array[Byte]('P', 'G', 'C', 'O', 'P', 'Y', '\n', 0xFF.toByte, '\r', '\n', 0x00)

  /** Binary COPY header: signature + flags 0 + no extension. */
  def binaryHeader: Array[Byte] =
    BinarySignature ++ BinaryEncoder.be4(0) ++ BinaryEncoder.be4(0)

  /** Decode a full binary COPY-FROM payload into rows of nullable
    * TEXT-form fields — the same shape the text decoder produces, so
    * both formats feed the one staging/cast pipeline. `types` are the
    * target columns' Spark types in COPY column order.
    */
  def decodeBinary(data: Array[Byte],
      types: Seq[org.apache.spark.sql.types.DataType]): Seq[Seq[Option[String]]] = {
    val buf = java.nio.ByteBuffer.wrap(data)
    if (buf.remaining < BinarySignature.length + 8)
      dataErr("COPY binary data too short for signature")
    val got = new Array[Byte](BinarySignature.length)
    buf.get(got)
    if (!java.util.Arrays.equals(got, BinarySignature))
      dataErr("COPY file signature not recognized")
    val flags = buf.getInt
    if (flags != 0)
      dataErr("unrecognized critical flags in COPY file header")
    val extLen = buf.getInt
    if (extLen < 0 || extLen > buf.remaining)
      dataErr("invalid COPY file header extension length")
    buf.position(buf.position() + extLen)
    val out = Seq.newBuilder[Seq[Option[String]]]
    var done = false
    while (!done) {
      if (buf.remaining < 2) dataErr("unexpected EOF in COPY binary data")
      val nf = buf.getShort
      if (nf == -1) done = true
      else {
        if (nf != types.length)
          dataErr(s"row field count $nf, expected ${types.length}")
        out += types.map { dt =>
          val len = buf.getInt
          if (len == -1) None
          else if (len < 0 || len > buf.remaining) dataErr("invalid field size")
          else {
            val fb = new Array[Byte](len)
            buf.get(fb)
            Some(binaryFieldToText(fb, dt))
          }
        }
      }
    }
    out.result()
  }

  /** One binary field → the text form a text-format COPY would carry
    * for the same value (CASTable by the staging pipeline; bytea uses
    * the `\x` hex input pg_to_bytea parses).
    */
  private def binaryFieldToText(b: Array[Byte],
      dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    val buf = java.nio.ByteBuffer.wrap(b)
    // fixed-width fields must carry exactly their width — a mistyped
    // payload (e.g. numeric bytes aimed at a float8 column) errors
    // like pg's "incorrect binary data format" instead of silently
    // decoding the first 8 bytes of something else
    def fixed(n: Int): java.nio.ByteBuffer = {
      if (b.length != n) dataErr(
        s"incorrect binary data format: ${b.length}-byte field for " +
          s"${dt.simpleString} (expected $n)")
      buf
    }
    dt match {
      case BooleanType => if (fixed(1).get() != 0) "true" else "false"
      case ByteType | ShortType => fixed(2).getShort.toString
      case IntegerType => fixed(4).getInt.toString
      case LongType => fixed(8).getLong.toString
      case FloatType => fixed(4).getFloat.toString
      case DoubleType => fixed(8).getDouble.toString
      case _: DecimalType => decodeNumericText(buf)
      case StringType | _: CharType | _: VarcharType => new String(b, "UTF-8")
      case BinaryType => "\\x" + b.map("%02x".format(_)).mkString
      case DateType =>
        java.time.LocalDate.ofEpochDay(fixed(4).getInt + BinaryEncoder.PG_EPOCH_DAYS).toString
      case TimestampNTZType => microsToLdt(fixed(8).getLong).toString
      case TimestampType => microsToLdt(fixed(8).getLong).toString + "Z"
      case other =>
        dataErr(s"COPY binary input for type ${other.simpleString} is not supported")
    }
  }

  private def microsToLdt(pgMicros: Long): java.time.LocalDateTime = {
    val micros = pgMicros + BinaryEncoder.PG_EPOCH_MICROS
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000).toInt,
      java.time.ZoneOffset.UTC)
  }

  /** Inverse of [[BinaryEncoder.encodeNumeric]]: base-10000 digit
    * groups → plain decimal string at the transmitted dscale. */
  private def decodeNumericText(buf: java.nio.ByteBuffer): String = {
    val nd = buf.getShort.toInt
    val weight = buf.getShort.toInt
    val sign = buf.getShort & 0xFFFF
    val dscale = buf.getShort.toInt
    if (sign == 0xC000) return "NaN"
    var bd = java.math.BigDecimal.ZERO
    var i = 0
    while (i < nd) {
      val d = buf.getShort.toInt
      bd = bd.add(new java.math.BigDecimal(d).scaleByPowerOfTen((weight - i) * 4))
      i += 1
    }
    if (sign == 0x4000) bd = bd.negate()
    bd.setScale(dscale).toPlainString
  }

  // ---- data format: decode ------------------------------------------------

  private def dataErr(msg: String): Nothing = throw PgException("22P04", msg)

  /** Decode a full COPY-FROM payload into rows of nullable strings. */
  def decode(data: String, spec: CopySpec): Seq[Seq[Option[String]]] = {
    val rows = if (spec.csv) decodeCsv(data, spec) else decodeText(data, spec)
    if (spec.header) rows.drop(1) else rows
  }

  private def decodeText(data: String, spec: CopySpec): Seq[Seq[Option[String]]] = {
    val out = Seq.newBuilder[Seq[Option[String]]]
    val lines = data.split("\n", -1)
    // a trailing \n produces one artifact "" element — drop only that
    val effective =
      if (lines.nonEmpty && lines.last.isEmpty) lines.dropRight(1) else lines
    effective.foreach { line0 =>
      val line = if (line0.endsWith("\r")) line0.dropRight(1) else line0
      if (line == "\\.") return out.result() // end-of-data marker
      val fields = Seq.newBuilder[Option[String]]
      val cur = new StringBuilder
      var i = 0
      def flush(): Unit = {
        val s = cur.toString
        // nullStr is compared against the RAW (pre-unescape) field:
        // pg matches \N before unescaping
        fields += (if (s == spec.nullStr) None else Some(unescapeText(s)))
        cur.clear()
      }
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '\\' && i + 1 < line.length) {
          cur.append(c).append(line.charAt(i + 1)); i += 2
        } else if (c == spec.delimiter) {
          flush(); i += 1
        } else { cur.append(c); i += 1 }
      }
      flush()
      out += fields.result()
    }
    out.result()
  }

  private def unescapeText(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'v' => sb.append('\u000b')
          case o => sb.append(o)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def decodeCsv(data: String, spec: CopySpec): Seq[Seq[Option[String]]] = {
    val out = Seq.newBuilder[Seq[Option[String]]]
    val fields = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    val cur = new StringBuilder
    var quoted = false // current field was ever quoted
    var inQ = false
    var rowStarted = false
    var i = 0
    def endField(): Unit = {
      val s = cur.toString
      // only an UNQUOTED field equal to nullStr is NULL (csv rule)
      fields += (if (!quoted && s == spec.nullStr) None else Some(s))
      cur.clear(); quoted = false
    }
    def endRow(): Unit = {
      endField()
      out += fields.toSeq
      fields.clear(); rowStarted = false
    }
    while (i < data.length) {
      val c = data.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < data.length && data.charAt(i + 1) == '"') { cur.append('"'); i += 2 }
        else if (c == '"') { inQ = false; i += 1 }
        else { cur.append(c); i += 1 }
      } else c match {
        case '"' if cur.isEmpty && !quoted =>
          inQ = true; quoted = true; rowStarted = true; i += 1
        case '"' => dataErr("unquoted \" in CSV field")
        case d if d == spec.delimiter => endField(); rowStarted = true; i += 1
        case '\r' if i + 1 < data.length && data.charAt(i + 1) == '\n' =>
          endRow(); i += 2
        case '\n' | '\r' => endRow(); i += 1
        case ch => cur.append(ch); rowStarted = true; i += 1
      }
    }
    if (inQ) dataErr("unterminated CSV quoted field")
    // trailing data without a final newline = one last row
    if (rowStarted || cur.nonEmpty || fields.nonEmpty) endRow()
    out.result().filterNot(r => r == Seq(Some("\\.")))
  }
}
