package graft.sources

import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal xlsx (SpreadsheetML) reader as a DataSource V2 — the engine's
  * Excel scan (SURVEY.md §2 A4–A7; `app/services/excel_reader.py`).
  *
  * Reproduced semantics:
  *   - values-only streaming read of the FIRST worksheet (`excel_reader.py:38-42`);
  *   - header = first row; header cells are trimmed strings, a null/missing
  *     header cell becomes `column_{i}`, an entirely empty header row aborts
  *     the read (`excel_reader.py:45-53`);
  *   - short rows are null-padded to the header width (`excel_reader.py:72`);
  *   - rows whose every cell is FALSY — missing, empty string, numeric 0,
  *     boolean false — are dropped during the scan and never count
  *     (`excel_reader.py:61-63`: `if not any(row)`, Python truthiness);
  *   - cell values surface as strings (numbers keep their lexical form,
  *     booleans become "true"/"false", shared/inline strings resolve);
  *   - date-formatted numeric cells resolve through xl/styles.xml number
  *     formats and surface as ISO-8601 strings — the same values the
  *     reference gets from openpyxl `data_only=True` (typed datetimes,
  *     `excel_reader.py:38`) once serialized by orjson. Both the 1900
  *     (with its leap-bug compensation) and 1904 date systems are handled;
  *   - the ACTIVE sheet is read (xl/workbook.xml `activeTab` resolved via
  *     workbook.xml.rels), matching `wb.active` at `excel_reader.py:41`;
  *     first sheet when no view state exists.
  *
  * Built on JDK zip + StAX only (no POI jar exists in this environment —
  * SURVEY.md §7.4 #4). One InputPartition per file: xlsx is a zip container
  * and not block-splittable; parallelism at scale comes from many files,
  * which is how spreadsheet drops arrive in practice.
  */
class XlsxSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xlsx"

  /** Accept a user-supplied schema (required by readStream; the per-file
    * header check in the reader factory still enforces consistency). */
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = XlsxSource.requirePath(options)
    val files = XlsxSource.expand(path, XlsxSource.hadoopConf())
    require(files.nonEmpty, s"xlsx: no .xlsx files under $path")
    // schema = header of the first file (lexicographic order, deterministic);
    // every other file must produce the same header — checked at read time
    XlsxParser.schemaOf(files.head, XlsxSource.hadoopConf())
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // the reader emits UTF8String cells unconditionally; a user schema with
    // other field types would silently corrupt downstream rows — fail fast
    val nonString = schema.fields.filterNot(_.dataType ==
      org.apache.spark.sql.types.StringType)
    require(nonString.isEmpty,
      "xlsx source emits string cells only; non-string fields in supplied " +
        s"schema: ${nonString.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
    new XlsxTable(schema, properties.get("path"))
  }
}

object XlsxSource {
  def requirePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "xlsx source requires a path")
    p
  }

  def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  /** A file path stays itself; a directory expands to its .xlsx files in
    * lexicographic order. One InputPartition per file — this is where the
    * source's parallelism comes from at scale (spreadsheet drops arrive as
    * many files, each unsplittable). */
  def expand(path: String, conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) Seq(path)
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".xlsx"))
      .map(_.getPath.toString).sorted
  }
}

class XlsxTable(schema: StructType, path: String) extends Table with SupportsRead {
  override def name(): String = s"xlsx:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        XlsxSource.expand(path, XlsxSource.hadoopConf())
          .map(f => XlsxPartition(f): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        // capture the session's Hadoop conf on the DRIVER (credentials,
        // fs.* settings) — executors must not rebuild a default Configuration
        new XlsxReaderFactory(schema,
          new org.apache.spark.util.SerializableConfiguration(XlsxSource.hadoopConf()))
      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
        new XlsxMicroBatchStream(schema, path)
    }
}

/** Streaming xlsx: each micro-batch reads the .xlsx files that appeared
  * since the last committed offset. The offset is the sorted set of file
  * paths already planned — the natural exactly-once unit for an
  * unsplittable container format (one partition per file, like the batch
  * scan). Files must be dropped atomically (write-then-rename), the same
  * contract Spark's built-in file source has. */
class XlsxMicroBatchStream(schema: StructType, path: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  // driver-side conf, captured once (credentials, fs.* settings)
  private val conf = XlsxSource.hadoopConf()
  private var availableNowTarget: Option[XlsxOffset] = None

  private def listNow(): XlsxOffset =
    XlsxOffset(
      try XlsxSource.expand(path, conf)
      catch { case _: java.io.FileNotFoundException => Seq.empty }) // dir not yet created

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(listNow()) // pin the drain target at start

  override def initialOffset(): Offset = XlsxOffset(Seq.empty)
  override def latestOffset(): Offset = availableNowTarget.getOrElse(listNow())
  // SupportsAdmissionControl variant (ReadLimit unused: whole files are the
  // admission unit and a single new workbook can't be split further)
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  override def deserializeOffset(json: String): Offset = XlsxOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[XlsxOffset].files.toSet
    end.asInstanceOf[XlsxOffset].files.filterNot(seen)
      .map(f => XlsxPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(schema,
      new org.apache.spark.util.SerializableConfiguration(conf))
}

/** Offset = sorted set of planned file paths, serialized as a JSON string
  * array (checkpoint-durable).
  *
  * Declared bound: the offset carries the FULL path set, so checkpoint size
  * grows with lifetime file count — right for bounded per-ingestion drops
  * (this protocol's shape); a million-file perpetual directory would want a
  * compacted seen-files log like Spark's built-in file source. */
case class XlsxOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    files.sorted.map(f =>
      "\"" + f.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\"").mkString("[", ",", "]")
}

object XlsxOffset {
  /** Parse the JSON string array written by [[XlsxOffset.json]]. */
  def fromJson(s: String): XlsxOffset = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    def err(msg: String) = throw new IllegalArgumentException(s"bad xlsx offset $msg: $s")
    while (i < s.length) {
      s.charAt(i) match {
        case '[' | ']' | ',' | ' ' => i += 1
        case '"' =>
          val sb = new StringBuilder
          i += 1
          while (i < s.length && s.charAt(i) != '"') {
            s.charAt(i) match {
              case '\\' =>
                if (i + 1 >= s.length) err("(dangling escape)")
                s.charAt(i + 1) match {
                  case '"' => sb.append('"'); i += 2
                  case '\\' => sb.append('\\'); i += 2
                  case 'u' =>
                    if (i + 6 > s.length) err("(truncated unicode escape)")
                    sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
                    i += 6
                  case other => err(s"(escape \\$other)")
                }
              case c => sb.append(c); i += 1
            }
          }
          if (i >= s.length) err("(unterminated string)")
          i += 1 // closing quote
          out += sb.toString
        case other => err(s"(char '$other')")
      }
    }
    XlsxOffset(out.toSeq)
  }
}

case class XlsxPartition(path: String) extends InputPartition

class XlsxReaderFactory(schema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[XlsxPartition].path
    new PartitionReader[InternalRow] {
      // every file in a multi-file read must carry the table's header —
      // otherwise rows would silently land in the wrong columns
      private val fileHeader = XlsxParser.schemaOf(path, conf.value).fieldNames
      require(fileHeader.sameElements(schema.fieldNames),
        s"xlsx $path: header ${fileHeader.mkString(",")} does not match the " +
          s"table schema ${schema.fieldNames.mkString(",")}")
      private val rows = XlsxParser.dataRows(path, conf.value, schema.length)
      private var current: Array[String] = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow =
        InternalRow.fromSeq(current.map(v =>
          if (v == null) null else UTF8String.fromString(v)))
      override def close(): Unit = ()
    }
  }
}

/** Streaming SpreadsheetML parsing over JDK zip + StAX. */
object XlsxParser {

  /** First row → schema (A5). */
  def schemaOf(path: String, conf: org.apache.hadoop.conf.Configuration): StructType = {
    val it = rawRows(path, conf)
    require(it.hasNext, s"xlsx $path: no rows")
    val header = it.next()
    require(header.exists(c => c != null && c.trim.nonEmpty),
      s"xlsx $path: empty header row — aborting (excel_reader.py:48-51)")
    StructType(header.zipWithIndex.map { case (c, i) =>
      val name = if (c == null || c.trim.isEmpty) s"column_$i" else c.trim
      StructField(name, StringType, nullable = true)
    })
  }

  /** Data rows: header skipped, short rows padded, all-falsy rows dropped (A6/A7). */
  def dataRows(path: String, conf: org.apache.hadoop.conf.Configuration,
      width: Int): Iterator[Array[String]] = {
    val it = rawRows(path, conf)
    if (it.hasNext) it.next() // header
    it.map { cells =>
      if (cells.length >= width) cells.take(width)
      else cells ++ Array.fill[String](width - cells.length)(null)
    }.filter(row => row.exists(truthy))
  }

  /** Python truthiness over a typed-then-stringified cell (A7). */
  private def truthy(v: String): Boolean = v match {
    case null | "" => false
    case s => !XlsxParser.falsyLexemes.contains(s)
  }
  // numeric 0 / 0.0 and boolean false are falsy in the reference's
  // `if not any(row)`; quoted string "0" would be truthy there, but the
  // lexical forms are indistinguishable post-extraction — documented choice
  private val falsyLexemes = Set("0", "0.0", "false")

  /** All sheet rows as string cells (sparse cells resolved by column ref). */
  def rawRows(path: String, conf: org.apache.hadoop.conf.Configuration)
      : Iterator[Array[String]] = {
    // pass 1: the small metadata parts in one zip scan
    val meta = readEntries(path, conf, Set(
      "xl/workbook.xml", "xl/_rels/workbook.xml.rels",
      "xl/styles.xml", "xl/sharedStrings.xml"))
    val shared = parseSharedStrings(meta.get("xl/sharedStrings.xml"))
    val dateStyles = parseDateStyles(meta.get("xl/styles.xml"))
    val date1904 = meta.get("xl/workbook.xml").exists(isDate1904)
    // pass 2: the one worksheet the workbook's view marks active
    // (excel_reader.py:41 `wb.active`); explicit fallbacks for workbooks
    // without view/rels parts. Never a _rels relationships file.
    val sheetXml = resolveActiveSheet(meta)
      .flatMap(sp => readEntry(path, conf, _ == sp))
      // rels-less workbooks: prefer the conventional first-sheet names over
      // zip order (writer-dependent), then any worksheet as a last resort
      .orElse(readEntry(path, conf,
        n => n == "xl/worksheets/sheet1.xml" || n == "xl/worksheets/sheet.xml"))
      .orElse(readEntry(path, conf, n => n.matches("xl/worksheets/[^/]+\\.xml")))
      .getOrElse(throw new IllegalArgumentException(s"xlsx $path: no worksheet"))
    parseSheet(sheetXml, shared, dateStyles, date1904).iterator
  }

  /** workbook.xml sheet order + activeTab + workbook.xml.rels r:id targets →
    * zip entry name of the active sheet. None when any part is missing. */
  private def resolveActiveSheet(meta: Map[String, Array[Byte]]): Option[String] =
    for {
      wb <- meta.get("xl/workbook.xml")
      rels <- meta.get("xl/_rels/workbook.xml.rels")
      (sheetRids, activeTab) = parseWorkbookSheets(wb)
      rid <- sheetRids.lift(activeTab).orElse(sheetRids.headOption)
      target <- parseRelTargets(rels).get(rid)
    } yield
      if (target.startsWith("/")) target.stripPrefix("/")
      else s"xl/$target"

  /** (sheet r:ids in workbook order, activeTab index — 0 when absent). */
  private def parseWorkbookSheets(bytes: Array[Byte]): (Seq[String], Int) = {
    val rids = ArrayBuffer.empty[String]
    var active = 0
    withXml(bytes) { r =>
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "sheet" =>
            // r:id is namespaced; match the attribute by local name
            (0 until r.getAttributeCount)
              .find(i => r.getAttributeLocalName(i) == "id")
              .foreach(i => rids += r.getAttributeValue(i))
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "workbookView" =>
            Option(r.getAttributeValue(null, "activeTab"))
              .flatMap(_.trim.toIntOption).foreach(active = _)
          case _ =>
        }
      }
    }
    (rids.toSeq, active)
  }

  private def isDate1904(wb: Array[Byte]): Boolean = {
    var flag = false
    withXml(wb) { r =>
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "workbookPr" =>
            val v = Option(r.getAttributeValue(null, "date1904")).map(_.trim.toLowerCase)
            flag = v.contains("1") || v.contains("true")
          case _ =>
        }
      }
    }
    flag
  }

  /** workbook.xml.rels: relationship Id → Target. */
  private def parseRelTargets(bytes: Array[Byte]): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    withXml(bytes) { r =>
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "Relationship" =>
            for {
              id <- Option(r.getAttributeValue(null, "Id"))
              target <- Option(r.getAttributeValue(null, "Target"))
            } out(id) = target
          case _ =>
        }
      }
    }
    out.toMap
  }

  private def parseSharedStrings(entry: Option[Array[Byte]]): IndexedSeq[String] =
    entry match {
      case None => IndexedSeq.empty
      case Some(bytes) =>
        val out = ArrayBuffer.empty[String]
        withXml(bytes) { r =>
          var inSi = false
          val sb = new StringBuilder
          while (r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
                inSi = true; sb.clear()
              case XMLStreamConstants.START_ELEMENT if inSi && r.getLocalName == "t" =>
                sb.append(r.getElementText)
              case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
                inSi = false; out += sb.toString
              case _ =>
            }
          }
        }
        out.toIndexedSeq
    }

  /** styles.xml → per-cellXf "is a date/time format" flags. Mirrors
    * openpyxl's resolution: the xf's numFmtId resolves to a format code
    * (custom <numFmt> entries first, then the builtin table), and a code is
    * a date format when its first section contains d/m/h/y/s outside quoted
    * literals and non-elapsed bracket sections. */
  private def parseDateStyles(entry: Option[Array[Byte]]): Int => Boolean =
    entry match {
      case None => _ => false
      case Some(bytes) =>
        val custom = scala.collection.mutable.Map.empty[Int, String]
        val xfFmtIds = ArrayBuffer.empty[Int]
        var inCellXfs = false
        withXml(bytes) { r =>
          while (r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
                case "cellXfs" => inCellXfs = true
                case "numFmt" =>
                  for {
                    id <- Option(r.getAttributeValue(null, "numFmtId"))
                      .flatMap(_.trim.toIntOption)
                    code <- Option(r.getAttributeValue(null, "formatCode"))
                  } custom(id) = code
                case "xf" if inCellXfs =>
                  xfFmtIds += Option(r.getAttributeValue(null, "numFmtId"))
                    .flatMap(_.trim.toIntOption).getOrElse(0)
                case _ =>
              }
              case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
                inCellXfs = false
              case _ =>
            }
          }
        }
        val flags = xfFmtIds.map { id =>
          custom.get(id).map(ExcelDates.isDateFormatCode)
            .getOrElse(ExcelDates.builtinDateIds(id))
        }.toIndexedSeq
        i => flags.lift(i).getOrElse(false)
    }

  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String],
      dateStyle: Int => Boolean, date1904: Boolean): Seq[Array[String]] = {
    val rows = ArrayBuffer.empty[Array[String]]
    withXml(bytes) { r =>
      var cells: ArrayBuffer[String] = null
      var cellCol = -1
      var cellType = ""
      var cellStyle = 0
      var pendingText: StringBuilder = null
      var inV = false
      var inIsT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => cells = ArrayBuffer.empty[String]
            case "c" =>
              cellCol = colIndex(Option(r.getAttributeValue(null, "r")))
                .getOrElse(cells.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellStyle = Option(r.getAttributeValue(null, "s"))
                .flatMap(_.trim.toIntOption).getOrElse(0)
            case "v" => inV = true; pendingText = new StringBuilder
            case "t" if cellType == "inlineStr" =>
              inIsT = true; pendingText = new StringBuilder
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inV || inIsT =>
            pendingText.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" | "t" if inV || inIsT =>
              val raw = pendingText.toString
              val value = cellType match {
                case "s" => shared.lift(raw.trim.toInt).orNull
                case "b" => if (raw.trim == "1") "true" else "false"
                case "n" if dateStyle(cellStyle) =>
                  raw.trim.toDoubleOption
                    .map(ExcelDates.serialToIso(_, date1904)).getOrElse(raw)
                case _ => raw
              }
              while (cells.length < cellCol) cells += null // sparse gap fill
              if (cells.length == cellCol) cells += value else cells(cellCol) = value
              inV = false; inIsT = false
            case "row" if cells != null => rows += cells.toArray; cells = null
            case _ =>
          }
          case _ =>
        }
      }
    }
    rows.toSeq
  }

  /** "C3" → 2 (0-based column index from the letters prefix). */
  private def colIndex(ref: Option[String]): Option[Int] = ref.flatMap { s =>
    val letters = s.takeWhile(_.isLetter)
    if (letters.isEmpty) None
    else Some(letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1)
  }

  private def withXml(bytes: Array[Byte])(f: XMLStreamReader => Unit): Unit = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val reader = factory.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    try f(reader) finally reader.close()
  }

  /** Scan the zip stream for the first entry matching `pred`. Works on any
    * Hadoop-visible filesystem (file://, s3a://, ...). */
  private def readEntry(path: String, conf: org.apache.hadoop.conf.Configuration,
      pred: String => Boolean): Option[Array[Byte]] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val in = new ZipInputStream(fs.open(p))
    try {
      var entry = in.getNextEntry
      while (entry != null) {
        if (pred(entry.getName)) return Some(in.readAllBytes())
        entry = in.getNextEntry
      }
      None
    } finally in.close()
  }

  /** One zip scan collecting every wanted entry (the small metadata parts). */
  private def readEntries(path: String, conf: org.apache.hadoop.conf.Configuration,
      wanted: Set[String]): Map[String, Array[Byte]] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val in = new ZipInputStream(fs.open(p))
    val out = scala.collection.mutable.Map.empty[String, Array[Byte]]
    try {
      var entry = in.getNextEntry
      while (entry != null && out.size < wanted.size) {
        if (wanted(entry.getName)) out(entry.getName) = in.readAllBytes()
        entry = in.getNextEntry
      }
      out.toMap
    } finally in.close()
  }
}

/** Excel serial-date resolution, matching what the reference observes through
  * openpyxl `data_only=True` (`excel_reader.py:38`) + orjson serialization:
  * date-formatted numeric cells become ISO-8601 strings.
  *
  * Semantics mirror openpyxl's `from_excel`: epoch 1899-12-30 for the 1900
  * system with the Lotus leap-bug compensation (serials in (0, 60) shift one
  * day so serial 1 = 1900-01-01; the phantom Feb 29 1900 collapses onto
  * Feb 28), epoch 1904-01-01 for the 1904 system, sub-day fractions rounded
  * to millisecond precision, and serials in [0, 1) surfacing as time-of-day.
  */
object ExcelDates {
  /** Builtin numFmtIds whose format codes are date/time (the 14–22 date and
    * 45–47 elapsed-time entries of the SpreadsheetML builtin table — the
    * same set openpyxl's builtin formats resolve as dates). */
  val builtinDateIds: Set[Int] = Set(14, 15, 16, 17, 18, 19, 20, 21, 22, 45, 46, 47)

  /** openpyxl `is_date_format`: first ';' section, quoted literals and
    * non-elapsed `[...]` sections (colors, locales) stripped, then any of
    * d/m/h/y/s means date. `[h]`/`[mm]`/`[ss]` elapsed markers survive the
    * strip and correctly read as date/time. */
  def isDateFormatCode(code: String): Boolean = {
    val section = code.split(';').headOption.getOrElse("")
    val sb = new StringBuilder
    var i = 0
    while (i < section.length) {
      section.charAt(i) match {
        case '"' =>
          i += 1
          while (i < section.length && section.charAt(i) != '"') i += 1
          i += 1
        case '[' =>
          val end = section.indexOf(']', i)
          val body = if (end < 0) "" else section.substring(i + 1, end)
          if (body.toLowerCase.matches("h+|m+|s+")) sb.append(body)
          i = if (end < 0) section.length else end + 1
        case '\\' => i += 2 // escaped literal char
        case c => sb.append(c); i += 1
      }
    }
    sb.toString.toLowerCase.exists("dmhys".contains(_))
  }

  private val MicrosPerDay = 86400000000L

  /** Serial → ISO-8601 string as orjson would render openpyxl's value:
    * `[0,1)` → "HH:MM:SS[.ffffff]" (time), otherwise
    * "YYYY-MM-DDTHH:MM:SS[.ffffff]" (datetime). */
  def serialToIso(serial: Double, date1904: Boolean): String = {
    var day = math.floor(serial).toLong
    val fraction = serial - day
    // openpyxl rounds the day fraction to millisecond precision (half-even)
    var micros = math.rint(fraction * MicrosPerDay / 1000d).toLong * 1000L
    if (micros >= MicrosPerDay) {
      // a fraction within ~0.5ms of midnight rounds to a full day; openpyxl's
      // timedelta arithmetic carries it into the NEXT day — keep the carry
      micros -= MicrosPerDay
      day += 1
    }
    val time = java.time.LocalTime.ofNanoOfDay(micros * 1000L)
    if (serial >= 0 && serial < 1) return isoTime(time)
    if (!date1904 && serial > 0 && serial < 60) day += 1
    val epoch = if (date1904) java.time.LocalDate.of(1904, 1, 1)
                else java.time.LocalDate.of(1899, 12, 30)
    val date = epoch.plusDays(day)
    f"${date.getYear}%04d-${date.getMonthValue}%02d-${date.getDayOfMonth}%02d" +
      s"T${isoTime(time)}"
  }

  /** Python `time.isoformat()` / orjson: microseconds only when nonzero. */
  private def isoTime(t: java.time.LocalTime): String = {
    val base = f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
    val us = t.getNano / 1000
    if (us == 0) base else f"$base.$us%06d"
  }
}
