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
  *     booleans become "true"/"false", shared/inline strings resolve).
  *     Known divergence: date-formatted numeric cells surface as Excel
  *     serial numbers, not datetimes — mapping them needs styles.xml
  *     number-format resolution, deferred (openpyxl's data_only gives the
  *     reference typed datetimes here).
  *
  * Built on JDK zip + StAX only (no POI jar exists in this environment —
  * SURVEY.md §7.4 #4). One InputPartition per file: xlsx is a zip container
  * and not block-splittable; parallelism at scale comes from many files,
  * which is how spreadsheet drops arrive in practice.
  */
class XlsxSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xlsx"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = XlsxSource.requirePath(options)
    val files = XlsxSource.expand(path, XlsxSource.hadoopConf())
    require(files.nonEmpty, s"xlsx: no .xlsx files under $path")
    // schema = header of the first file (lexicographic order, deterministic);
    // every other file must produce the same header — checked at read time
    XlsxParser.schemaOf(files.head, XlsxSource.hadoopConf())
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new XlsxTable(schema, properties.get("path"))
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
    java.util.EnumSet.of(TableCapability.BATCH_READ)

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
    val shared = readSharedStrings(path, conf)
    val sheetXml = readEntry(path, conf,
      n => n.matches("xl/worksheets/sheet1\\.xml") || n.matches("xl/worksheets/sheet\\.xml"))
      .orElse(readEntry(path, conf, _.startsWith("xl/worksheets/")))
      .getOrElse(throw new IllegalArgumentException(s"xlsx $path: no worksheet"))
    parseSheet(sheetXml, shared).iterator
  }

  private def readSharedStrings(path: String,
      conf: org.apache.hadoop.conf.Configuration): IndexedSeq[String] =
    readEntry(path, conf, _ == "xl/sharedStrings.xml") match {
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

  private def parseSheet(bytes: Array[Byte],
      shared: IndexedSeq[String]): Seq[Array[String]] = {
    val rows = ArrayBuffer.empty[Array[String]]
    withXml(bytes) { r =>
      var cells: ArrayBuffer[String] = null
      var cellCol = -1
      var cellType = ""
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
}
