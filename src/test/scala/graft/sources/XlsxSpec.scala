package graft.sources

import graft.TestSpark
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** xlsx DataSource V2 semantics (A4–A7), driven through spark.read over
  * fixture workbooks written with plain java.util.zip — no spreadsheet
  * library on either side. */
class XlsxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Minimal SpreadsheetML workbook: shared strings + one sheet. */
  private def writeXlsx(sharedStrings: Seq[String],
      rows: Seq[Seq[(String, String)]]): String = {
    // each cell: (type, rawValue); type "" means numeric
    val f = Files.createTempFile("graft_wb", ".xlsx")
    val zip = new ZipOutputStream(Files.newOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>""")
    if (sharedStrings.nonEmpty)
      entry("xl/sharedStrings.xml",
        s"""<?xml version="1.0"?><sst>${sharedStrings.map(s => s"<si><t>$s</t></si>").mkString}</sst>""")
    val colLetter = "ABCDEFGH"
    val sheetRows = rows.zipWithIndex.map { case (cells, ri) =>
      val cellXml = cells.zipWithIndex.collect {
        case ((tpe, raw), ci) if raw != null =>
          val ref = s"${colLetter(ci)}${ri + 1}"
          val tAttr = if (tpe.nonEmpty) s""" t="$tpe"""" else ""
          if (tpe == "inlineStr") s"""<c r="$ref"$tAttr><is><t>$raw</t></is></c>"""
          else s"""<c r="$ref"$tAttr><v>$raw</v></c>"""
      }.mkString
      s"<row r=\"${ri + 1}\">$cellXml</row>"
    }.mkString
    entry("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$sheetRows</sheetData></worksheet>""")
    zip.close()
    f.toString
  }

  test("header extraction: trim, column_{i} fallback, value typing (A5/A6)") {
    val path = writeXlsx(
      sharedStrings = Seq("  name ", "alpha", "beta"),
      rows = Seq(
        Seq(("s", "0"), ("", null), ("inlineStr", "qty ")), // header: shared, MISSING, inline
        Seq(("s", "1"), ("", "12.5"), ("b", "1")),
        Seq(("s", "2"), ("", "7"), ("b", "0"))))
    val df = spark.read.format("xlsx").load(path)
    assert(df.columns.toSeq == Seq("name", "column_1", "qty"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("alpha", "12.5", "true"), ("beta", "7", "false")))
  }

  test("short rows are null-padded; sparse cells resolve by reference (A6)") {
    val path = writeXlsx(
      sharedStrings = Seq("a", "b", "x"),
      rows = Seq(
        Seq(("s", "0"), ("s", "1"), ("inlineStr", "c")),
        Seq(("s", "2")), // short row → padded
        Seq(("s", "2"), (null, null), ("inlineStr", "z")))) // gap in the middle
    val df = spark.read.format("xlsx").load(path)
    val rows = df.collect().map(r => (0 until 3).map(i =>
      Option(r.getString(i)).getOrElse("·")).mkString(","))
    assert(rows.toSeq == Seq("x,·,·", "x,·,z"))
  }

  test("all-falsy rows are dropped during the scan (A7: `if not any(row)`)") {
    val path = writeXlsx(
      sharedStrings = Seq("h1", "h2", "keep"),
      rows = Seq(
        Seq(("s", "0"), ("s", "1")),
        Seq(("", "0"), ("", "0.0")), // numeric zeros → falsy → dropped
        Seq(("b", "0"), ("", null)), // false + missing → dropped
        Seq(("s", "2"), ("", "0")))) // one truthy cell → kept
    val df = spark.read.format("xlsx").load(path)
    assert(df.count() == 1)
    assert(df.collect()(0).getString(0) == "keep")
  }

  test("an entirely empty header row aborts the read (A5)") {
    val path = writeXlsx(
      sharedStrings = Seq.empty,
      rows = Seq(Seq(("inlineStr", " "), ("inlineStr", "")),
        Seq(("", "1"), ("", "2"))))
    val ex = intercept[Exception] {
      spark.read.format("xlsx").load(path)
    }
    assert(ex.getMessage.contains("empty header row"))
  }

  test("a directory of workbooks reads as one table, one partition per file") {
    val dir = Files.createTempDirectory("graft_wb_dir")
    def writeInto(name: String, values: Seq[String]): Unit = {
      val f = writeXlsx(
        sharedStrings = Seq("col") ++ values,
        rows = Seq(Seq(("s", "0"))) ++
          values.indices.map(i => Seq(("s", s"${i + 1}"))))
      Files.move(java.nio.file.Paths.get(f), dir.resolve(name))
    }
    writeInto("a.xlsx", Seq("v1", "v2"))
    writeInto("b.xlsx", Seq("v3"))
    val df = spark.read.format("xlsx").load(dir.toString)
    assert(df.columns.toSeq == Seq("col"))
    assert(df.rdd.getNumPartitions == 2)
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("v1", "v2", "v3"))
  }

  /** Fixture writer for the styles/active-sheet tests: explicit workbook.xml
    * (with optional activeTab + date1904), workbook.xml.rels, styles.xml, and
    * one or more sheets of raw (type, style, value) cells. */
  private def writeXlsxFull(
      sheets: Seq[Seq[Seq[(String, Int, String)]]],
      activeTab: Int = 0,
      date1904: Boolean = false,
      stylesXml: Option[String] = None): String = {
    val f = Files.createTempFile("graft_wbf", ".xlsx")
    val zip = new ZipOutputStream(Files.newOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    val pr = if (date1904) """<workbookPr date1904="true"/>""" else ""
    val sheetTags = sheets.indices.map(i =>
      s"""<sheet name="S${i + 1}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""").mkString
    entry("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">$pr<bookViews><workbookView activeTab="$activeTab"/></bookViews><sheets>$sheetTags</sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">${
        sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString
      }</Relationships>""")
    stylesXml.foreach(entry("xl/styles.xml", _))
    val colLetter = "ABCDEFGH"
    sheets.zipWithIndex.foreach { case (rows, si) =>
      val sheetRows = rows.zipWithIndex.map { case (cells, ri) =>
        val cellXml = cells.zipWithIndex.collect {
          case ((tpe, style, raw), ci) if raw != null =>
            val ref = s"${colLetter(ci)}${ri + 1}"
            val tAttr = if (tpe.nonEmpty) s""" t="$tpe"""" else ""
            val sAttr = if (style != 0) s""" s="$style"""" else ""
            if (tpe == "inlineStr") s"""<c r="$ref"$tAttr$sAttr><is><t>$raw</t></is></c>"""
            else s"""<c r="$ref"$tAttr$sAttr><v>$raw</v></c>"""
        }.mkString
        s"<row r=\"${ri + 1}\">$cellXml</row>"
      }.mkString
      entry(s"xl/worksheets/sheet${si + 1}.xml",
        s"""<?xml version="1.0"?><worksheet><sheetData>$sheetRows</sheetData></worksheet>""")
    }
    zip.close()
    f.toString
  }

  // xf 0: General; xf 1: builtin date 14; xf 2: custom yyyy-mm-dd; xf 3:
  // numeric 0.00 (NOT a date despite custom id order); xf 4: builtin time 20
  private val datedStyles =
    """<?xml version="1.0"?><styleSheet>
      |<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd"/></numFmts>
      |<cellStyleXfs count="1"><xf numFmtId="14"/></cellStyleXfs>
      |<cellXfs count="5">
      |<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/>
      |<xf numFmtId="2"/><xf numFmtId="20"/>
      |</cellXfs></styleSheet>""".stripMargin

  test("date-formatted serials resolve to ISO datetimes via styles.xml") {
    val header = Seq(("inlineStr", 0, "d14"), ("inlineStr", 0, "d164"),
      ("inlineStr", 0, "plain"), ("inlineStr", 0, "time"))
    val path = writeXlsxFull(
      sheets = Seq(Seq(
        header,
        Seq(("", 1, "45292"), ("", 2, "45292.5"), ("", 3, "45292.5"), ("", 4, "0.75")),
        Seq(("", 1, "45292.4375"), ("", 2, "36892"), ("", 0, "7"), ("", 4, "0.5")))),
      stylesXml = Some(datedStyles))
    val rows = spark.read.format("xlsx").load(path).collect()
      .map(r => (0 until 4).map(r.getString))
    assert(rows(0) == Seq("2024-01-01T00:00:00", "2024-01-01T12:00:00", "45292.5", "18:00:00"))
    assert(rows(1) == Seq("2024-01-01T10:30:00", "2001-01-01T00:00:00", "7", "12:00:00"))
  }

  test("1900 leap-bug compensation matches openpyxl (serials 59/60/61)") {
    val path = writeXlsxFull(
      sheets = Seq(Seq(
        Seq(("inlineStr", 0, "d")),
        Seq(("", 1, "59")), Seq(("", 1, "60")), Seq(("", 1, "61")), Seq(("", 1, "1")))),
      stylesXml = Some(datedStyles))
    val vals = spark.read.format("xlsx").load(path).collect().map(_.getString(0)).toSeq
    assert(vals == Seq("1900-02-28T00:00:00", "1900-02-28T00:00:00",
      "1900-03-01T00:00:00", "1900-01-01T00:00:00"))
  }

  test("1904 date system (workbookPr date1904)") {
    val path = writeXlsxFull(
      sheets = Seq(Seq(Seq(("inlineStr", 0, "d")), Seq(("", 1, "100")))),
      date1904 = true,
      stylesXml = Some(datedStyles))
    val vals = spark.read.format("xlsx").load(path).collect().map(_.getString(0)).toSeq
    assert(vals == Seq("1904-04-10T00:00:00"))
  }

  test("serials within 0.5ms of midnight carry into the next day (openpyxl)") {
    // 45292 + (86399999.8ms of day) rounds to a full 24h: openpyxl's
    // timedelta arithmetic lands on the NEXT midnight, not the same day's
    assert(graft.sources.ExcelDates.serialToIso(45292.9999999977, date1904 = false)
      == "2024-01-02T00:00:00")
    // sanity: a fraction that rounds within the day stays put
    assert(graft.sources.ExcelDates.serialToIso(45292.5, date1904 = false)
      == "2024-01-01T12:00:00")
    // time-only serial wrapping rounds to midnight
    assert(graft.sources.ExcelDates.serialToIso(0.9999999999, date1904 = false)
      == "00:00:00")
  }

  test("a user-supplied schema with non-string types is rejected fast") {
    val path = writeXlsx(
      sharedStrings = Seq("a", "b", "x", "y"),
      rows = Seq(Seq(("s", "0"), ("s", "1")), Seq(("s", "2"), ("s", "3"))))
    val err = intercept[IllegalArgumentException] {
      spark.read.format("xlsx")
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("a",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("b",
            org.apache.spark.sql.types.LongType))))
        .load(path).collect()
    }
    assert(err.getMessage.contains("b: bigint"))
  }

  test("the ACTIVE sheet is read, not the first (excel_reader.py:41)") {
    val s1 = Seq(Seq(("inlineStr", 0, "col")), Seq(("inlineStr", 0, "wrong-sheet")))
    val s2 = Seq(Seq(("inlineStr", 0, "col")), Seq(("inlineStr", 0, "active-sheet")))
    val path = writeXlsxFull(sheets = Seq(s1, s2), activeTab = 1)
    val vals = spark.read.format("xlsx").load(path).collect().map(_.getString(0)).toSeq
    assert(vals == Seq("active-sheet"))
  }

  test("xlsx drives the full ingestion pipeline end-to-end (A4→A22)") {
    val (mock, server, url) = graft.receiver.MockPimCore.serve()
    try {
      val path = writeXlsx(
        sharedStrings = Seq("sku", "price") ++ (1 to 7).map(i => s"SKU-$i"),
        rows = Seq(Seq(("s", "0"), ("s", "1"))) ++
          (1 to 7).map(i => Seq(("s", s"${i + 1}"), ("", s"$i.50"))))
      val store = graft.state.IngestionStateStore.inMemory()
      val result = graft.ingest.IngestionPipeline.run(spark,
        graft.api.IngestRequest(path, "excel", url, chunkSizeByRecords = Some(3)),
        store)
      assert(result.totalRecords == 7)
      assert(result.chunksSent == 3) // 3+3+1
      assert(result.state.exists(_.status == graft.api.IngestionState.Completed))
      assert(mock.completedCount == 1)
    } finally server.stop(0)
  }
}
