package graft.sources

import graft.SparkSpec

class ExcelSourceSpec extends SparkSpec {

  private def fixture: String =
    getClass.getResource("/fixtures/eia930/reference.xlsx").getPath

  test("A1 column references decode correctly (A, Z, AA, BC)") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA12") == 26)
    assert(Xlsx.colIndex("BC3") == 2 * 26 + 2)
  }

  test("committed workbook: sheet discovery and unknown-sheet error") {
    assert(Xlsx.sheetNames(fixture) == Seq("BAs", "Energy Sources"))
    val e = intercept[IllegalArgumentException](
      Xlsx.readRows(fixture, "Nope"))
    assert(e.getMessage.contains("no sheet 'Nope'"))
  }

  test("S5: BAs sheet reads and slices to the first 6 columns") {
    val ba = CsvSources.balancingAuthoritiesXlsx(spark, fixture)
    // slice drops the extra workbook columns, keeps the schema's 6
    assert(ba.columns.toSeq == CsvSources.balancingAuthoritiesSchema.fieldNames.toSeq)
    assert(ba.count() == 4)
    val ciso = ba.filter(ba("BA Code") === "CISO").collect()(0)
    assert(ciso.getAs[String]("BA Name") == "California ISO")
    assert(ciso.getAs[String]("Time Zone") == "Pacific")
    // sparse row: MISO's absent Time Zone cell surfaces as null
    val miso = ba.filter(ba("BA Code") === "MISO").collect()(0)
    assert(miso.isNullAt(miso.fieldIndex("Time Zone")))
  }

  test("S5: Energy Sources sheet reads whole, numbers as strings") {
    val es = CsvSources.energySourcesXlsx(spark, fixture)
    assert(es.columns.toSeq == Seq("Energy Source Code", "Energy Source Name", "Share"))
    assert(es.count() == 4)
    assert(es.filter(es("Energy Source Code") === "SUN")
      .collect()(0).getAs[String]("Share") == "0.11")
  }

  test("S5 over URL: the pipeline wiring reads the workbook via file:// and http://") {
    // file:// URL straight through the S5 slice (the reference passes a URL,
    // not a path, to pd.read_excel — EIA930PipelineHourlyData.py:33)
    val fileUrl = java.nio.file.Paths.get(fixture).toUri.toString
    assert(fileUrl.startsWith("file:"))
    val ba = CsvSources.balancingAuthoritiesXlsx(spark, fileUrl)
    assert(ba.columns.toSeq == CsvSources.balancingAuthoritiesSchema.fieldNames.toSeq)
    assert(ba.count() == 4)

    // http:// URL against an in-process server vending the workbook bytes
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixture))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/wb.xlsx", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val httpUrl = s"http://127.0.0.1:${server.getAddress.getPort}/wb.xlsx"
      assert(Xlsx.sheetNames(httpUrl) == Seq("BAs", "Energy Sources"))
      val es = CsvSources.energySourcesXlsx(spark, httpUrl)
      assert(es.count() == 4)
    } finally server.stop(0)
  }

  test("writer/reader round-trip: shared strings, gaps, wide sheets, escaping") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx")
      .resolve("t.xlsx").toString
    // 28 columns exercises AA/AB refs; '<&>' exercises XML escaping
    val header: Seq[Any] = (0 until 28).map(i => s"h$i")
    val row: Seq[Any] = Seq("x <&> y", null, 42) ++ Seq.fill(24)(null) :+ "tail"
    Xlsx.write(tmp, Seq("S" -> Seq(header, row)))
    val rows = Xlsx.readRows(tmp, "S")
    assert(rows.head.flatten.size == 28)
    assert(rows(1)(0).contains("x <&> y"))
    assert(rows(1)(1).isEmpty) // gap preserved as absent
    assert(rows(1)(2).contains("42"))
    assert(rows(1)(27).contains("tail"))
  }

  test("real-world shared-strings workbook: rich text runs, styled cells, phonetic runs, preserve-space") {
    // hand-built to mimic what Excel itself emits for the EIA930 reference
    // workbook shape: an sst with count attributes, a plain <si><t>, a
    // rich-text <si> split across styled runs, a phonetic <rPh> run (must be
    // EXCLUDED), xml:space="preserve" leading whitespace, and styled cells
    // (s= attributes) in the sheet
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_sst")
    val p = dir.resolve("s.xlsx").toString
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(p)))
    def put(name: String, content: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes("UTF-8")); out.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook><sheets><sheet name="BAs" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="3">""" +
        """<si><t>BA Code</t></si>""" +
        """<si><r><rPr><b/></rPr><t>California </t></r><r><t>ISO</t></r>""" +
        """<rPh sb="0" eb="4"><t>phonetic-guide</t></rPh></si>""" +
        """<si><t xml:space="preserve"> leading space</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="s" s="1"><v>0</v></c></row>""" +
        """<row r="2"><c r="A2" t="s" s="2"><v>1</v></c>""" +
        """<c r="B2" t="s"><v>2</v></c><c r="C2" s="3"><v>42</v></c>""" +
        """<c r="D2" s="3"/></row>""" + // styled cell with no value = absent
        """</sheetData></worksheet>""")
    out.close()
    val rows = Xlsx.readRows(p, "BAs")
    assert(rows(0) == Seq(Some("BA Code")))
    assert(rows(1)(0).contains("California ISO"), "rich-text runs concatenate, rPh excluded")
    assert(rows(1)(1).contains(" leading space"), "xml:space=preserve text kept verbatim")
    assert(rows(1)(2).contains("42"))
    assert(rows(1).lift(3).forall(_.isEmpty), "valueless styled cell is absent")
  }

  test("reader handles inline strings (producer variant not used by the writer)") {
    // hand-build a minimal workbook whose sheet uses t="inlineStr" — openpyxl
    // write_only mode and several other producers emit this form
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_inline")
    val p = dir.resolve("i.xlsx").toString
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(p)))
    def put(name: String, content: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes("UTF-8")); out.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook><sheets><sheet name="I" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>hello</t></is></c><c r="B1"><v>7</v></c></row></sheetData></worksheet>""")
    out.close()
    val rows = Xlsx.readRows(p, "I")
    assert(rows == Seq(Seq(Some("hello"), Some("7"))))
  }
}
