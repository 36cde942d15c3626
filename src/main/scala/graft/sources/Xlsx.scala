package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import javax.xml.parsers.DocumentBuilderFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.{Document, Element}

/** Minimal XLSX (ECMA-376 OOXML) reader + writer in pure JDK — no POI, no
  * new dependency: an .xlsx file is a ZIP of XML parts with documented
  * shapes ([Content_Types].xml, xl/workbook.xml + its rels, shared strings,
  * one XML part per worksheet).
  *
  * This is the S5 surface the reference drives with `pd.read_excel(url,
  * sheet_name=['BAs', 'Energy Sources'])` (EIA930PipelineHourlyData.py:33-34):
  * a small reference workbook parsed on the DRIVER (pandas does exactly the
  * same) and broadcast from there — never a distributed read, so a
  * driver-side parse is the right shape at any scale.
  *
  * Reader coverage: sheet name -> part resolution through workbook rels,
  * shared strings (t="s", including rich-text runs), inline strings
  * (t="inlineStr"), formula-string cells (t="str"), numeric cells, and
  * sparse rows (skipped cells resolved by A1-style references, gaps = null).
  */
object Xlsx {

  // ---- reader -------------------------------------------------------------

  /** Resolve a path-or-URL to a local file for the ZIP reader: plain paths
    * pass through, `file://` URLs map to their path, and `http(s)://` URLs
    * are fetched ONCE into a temp file that lives only for `f` — the
    * reference reads the reference-tables workbook straight off the EIA URL
    * (EIA930PipelineHourlyData.py:33 `pd.read_excel(url, ...)`), and a
    * driver-side fetch of a dimension-sized workbook is the right shape at
    * any scale (the data is broadcast from the driver either way).
    */
  private def withLocalCopy[T](pathOrUrl: String)(f: String => T): T =
    if (pathOrUrl.startsWith("file:"))
      f(java.nio.file.Paths.get(java.net.URI.create(pathOrUrl)).toString)
    else if (pathOrUrl.startsWith("http://") || pathOrUrl.startsWith("https://")) {
      val tmp = java.nio.file.Files.createTempFile("graft-xlsx", ".xlsx")
      try {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(pathOrUrl))
          .timeout(java.time.Duration.ofSeconds(60)).GET().build()
        val resp = HttpPages.defaultClient.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofFile(tmp))
        require(resp.statusCode() == 200,
          s"xlsx: HTTP ${resp.statusCode()} fetching $pathOrUrl")
        f(tmp.toString)
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else f(pathOrUrl)

  private def parseXml(bytes: Array[Byte]): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false) // standard parts use the default (unprefixed) ns
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def part(zip: ZipFile, name: String): Array[Byte] = {
    val e = zip.getEntry(name)
    require(e != null, s"xlsx: missing part $name")
    zip.getInputStream(e).readAllBytes()
  }

  private def elems(doc: Document, tag: String): Seq[Element] = {
    val nl = doc.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }
  private def childElems(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** Sheet names in workbook order. Accepts a local path or a URL. */
  def sheetNames(path: String): Seq[String] = withLocalCopy(path) { local =>
    val zip = new ZipFile(local)
    try elems(parseXml(part(zip, "xl/workbook.xml")), "sheet").map(_.getAttribute("name"))
    finally zip.close()
  }

  /** Text of one shared-string item: plain `<t>`, or the concatenation of
    * rich-text runs' `<r><t>` — EXCLUDING phonetic runs (`<rPh>`, furigana
    * annotations some Excel locales emit), whose `<t>` elements are guides,
    * not cell content. `xml:space="preserve"` needs no handling: DOM keeps
    * text content verbatim either way.
    */
  private def sharedStringText(si: Element): String =
    childElems(si, "t").filter { t =>
      var p = t.getParentNode
      var inPhonetic = false
      while (p != null && p != si) {
        if (p.getNodeName == "rPh") inPhonetic = true
        p = p.getParentNode
      }
      !inPhonetic
    }.map(_.getTextContent).mkString

  /** "BC" -> 0-based column index (A=0, Z=25, AA=26 …). */
  private[sources] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    require(letters.nonEmpty, s"xlsx: bad cell ref '$ref'")
    letters.foldLeft(0)((acc, c) => acc * 26 + (c.toUpper - 'A' + 1)) - 1
  }

  /** All cells of one sheet as rows of Option[String] (None = absent cell),
    * resolved through shared strings. Driver-side: reference workbooks are
    * dimension-table sized.
    */
  def readRows(path: String, sheet: String): Seq[Seq[Option[String]]] =
   withLocalCopy(path) { local =>
    val zip = new ZipFile(local)
    try {
      val wb = parseXml(part(zip, "xl/workbook.xml"))
      val rels = parseXml(part(zip, "xl/_rels/workbook.xml.rels"))
      val ridToTarget = elems(rels, "Relationship")
        .map(r => r.getAttribute("Id") -> r.getAttribute("Target")).toMap
      val sheetElem = elems(wb, "sheet").find(_.getAttribute("name") == sheet)
        .getOrElse(throw new IllegalArgumentException(
          s"xlsx: no sheet '$sheet' in $path (have: ${sheetNames(path).mkString(", ")})"))
      // r:id attribute; with namespace-unaware parsing the qualified name is literal
      val rid = sheetElem.getAttribute("r:id")
      val target = ridToTarget.getOrElse(rid,
        throw new IllegalArgumentException(s"xlsx: unresolved sheet relationship $rid"))
      val partName = if (target.startsWith("/")) target.drop(1) else s"xl/$target"

      val shared: IndexedSeq[String] =
        if (zip.getEntry("xl/sharedStrings.xml") == null) IndexedSeq.empty
        else elems(parseXml(part(zip, "xl/sharedStrings.xml")), "si")
          .map(sharedStringText).toIndexedSeq

      val sheetDoc = parseXml(part(zip, partName))
      elems(sheetDoc, "row").map { row =>
        val cells = mutable.Map.empty[Int, String]
        childElems(row, "c").foreach { c =>
          val idx = colIndex(c.getAttribute("r"))
          val t = c.getAttribute("t")
          val v: Option[String] = t match {
            case "s" =>
              childElems(c, "v").headOption.map(v => shared(v.getTextContent.trim.toInt))
            case "inlineStr" =>
              childElems(c, "is").headOption.map(is => childElems(is, "t").map(_.getTextContent).mkString)
            case _ => // "" (number), "str" (formula result), "b" (boolean)
              childElems(c, "v").headOption.map(_.getTextContent)
          }
          v.foreach(cells.update(idx, _))
        }
        val width = if (cells.isEmpty) 0 else cells.keys.max + 1
        (0 until width).map(cells.get)
      }
    } finally zip.close()
   }

  /** One sheet as a DataFrame: first row = header (null header cells become
    * _cN), every value a string — typing/slicing is downstream Column algebra,
    * same contract as the CSV dimension readers.
    */
  def readSheet(spark: SparkSession, path: String, sheet: String): DataFrame = {
    val rows = readRows(path, sheet)
    require(rows.nonEmpty, s"xlsx: sheet '$sheet' is empty")
    val header = rows.head.zipWithIndex.map { case (h, i) => h.getOrElse(s"_c$i") }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = rows.tail.map { r =>
      Row.fromSeq(header.indices.map(i => r.lift(i).flatten.orNull))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  // ---- writer (fixtures + sink-side completeness) -------------------------

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val FixedTime = 1577836800000L // 2020-01-01; deterministic archives

  /** Write a workbook: sheet name -> rows of cells (String = shared-string
    * cell, any numeric -> number cell). Strings go through a real shared-
    * string table, so reading back exercises the sst path. Deterministic
    * output (fixed entry times, sorted parts) — fixture regeneration is
    * byte-stable.
    */
  def write(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    val strings = mutable.LinkedHashMap.empty[String, Int]
    def sstIndex(s: String): Int = strings.getOrElseUpdate(s, strings.size)

    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }

    val sheetParts = sheets.zipWithIndex.map { case ((_, rows), si) =>
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.flatMap {
          case (null, _) => None
          case (cell, ci) =>
            val ref = s"${colRef(ci)}${ri + 1}"
            Some(cell match {
              case s: String => s"""<c r="$ref" t="s"><v>${sstIndex(s)}</v></c>"""
              case n => s"""<c r="$ref"><v>$n</v></c>"""
            })
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      s"xl/worksheets/sheet${si + 1}.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""".stripMargin
    }

    val sheetDecls = sheets.zipWithIndex.map { case ((name, _), si) =>
      s"""<sheet name="${xmlEscape(name)}" sheetId="${si + 1}" r:id="rId${si + 1}"/>"""
    }.mkString
    val relDecls = sheets.indices.map { si =>
      s"""<Relationship Id="rId${si + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${si + 1}.xml"/>"""
    }.mkString
    val sst = strings.keys.map(s => s"<si><t>${xmlEscape(s)}</t></si>").mkString
    val overrides = sheets.indices.map { si =>
      s"""<Override PartName="/xl/worksheets/sheet${si + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
    }.mkString

    val parts: Seq[(String, String)] = Seq(
      "[Content_Types].xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>$overrides</Types>""".stripMargin,
      "_rels/.rels" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetDecls</sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$relDecls<Relationship Id="rIdSst" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>""".stripMargin,
      "xl/sharedStrings.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">$sst</sst>""".stripMargin
    ) ++ sheetParts

    val out = new ZipOutputStream(java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(path)))
    try parts.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(FixedTime)
      out.putNextEntry(e)
      out.write(content.getBytes(UTF_8))
      out.closeEntry()
    } finally out.close()
  }
}
