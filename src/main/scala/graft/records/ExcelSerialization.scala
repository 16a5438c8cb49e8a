package graft.records

import graft.model.{AuthLookup, MarcRecord}
import scala.collection.mutable

/** `.xlsx` source (reference from_excel, dlx/marc/__init__.py:286-290
  * + dlx/util.py:43-66 Table.from_excel). The reference depends on the
  * obsolete xlrd package and skips its own excel tests; here the
  * format is read directly — an xlsx is a zip of XML parts, so the JDK
  * (java.util.zip + javax.xml.stream) covers it with no new
  * dependencies.
  *
  * Reference value semantics reproduced: numeric cells render as
  * integers when integral (xlrd ctype 2 → int(value)), every cell is
  * str().rstrip()'d. Date-styled cells are out of scope like the
  * reference's ("todo" upstream); they surface as raw serial numbers.
  */
object ExcelSerialization {

  /** sheet-1 rows as trimmed strings, shared strings resolved. */
  def readXlsxRows(path: String): Seq[Seq[String]] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      def entryBytes(name: String): Option[Array[Byte]] =
        Option(zip.getEntry(name)).map { e =>
          val in = zip.getInputStream(e)
          try in.readAllBytes() finally in.close()
        }
      val shared = entryBytes("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
      val sheetName = {
        import scala.jdk.CollectionConverters._
        zip.entries().asScala.map(_.getName)
          .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
          .toSeq.sorted.headOption
          .getOrElse(throw new IllegalArgumentException(s"No worksheet in $path"))
      }
      parseSheet(entryBytes(sheetName).get, shared)
    } finally zip.close()
  }

  /** concatenated <t> runs per <si> (plain or rich-text). */
  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val reader = xmlReader(bytes)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (reader.hasNext) {
      reader.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          reader.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          cur.append(reader.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += cur.result()
            case _ =>
          }
        case _ =>
      }
    }
    out.result()
  }

  /** "A"->0, "AB"->27 — the column letters of a cell reference. */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  /** reference clean(): numeric → int when integral; rstrip all. */
  private def clean(raw: String, cellType: String, shared: Vector[String]): String = {
    val v = cellType match {
      case "s" => shared.lift(raw.trim.toInt).getOrElse("")
      case "b" => raw.trim // xlrd booleans surface as 1/0
      case _ => raw
    }
    val rendered =
      if (cellType == "" || cellType == "n") {
        // plain numeric cell: integral values render as ints (xlrd
        // ctype 2 → int(cell.value)); others keep their repr
        try {
          val d = v.trim.toDouble
          if (d == math.rint(d) && !d.isInfinite) d.toLong.toString else v.trim
        } catch { case _: NumberFormatException => v }
      } else v
    rendered.replaceAll("""[\s ]+$""", "")
  }

  private def parseSheet(bytes: Array[Byte], shared: Vector[String]): Seq[Seq[String]] = {
    val reader = xmlReader(bytes)
    val rows = mutable.Buffer.empty[Seq[String]]
    var row: mutable.Buffer[String] = null
    var cellCol = 0
    var cellType = ""
    var inV = false
    var inInlineT = false
    val v = new StringBuilder
    while (reader.hasNext) {
      reader.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          reader.getLocalName match {
            case "row" => row = mutable.Buffer.empty
            case "c" =>
              val ref = Option(reader.getAttributeValue(null, "r")).getOrElse("")
              cellCol = if (ref.nonEmpty) colIndex(ref) else row.length
              cellType = Option(reader.getAttributeValue(null, "t")).getOrElse("")
              v.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inInlineT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV || inInlineT =>
          v.append(reader.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "v" => inV = false
            case "t" => inInlineT = false
            case "c" =>
              while (row.length < cellCol) row += "" // gap cells
              row += clean(v.result(), cellType, shared)
            case "row" => rows += row.toSeq; row = null
            case _ =>
          }
        case _ =>
      }
    }
    rows.toSeq
  }

  private def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
  }

  /** from_excel → records, through the same Table path as from_csv. */
  def fromExcel(path: String, recordType: String, authControl: Boolean = true)
      (implicit auth: AuthLookup): Seq[MarcRecord] =
    rowsToRecords(readXlsxRows(path), recordType, authControl)

  /** [[fromExcel]] over in-memory bytes — the executor-side entry
    * point (no local file needed on a cluster worker). */
  def fromExcelBytes(bytes: Array[Byte], recordType: String, authControl: Boolean = true)
      (implicit auth: AuthLookup): Seq[MarcRecord] =
    rowsToRecords(readXlsxRows(bytes), recordType, authControl)

  private def rowsToRecords(all: Seq[Seq[String]], recordType: String,
      authControl: Boolean)(implicit auth: AuthLookup): Seq[MarcRecord] = {
    val rows = all.filter(_.exists(_.nonEmpty))
    require(rows.nonEmpty, "Empty sheet")
    val header = rows.head.map(_.trim)
    val table = new TableSerialization.Table
    for ((row, ri) <- rows.tail.zipWithIndex; (cell, ci) <- row.zipWithIndex
         if ci < header.length && cell.nonEmpty)
      table.set(ri + 1, header(ci), cell)
    table.header = header.toVector
    TableSerialization.fromTable(table, recordType, authControl)
  }

  /** sheet-1 rows from in-memory xlsx bytes (ZipInputStream; entry
    * order in the archive is not guaranteed, so parts are collected
    * first). */
  def readXlsxRows(bytes: Array[Byte]): Seq[Seq[String]] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val parts = mutable.Map.empty[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        parts(e.getName) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
    val sheetName = parts.keys
      .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
      .toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException("No worksheet in xlsx bytes"))
    parseSheet(parts(sheetName), shared)
  }

  /** Minimal xlsx writer (the export dual of the reader): one sheet,
    * every cell an inline string — JDK zip + hand-built XML, zero new
    * dependencies. Round-trips through [[readXlsxRows]] and opens in
    * spreadsheet apps. */
  def toXlsx(rows: Seq[Seq[String]]): Array[Byte] = {
    def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sheet = new StringBuilder(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    for (row <- rows) {
      sheet.append("<row>")
      for (cell <- row)
        sheet.append(s"""<c t="inlineStr"><is><t>${esc(cell)}</t></is></c>""")
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")
    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
         """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
         """<Default Extension="xml" ContentType="application/xml"/>""" +
         """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
         """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
         """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
         """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
         """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
         """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
         """</Relationships>"""),
      "xl/worksheets/sheet1.xml" -> sheet.result())
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    for ((name, content) <- parts) {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }
}
