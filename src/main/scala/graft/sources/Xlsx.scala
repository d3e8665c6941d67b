package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal OOXML (.xlsx) workbook writer — the reference's report sink
  * (survey_analysis.py:370-446) re-expressed on nothing but `java.util.zip`.
  *
  * An xlsx file is a zip of XML parts; this writer emits the five required
  * parts ([Content_Types].xml, _rels/.rels, xl/workbook.xml,
  * xl/_rels/workbook.xml.rels, xl/styles.xml) plus one worksheet part per
  * sheet. Strings are written as INLINE strings (t="inlineStr"), which
  * drops the sharedStrings part and keeps the writer single-pass and
  * streaming: nothing is buffered beyond one row's XML.
  *
  * Styles match the reference's three formats: 0 = default, 1 = wrap +
  * vertical-top (answer columns), 2 = bold (headers/titles).
  *
  * Scale posture: an .xlsx is definitionally a single driver-side artifact
  * (one zip stream, 1,048,576-row hard format limit) — this sink is for
  * REPORT-sized frames. The distributed analog for bulk data remains the
  * partitioned parquet sink (SurveyPipeline.writeReport); callers guard
  * row counts before collecting (see SurveyPipeline.writeExcelReport).
  */
object Xlsx {

  /** Style ids understood by the writer (indices into styles.xml cellXfs). */
  val StyleDefault = 0
  val StyleWrapTop = 1
  val StyleBold = 2

  sealed trait SheetSpec { def name: String }

  /** A rectangular table: one bold header row, then data rows. `colWidths`
    * are xlsx character widths (empty = engine defaults); `wrapCols` are
    * 0-based column indices rendered wrap/valign-top (the reference's
    * `*_Answer` treatment, survey_analysis.py:389-394). */
  final case class Table(
      name: String,
      header: Seq[String],
      rows: Seq[Seq[Any]],
      colWidths: Seq[Double] = Nil,
      wrapCols: Set[Int] = Set.empty) extends SheetSpec

  /** Sparse cells at explicit (0-based row, 0-based col) positions — the
    * chart-sheet helper-block layout (survey_analysis.py:417-423). */
  final case class Sparse(
      name: String,
      cells: Seq[(Int, Int, Any, Int)]) extends SheetSpec

  /** xlsx rows-per-sheet hard limit (2^20). */
  val MaxRows: Int = 1 << 20

  def write(path: String, sheets: Seq[SheetSpec]): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    sheets.foreach {
      case t: Table => require(t.rows.length < MaxRows,
        s"sheet '${t.name}': ${t.rows.length} rows exceeds the xlsx limit")
      case _ =>
    }
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def part(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes(StandardCharsets.UTF_8))
        zos.closeEntry()
      }
      part("[Content_Types].xml", contentTypes(sheets.length))
      part("_rels/.rels", rootRels)
      part("xl/workbook.xml", workbook(sheets.map(_.name)))
      part("xl/_rels/workbook.xml.rels", workbookRels(sheets.length))
      part("xl/styles.xml", styles)
      sheets.zipWithIndex.foreach { case (s, i) =>
        zos.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${i + 1}.xml"))
        val w = new java.io.OutputStreamWriter(zos, StandardCharsets.UTF_8)
        writeWorksheet(w, s)
        w.flush()
        zos.closeEntry()
      }
    } finally zos.close()
  }

  // ---- worksheet rendering ----

  /** 0-based column index → A1-style letters. */
  def colLetters(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  /** Escape XML text content; drop chars illegal in XML 1.0 (surveys can
    * contain stray control bytes; astral chars are legal and kept). */
  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c if c >= 0x20 || c == '\t' || c == '\n' || c == '\r' => sb.append(c)
      case _ => ()
    }
    sb.toString
  }

  private def escAttr(s: String): String =
    esc(s).replace("\"", "&quot;")

  private def cellXml(rowRef: Int, colIdx: Int, v: Any, style: Int): String = {
    val ref = s"${colLetters(colIdx)}$rowRef"
    val s = if (style != 0) s""" s="$style"""" else ""
    v match {
      case null => ""
      case n @ (_: Int | _: Long | _: Short | _: Byte) =>
        s"""<c r="$ref"$s><v>$n</v></c>"""
      case d: Double if !d.isNaN && !d.isInfinite =>
        s"""<c r="$ref"$s><v>$d</v></c>"""
      case f: Float if !f.isNaN && !f.isInfinite =>
        s"""<c r="$ref"$s><v>$f</v></c>"""
      case b: Boolean =>
        s"""<c r="$ref"$s t="b"><v>${if (b) 1 else 0}</v></c>"""
      case other =>
        val str = other.toString
        // blank → no cell at all (XlsxWriter writes nothing for empty
        // strings; an empty inline-str cell would read back differently)
        if (str.isEmpty) ""
        else s"""<c r="$ref"$s t="inlineStr"><is><t xml:space="preserve">${esc(str)}</t></is></c>"""
    }
  }

  private def writeWorksheet(w: java.io.Writer, spec: SheetSpec): Unit = {
    w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""")
    spec match {
      case Table(_, header, rows, widths, wrapCols) =>
        if (widths.nonEmpty) {
          w.write("<cols>")
          widths.zipWithIndex.foreach { case (cw, i) =>
            w.write(s"""<col min="${i + 1}" max="${i + 1}" width="$cw" customWidth="1"/>""")
          }
          w.write("</cols>")
        }
        w.write("<sheetData>")
        w.write(s"""<row r="1">""")
        header.zipWithIndex.foreach { case (h, i) => w.write(cellXml(1, i, h, StyleBold)) }
        w.write("</row>")
        var r = 2
        rows.foreach { row =>
          w.write(s"""<row r="$r">""")
          row.zipWithIndex.foreach { case (v, i) =>
            w.write(cellXml(r, i, v, if (wrapCols(i)) StyleWrapTop else StyleDefault))
          }
          w.write("</row>")
          r += 1
        }
        w.write("</sheetData>")
      case Sparse(_, cells) =>
        w.write("<sheetData>")
        cells.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (row0, cs) =>
          w.write(s"""<row r="${row0 + 1}">""")
          cs.sortBy(_._2).foreach { case (_, col0, v, style) =>
            w.write(cellXml(row0 + 1, col0, v, style))
          }
          w.write("</row>")
        }
        w.write("</sheetData>")
    }
    w.write("</worksheet>")
  }

  // ---- fixed parts ----

  private def contentTypes(nSheets: Int): String = {
    val overrides = (1 to nSheets).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
      overrides + "</Types>"
  }

  private val rootRels: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      "</Relationships>"

  private def workbook(names: Seq[String]): String = {
    val sheets = names.zipWithIndex.map { case (n, i) =>
      s"""<sheet name="${escAttr(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      s"<sheets>$sheets</sheets></workbook>"
  }

  private def workbookRels(nSheets: Int): String = {
    val rels = (1 to nSheets).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      rels +
      s"""<Relationship Id="rId${nSheets + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
      "</Relationships>"
  }

  /** cellXfs: 0 default, 1 wrap+top (StyleWrapTop), 2 bold (StyleBold). */
  private val styles: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>""" +
      """<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>""" +
      """<fills count="2"><fill><patternFill patternType="none"/></fill>""" +
      """<fill><patternFill patternType="gray125"/></fill></fills>""" +
      """<borders count="1"><border><left/><right/><top/><bottom/><diagonal/></border></borders>""" +
      """<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>""" +
      """<cellXfs count="3">""" +
      """<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>""" +
      """<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0" applyAlignment="1"><alignment wrapText="1" vertical="top"/></xf>""" +
      """<xf numFmtId="0" fontId="1" fillId="0" borderId="0" xfId="0" applyFont="1"/>""" +
      """</cellXfs></styleSheet>"""
}
