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
    * chart-sheet helper-block layout (survey_analysis.py:417-423) — plus
    * optional pie charts anchored on the sheet. */
  final case class Sparse(
      name: String,
      cells: Seq[(Int, Int, Any, Int)],
      charts: Seq[Pie] = Nil) extends SheetSpec

  /** One pie chart: categories/values reference a 4-cell helper block on
    * `sheetRef` starting at 1-based row `firstRow` (labels col AY, values
    * col AZ — the reference's helper geometry, survey_analysis.py:417-423),
    * with the cached copies OOXML requires embedded; anchored at the
    * 0-based cell (fromCol, fromRow) spanning the reference's 480×320 px
    * block (:427-444). */
  final case class Pie(
      title: String,
      seriesName: String,
      sheetRef: String,
      firstRow: Int,
      labels: Seq[String],
      values: Seq[Long],
      fromCol: Int,
      fromRow: Int)

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
      // sheets with charts get one drawing part each; chart parts number
      // globally across the workbook (chart1.xml, chart2.xml, ...)
      val drawingOfSheet = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      var nCharts = 0
      val chartsOfDrawing = scala.collection.mutable.LinkedHashMap.empty[Int, Seq[(Int, Pie)]]
      sheets.zipWithIndex.foreach {
        case (sp: Sparse, i) if sp.charts.nonEmpty =>
          val d = drawingOfSheet.size + 1
          drawingOfSheet(i) = d
          chartsOfDrawing(d) = sp.charts.map { c => nCharts += 1; (nCharts, c) }
        case _ =>
      }
      part("[Content_Types].xml", contentTypes(sheets.length, drawingOfSheet.size, nCharts))
      part("_rels/.rels", rootRels)
      part("xl/workbook.xml", workbook(sheets.map(_.name)))
      part("xl/_rels/workbook.xml.rels", workbookRels(sheets.length))
      part("xl/styles.xml", styles)
      sheets.zipWithIndex.foreach { case (s, i) =>
        zos.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${i + 1}.xml"))
        val w = new java.io.OutputStreamWriter(zos, StandardCharsets.UTF_8)
        writeWorksheet(w, s, hasDrawing = drawingOfSheet.contains(i))
        w.flush()
        zos.closeEntry()
        drawingOfSheet.get(i).foreach { d =>
          part(s"xl/worksheets/_rels/sheet${i + 1}.xml.rels",
            """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
              """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
              s"""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/drawing" Target="../drawings/drawing$d.xml"/>""" +
              "</Relationships>")
        }
      }
      chartsOfDrawing.foreach { case (d, charts) =>
        part(s"xl/drawings/drawing$d.xml", drawingXml(charts))
        part(s"xl/drawings/_rels/drawing$d.xml.rels",
          """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
            charts.zipWithIndex.map { case ((cid, _), k) =>
              s"""<Relationship Id="rId${k + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/chart" Target="../charts/chart$cid.xml"/>"""
            }.mkString + "</Relationships>")
        charts.foreach { case (cid, pie) => part(s"xl/charts/chart$cid.xml", chartXml(pie)) }
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

  private def writeWorksheet(w: java.io.Writer, spec: SheetSpec,
      hasDrawing: Boolean = false): Unit = {
    w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""")
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
      case Sparse(_, cells, _) =>
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
    if (hasDrawing)
      w.write("""<drawing r:id="rId1"/>""")
    w.write("</worksheet>")
  }

  // ---- fixed parts ----

  private def contentTypes(nSheets: Int, nDrawings: Int, nCharts: Int): String = {
    val overrides = (1 to nSheets).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
      (1 to nDrawings).map(i =>
        s"""<Override PartName="/xl/drawings/drawing$i.xml" ContentType="application/vnd.openxmlformats-officedocument.drawing+xml"/>""").mkString +
      (1 to nCharts).map(i =>
        s"""<Override PartName="/xl/charts/chart$i.xml" ContentType="application/vnd.openxmlformats-officedocument.drawingml.chart+xml"/>""").mkString
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

  /** DrawingML pie chart (c:pieChart): categories/values reference the
    * helper block (with the sheet-local caches OOXML requires), data
    * labels show category + percentage, legend right — the reference's
    * XlsxWriter chart configuration (survey_analysis.py:427-437). */
  private def chartXml(p: Pie): String = {
    val ref = s"'${esc(p.sheetRef).replace("'", "''")}'"
    val catF = s"$ref!$$AY$$${p.firstRow}:$$AY$$${p.firstRow + p.labels.size - 1}"
    val valF = s"$ref!$$AZ$$${p.firstRow}:$$AZ$$${p.firstRow + p.values.size - 1}"
    val catPts = p.labels.zipWithIndex.map { case (l, i) =>
      s"""<c:pt idx="$i"><c:v>${esc(l)}</c:v></c:pt>"""
    }.mkString
    val valPts = p.values.zipWithIndex.map { case (v, i) =>
      s"""<c:pt idx="$i"><c:v>$v</c:v></c:pt>"""
    }.mkString
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<c:chartSpace xmlns:c="http://schemas.openxmlformats.org/drawingml/2006/chart" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      """<c:lang val="en-US"/><c:chart>""" +
      s"""<c:title><c:tx><c:rich><a:bodyPr/><a:lstStyle/><a:p><a:pPr><a:defRPr/></a:pPr><a:r><a:rPr lang="en-US"/><a:t>${esc(p.title)}</a:t></a:r></a:p></c:rich></c:tx><c:layout/></c:title>""" +
      """<c:plotArea><c:layout/><c:pieChart><c:varyColors val="1"/>""" +
      s"""<c:ser><c:idx val="0"/><c:order val="0"/><c:tx><c:v>${esc(p.seriesName)}</c:v></c:tx>""" +
      """<c:dLbls><c:showCatName val="1"/><c:showPercent val="1"/></c:dLbls>""" +
      s"""<c:cat><c:strRef><c:f>$catF</c:f><c:strCache><c:ptCount val="${p.labels.size}"/>$catPts</c:strCache></c:strRef></c:cat>""" +
      s"""<c:val><c:numRef><c:f>$valF</c:f><c:numCache><c:formatCode>General</c:formatCode><c:ptCount val="${p.values.size}"/>$valPts</c:numCache></c:numRef></c:val>""" +
      """</c:ser><c:firstSliceAng val="0"/></c:pieChart></c:plotArea>""" +
      """<c:legend><c:legendPos val="r"/><c:layout/></c:legend>""" +
      """<c:plotVisOnly val="1"/></c:chart></c:chartSpace>"""
  }

  /** One twoCellAnchor per chart: the reference's 480×320 px block spans 7
    * columns + 304800 EMU by 16 rows from the insertion cell
    * (survey_analysis.py:436,439-444). */
  private def drawingXml(charts: Seq[(Int, Pie)]): String = {
    val anchors = charts.zipWithIndex.map { case ((_, p), k) =>
      s"""<xdr:twoCellAnchor><xdr:from><xdr:col>${p.fromCol}</xdr:col><xdr:colOff>0</xdr:colOff><xdr:row>${p.fromRow}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:from>""" +
        s"""<xdr:to><xdr:col>${p.fromCol + 7}</xdr:col><xdr:colOff>304800</xdr:colOff><xdr:row>${p.fromRow + 16}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:to>""" +
        s"""<xdr:graphicFrame macro=""><xdr:nvGraphicFramePr><xdr:cNvPr id="${k + 2}" name="Chart ${k + 1}"/><xdr:cNvGraphicFramePr/></xdr:nvGraphicFramePr>""" +
        """<xdr:xfrm><a:off x="0" y="0"/><a:ext cx="0" cy="0"/></xdr:xfrm>""" +
        """<a:graphic><a:graphicData uri="http://schemas.openxmlformats.org/drawingml/2006/chart">""" +
        s"""<c:chart xmlns:c="http://schemas.openxmlformats.org/drawingml/2006/chart" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" r:id="rId${k + 1}"/>""" +
        """</a:graphicData></a:graphic></xdr:graphicFrame><xdr:clientData/></xdr:twoCellAnchor>"""
    }.mkString
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<xdr:wsDr xmlns:xdr="http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">""" +
      anchors + "</xdr:wsDr>"
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
