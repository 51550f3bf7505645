package graft.sources

import java.io.ByteArrayInputStream

import scala.collection.mutable.ArrayBuffer
import scala.util.Try

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-JVM XLSX ingestion (S7 — the reference reads the iShares holdings
  * workbook directly: `/root/reference/data_apis/my_ishares.py:16`).
  *
  * An .xlsx file is a zip of XML parts; this reader uses only
  * `java.util.zip` + the JDK StAX parser — no external format jars — and
  * runs the parse ON EXECUTORS: the file arrives through Spark's
  * `binaryFile` source, so a directory of thousands of vendor workbooks
  * ingests as one distributed DataFrame (one task per workbook, the natural
  * parallelism unit for an opaque container format). Nothing is parsed on
  * the driver.
  *
  * Supported surface (the subset real tabular workbooks use): shared
  * strings (`t="s"`, including rich-text `<r><t>` runs), inline strings
  * (`t="inlineStr"`), numeric cells, omitted empty cells, and gapless or
  * gapped `r="A1"`-style references. First sheet part only — holdings
  * workbooks are single-sheet.
  *
  * Row order is a property of the sheet, not a column: `row_idx` is
  * synthesized from data-row order (1-based, header excluded) so
  * keep-first-by-Ticker dedup ([[HoldingsSource.dedupByTicker]], mirroring
  * pandas `drop_duplicates` at `my_ishares.py:18`) stays deterministic in a
  * distributed read.
  */
object XlsxSource {

  /** One parsed holdings row; field order = [[HoldingsSource]] column
    * order, names already engine-normalized (the F13 rename map is applied
    * during parse — vendor headers never escape the source). */
  case class Holding(
      row_idx: Long, ticker: String, name: String, sector: String,
      asset_class: String, market_value: Option[Double],
      weight_pct: Option[Double], shares: Option[Double],
      price: Option[Double])

  /** Distributed load: every matched .xlsx becomes one parse task. */
  def holdings(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) => parseHoldings(bytes) }
      .toDF()
  }

  /** Parse one workbook's bytes into holdings rows (executor-side). */
  def parseHoldings(bytes: Array[Byte]): Seq[Holding] = {
    val rows = sheetRows(bytes)
    if (rows.isEmpty) return Nil
    // header row -> column index per vendor header, then normalize names
    val header = rows.head.map { case (ci, v) => (v, ci) }.toMap
    def colOf(vendor: String): Option[Int] = header.get(vendor)
    def str(r: Map[Int, String], vendor: String): String =
      colOf(vendor).flatMap(r.get).orNull
    def num(r: Map[Int, String], vendor: String): Option[Double] =
      colOf(vendor).flatMap(r.get).flatMap(v => Try(v.toDouble).toOption)
    rows.tail.zipWithIndex.map { case (cells, i) =>
      val r = cells.toMap
      Holding(i + 1L, str(r, "Ticker"), str(r, "Name"), str(r, "Sector"),
        str(r, "Asset Class"), num(r, "Market Value"), num(r, "Weight (%)"),
        num(r, "Shares"), num(r, "Price"))
    }
  }

  /** All rows of the first worksheet as (columnIndex, cellValue) pairs in
    * sheet order, shared strings resolved. */
  def sheetRows(bytes: Array[Byte]): Seq[Seq[(Int, String)]] = {
    val parts = zipParts(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Vector.empty)
    val sheetName = parts.keys.filter(_.startsWith("xl/worksheets/"))
      .toSeq.sorted.headOption.getOrElse(
        throw new IllegalArgumentException("xlsx has no worksheet part"))
    parseSheet(parts(sheetName), shared)
  }

  /** Single pass over the zip stream, keeping only the parts we read.
    * (Zip entry order is arbitrary — sharedStrings may follow the sheet —
    * so both are buffered before parsing.) */
  private def zipParts(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zis = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zis.getNextEntry
      while (e != null) {
        val n = e.getName
        if (!e.isDirectory &&
            (n == "xl/sharedStrings.xml" || n.startsWith("xl/worksheets/")))
          out += n -> zis.readAllBytes()
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.result()
  }

  /** Hardened StAX reader (DTD + external entities off — workbook content
    * is untrusted vendor input). */
  private def xmlReader(xml: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f.createXMLStreamReader(new ByteArrayInputStream(xml))
  }

  /** `<sst><si>…</si></sst>` → indexed strings; rich-text runs
    * (`<si><r><t>a</t></r><r><t>b</t></r></si>`) concatenate. */
  private def parseSharedStrings(xml: Array[Byte]): Vector[String] = {
    val r = xmlReader(xml)
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => inSi = true; sb.clear()
          case "t" if inSi => inT = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "t" => inT = false
          case "si" => inSi = false; out += sb.toString
          case _ => ()
        }
        case _ => ()
      }
    } finally r.close()
    out.result()
  }

  /** Worksheet `<sheetData>` → rows of (colIdx, value). Cell type `s`
    * resolves through the shared-strings table; `inlineStr` reads the
    * embedded `<is><t>`; anything else is the raw `<v>` text. Cells without
    * an `r` reference take the next column slot. */
  private def parseSheet(
      xml: Array[Byte], shared: Vector[String]): Seq[Seq[(Int, String)]] = {
    val r = xmlReader(xml)
    val rows = ArrayBuffer[Seq[(Int, String)]]()
    val row = ArrayBuffer[(Int, String)]()
    val text = new StringBuilder
    var cellCol = -1
    var cellType: String = null
    var inV = false
    var lastCol = -1
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row.clear(); lastCol = -1
          case "c" =>
            val ref = r.getAttributeValue(null, "r")
            cellCol = if (ref != null) colIndex(ref) else lastCol + 1
            lastCol = cellCol
            cellType = r.getAttributeValue(null, "t")
            text.clear()
          case "v" | "t" => inV = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if inV => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" => inV = false
          case "c" =>
            val raw = text.toString
            val v = cellType match {
              case "s" =>
                val i = Try(raw.trim.toInt).getOrElse(-1)
                if (i >= 0 && i < shared.size) shared(i)
                else throw new IllegalArgumentException(
                  s"xlsx shared-string index $raw out of range " +
                  s"(table has ${shared.size})")
              case _ => raw // inlineStr accumulated via its <t>; numbers raw
            }
            if (v.nonEmpty) row += ((cellCol, v))
          case "row" => rows += row.toVector
          case _ => ()
        }
        case _ => ()
      }
    } finally r.close()
    rows.toSeq
  }

  /** `"BC12"` → 0-based column 54 (base-26 letters, digits dropped). */
  def colIndex(ref: String): Int = {
    var i = 0
    var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    c - 1
  }
}
