package graft

import graft.sources.{HoldingsSource, XlsxSource}
import org.apache.spark.sql.functions._

/** Pure-JVM xlsx reader: format-surface unit coverage + the parity pin
  * that makes the DuckDB oracle (which reads the CSV twin) a real check of
  * the workbook ingestion path.
  */
class XlsxSourceSpec extends SparkSpec {

  test("colIndex decodes A1-style references") {
    assert(XlsxSource.colIndex("A1") == 0)
    assert(XlsxSource.colIndex("H33") == 7)
    assert(XlsxSource.colIndex("Z9") == 25)
    assert(XlsxSource.colIndex("AA1") == 26)
    assert(XlsxSource.colIndex("BC12") == 54)
  }

  /** Build a minimal workbook in memory: shared + inline strings, numeric
    * cells, an omitted (gap) cell, rich-text shared string. */
  private def miniXlsx: Array[Byte] = {
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="C2"><v>1.5</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>inline!</t></is></c><c r="B3"><v>7</v></c><c r="C3"><v>-2.25</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val sst =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |<si><t>name</t></si><si><t>n</t></si><si><t>x</t></si>
        |<si><r><t>rich</t></r><r><t> text</t></r></si>
        |</sst>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    for ((n, d) <- Seq("xl/worksheets/sheet1.xml" -> sheet,
                       "xl/sharedStrings.xml" -> sst)) {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(d.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("sheetRows resolves shared/inline strings, numbers, and cell gaps") {
    val rows = XlsxSource.sheetRows(miniXlsx)
    assert(rows.size == 3)
    assert(rows(0) == Seq((0, "name"), (1, "n"), (2, "x")))
    // rich-text runs concatenate; the B2 gap simply yields no pair
    assert(rows(1) == Seq((0, "rich text"), (2, "1.5")))
    assert(rows(2) == Seq((0, "inline!"), (1, "7"), (2, "-2.25")))
  }

  test("sheetRows fails loudly on an out-of-range shared-string index") {
    val sheet =
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>99</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(sheet.getBytes("UTF-8")); z.closeEntry(); z.close()
    assertThrows[IllegalArgumentException](XlsxSource.sheetRows(bos.toByteArray))
  }

  test("workbook fixture parses with synthesized file-order row_idx") {
    val df = XlsxSource.holdings(spark, HoldingsSource.FixturePath)
    assert(df.columns.toSeq == Seq("row_idx", "ticker", "name", "sector",
      "asset_class", "market_value", "weight_pct", "shares", "price"))
    assert(df.count() == 33)
    val idx = df.select("row_idx").collect().map(_.getLong(0)).sorted
    assert(idx.toSeq == (1L to 33L))
  }

  test("xlsx view equals the CSV oracle twin row-for-row") {
    val xlsx = HoldingsSource.load(spark, HoldingsSource.FixturePath)
    val csv = HoldingsSource.loadCsv(spark, HoldingsSource.OracleCsvPath)
    assert(xlsx.schema.fieldNames.sameElements(csv.schema.fieldNames))
    val key = col("row_idx")
    val a = xlsx.orderBy(key).collect()
    val b = csv.orderBy(key).collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, c) =>
      assert(x.toSeq == c.toSeq, s"row mismatch: $x vs $c")
    }
  }

  test("keep-first ticker dedup is honored through the workbook path") {
    val deduped = HoldingsSource.dedupByTicker(
      HoldingsSource.load(spark, HoldingsSource.FixturePath))
    assert(deduped.count() == 29)
    assert(deduped.filter(col("ticker") === "SMCI")
      .select("row_idx").head().getLong(0) == 1L)
    assert(deduped.filter(col("ticker") === "XTSLA")
      .select("row_idx").head().getLong(0) == 20L)
  }
}
