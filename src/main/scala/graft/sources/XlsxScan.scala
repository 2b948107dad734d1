package graft.sources

import java.util.zip.ZipFile

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.xml.{Elem, XML}

/** S7 — XLSX scan with two-row super-header flattening (reference
  * src/PMC4232638/index.js:24-60, src/PMC4468049/index.js:33-43).
  *
  * XLSX is a zip of OOXML parts; this reads `xl/sharedStrings.xml` and a
  * worksheet part with the JDK's zip + XML only (no POI on the classpath).
  * Supplementary spreadsheets are tiny (tens of KB) so the parse is
  * driver-side and the result becomes a DataFrame via `createDataFrame` —
  * exactly SURVEY §2.1 S7's prescription.
  *
  * Super-header semantics (PMC4232638): row0 is a title; row1 carries
  * sparse "super" headers that carry forward; row2 the column headers; the
  * flattened name is `"<lastSuper> - <col>"`, or the super name alone when
  * the column cell is empty. Data rows follow; `----` and empty cells
  * normalize to "".
  */
object XlsxScan {

  /** Column index from an A1-style cell reference ("BC12" → 54). */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  /** Raw cell grid of one worksheet (row-major, ragged rows padded later). */
  def readGrid(path: String, sheetPart: String = "xl/worksheets/sheet1.xml"): Seq[Seq[String]] = {
    val zip = new ZipFile(path)
    try {
      def part(name: String): Option[Elem] =
        Option(zip.getEntry(name)).map(e => XML.load(zip.getInputStream(e)))
      val shared: IndexedSeq[String] = part("xl/sharedStrings.xml") match {
        case Some(ss) => (ss \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
        case None => IndexedSeq.empty
      }
      val sheet = part(sheetPart).getOrElse(
        throw new IllegalArgumentException(s"no $sheetPart in $path"))
      (sheet \ "sheetData" \ "row").map { row =>
        val cells = (row \ "c").map { c =>
          val idx = colIndex((c \@ "r"))
          val v = (c \ "v").text
          val value = (c \@ "t") match {
            case "s" => if (v.nonEmpty) shared(v.toInt) else ""
            case "inlineStr" => (c \\ "t").map(_.text).mkString
            case _ => v
          }
          idx -> value
        }
        val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
        val arr = Array.fill(width)("")
        cells.foreach { case (i, v) => arr(i) = v }
        arr.toSeq
      }
    } finally zip.close()
  }

  /** Flatten the 3-row header block into column names. */
  def flattenSuperHeader(superRow: Seq[String], colRow: Seq[String]): Seq[String] = {
    var lastSuper = ""
    superRow.zipAll(colRow, "", "").map { case (sup, col) =>
      if (sup.nonEmpty) lastSuper = sup
      // carried-forward super also covers spanned columns whose own
      // header cell is empty — otherwise they'd collapse to "" duplicates
      if (col.isEmpty) lastSuper
      else if (lastSuper.isEmpty) col
      else s"$lastSuper - $col"
    }
  }

  /** DataFrame of the sheet. `superHeader=true` applies the PMC4232638
    * 3-row header block (title / super / columns); otherwise row0 is the
    * header. All columns are strings; '----' normalizes to "".
    */
  def df(
      spark: SparkSession,
      path: String,
      sheetPart: String = "xl/worksheets/sheet1.xml",
      superHeader: Boolean = false): DataFrame = {
    val grid = readGrid(path, sheetPart)
    val (names, data) =
      if (superHeader) (flattenSuperHeader(grid(1), grid(2)), grid.drop(3))
      else (grid.head, grid.tail)
    val width = names.length
    val rows = data.map { r =>
      val padded = r.padTo(width, "").take(width)
        .map(v => if (v == "----") "" else v)
      Row.fromSeq(padded)
    }
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), schema)
  }
}
