package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Flat-file scan layer (SURVEY §2.1).
  *
  * Each scan is a declarative `spark.read` so Catalyst keeps column pruning
  * and (for parquet/csv sources) filter pushdown; the only pre-processing is
  * a distributed comment-line filter, because the reference's delimited files
  * allow `##` comment lines (multi-char, which the csv reader's single-char
  * `comment` option can't express — `loadDelimToJson`, reference
  * src/util.js:69-84).
  *
  * Scale: `textFile` / `csv` split by HDFS blocks, so a 100 TB TSV corpus
  * parallelizes across executors; the comment filter is a narrow map, no
  * shuffle.
  */
object Scans {

  /** S1/S2 delimited scan: `##` comments, quote/escape disabled (reference
    * parses with `quote: null, escape: null`), optional header-name remap
    * (P1, `convertRowFields` src/util.js:219-226), auto type parse.
    */
  def delim(
      spark: SparkSession,
      path: String,
      sep: String = "\t",
      header: Boolean = true,
      comment: String = "##",
      headerMap: Map[String, String] = Map.empty,
      inferSchema: Boolean = true,
      patchLine: String => String = identity): DataFrame = {
    import spark.implicits._
    // patchLine runs in the same narrow pre-pass as the comment filter —
    // e.g. naming a blank trailing header column so the CSV header checker
    // doesn't warn on every read (fdaSrs' UNII file)
    val lines: Dataset[String] =
      spark.read.textFile(path).filter(l => !l.startsWith(comment))
        .map(patchLine)
    val df = spark.read
      .option("sep", sep)
      .option("header", header)
      .option("inferSchema", inferSchema)
      .option("quote", "\u0000")
      .option("escape", "\u0000")
      .csv(lines)
    headerMap.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  /** S9 plain-text list scan (one value per line, e.g. HGVS notation lists,
    * reference src/variants/index.js:37-41).
    */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).toDF("line")

  /** S6/S8/S16 JSON scan: whole-document JSON (OBO-graph dumps, ontology
    * JSON, saved API responses used as a disk proxy —
    * reference src/diseaseOntology/index.js:157-166,
    * src/ontology/index.js:253-258, src/oncokb/index.js:796-812).
    */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).json(path)
}
