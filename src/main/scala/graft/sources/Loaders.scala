package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PersistentGraphStore

/** End-to-end loader slice (SURVEY §7.2 step 3): scan → normalize →
  * resolve → upsert into the persistent graph store, per source, with the
  * reference's shapes:
  *
  *  - vocab: seed controlled terms (reference data/vocab.json via
  *    src/ontology/index.js) — the root of the Snakefile DAG;
  *  - doid: OBO-graph JSON → Disease vertices + SubClassOf edges
  *    (diseaseOntology/index.js:157-166, 102, 122-131);
  *  - drugbank: streaming rowTag XML → Therapy vertices
  *    (drugbank/index.js:279-333, 77-89).
  *
  * Each `load*` is idempotent: re-running against the same store yields
  * all-noop counters (the addRecord existsOk semantics, graphkb.js:545-612).
  */
object Loaders {

  private def parseCurie(c: org.apache.spark.sql.Column) =
    lower(regexp_replace(regexp_extract(c, ".*/([A-Za-z]+_[0-9]+)$", 1), "_", ":"))

  /** Disease vertices from an OBO-graph JSON dump. */
  def doidVertices(spark: SparkSession, path: String): DataFrame =
    Scans.json(spark, path)
      .select(explode(col("graphs")(0)("nodes")).as("n"))
      .select(
        parseCurie(col("n.id")).as("sourceId"),
        col("n.lbl").as("name"),
        coalesce(
          exists(col("n.meta.basicPropertyValues"),
            x => x("pred").endsWith("deprecated") && x("val") === "true"),
          lit(false)).as("deprecated"),
        when(col("n.meta.synonyms").isNull, lit(0L))
          .otherwise(size(col("n.meta.synonyms")).cast("long")).as("nAlias"))
      .filter(col("sourceId") =!= "")

  /** SubClassOf edges from the OBO-graph `is_a` edge list. */
  def doidEdges(spark: SparkSession, path: String): DataFrame =
    Scans.json(spark, path)
      .select(explode(col("graphs")(0)("edges")).as("e"))
      .filter(col("e.pred") === "is_a")
      .select(parseCurie(col("e.sub")).as("out"), parseCurie(col("e.obj")).as("in"),
        lit("SubClassOf").as("edgeClass"))
      .filter(col("out") =!= "" && col("in") =!= "")

  def loadDoid(spark: SparkSession, store: PersistentGraphStore, path: String): Map[String, Long] = {
    val counts = store.merge("vertices", doidVertices(spark, path),
      keyCols = Seq("sourceId"), compareCols = Seq("name", "deprecated", "nAlias"))
    val edges = store.upsertEdges(doidEdges(spark, path))
    counts ++ edges.map { case (k, v) => s"edges_$k" -> v }
  }

  /** Therapy vertices from the DrugBank XML via the streaming rowTag scan. */
  def drugbankTherapies(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    XmlScan.rowTagFragments(spark, path, "drug")
      .map { frag =>
        val x = scala.xml.XML.loadString(frag)
        val primaryId = (x \ "drugbank-id")
          .collectFirst { case e if (e \@ "primary") == "true" => e.text }
          .getOrElse((x \ "drugbank-id").text)
        (primaryId, (x \ "name").text.toLowerCase.trim,
          (x \ "cas-number").text, (x \ "unii").text,
          (x \ "mechanism-of-action").text.take(64))
      }
      .toDF("sourceId", "name", "casNumber", "unii", "mechanismOfAction")
  }

  def loadDrugbank(spark: SparkSession, store: PersistentGraphStore, path: String): Map[String, Long] =
    store.merge("therapies", drugbankTherapies(spark, path),
      keyCols = Seq("sourceId"),
      compareCols = Seq("name", "casNumber", "unii", "mechanismOfAction"))

  /** Seed vocabulary terms (the DAG root). */
  val VocabSeed: Seq[(String, String)] = Seq(
    ("sensitivity", "therapeutic efficacy"), ("resistance", "therapeutic efficacy"),
    ("likely oncogenic", "biological"), ("fusion", "structural variant"))

  def loadVocab(spark: SparkSession, store: PersistentGraphStore): Map[String, Long] = {
    import spark.implicits._
    store.merge("vocabulary", VocabSeed.toDF("name", "category"),
      keyCols = Seq("name"), compareCols = Seq("category"))
  }
}
