package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.xml.{Elem, XML}

/** S5 — OWL/RDF scan: RDF/XML → (subject, predicate, object) triples →
  * group by subject (reference `convertOwlGraphToJson` src/util.js:22-66,
  * consumed by vario src/vario.js:45-55, uberon src/uberon/index.js:70-77,
  * sequenceOntology src/sequenceOntology.js:86-92).
  *
  * Triple extraction is the RDF/XML striped syntax for the subset these
  * ontology files use: each top-level element carrying `rdf:about` is a
  * subject; its element name contributes an `rdf:type` triple; each child
  * element is a predicate whose object is `rdf:resource` when present, else
  * the element text. Anonymous nested nodes (owl:Restriction bnodes, axiom
  * annotations) are skipped — the reference's idParser throws on those
  * subjects and drops them anyway (src/util.js:27-32).
  *
  * Scale: one task per file via `binaryFiles` (RDF/XML is not
  * block-splittable); the triple explosion itself is a narrow flatMap and
  * downstream grouping is a single hash shuffle on `subject`.
  */
object OwlScan {

  val RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  case class Triple(subject: String, predicate: String, obj: String)

  private def fileTriples(content: java.io.InputStream): Iterator[Triple] = {
    val root = XML.load(content)
    root.child.iterator.collect { case e: Elem => e }.flatMap { subjEl =>
      subjEl.attribute(RDF_NS, "about").map(_.text) match {
        case None => Iterator.empty
        case Some(subject) =>
          val typeTriple =
            Triple(subject, RDF_NS + "type", subjEl.namespace + subjEl.label)
          val predTriples = subjEl.child.iterator.collect { case p: Elem => p }
            .flatMap { p =>
              val pred = p.namespace + p.label
              p.attribute(RDF_NS, "resource").map(_.text) match {
                case Some(res) => Some(Triple(subject, pred, res))
                case None =>
                  val kids = p.child.collect { case c: Elem => c }
                  if (kids.nonEmpty) None // bnode object — skipped
                  else {
                    val text = p.text.trim
                    if (text.isEmpty) None else Some(Triple(subject, pred, text))
                  }
              }
            }
          Iterator(typeTriple) ++ predTriples
      }
    }
  }

  /** Triples DataFrame: (subject, predicate, obj). */
  def triples(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (_, pds) => fileTriples(pds.open()) }
      .toDS()
      .toDF()
  }

  /** convertOwlGraphToJson shape: one row per subject with
    * `props: array<struct<predicate, objects>>` (predicate → value list).
    * Single shuffle on subject.
    */
  def grouped(triplesDf: DataFrame): DataFrame =
    triplesDf
      .groupBy(col("subject"))
      .agg(collect_list(struct(col("predicate"), col("obj"))).as("pairs"))
      .select(
        col("subject"),
        expr(
          """transform(
            |  array_distinct(transform(pairs, p -> p.predicate)),
            |  pr -> struct(
            |    pr AS predicate,
            |    transform(filter(pairs, p -> p.predicate = pr), p -> p.obj)
            |      AS objects))""".stripMargin).as("props"))
}
