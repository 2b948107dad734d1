package graft.sources

import java.io.StringWriter
import javax.xml.stream.{XMLEventWriter, XMLInputFactory, XMLOutputFactory}
import javax.xml.stream.events.{EndElement, StartElement}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import scala.xml.{Elem, PCData, Text, XML}

/** XML scan layer (SURVEY S3/S4).
  *
  * S4 — streaming element-at-a-time rowTag split (the reference streams
  * DrugBank with `xml-stream` on `endElement: drug` events,
  * src/drugbank/index.js:279-333): a StAX event reader walks each file and
  * emits one well-formed fragment string per `rowTag` element through a LAZY
  * iterator, so memory stays bounded by one fragment regardless of file
  * size. Files parallelize via `binaryFiles` (one task per file — XML is not
  * block-splittable, so at 100 TB the unit of parallelism is the file, same
  * as every production spark-xml deployment).
  *
  * S3 — DOM parse to a JSON document (`parseXmlToJson` with xml2js
  * `mergeAttrs/trim/normalize/emptyTag:null`, src/util.js:87-114): repeated
  * child tags group into arrays, attributes merge in as scalar fields, text
  * under mixed content lands in `_`, empty tags become null. The JSON bridge
  * means downstream is plain `spark.read.json` — schema inference, column
  * pruning and the rest of Catalyst apply unchanged.
  */
object XmlScan {

  /** Lazily split one XML stream into serialized `rowTag` fragments. */
  private class FragmentIterator(in: java.io.InputStream, rowTag: String)
      extends Iterator[String] {
    private val reader = {
      val xif = XMLInputFactory.newInstance()
      xif.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      // fixtures are untrusted content: no DTD/entity resolution
      xif.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      xif.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        java.lang.Boolean.FALSE)
      xif.createXMLEventReader(in)
    }
    private val xof = {
      val f = XMLOutputFactory.newInstance()
      // re-declare namespaces inherited from ancestors so each fragment is
      // independently well-formed
      f.setProperty("javax.xml.stream.isRepairingNamespaces", java.lang.Boolean.TRUE)
      f
    }
    private var nextFragment: Option[String] = None

    private def advance(): Unit = {
      nextFragment = None
      while (nextFragment.isEmpty && reader.hasNext) {
        val ev = reader.nextEvent()
        ev match {
          case se: StartElement if se.getName.getLocalPart == rowTag =>
            val sw = new StringWriter()
            val w: XMLEventWriter = xof.createXMLEventWriter(sw)
            w.add(ev)
            var depth = 1
            while (depth > 0 && reader.hasNext) {
              val e = reader.nextEvent()
              e match {
                case _: StartElement => depth += 1
                case _: EndElement => depth -= 1
                case _ => ()
              }
              w.add(e)
            }
            w.close()
            nextFragment = Some(sw.toString)
          case _ => ()
        }
      }
      if (nextFragment.isEmpty) { reader.close(); in.close() }
    }

    advance()
    override def hasNext: Boolean = nextFragment.isDefined
    override def next(): String = {
      val f = nextFragment.get
      advance()
      f
    }
  }

  /** S4: one serialized XML fragment per `rowTag` element, distributed one
    * task per file.
    */
  def rowTagFragments(spark: SparkSession, path: String, rowTag: String): Dataset[String] = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (_, pds) => new FragmentIterator(pds.open(), rowTag) }
      .toDS()
  }

  /** S4 + S3 composed: rowTag fragments → JSON documents → inferred
    * DataFrame (the spark-xml `rowTag` shape without the package). The row
    * element's fields become top-level columns (no root wrapper).
    */
  def rowTagDF(spark: SparkSession, path: String, rowTag: String): DataFrame =
    spark.read.json(rowTagFragments(spark, path, rowTag)
      .map(x => domToJson(x, wrap = false))(org.apache.spark.sql.Encoders.STRING))

  // ------------------------------------------------------------- S3 DOM→JSON

  private def normText(e: Elem): String =
    e.child.collect { case t: Text => t.data; case t: PCData => t.data }
      .mkString.trim.replaceAll("\\s+", " ")

  /** xml2js-equivalent value model: null | String | Map; repeated child tags
    * become Seq values under one key.
    */
  private def elemToValue(e: Elem): Any = {
    val kids = e.child.collect { case c: Elem => c }
    val attrs = e.attributes.asAttrMap
    val text = normText(e)
    if (kids.isEmpty && attrs.isEmpty) {
      if (text.isEmpty) null else text // emptyTag: null
    } else {
      val grouped: Map[String, Any] = kids.groupBy(_.label).map {
        case (k, Seq(one)) => k -> elemToValue(one)
        case (k, many) => k -> many.map(elemToValue)
      }
      val merged: Map[String, Any] = attrs ++ grouped // mergeAttrs
      if (text.nonEmpty) merged + ("_" -> text) else merged
    }
  }

  private def renderJson(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case s: String =>
      sb.append('"')
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    case m: Map[_, _] =>
      sb.append('{')
      var first = true
      m.toSeq.sortBy(_._1.toString).foreach { case (k, mv) =>
        if (!first) sb.append(',')
        first = false
        renderJson(k.toString, sb)
        sb.append(':')
        renderJson(mv, sb)
      }
      sb.append('}')
    case xs: Seq[_] =>
      sb.append('[')
      var first = true
      xs.foreach { x =>
        if (!first) sb.append(',')
        first = false
        renderJson(x, sb)
      }
      sb.append(']')
    case other => renderJson(other.toString, sb)
  }

  /** S3: parse an XML document string into a single JSON document string
    * (wrapped under the root tag name, as xml2js does; `wrap=false` emits
    * the root's fields as the top-level object).
    */
  def domToJson(xml: String, wrap: Boolean = true): String = {
    val root = XML.loadString(xml)
    val value = elemToValue(root) match {
      case m: Map[_, _] if !wrap => m
      case v => Map(root.label -> v)
    }
    val sb = new StringBuilder()
    renderJson(value, sb)
    sb.toString
  }

  /** S3 whole-file variant: each file becomes one JSON document row. */
  def domDF(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val docs = spark.sparkContext.wholeTextFiles(path).map(f => domToJson(f._2)).toDS()
    spark.read.json(docs)
  }
}
