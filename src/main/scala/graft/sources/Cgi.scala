package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cancer Genome Interpreter row parsing (reference
  * src/cancergenomeinterpreter/index.js:73-190):
  *  - `parseCategoryVariant` strips the gene prefix off the biomarker,
  *    fixes the 'undexpression' typo, and folds CNA deletions to
  *    'copy loss' (:73-88);
  *  - `parseEvidence` routes PMID / PMC / NCT items, silently drops
  *    FDA/NCCN/ASCO/AACR guidelines, and errors on anything else
  *    (:91-107);
  *  - `parseTherapy` falls back to the drug family and strips the
  *    square brackets (:110-117);
  *  - `preprocessVariants` expands '+'-concomitant biomarkers into the
  *    cartesian product of their per-gene variant lists (X2), rewrites
  *    protein lists (`GENE (A1,B2)`) into per-variant HGVS with the
  *    variantClass suffix for bare positions, exon phrases into `e.N…`
  *    notations, and `A-B fusion` pairs; three-plus combinations are
  *    unsupported and error (:121-190).
  *
  * All parsing is deterministic executor-side row logic (flatMap); the
  * error path is the K10 side-channel.
  */
object Cgi {

  case class CgiRow(
      rowId: String, biomarker: String, gene: String, variantClass: String,
      protein: String, drug: String, drugFamily: String, evidence: String)

  /** One parsed variant spec within a combination. */
  case class VariantSpec(
      gene: String, protein: Option[String] = None,
      exonic: Option[String] = None, vtype: Option[String] = None,
      gene2: Option[String] = None, isCat: Boolean = false) {
    def repr: String =
      protein.orElse(exonic.map(e => s"$gene:$e"))
        .orElse(vtype.map(t => gene2 match {
          case Some(g2) => s"$gene::$g2:$t"
          case None => s"$gene $t"
        })).getOrElse(gene)
  }

  def parseCategoryVariant(biomarker: String, gene: String,
      variantClass: String): VariantSpec = {
    val vtype = biomarker.drop(gene.length).trim
      .replace("undexpression", "underexpression")
    if (variantClass == "CNA" && vtype == "deletion")
      VariantSpec(gene, vtype = Some("copy loss"), isCat = true)
    else VariantSpec(gene, vtype = Some(vtype), isCat = true)
  }

  def parseEvidence(evidence: String): Seq[String] =
    evidence.split(";").map(_.trim).toSeq.flatMap { item =>
      if (item.startsWith("PMID:")) Seq(item.drop("PMID:".length))
      else if (item.startsWith("PMC")) Seq(item)
      else if (item.matches("^NCT\\d+$")) Seq(item)
      else if (Seq("FDA", "NCCN", "ASCO", "AACR").exists(item.startsWith))
        Seq.empty
      else throw new IllegalArgumentException(
        s"cannot process non-pubmed/nct/aacr/asco evidence $item")
    }

  def parseTherapy(drug: String, drugFamily: String): String = {
    val d = if (drug == "[]" || drug.isEmpty) drugFamily else drug
    d.replaceAll("^\\[", "").replaceAll("\\]$", "")
  }

  private val ProteinList = "^(\\w+) \\(([A-Z0-9*,;]+)\\)$".r
  private val GeneTail = "^(\\w+)\\s+(.*)$".r
  private val ExonPhrase = "^exon (\\d+) (insertion|deletion)s?$".r
  private val FusionPair = "^([A-Za-z0-9.]+)-([A-Za-z0-9.]+) fusion$".r
  private val BarePos = "^([A-Z])?(\\d+)$".r
  private val PosRange = "^(\\d+)-(\\d+)$".r

  /** cgi/index.js:121-190 — expand one row into variant combinations. */
  def preprocessVariants(row: CgiRow): Seq[Seq[VariantSpec]] = {
    if (row.biomarker.split("\\+").length > 2)
      throw new IllegalArgumentException(
        "Missing logic to process variant combinations of 3 or more")
    if (row.protein.trim.nonEmpty)
      return Seq(Seq(VariantSpec(row.gene,
        protein = Some(row.protein.replace(":", ":p.")))))

    val combinations = row.biomarker.split("\\s*\\+\\s*").toSeq.map {
      case variant @ ProteinList(gene, tail) =>
        tail.split("[,;]").toSeq.map { singleProtein =>
          val hgvsp = singleProtein match {
            case BarePos(refAA, pos) =>
              s"p.${Option(refAA).getOrElse("?")}$pos${row.variantClass.toLowerCase}"
            case _ => tail match {
              case PosRange(start, end) =>
                s"p.(?${start}_?$end)${row.variantClass.toLowerCase}"
              case _ => s"p.$singleProtein"
            }
          }
          VariantSpec(gene, protein = Some(s"$gene:$hgvsp"))
        }
      case variant @ GeneTail(gene, tail) =>
        tail match {
          case ExonPhrase(pos, kind) =>
            Seq(VariantSpec(gene, exonic = Some(s"e.$pos${kind.take(3)}")))
          case _ =>
            // the reference call (index.js:163) does NOT pass variantClass,
            // so the CNA→copy-loss fold never fires on this path —
            // transcribed from code, not the function's intent
            Seq(parseCategoryVariant(row.biomarker, gene, variantClass = ""))
        }
      case FusionPair(gene1, gene2) =>
        Seq(VariantSpec(gene1, gene2 = Some(gene2), vtype = Some("fusion"),
          isCat = true))
      case variant => throw new IllegalArgumentException(
        s"unable to process variant ($variant)")
    }

    if (combinations.length > 1)
      for (a <- combinations(0); b <- combinations(1)) yield Seq(a, b)
    else combinations(0).map(Seq(_))
  }

  case class ParsedRow(
      rowId: String, kind: String, comboIdx: Long, value: String)

  /** Parse every row; errors become K10 side-channel rows. */
  def parse(spark: SparkSession, rows: Seq[CgiRow]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).flatMap { row =>
      try {
        val combos = preprocessVariants(row).zipWithIndex.map {
          case (combo, i) =>
            ParsedRow(row.rowId, "combo", i.toLong,
              combo.map(_.repr).mkString(" AND "))
        }
        val ev = ParsedRow(row.rowId, "evidence", 0L,
          parseEvidence(row.evidence).mkString(","))
        val th = ParsedRow(row.rowId, "therapy", 0L,
          parseTherapy(row.drug, row.drugFamily))
        combos :+ ev :+ th
      } catch {
        case e: IllegalArgumentException =>
          Seq(ParsedRow(row.rowId, "error", 0L, e.getMessage))
      }
    }.toDF()
  }
}
