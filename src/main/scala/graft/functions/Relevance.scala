package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** F6 — CIViC relevance translation (reference `translateRelevance`
  * civic/relevance.js:11-333): (evidenceType, evidenceDirection,
  * significance) → GraphKB relevance term. The full decision tree is a
  * lookup table; unsupported combinations resolve to None (the reference
  * throws — callers route those rows to the error side-channel).
  *
  * Used as a broadcast dimension join: ~25 rows against millions of
  * evidence rows — map-side, no shuffle.
  */
object Relevance {

  /** (direction, type, significance) → relevance. Transcribed 1:1 from the
    * reference's switch tree (including the deprecated-term branches and
    * the NA/NA special cases).
    */
  val table: Seq[((String, String, String), String)] = Seq(
    (("DOES_NOT_SUPPORT", "FUNCTIONAL", "DOMINANT_NEGATIVE"), "no dominant negative"),
    (("DOES_NOT_SUPPORT", "FUNCTIONAL", "GAIN_OF_FUNCTION"), "no gain of function"),
    (("DOES_NOT_SUPPORT", "FUNCTIONAL", "NEOMORPHIC"), "no neomorphic"),
    (("DOES_NOT_SUPPORT", "ONCOGENIC", "ONCOGENICITY"), "likely benign"),
    (("DOES_NOT_SUPPORT", "PREDICTIVE", "RESISTANCE"), "no resistance"),
    (("DOES_NOT_SUPPORT", "PREDICTIVE", "SENSITIVITYRESPONSE"), "no response"),
    (("SUPPORTS", "DIAGNOSTIC", "NEGATIVE"), "opposes diagnosis"),
    (("SUPPORTS", "DIAGNOSTIC", "POSITIVE"), "favours diagnosis"),
    (("SUPPORTS", "FUNCTIONAL", "DOMINANT_NEGATIVE"), "dominant negative"),
    (("SUPPORTS", "FUNCTIONAL", "GAIN_OF_FUNCTION"), "gain of function"),
    (("SUPPORTS", "FUNCTIONAL", "LOSS_OF_FUNCTION"), "loss of function"),
    (("SUPPORTS", "FUNCTIONAL", "NEOMORPHIC"), "neomorphic"),
    (("SUPPORTS", "FUNCTIONAL", "UNALTERED_FUNCTION"), "unaltered function"),
    (("SUPPORTS", "ONCOGENIC", "ONCOGENICITY"), "likely oncogenic"),
    (("SUPPORTS", "PREDICTIVE", "ADVERSE_RESPONSE"), "adverse response"),
    (("SUPPORTS", "PREDICTIVE", "REDUCED_SENSITIVITY"), "reduced sensitivity"),
    (("SUPPORTS", "PREDICTIVE", "RESISTANCE"), "resistance"),
    (("SUPPORTS", "PREDICTIVE", "SENSITIVITYRESPONSE"), "sensitivity"),
    (("SUPPORTS", "PREDISPOSING", "LIKELY_PATHOGENIC"), "likely pathogenic"),
    (("SUPPORTS", "PREDISPOSING", "PATHOGENIC"), "pathogenic"),
    (("SUPPORTS", "PREDISPOSING", "POSITIVE"), "predisposing"),
    (("SUPPORTS", "PREDISPOSING", "PREDISPOSITION"), "likely predisposing"),
    (("SUPPORTS", "PREDISPOSING", "PROTECTIVENESS"), "likely protective"),
    (("SUPPORTS", "PREDISPOSING", "UNCERTAIN_SIGNIFICANCE"), "likely predisposing"),
    (("SUPPORTS", "PROGNOSTIC", "BETTER_OUTCOME"), "favourable prognosis"),
    (("SUPPORTS", "PROGNOSTIC", "POOR_OUTCOME"), "unfavourable prognosis"),
    (("NA", "PREDISPOSING", "NA"), "likely predisposing"),
    (("NA", "ONCOGENIC", "NA"), "likely oncogenic"))

  /** Pure lookup (driver/executor side). */
  def translate(direction: String, evidenceType: String, significance: String): Option[String] =
    table.toMap.get((direction, evidenceType, significance))

  /** The table as a broadcast-joinable dimension DataFrame. */
  def dimension(spark: SparkSession): DataFrame = {
    import spark.implicits._
    table.map { case ((d, t, s), r) => (d, t, s, r) }
      .toDF("direction", "evidence_type", "significance", "relevance")
  }

  /** X7 — MOA assertion → applicable relevance terms (reference
    * `parseRelevance` moa/index.js:519-557; jest corpus test/moa.test.js).
    * One assertion can yield several statements, one per term; an empty
    * result or a sensitivity+resistance contradiction is an error row.
    */
  case class MoaAssertion(
      therapyName: Option[String],
      therapySensitivity: Option[Boolean],
      therapyResistance: Option[Boolean],
      favorablePrognosis: Option[Int],
      variantPathogenic: Seq[String])

  case class MoaRelevanceError(msg: String) extends Exception(msg)

  def parseMoaRelevance(a: MoaAssertion): Seq[String] = {
    if (a.therapyResistance.contains(true) && a.therapySensitivity.contains(true))
      throw MoaRelevanceError("nonsensical entry linked to both sensitivity and resistance")
    val therapy = a.therapyName.map { _ =>
      if (a.therapyResistance.contains(true)) Seq("resistance")
      else if (a.therapySensitivity.contains(true)) Seq("sensitivity")
      else if (a.therapySensitivity.contains(false)) Seq("no sensitivity")
      else Seq.empty
    }.getOrElse(Seq.empty)
    val prognosis = a.favorablePrognosis match {
      case Some(1) => Seq("favourable prognosis")
      case Some(0) => Seq("unfavourable prognosis")
      case _ => Seq.empty
    }
    val pathogenic =
      if (a.variantPathogenic.nonEmpty && a.variantPathogenic.forall(_ == "1.0"))
        Seq("pathogenic")
      else Seq.empty
    val all = therapy ++ prognosis ++ pathogenic
    if (all.isEmpty) throw MoaRelevanceError("statement has no relevance")
    all
  }
}
