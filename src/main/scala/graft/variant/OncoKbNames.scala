package graft.variant

/** F3 — OncoKB variant-name parser (reference `parseVariantName`
  * oncokb/index.js:131-193 + VOCABULARY_MAPPING :102-107): protein
  * fallback, splice shorthands, dash/en-dash fusions with flip detection
  * against the linked gene, exon-mutation grammar, vocabulary folds,
  * truncation ranges.
  */
object OncoKbNames {

  case class Parsed(
      vtype: String,
      reference2: Option[String] = None,
      flipped: Option[Boolean] = None)

  case class OncoKbParseError(msg: String) extends Exception(msg)

  val VocabularyMapping: Map[String, String] = Map(
    "fusions" -> "fusion",
    "oncogenic mutations" -> "oncogenic mutation",
    "promoter mutations" -> "promoter mutation",
    "truncating mutations" -> "truncating")

  private val SpliceRange = "^([a-z])?(\\d+)_([a-z])?(\\d+)splice$".r
  // – is the en-dash OncoKB mixes in with plain dashes
  private val FusionDash = "(?iu)^([a-z0-9_]+)[–-]([a-z0-9_]+)(\\s+fusion)?$".r
  private val ExonMutation = "(?i)^exon (\\d+) (mutation|insertion|deletion|deletion/insertion|splice mutation|indel|missense mutation)s?$".r
  private val TwoExonDeletion = "(?i)^Exon (\\d+) and (\\d+) deletion$".r
  private val TruncRange = "(?i)^([A-Z]\\d+)_([A-Z]\\d+)(trunc|fs)$".r

  def parse(variantIn: String, reference1: Option[String] = None): Parsed = {
    val variant = variantIn.toLowerCase.trim

    if (HgvsParser.parseOpt(s"p.$variant").isDefined)
      return Parsed(s"p.$variant")

    variant match {
      case SpliceRange(a1, p1, a2, p2) =>
        Parsed(s"p.(${Option(a1).getOrElse("?")}${p1}_${Option(a2).getOrElse("?")}$p2)spl")
      case v if v.endsWith("_splice") =>
        Parsed(s"p.${v.replace("_splice", "spl")}")
      case FusionDash(gene1, gene2, _) =>
        reference1.map(_.toLowerCase) match {
          case Some(r1) if r1 == gene1 =>
            Parsed("fusion", reference2 = Some(gene2), flipped = Some(false))
          case Some(r1) if r1 == gene2 =>
            Parsed("fusion", reference2 = Some(gene1), flipped = Some(true))
          case Some(r1) => throw OncoKbParseError(
            s"Fusion gene names ($gene1,$gene2) do not match expected gene name ($r1)")
          case None =>
            Parsed("fusion", reference2 = Some(gene2), flipped = Some(false))
        }
      case ExonMutation(pos, kind) =>
        if (kind == "deletion/insertion" || kind == "indel") Parsed(s"e.${pos}delins")
        else Parsed(s"e.$pos${kind.take(3)}")
      case v if VocabularyMapping.contains(v) =>
        Parsed(VocabularyMapping(v))
      case TwoExonDeletion(e1, e2) =>
        Parsed(s"e.${e1}_${e2}del")
      case TruncRange(p1, p2, kind) =>
        Parsed(s"p.(${p1}_$p2)${if (kind == "trunc") "*" else "fs"}")
      case _ => throw OncoKbParseError(
        s"Unable to parse variant from variantName (variantName=$variantIn, reference1=${reference1.getOrElse("")})")
    }
  }
}
