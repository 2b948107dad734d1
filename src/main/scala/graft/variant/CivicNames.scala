package graft.variant

/** F2 — CIViC variant-name normalization grammar (reference
  * `normalizeGeneVariant` civic/variant.js:20-257; jest corpus
  * test/civic/civic.variant.test.js, transcribed in CivicNamesSpec).
  *
  * One raw CIViC name → N normalized variant records: positional records
  * carry an HGVS-ish `variant` string (validated downstream by
  * [[HgvsParser]]), categorical records carry a vocabulary `vtype`; a
  * combined protein+cds name links the cds form via `inferredByCds`, a
  * "splicing alteration (c.X)" links a category via `infersType`.
  *
  * Pure function used inside `flatMap` over evidence rows.
  */
object CivicNames {

  case class Ref(name: String, sourceId: Option[String],
      refClass: Option[String] = None)

  case class Normalized(
      reference1: Ref,
      reference2: Option[Ref] = None,
      positional: Boolean = false,
      variant: Option[String] = None,
      vtype: Option[String] = None,
      inferredByCds: Option[String] = None,
      infersType: Option[String] = None)

  case class NotImplemented(msg: String) extends Exception(msg)
  case class CivicParsingError(msg: String) extends Exception(msg)

  /** The CIViC feature flavours dispatched by `normalizeVariant`
    * (civic/variant.js:349-380): Gene names go through the name grammar,
    * Factors map to signature vocabulary, Fusions come pre-structured.
    */
  sealed trait CivicFeature
  case class GeneF(entrezId: Option[Long], entrezName: String,
      variantName: String) extends CivicFeature
  case class FactorF(factorName: String, variantName: String) extends CivicFeature
  case class FusionGene(name: String, entrezId: Option[Long])
  case class FusionF(fivePrime: Option[FusionGene],
      threePrime: Option[FusionGene]) extends CivicFeature
  case class UnknownF(typename: String) extends CivicFeature

  /** CIViC Factor → GraphKB signature terms (civic/variant.js:266-287):
    * only TMB is supported; the reference1 carries the Signature class
    * marker that routes it away from gene fetching.
    */
  def normalizeFactor(factorName: String, variantName: String): Seq[Normalized] =
    factorName match {
      case "TMB" => Seq(Normalized(
        Ref("high mutation burden", None, Some("Signature")),
        vtype = Some("high signature")))
      case other =>
        throw NotImplemented(s"unable to process Factor $other $variantName")
    }

  /** CIViC structured Fusion feature (civic/variant.js:296-338): both
    * genes when present, else whichever end is known; entrez ids become
    * string sourceIds ('' when absent, like the JS template literal).
    */
  def normalizeFusion(fivePrime: Option[FusionGene],
      threePrime: Option[FusionGene]): Seq[Normalized] = {
    def ref(g: FusionGene) = Ref(g.name.toLowerCase.trim,
      Some(g.entrezId.map(_.toString).getOrElse("")))
    (fivePrime, threePrime) match {
      case (Some(f5), Some(f3)) =>
        Seq(Normalized(ref(f5), Some(ref(f3)), vtype = Some("fusion")))
      case (Some(f5), None) => Seq(Normalized(ref(f5), vtype = Some("fusion")))
      case (None, Some(f3)) => Seq(Normalized(ref(f3), vtype = Some("fusion")))
      case (None, None) =>
        throw CivicParsingError("fivePrimeGene and/or threePrimeGene expected on Fusion variant")
    }
  }

  /** Feature-type dispatch (civic/variant.js:349-380). */
  def normalizeFeature(feature: CivicFeature): Seq[Normalized] = feature match {
    case GeneF(id, entrezName, name) => normalize(name, id, entrezName)
    case FactorF(fn, name) => normalizeFactor(fn, name)
    case FusionF(f5, f3) => normalizeFusion(f5, f3)
    case UnknownF(t) =>
      throw NotImplemented(s"unable to process variant's feature of type $t")
  }

  /** Hardcoded CIViC→GraphKB correspondences (civic/variant.js:20-41). */
  val SUBS: Map[String, String] = Map(
    "E746_T751>I" -> "E746_T751delinsI",
    "EML4-ALK C1156Y-L1196M" -> "EML4-ALK and C1156Y and L1196M",
    "EML4-ALK C1156Y-L1198F" -> "EML4-ALK and C1156Y and L1198F",
    "EML4-ALK G1202R-L1196M" -> "EML4-ALK and G1202R and L1196M",
    "EML4-ALK G1202R-L1198F" -> "EML4-ALK and G1202R and L1198F",
    "EML4-ALK L1196M-L1198F" -> "EML4-ALK and L1196M and L1198F",
    "EML4-ALK T1151INST" -> "EML4-ALK and T1151_?1152insT",
    "Ex19 del L858R" -> "e.19del and L858R",
    "G12/G13" -> "p.(G12_G13)mut",
    "K558NP" -> "K558delKinsNP",
    "T1151insT" -> "T1151_?1152insT",
    "V600E AMPLIFICATION" -> "V600E and AMPLIFICATION",
    "V600E+V600M" -> "V600E and V600M",
    "V600_K601>E" -> "V600_K601delVKinsE",
    "del 755-759" -> "?755_?759del",
    "di842-843vm" -> "D842_I843delDIinsVM",
    "mutations" -> "mutation",
    "p.193_196dupSTSC (c.577_588dupAGCACCAGCTGC)" -> "p.S193_C196dupSTSC (c.577_588dupAGCACCAGCTGC)",
    "p26.3-25.3 11mb del" -> "y.p26.3_p25.3del")

  /** abl1/abl equivalence + case-insensitive compare (civic/variant.js:49-57). */
  def sameGene(g1: String, g2: String): Boolean = {
    val abl = Set("abl1", "abl")
    (abl.contains(g1.toLowerCase) && abl.contains(g2.toLowerCase)) ||
      g1.equalsIgnoreCase(g2)
  }

  private val Categorical = Set("loss-of-function", "gain-of-function",
    "overexpression", "expression", "amplification", "mutation")
  private val Translocation = "(?i)^t\\(([^;()]+);([^;()]+)\\)\\(([^;()]+);([^;()]+)\\)$".r
  private val ProteinCds = "(?i)^(p\\.)?([a-z*]\\d+\\S*)\\s+\\((c\\.[^)]+)\\)$".r
  private val DeprecatedCds = "^c\\.(\\d+)([acgt][acgt]+)>([acgt][acgt]+)$".r
  private val ExonIntron = "(?i)^(intron|exon)\\s+(\\d+)(-(\\d+))?\\s+(mutation|deletion|frameshift|insertion)s?$".r
  private val FusionPair = "(?i)^([A-Z][^-\\s]*)(-|::)([A-Z][^-\\s]*)\\s*(\\S+)?$".r
  private val ExonTailDash = "^e(\\d+)-e(\\d+)$".r
  private val ExonTailSemi = "^[a-z](\\d+);[a-z](\\d+)$".r
  private val SingleFusion = "(?i)^[A-Z][^-\\s]*\\s+fusions?$".r
  private val BareCds = "(?i)^\\s*c\\.\\d+\\s*[a-z]\\s*>[a-z]\\s*$".r
  private val DomainCat = "(?i)^((delete?rious)|promoter)\\s+mutation$".r
  private val SpliceAlt = "(?i)^(splicing\\s+alteration)\\s+\\((c\\..*)\\)$".r
  private val PhosSplice = "(?i)^([a-z]\\d+)\\s+(phosphorylation|splice site)(\\s+mutation)?$".r
  private val FusionPlusMut = "(?i)^(\\w+\\s+fusion)\\s+([a-z]\\d+\\S+)$".r
  private val GeneMutation = "^(.*)\\s+mutations?$".r

  def normalize(rawName: String, entrezId: Option[Long], rawEntrezName: String): Seq[Normalized] = {
    if (Set("Non-V600", "P-Loop Mutation").contains(rawName))
      throw NotImplemented(s"unable to process CIViC variant $rawEntrezName $rawName")

    val entrezName = rawEntrezName.toLowerCase.trim
    val joiner = " and "
    val name = SUBS.getOrElse(rawName, rawName)
      .replace(" + ", joiner)
      .replace("; ", joiner)
      .toLowerCase.trim

    if (name.contains(" / "))
      throw CivicParsingError(s"/ has ambiguous meaning in CIVIC, cannot process variant ($name)")
    if (name.contains(joiner))
      return name.split(joiner).toSeq
        .flatMap(n => normalize(n.trim, entrezId, entrezName))

    val gene = Ref(entrezName, Some(entrezId.map(_.toString).getOrElse("")))

    name match {
      case n if Categorical.contains(n) =>
        Seq(Normalized(gene, vtype = Some(n.replace("-", " "))))
      case Translocation(chr1, chr2, pos1, pos2) =>
        Seq(Normalized(Ref(chr1, None), Some(Ref(chr2, None)), positional = true,
          variant = Some(s"translocation($pos1, $pos2)")))
      case ProteinCds(_, protein, cds0) =>
        // correct deprecated same-length multi-base cds substitution → delins
        val cds = cds0 match {
          case DeprecatedCds(pos, ref, alt) if ref.length == alt.length =>
            s"c.${pos}_${pos.toInt + ref.length - 1}del${ref}ins$alt"
          case other => other
        }
        Seq(Normalized(gene, positional = true, variant = Some(s"p.$protein"),
          inferredByCds = Some(cds)))
      case ExonIntron(kind, b1, _, b2, vtype) =>
        val break2 = Option(b2).map(b => s"_$b").getOrElse("")
        val tail = if (vtype == "frameshift") "fs" else vtype.take(3)
        val prefix = if (kind == "exon") "e" else "i"
        Seq(Normalized(gene, positional = true,
          variant = Some(s"$prefix.$b1$break2$tail")))
      case FusionPair(gene1, _, gene2, tail) =>
        val rest: Either[String, String] = Option(tail) match {
          case Some(ExonTailDash(e1, e2)) => Right(s"fusion(e.$e1,e.$e2)")
          case Some(ExonTailSemi(e1, e2)) => Right(s"fusion(e.$e1,e.$e2)")
          case Some(other) =>
            return normalize(s"$gene1-$gene2", entrezId, entrezName) ++
              normalize(other, entrezId, entrezName)
          case None => Left("fusion")
        }
        def mk(r1: Ref, r2: Ref) = rest match {
          case Left(t) => Normalized(r1, Some(r2), vtype = Some(t))
          case Right(v) => Normalized(r1, Some(r2), positional = true, variant = Some(v))
        }
        if (sameGene(gene1, entrezName)) Seq(mk(gene, Ref(gene2, None)))
        else if (sameGene(gene2, entrezName)) Seq(mk(Ref(gene1, None), gene))
        else throw CivicParsingError(
          s"linked gene name ($entrezName) does not match either of the fusion partners ($gene1, $gene2) for this variant ($rawName)")
      case SingleFusion() =>
        Seq(Normalized(gene, vtype = Some("fusion")))
      case BareCds() =>
        Seq(Normalized(gene, positional = true,
          variant = Some(name.replaceAll("\\s+", ""))))
      case n if DomainCat.findFirstIn(n).isDefined || n.contains("domain") =>
        Seq(Normalized(gene, vtype = Some(n)))
      case SpliceAlt(cat, cds) =>
        Seq(Normalized(gene, positional = true, variant = Some(cds),
          infersType = Some(cat)))
      case PhosSplice(pos, kind, _) =>
        val tail = if (kind == "phosphorylation") "phos" else "spl"
        Seq(Normalized(gene, positional = true, variant = Some(s"p.$pos$tail")))
      case FusionPlusMut(fusion, mut) =>
        normalize(fusion, entrezId, entrezName) ++ normalize(mut, entrezId, entrezName)
      case GeneMutation(g) if sameGene(g, entrezName) =>
        Seq(Normalized(gene, vtype = Some("mutation")))
      case _ =>
        // parser fallback for notation that is close to correct
        if (HgvsParser.parseOpt(name).isDefined)
          Seq(Normalized(gene, positional = true, variant = Some(name)))
        else if (HgvsParser.parseOpt(s"p.$name").isDefined)
          Seq(Normalized(gene, positional = true, variant = Some(s"p.$name")))
        else Seq(Normalized(gene, vtype = Some(name)))
    }
  }
}
