package graft.sources

/** NCIt raw-row normalization (reference `cleanRawRow` +
  * `pickEndpoint` src/ncit/index.js:61-190; jest tables
  * test/ncit.test.js): deprecation from obsolete/retired parents or
  * concept status (P5), pipe-list splitting with synonym promotion (X9),
  * species-driven name preference (F14/A5), display-name building (F17)
  * and semantic-type → vertex-class routing.
  *
  * Pure row function used inside `map` over the NCIt flat-file scan.
  */
object NcitClean {

  val Deprecated: Seq[String] = Seq("C61063" /* obsolete */ , "C85834" /* retired */ )

  val DiseaseConcepts: Seq[String] = Seq(
    "Anatomical Abnormality", "Congenital Abnormality", "Disease or Syndrome",
    "Experimental Model of Disease", "Mental or Behavioral Dysfunction",
    "Neoplastic Process", "Sign or Symptom")

  val AnatomyConcepts: Seq[String] = Seq(
    "Anatomical Structure", "Body Location or Region",
    "Body Part, Organ, or Organ Component", "Body Space or Junction",
    "Body System", "Tissue")

  val TherapeuticConcepts: Seq[String] = Seq(
    "Antibiotic", "Biologically Active Substance",
    "Biomedical or Dental Material", "Chemical Viewed Functionally",
    "Chemical Viewed Structurally", "Chemical", "Clinical Drug",
    "Drug Delivery Device", "Element, Ion, or Isotope", "Food",
    "Hazardous or Poisonous Substance", "Hormone", "Immunologic Factor",
    "Indicator, Reagent, or Diagnostic Aid", "Inorganic Chemical",
    "Medical Device", "Organic Chemical", "Pharmacologic Substance", "Plant",
    "Steroid", "Substance", "Therapeutic or Preventive Procedure", "Vitamin")

  case class EndpointError(msg: String) extends Exception(msg)

  /** Route a semantic type to its vertex class; ambiguous membership is an
    * error; unknown types fall back to the parent concepts.
    */
  def pickEndpoint(conceptName: String, parentConcepts: String = ""): String = {
    var endpoint: Option[String] = None
    if (AnatomyConcepts.exists(conceptName.contains)) endpoint = Some("AnatomicalEntity")
    if (DiseaseConcepts.exists(conceptName.contains)) {
      if (endpoint.isDefined)
        throw EndpointError(s"Concept must be in a discrete category ($conceptName)")
      endpoint = Some("Disease")
    }
    if (TherapeuticConcepts.exists(conceptName.contains)) {
      if (endpoint.isDefined)
        throw EndpointError(s"Concept must be in a discrete category ($conceptName)")
      endpoint = Some("Therapy")
    }
    endpoint.getOrElse {
      if (parentConcepts.nonEmpty)
        try return pickEndpoint(parentConcepts) catch { case _: EndpointError => () }
      throw EndpointError(s"Concept not implemented ($conceptName)")
    }
  }

  case class RawRow(
      id: String, synonyms: String, parents: String, xmlTag: String,
      name: String, definition: String, semanticType: String,
      conceptStatus: String, parentConcepts: String)

  case class CleanRow(
      sourceId: String, name: String, displayName: String, description: String,
      deprecated: Boolean, parents: Seq[String], synonyms: Seq[String],
      originalSynonyms: Seq[String], species: String, endpoint: String,
      url: String)

  private val SpeciesRe = "(?i)\\b(murine|mouse|rat)\\b".r
  private def speciesMatch(term: String): String =
    SpeciesRe.findFirstMatchIn(term).map(_.group(1)).getOrElse("")

  def cleanRawRow(raw: RawRow): CleanRow = {
    val deprecated =
      raw.parents.split("\\|").exists(Deprecated.contains) ||
        raw.conceptStatus == "Obsolete_Concept" ||
        raw.conceptStatus == "Retired_Concept"
    val parents = raw.parents.split("\\|").toSeq.map(_.trim)
      .filter(p => p.nonEmpty && !Deprecated.contains(p))
      .map(_.toLowerCase)
    var synonyms = raw.synonyms.split("\\|").toSeq.map(_.trim).filter(_.nonEmpty)
    var name = raw.name.trim
    val sourceId = raw.id.toLowerCase.trim
    val endpoint = pickEndpoint(raw.semanticType, raw.parentConcepts)

    // split up the name if it is a list
    if (name.contains("|")) {
      val names = name.split("\\|").toSeq.map(_.trim).filter(_.nonEmpty)
      name = names.head
      synonyms = synonyms ++ names.tail
    }

    // non-human concepts should use the fuller (species-bearing) name
    var species = speciesMatch(name)
    if (species.isEmpty) {
      synonyms.find(s => speciesMatch(s).nonEmpty).foreach { s =>
        name = s
        species = speciesMatch(s)
      }
      // the reference applies the parents-derived species UNCONDITIONALLY
      // inside this branch (ncit/index.js:151-163): a parent match
      // overwrites a synonym-derived species.
      parents.map(speciesMatch).find(_.nonEmpty).foreach(species = _)
    }

    if (name.isEmpty) name = sourceId
    val url = raw.xmlTag.stripPrefix("<").stripSuffix(">")
    // displayName keeps the original case (computed before the final
    // lowercasing, ncit/index.js:180-183)
    val displayName =
      if (name.toLowerCase == sourceId.toLowerCase) sourceId
      else s"$name [$sourceId]"

    // final output normalization (ncit/index.js:184-189): name lowercased;
    // synonyms deduped (on original case, like JS `new Set`), lowercased,
    // with the name itself removed; the original-case list is kept as
    // `original_synonyms`.
    val loweredName = name.toLowerCase
    val outSynonyms = synonyms.distinct.map(_.toLowerCase)
      .filter(_ != loweredName)

    CleanRow(sourceId, loweredName, displayName, raw.definition, deprecated,
      parents, outSynonyms, synonyms, species, endpoint, url)
  }
}
