package graft.variant

/** X4 — CGI multi-variant biomarker expansion (reference
  * `preprocessVariants` src/cancergenomeinterpreter/index.js:122-189).
  *
  * A biomarker string expands to condition sets of variant notations:
  *  - a non-empty protein column short-circuits: `GENE:X123Y` →
  *    `GENE:p.X123Y` (single set);
  *  - `A + B` co-occurrence: ≤2 `+`-separated parts, sets are the
  *    cross-product of each part's alternatives;
  *  - `GENE (V1,V2;V3)` → one alternative per protein token; bare
  *    `[A-Z]?\d+` tokens compose `p.<refAA|?><pos><class>`, range tails
  *    `N-M` compose `p.(?N_?M)<class>`;
  *  - `GENE exon N insertion|deletion` → `GENE:e.<N>ins|del`;
  *  - `GENE <tail>` → category variant `GENE:cat:<tail>`;
  *  - `G1-G2 fusion` → `(G1,G2):fusion`.
  *
  * Pure function used inside `flatMap` (one row → N condition sets).
  */
object Biomarkers {

  case class BiomarkerError(msg: String) extends Exception(msg)

  // the reference's class omits '-' (cancergenomeinterpreter/index.js:141),
  // which makes its own range branch (:149-151) unreachable; '-' is included
  // here so `GENE (746-750)` reaches the documented range composition
  private val ProteinList = "^(\\w+) \\(([A-Z0-9*,;-]+)\\)$".r
  private val SingleAA = "^([A-Z])?(\\d+)$".r
  private val Range = "^(\\d+)-(\\d+)$".r
  private val GeneTail = "^(\\w+)\\s+(.*)$".r
  private val ExonTail = "^exon (\\d+) (insertion|deletion)s?$".r
  private val Fusion = "^([A-Za-z0-9.]+)-([A-Za-z0-9.]+) fusion$".r

  /** One `+`-part → its alternative variants. */
  private def expandPart(part: String, biomarker: String, variantClass: String): Seq[String] =
    part match {
      case ProteinList(gene, tail) =>
        tail.split("[,;]").toSeq.map { sp =>
          val hgvsp = sp match {
            case SingleAA(refAA, pos) =>
              s"p.${Option(refAA).getOrElse("?")}$pos${variantClass.toLowerCase}"
            case _ => tail match {
              case Range(start, end) => s"p.(?${start}_?$end)${variantClass.toLowerCase}"
              case _ => s"p.$sp"
            }
          }
          s"$gene:$hgvsp"
        }
      case Fusion(g1, g2) => Seq(s"($g1,$g2):fusion")
      case GeneTail(gene, tail) =>
        tail match {
          case ExonTail(pos, kind) => Seq(s"$gene:e.$pos${kind.take(3)}")
          case _ => Seq(s"$gene:cat:$tail")
        }
      case other => throw BiomarkerError(s"unable to process variant ($other)")
    }

  /** Full expansion → condition sets (each set = co-occurring variants). */
  def expand(biomarker: String, variantClass: String, protein: String = ""): Seq[Seq[String]] = {
    val parts = biomarker.split("\\s*\\+\\s*").toSeq
    if (parts.length > 2)
      throw BiomarkerError("combinations of 3 or more not supported")
    if (protein.trim.nonEmpty)
      return Seq(Seq(protein.replace(":", ":p.")))
    val levels = parts.map(expandPart(_, biomarker, variantClass))
    levels match {
      case Seq(only) => only.map(Seq(_))
      case Seq(l1, l2) => for (a <- l1; b <- l2) yield Seq(a, b)
      case _ => Seq.empty
    }
  }
}
