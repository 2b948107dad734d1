package graft.variant

import org.scalatest.funsuite.AnyFunSuite

import CivicNames._

/** Transcribed from the reference jest corpora:
  * test/civic/civic.variant.test.js (normalizeGeneVariant cases) and
  * test/oncokb.test.js (parseVariantName cases).
  */
class CivicNamesSpec extends AnyFunSuite {

  private def gene(n: String) = Ref(n, Some("1"))
  private def n1(name: String, entrez: String) =
    normalize(name, Some(1L), entrez)

  test("exon mutation") {
    assert(n1("EXON 12 MUTATION", "gene") == Seq(
      Normalized(gene("gene"), positional = true, variant = Some("e.12mut"))))
  }

  test("deleterious mutation → category") {
    assert(n1("DELETRIOUS MUTATION", "gene") == Seq(
      Normalized(gene("gene"), vtype = Some("deletrious mutation"))))
  }

  test("phosphorylation variant") {
    assert(n1("Y1234 phosphorylation", "gene") == Seq(
      Normalized(gene("gene"), positional = true, variant = Some("p.y1234phos"))))
  }

  test("single gene fusion with missense mutation") {
    assert(n1("ALK FUSION G1202R", "ALK") == Seq(
      Normalized(gene("alk"), vtype = Some("fusion")),
      Normalized(gene("alk"), positional = true, variant = Some("p.g1202r"))))
  }

  test("multi-gene fusion with 2 resistance mutations (dash notation, via SUBS)") {
    assert(n1("EML4-ALK G1202R-L1198F", "alk") == Seq(
      Normalized(Ref("eml4", None), Some(gene("alk")), vtype = Some("fusion")),
      Normalized(gene("alk"), positional = true, variant = Some("p.g1202r")),
      Normalized(gene("alk"), positional = true, variant = Some("p.l1198f"))))
  }

  test("multi-gene fusion") {
    assert(n1("CD74-NRG1", "NRG1") == Seq(
      Normalized(Ref("cd74", None), Some(gene("nrg1")), vtype = Some("fusion"))))
  }

  test("fusion with multiple variants (dash and colon separators)") {
    val expected = Seq(
      Normalized(Ref("lmna", None), Some(gene("ntrk1")), vtype = Some("fusion")),
      Normalized(gene("ntrk1"), positional = true, variant = Some("p.g595r")),
      Normalized(gene("ntrk1"), positional = true, variant = Some("p.g667c")))
    assert(n1("LMNA-NTRK1 G595R AND G667C", "NTRK1") == expected)
    assert(n1("LMNA::NTRK1 G595R AND G667C", "NTRK1") == expected)
  }

  test("corrects deprecated indel syntax") {
    assert(n1("S111C (c.330CA>TT)", "NTRK1") == Seq(
      Normalized(gene("ntrk1"), positional = true, variant = Some("p.s111c"),
        inferredByCds = Some("c.330_331delcainstt"))))
  }

  test("categorical variant") {
    assert(n1("UNDEREXPRESSION", "NTRK1") == Seq(
      Normalized(gene("ntrk1"), vtype = Some("underexpression"))))
  }

  test("protein truncation with cds notation") {
    assert(n1("E46* (c.136G>T)", "ALK") == Seq(
      Normalized(gene("alk"), positional = true, variant = Some("p.e46*"),
        inferredByCds = Some("c.136g>t"))))
  }

  test("categorical variant with spaces (domain)") {
    assert(n1("DNA BINDING DOMAIN MUTATION", "NTRK1") == Seq(
      Normalized(gene("ntrk1"), vtype = Some("dna binding domain mutation"))))
  }

  test("regular missense mutation via parser fallback") {
    assert(n1("R132H", "NTRK1") == Seq(
      Normalized(gene("ntrk1"), positional = true, variant = Some("p.r132h"))))
  }

  test("plural for single gene fusion") {
    assert(n1("NRG1 fusions", "NRG1") == Seq(
      Normalized(gene("nrg1"), vtype = Some("fusion"))))
  }

  test("fusion with exon positions / new exon notation / reference2 input") {
    assert(n1("EML4-ALK E20;A20", "ALK") == Seq(
      Normalized(Ref("eml4", None), Some(gene("alk")), positional = true,
        variant = Some("fusion(e.20,e.20)"))))
    assert(n1("EWSR1-FLI1 e7-e6", "FLI1") == Seq(
      Normalized(Ref("ewsr1", None), Some(gene("fli1")), positional = true,
        variant = Some("fusion(e.7,e.6)"))))
    assert(n1("EML4-ALK E20;A20", "EML4") == Seq(
      Normalized(gene("eml4"), Some(Ref("alk", None)), positional = true,
        variant = Some("fusion(e.20,e.20)"))))
  }

  test("abl fusion (gene-name equivalence)") {
    assert(n1("BCR-ABL", "ABL1") == Seq(
      Normalized(Ref("bcr", None), Some(gene("abl1")), vtype = Some("fusion"))))
  }

  test("cds notation") {
    assert(n1("c.123G>T", "ABL1") == Seq(
      Normalized(gene("abl1"), positional = true, variant = Some("c.123g>t"))))
  }

  test("exon range deletion") {
    assert(n1("exon 2-3 deletion", "ABL1") == Seq(
      Normalized(gene("abl1"), positional = true, variant = Some("e.2_3del"))))
  }

  test("frameshift with cds") {
    assert(n1("t133lfs*26 (c.397dela)", "ALK") == Seq(
      Normalized(gene("alk"), positional = true, variant = Some("p.t133lfs*26"),
        inferredByCds = Some("c.397dela"))))
  }

  test("simple gene mutation / bare mutations") {
    assert(n1("ABL1 mutations", "ABL1") == Seq(
      Normalized(gene("abl1"), vtype = Some("mutation"))))
    assert(n1("mutations", "ABL1") == Seq(
      Normalized(gene("abl1"), vtype = Some("mutation"))))
  }

  test("exon plural mutations") {
    assert(n1("exon 3 mutations", "ABL1") == Seq(
      Normalized(gene("abl1"), positional = true, variant = Some("e.3mut"))))
  }

  test("splice site mutation") {
    assert(n1("F547 SPLICE SITE MUTATION", "ALK") == Seq(
      Normalized(gene("alk"), positional = true, variant = Some("p.f547spl"))))
  }

  test("protein deletion/dup with cds") {
    assert(n1("r79_s80del (c.236_241delgcagtc)", "ALK") == Seq(
      Normalized(gene("alk"), positional = true, variant = Some("p.r79_s80del"),
        inferredByCds = Some("c.236_241delgcagtc"))))
    assert(n1("r82_v84del (c.244_252del)", "ALK") == Seq(
      Normalized(gene("alk"), positional = true, variant = Some("p.r82_v84del"),
        inferredByCds = Some("c.244_252del"))))
    assert(n1("p.s193_c196dupstsc (c.577_588dupagcaccagctgc)", "ALK") == Seq(
      Normalized(gene("alk"), positional = true,
        variant = Some("p.s193_c196dupstsc"),
        inferredByCds = Some("c.577_588dupagcaccagctgc"))))
  }

  test("SUBS table: implicit-or position and cytoband") {
    assert(n1("G12/G13", "KRAS") == Seq(
      Normalized(gene("kras"), positional = true, variant = Some("p.(g12_g13)mut"))))
    assert(n1("p26.3-25.3 11mb del", "GENE") == Seq(
      Normalized(gene("gene"), positional = true, variant = Some("y.p26.3_p25.3del"))))
  }

  test("translocation syntax") {
    assert(n1("t(9;22)(q34;q11)", "ABL1") == Seq(
      Normalized(Ref("9", None), Some(Ref("22", None)), positional = true,
        variant = Some("translocation(q34, q11)"))))
  }

  test("semi-colon delimited variants (jest)") {
    assert(n1("A50A (c.150C>G); Splicing alteration (c.463-1G>T)", "ALK") == Seq(
      Normalized(gene("alk"), positional = true, variant = Some("p.a50a"),
        inferredByCds = Some("c.150c>g")),
      Normalized(gene("alk"), positional = true, variant = Some("c.463-1g>t"),
        infersType = Some("splicing alteration"))))
  }

  test("bad notation returns as vocabulary (jest)") {
    assert(n1("ERBB2 G776INSV_G/C", "ERBB2") == Seq(
      Normalized(gene("erbb2"), vtype = Some("erbb2 g776insv_g/c"))))
    assert(n1("exon1 151nt del; Null (Partial deletion of Exon 1)", "ERBB2") == Seq(
      Normalized(gene("erbb2"), vtype = Some("exon1 151nt del")),
      Normalized(gene("erbb2"), vtype = Some("null (partial deletion of exon 1)"))))
  }

  test("unsupported and ambiguous names throw") {
    assertThrows[NotImplemented](n1("Non-V600", "BRAF"))
    assertThrows[CivicParsingError](n1("a / b", "GENE"))
    assertThrows[CivicParsingError](n1("AAA-BBB", "OTHER"))
  }

  test("normalizeFactorVariant: TMB → high mutation burden signature (jest :80-93)") {
    assert(normalizeFactor("TMB", "abc") == Seq(
      Normalized(Ref("high mutation burden", None, Some("Signature")),
        vtype = Some("high signature"))))
    assertThrows[NotImplemented](normalizeFactor("Kataegis", "abc"))
    assertThrows[NotImplemented](normalizeFactor("Methylation signature", "x"))
  }

  test("normalizeFusionVariant: five/three/both prime genes (jest :94-123)") {
    val braf = FusionGene("BRAF", Some(673L))
    val alk = FusionGene("ALK", Some(238L))
    assert(normalizeFusion(Some(braf), None) == Seq(
      Normalized(Ref("braf", Some("673")), vtype = Some("fusion"))))
    assert(normalizeFusion(None, Some(alk)) == Seq(
      Normalized(Ref("alk", Some("238")), vtype = Some("fusion"))))
    assert(normalizeFusion(Some(braf), Some(alk)) == Seq(
      Normalized(Ref("braf", Some("673")), Some(Ref("alk", Some("238"))),
        vtype = Some("fusion"))))
    assertThrows[CivicParsingError](normalizeFusion(None, None))
    // missing entrez id becomes the empty-string sourceId (JS `${x || ''}`)
    assert(normalizeFusion(Some(FusionGene("BRAF", None)), None) == Seq(
      Normalized(Ref("braf", Some("")), vtype = Some("fusion"))))
  }

  test("normalizeVariant feature dispatch (jest :779-797)") {
    assert(normalizeFeature(FactorF("TMB", "abc")).length == 1)
    assert(normalizeFeature(
      FusionF(Some(FusionGene("BRAF", Some(673L))), None)).length == 1)
    assert(normalizeFeature(GeneF(Some(672L), "BRCA1", "Mutation")).length == 1)
    assertThrows[NotImplemented](normalizeFeature(UnknownF("Other")))
  }
}

class OncoKbNamesSpec extends AnyFunSuite {
  import OncoKbNames._

  test("protein fallback (jest: V600_K601insFGLAT)") {
    assert(parse("V600_K601insFGLAT", Some("braf")) ==
      Parsed("p.v600_k601insfglat"))
  }

  test("fusion without gene (jest: BCR-ABL1 Fusion)") {
    assert(parse("BCR-ABL1 Fusion") ==
      Parsed("fusion", Some("abl1"), Some(false)))
  }

  test("fusion with gene given flips (jest)") {
    assert(parse("BCR-ABL1 Fusion", Some("ABL1")) ==
      Parsed("fusion", Some("bcr"), Some(true)))
  }

  test("case-insensitive fusion (jest: RAD51C-ATXN7)") {
    assert(parse("RAD51C-ATXN7", Some("atxn7")) ==
      Parsed("fusion", Some("rad51c"), Some(true)))
  }

  test("unicode en-dash (jest: GOPC–ROS1 Fusion)") {
    assert(parse("GOPC–ROS1 Fusion", Some("ros1")) ==
      Parsed("fusion", Some("gopc"), Some(true)))
  }

  test("splice shorthands") {
    assert(parse("X100_A101splice") == Parsed("p.(x100_a101)spl"))
    assert(parse("700_800splice") == Parsed("p.(?700_?800)spl"))
    assert(parse("e14_splice") == Parsed("p.e14spl"))
  }

  test("exon grammar + vocabulary") {
    assert(parse("Exon 12 mutations") == Parsed("e.12mut"))
    assert(parse("exon 5 deletion/insertion") == Parsed("e.5delins"))
    assert(parse("Exon 4 and 5 deletion") == Parsed("e.4_5del"))
    assert(parse("Truncating Mutations") == Parsed("truncating"))
    assert(parse("fusions") == Parsed("fusion"))
  }

  test("truncation range") {
    assert(parse("K550_W557trunc") == Parsed("p.(k550_w557)*"))
    assert(parse("A50_E60fs") == Parsed("p.(a50_e60)fs"))
  }

  test("mismatched fusion genes throw") {
    assertThrows[OncoKbParseError](parse("AAA-BBB fusion", Some("CCC")))
    assertThrows[OncoKbParseError](parse("%%%"))
  }
}

class DocmFixesSpec extends AnyFunSuite {
  import DocmFixes._

  test("single trailing-dash deletion") {
    assert(fix("p.W802-") == "p.W802delW")
  }

  test("multi trailing-dash deletion") {
    assert(fix("p.DIM842-") == "p.D842_M844delDIM")
  }

  test("multi-AA substitution → delins with common-prefix trim") {
    // DI842-843VM style: p.DI842VM → common prefix 0 → full delins
    assert(fix("p.DI842VM") == "p.D842_I843delDIinsVM")
    // shared leading base trims and shifts the position
    assert(fix("p.AB100AC") == "p.B101delBinsC")
  }

  test("pass-through") {
    assert(fix("p.G12D") == "p.G12D")
    assert(fix("p.ABC100X") == "p.ABC100X") // X = frameshift, excluded
  }
}
