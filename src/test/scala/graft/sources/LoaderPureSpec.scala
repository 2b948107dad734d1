package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the pure per-record functions of the round-4 loaders —
  * each case is transcribed from the cited reference lines (the oracle
  * rows cover the composed pipelines; these pin the edges of the scalar
  * grammars directly).
  */
class LoaderPureSpec extends AnyFunSuite {

  test("moa composeGenomicHgvs matches the jest corpus (test/moa.test.js:7-39)") {
    import Moa.composeGenomicHgvs
    assert(composeGenomicHgvs("-", "A", 123, 124) == "g.123_124insA")
    assert(composeGenomicHgvs("A", "-", 124, 124) == "g.124delA")
    assert(composeGenomicHgvs("AA", "-", 124, 125) == "g.124_125delAA")
    assert(composeGenomicHgvs("A", "C", 124, 124) == "g.124A>C")
    assert(composeGenomicHgvs("AA", "C", 124, 125) == "g.124_125delAAinsC")
    // old indel syntax: start==end and same lengths widens the end
    assert(composeGenomicHgvs("AA", "CC", 124, 124) == "g.124_125delAAinsCC")
  }

  test("moa forms: category/exon/generic decision (test/moa.test.js:140-221)") {
    import Moa.{forms, MoaVariant}
    def v(exon: Option[Long], ann: Option[String]) = MoaVariant(1L, "G",
      "somatic_variant", None, None, None, None, None, None, None, exon, ann)
    // annotation only → category typed by the annotation (moa-first)
    val cat = forms(v(None, Some("some variant type")))
    assert(cat.map(f => (f.form, f.vtype, f.annotationFirst)) ==
      Seq(("category", "some variant type", true)))
    // exon + annotation → positional e.2mut typed by the annotation
    val exon = forms(v(Some(2L), Some("some variant type")))
    assert(exon.map(f => (f.form, f.notation, f.break1)) ==
      Seq(("exon", "e.2mut", Some("e.2"))))
    // nothing at all → generic 'mutation' category
    assert(forms(v(None, None)).map(f => (f.form, f.vtype)) ==
      Seq(("category", "mutation")))
  }

  test("cgi parseEvidence routes and rejects (cgi/index.js:91-107)") {
    import Cgi.parseEvidence
    assert(parseEvidence("PMID:123;PMC456;NCT00112233;FDA guidance;NCCN x") ==
      Seq("123", "PMC456", "NCT00112233"))
    assertThrows[IllegalArgumentException](parseEvidence("WEIRD:1"))
  }

  test("cgi parseTherapy falls back to the bracket-stripped family (cgi/index.js:110-117)") {
    import Cgi.parseTherapy
    assert(parseTherapy("[Vemurafenib]", "x") == "Vemurafenib")
    assert(parseTherapy("[]", "[MEK inhibitors]") == "MEK inhibitors")
    assert(parseTherapy("", "family") == "family")
  }

  test("cgl normalizeProtein: paren strip + Ter rewrite except fs (cgl/index.js:61-71)") {
    import Cgl.normalizeProtein
    assert(normalizeProtein("p.(L858R)") == "p.L858R")
    assert(normalizeProtein("p.R306*") == "p.R306Ter")
    assert(normalizeProtein("p.G12fs*") == "p.G12fs*")
    assertThrows[IllegalArgumentException](normalizeProtein("L858R"))
  }

  test("cgl genomicNotation: VCF routing with checks (cgl/index.js:101-152)") {
    import Cgl.genomicNotation
    assert(genomicNotation("7", "55259515", "T", "G").contains("g.55259515T>G"))
    assert(genomicNotation("7", "100_102", "TACG", "T").contains("g.100_102delACG"))
    // the reference's empty-insertion quirk, transcribed as-is
    assert(genomicNotation("7", "200", "T", "TAA").contains("g.200_201ins"))
    assert(genomicNotation("7", "", "T", "G").isEmpty)
    // !chromosome early return (cgl/index.js:104)
    assert(genomicNotation("", "55259515", "T", "G").isEmpty)
    assertThrows[IllegalArgumentException](genomicNotation("7", "300", "A", "TG"))
    // deletion span mismatch
    assertThrows[IllegalArgumentException](
      genomicNotation("7", "100_105", "TAC", "T"))
  }

  test("docm buildGenomicVariant variant_type routing (docm/index.js:72-90)") {
    import Docm.{buildGenomicVariant, DocmRecord}
    def r(vt: String, start: Long, stop: Long, ref: String, alt: String) =
      DocmRecord("x", "p.X1Y", "G", "7", "GRCh37", start, stop, ref, alt, vt)
    assert(buildGenomicVariant(r("SNV", 10, 10, "A", "T")) == "7:g.10A>T")
    assert(buildGenomicVariant(r("DEL", 10, 10, "A", "-")) == "7:g.10delA")
    assert(buildGenomicVariant(r("DEL", 10, 12, "AAA", "-")) == "7:g.10_12delAAA")
    assert(buildGenomicVariant(r("INS", 10, 11, "-", "TT")) == "7:g.10_11insTT")
    assert(buildGenomicVariant(r("X", 10, 11, "AA", "T")) == "7:g.10_11delAAinsT")
  }

  test("fdaApprovals year rule: one distinct year only (fdaApprovals/index.js:90-105)") {
    import FdaApprovals.announcementYear
    assert(announcementYear(
      "On January 15, 2020 x\nfiled Jan. 3, 2020 y").contains("2020"))
    assert(announcementYear("May 1, 2019\nJune 2, 2021").isEmpty)
    assert(announcementYear("no dates here").isEmpty)
  }

  test("cosmic fusions preprocess: NS folds and variant strings (cosmic/fusions.js:163-186)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val pre = CosmicFusions.preprocess(Seq(
      ("r", "f", "s", "BRAF_ENST1", "MEK1", "10", "2", "NS", "NS", "p"))
      .toDF("recId", "fusionId", "sampleId", "gene1", "gene2", "exon1",
        "exon2", "disease", "diseaseFamily", "pubmed"))
    val row = pre.select("g1", "disease", "diseaseFamily", "variant",
      "nonSpecificVariant").collect().head
    assert(row.getString(0) == "BRAF")
    assert(row.getString(1) == "")
    assert(row.getString(2) == "cancer")
    assert(row.getString(3) == "(BRAF,MEK1).fus(e.10,e.2)")
    assert(row.getString(4) == "(BRAF,MEK1).fus(e.?,e.?)")
  }
}
