package graft.variant

import org.scalatest.funsuite.AnyFunSuite
import ProfileDnf._

/** Transcribed from the reference jest corpus
  * test/civic/civic.profile.test.js (parse/compile/combine/disambiguate
  * cases) and test/civic cgi expectations for Biomarkers.
  */
class ProfileDnfSpec extends AnyFunSuite {

  private def v(id: Long, name: String) = Variant(id, name)

  test("parse: AND / OR / nesting (jest _parse cases)") {
    assert(parse(tokenize("1 AND 2")) == Seq(Seq(1L, 2L)))
    assert(parse(tokenize("1 OR 2")) == Seq(Seq(1L), Seq(2L)))
    assert(parse(tokenize("1 AND ( 2 OR 3 )")) == Seq(Seq(1L, 2L), Seq(1L, 3L)))
    assert(parse(tokenize("1 OR ( 2 AND 3 )")) == Seq(Seq(1L), Seq(2L, 3L)))
    assert(parse(tokenize("( 1 AND 2 ) OR ( 3 AND 4 )")) ==
      Seq(Seq(1L, 2L), Seq(3L, 4L)))
    assert(parse(tokenize("1 AND ( 2 OR ( 3 AND 4 ) )")) ==
      Seq(Seq(1L, 2L), Seq(1L, 3L, 4L)))
  }

  test("parse: NOT rejected") {
    assertThrows[NotSupported](parse(tokenize("1 AND NOT 2")))
  }

  test("combine (jest _combine cases)") {
    assert(combine(Seq(Seq.empty), Seq(Seq.empty)) == Seq(Seq.empty))
    val a = v(1, "A"); val b = v(2, "B"); val c = v(3, "C"); val d = v(4, "D")
    assert(combine(Seq(Seq(a)), Seq(Seq.empty)) == Seq(Seq(a)))
    assert(combine(Seq(Seq.empty), Seq(Seq(b))) == Seq(Seq(b)))
    assert(combine(Seq(Seq(a)), Seq(Seq(b))) == Seq(Seq(a, b)))
    assert(combine(Seq(Seq(a)), Seq(Seq(b), Seq(c))) == Seq(Seq(a, b), Seq(a, c)))
    assert(combine(Seq(Seq(a), Seq(b)), Seq(Seq(c), Seq(d))) ==
      Seq(Seq(a, c), Seq(a, d), Seq(b, c), Seq(b, d)))
  }

  test("disambiguate: AND statement (jest case)") {
    val conditions = Seq(Seq(v(8, "X123M/N"), v(9, "X456O/P"), v(10, "X456Q")))
    assert(disambiguate(conditions) == Seq(
      Seq(v(8, "X123M"), v(9, "X456O"), v(10, "X456Q")),
      Seq(v(8, "X123M"), v(9, "X456P"), v(10, "X456Q")),
      Seq(v(8, "X123N"), v(9, "X456O"), v(10, "X456Q")),
      Seq(v(8, "X123N"), v(9, "X456P"), v(10, "X456Q"))))
  }

  test("disambiguate: OR statement (jest case)") {
    val conditions = Seq(Seq(v(8, "X123M/N")), Seq(v(9, "X456O/P")))
    assert(disambiguate(conditions) == Seq(
      Seq(v(8, "X123M")), Seq(v(8, "X123N")),
      Seq(v(9, "X456O")), Seq(v(9, "X456P"))))
  }

  test("expand end-to-end with names") {
    val names = Map(1L -> "V600E", 2L -> "Q157P/R", 3L -> "AMP")
    assert(expand("1 AND ( 2 OR 3 )", names) == Seq(
      Seq(v(1, "V600E"), v(2, "Q157P")),
      Seq(v(1, "V600E"), v(2, "Q157R")),
      Seq(v(1, "V600E"), v(3, "AMP"))))
  }
}

class BiomarkersSpec extends AnyFunSuite {
  import Biomarkers._

  test("protein column short-circuits") {
    assert(expand("whatever", "MUT", "KRAS:G12D") == Seq(Seq("KRAS:p.G12D")))
  }

  test("gene protein-list alternatives") {
    assert(expand("KRAS (G12,G13)", "MUT") ==
      Seq(Seq("KRAS:p.G12mut"), Seq("KRAS:p.G13mut")))
    assert(expand("TP53 (R175H)", "MUT") == Seq(Seq("TP53:p.R175H")))
  }

  test("range tail") {
    assert(expand("EGFR (746-750)", "DEL") == Seq(Seq("EGFR:p.(?746_?750)del")))
  }

  test("exon and category tails") {
    assert(expand("EGFR exon 19 deletions", "DEL") == Seq(Seq("EGFR:e.19del")))
    assert(expand("KRAS oncogenic mutation", "MUT") ==
      Seq(Seq("KRAS:cat:oncogenic mutation")))
  }

  test("fusion") {
    assert(expand("BCR-ABL1 fusion", "FUS") == Seq(Seq("(BCR,ABL1):fusion")))
  }

  test("co-occurrence cross product, >2 rejected") {
    assert(expand("KRAS (G12,G13) + TP53 oncogenic mutation", "MUT") == Seq(
      Seq("KRAS:p.G12mut", "TP53:cat:oncogenic mutation"),
      Seq("KRAS:p.G13mut", "TP53:cat:oncogenic mutation")))
    assertThrows[BiomarkerError](expand("A x + B y + C z", "MUT"))
  }
}
