package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import Relevance._

/** F6 lookup laws + the MOA parseRelevance jest corpus
  * (test/moa.test.js:53-108) transcribed.
  */
class RelevanceSpec extends AnyFunSuite {

  test("F6 table: every supported combo resolves; unsupported do not") {
    assert(translate("SUPPORTS", "PREDICTIVE", "RESISTANCE").contains("resistance"))
    assert(translate("DOES_NOT_SUPPORT", "PREDICTIVE", "SENSITIVITYRESPONSE")
      .contains("no response"))
    assert(translate("NA", "ONCOGENIC", "NA").contains("likely oncogenic"))
    assert(translate("SUPPORTS", "DIAGNOSTIC", "NA").isEmpty)
    assert(table.size == 28)
  }

  private def a(
      therapy: Option[String] = None,
      sens: Option[Boolean] = None,
      res: Option[Boolean] = None,
      prog: Option[Int] = None,
      path: Seq[String] = Seq.empty) =
    MoaAssertion(therapy, sens, res, prog, path)

  test("moa: sensitivity / no sensitivity / resistance") {
    assert(parseMoaRelevance(a(Some("stuff"), sens = Some(true))) == Seq("sensitivity"))
    assert(parseMoaRelevance(a(Some("stuff"), sens = Some(false))) == Seq("no sensitivity"))
    assert(parseMoaRelevance(a(Some("stuff"), res = Some(true))) == Seq("resistance"))
  }

  test("moa: prognosis branches") {
    assert(parseMoaRelevance(a(prog = Some(1))) == Seq("favourable prognosis"))
    assert(parseMoaRelevance(a(prog = Some(0))) == Seq("unfavourable prognosis"))
  }

  test("moa: pathogenic requires all variants pathogenic and at least one") {
    assert(parseMoaRelevance(a(path = Seq("1.0"))) == Seq("pathogenic"))
    assertThrows[MoaRelevanceError](parseMoaRelevance(a(path = Seq("0.0"))))
  }

  test("moa: contradictions and empty relevance throw") {
    assertThrows[MoaRelevanceError](
      parseMoaRelevance(a(Some("x"), sens = Some(true), res = Some(true))))
    assertThrows[MoaRelevanceError](parseMoaRelevance(a()))
  }

  test("moa: multiple terms accumulate (therapy + prognosis + pathogenic)") {
    assert(parseMoaRelevance(a(Some("x"), sens = Some(true), prog = Some(1),
      path = Seq("1.0", "1.0"))) ==
      Seq("sensitivity", "favourable prognosis", "pathogenic"))
  }
}
