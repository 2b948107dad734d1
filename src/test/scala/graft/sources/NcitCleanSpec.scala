package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import NcitClean._

/** Transcribed from the reference jest tables (test/ncit.test.js:33-60
  * deprecation + parents cases; pickEndpoint routing).
  */
class NcitCleanSpec extends AnyFunSuite {

  private val base = RawRow(
    id = "C12345", synonyms = "syn1|syn2", parents = "",
    xmlTag = "<http://example.org/C12345>", name = "Some Concept",
    definition = "a def", semanticType = "Disease or Syndrome",
    conceptStatus = "", parentConcepts = "")

  test("deprecated truth table (jest :33-44)") {
    val cases = Seq(
      ("", "C99999|C61063", true), // obsolete in parents
      ("", "C85834|C99999", true), // retired in parents
      ("Obsolete_Concept", "", true),
      ("Retired_Concept", "", true),
      ("", "C99999", false),
      ("Valid_Concept", "", false),
      ("", "", false))
    cases.foreach { case (status, parents, expected) =>
      val row = cleanRawRow(base.copy(conceptStatus = status, parents = parents))
      assert(row.deprecated == expected, s"($status, $parents)")
    }
  }

  test("parents cleaning table (jest :47-58)") {
    val cases = Seq(
      ("", Seq.empty[String]),
      ("C00001", Seq("c00001")),
      ("C00001|C00002", Seq("c00001", "c00002")),
      ("C00001|C61063", Seq("c00001")), // obsolete dropped
      ("C00001|C85834", Seq("c00001")), // retired dropped
      ("||C00001", Seq("c00001"))) // extra separators
    cases.foreach { case (parents, expected) =>
      assert(cleanRawRow(base.copy(parents = parents)).parents == expected,
        s"($parents)")
    }
  }

  test("name list splitting promotes tail to synonyms") {
    val row = cleanRawRow(base.copy(name = "First Name|Second Name"))
    assert(row.name == "first name")
    assert(row.originalSynonyms == Seq("syn1", "syn2", "Second Name"))
    assert(row.synonyms == Seq("syn1", "syn2", "second name"))
  }

  test("species-bearing synonym replaces the name") {
    val row = cleanRawRow(base.copy(name = "Tp53", synonyms = "Mouse Tp53"))
    assert(row.name == "mouse tp53")
    assert(row.displayName == "Mouse Tp53 [c12345]")
    assert(row.species == "Mouse")
  }

  test("parent-derived species overwrites synonym-derived (ncit/index.js:151-163)") {
    val row = cleanRawRow(base.copy(
      name = "Tp53", synonyms = "Mouse Tp53", parents = "rat thing"))
    assert(row.name == "mouse tp53") // name swap still from the synonym pass
    assert(row.species == "rat")     // but the parent match wins the species
  }

  test("output normalization: lowercase, dedup, name removed from synonyms") {
    val row = cleanRawRow(base.copy(
      name = "Some Concept", synonyms = "Alpha|alpha|ALPHA|Some Concept"))
    assert(row.name == "some concept")
    // JS `new Set` dedups on ORIGINAL case, then lowercases — so distinct
    // original-case variants survive as duplicates after lowering
    assert(row.synonyms == Seq("alpha", "alpha", "alpha"))
    assert(row.originalSynonyms ==
      Seq("Alpha", "alpha", "ALPHA", "Some Concept"))
  }

  test("display name + url + empty-name fallback") {
    val row = cleanRawRow(base)
    assert(row.displayName == "Some Concept [c12345]")
    assert(row.url == "http://example.org/C12345")
    val anon = cleanRawRow(base.copy(name = "", synonyms = ""))
    assert(anon.name == "c12345" && anon.displayName == "c12345")
  }

  test("pickEndpoint: routing, ambiguity, parent fallback") {
    assert(pickEndpoint("Disease or Syndrome") == "Disease")
    assert(pickEndpoint("Body System") == "AnatomicalEntity")
    assert(pickEndpoint("Organic Chemical") == "Therapy")
    assertThrows[EndpointError](pickEndpoint("Tissue Neoplastic Process"))
    assert(pickEndpoint("Unknown Thing", "Clinical Drug") == "Therapy")
    assertThrows[EndpointError](pickEndpoint("Unknown Thing"))
  }
}
