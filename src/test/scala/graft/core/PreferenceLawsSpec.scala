package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's `orderPreferredOntologyTerms` laws
  * (test/graphkb.test.js:7-80) transcribed against the Resolver ladder:
  * each case builds a two-candidate frame and asserts the expected winner
  * under the full preference sort.
  */
case class PrefCand(
    name: String, deprecated: Boolean, alias: Boolean,
    dependency: Option[String], sourceIdVersion: Option[String],
    sourceVersion: Option[String], description: Option[String],
    sourceRank: Int)

class PreferenceLawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private type Cand = PrefCand

  private def winner(a: Cand, b: Cand): String = {
    val df = Seq(a, b).toDF()
    val pref = Resolver.ontologyPreference(sourceVersion = col("sourceVersion"))
    df.orderBy(pref: _*).select("name").as[String].head()
  }

  private def c(name: String, deprecated: Boolean = false, alias: Boolean = false,
      dependency: Option[String] = None, sidv: Option[String] = None,
      srcv: Option[String] = None, desc: Option[String] = Some("d"),
      rank: Int = 1) =
    PrefCand(name, deprecated, alias, dependency, sidv, srcv, desc, rank)

  test("prefer non-deprecated") {
    assert(winner(c("w"), c("l", deprecated = true)) == "w")
    assert(winner(c("l", deprecated = true), c("w")) == "w")
  }

  test("prefer non-alias and independent (no dependency)") {
    assert(winner(c("w"), c("l", alias = true)) == "w")
    assert(winner(c("w"), c("l", dependency = Some("x"))) == "w")
  }

  test("prefer generic to versioned terms") {
    assert(winner(c("w"), c("l", sidv = Some("2019-10-08"))) == "w")
  }

  test("reference behavior: OLDER sourceIdVersion wins (jest :41-48)") {
    assert(winner(c("w", sidv = Some("2019-10-08")),
      c("l", sidv = Some("2020-10-08"))) == "w")
  }

  test("reference behavior: OLDER source version wins (jest :50-60)") {
    assert(winner(c("w", sidv = Some("2019-10-08"), srcv = Some("1")),
      c("l", sidv = Some("2019-10-08"), srcv = Some("2"))) == "w")
  }

  test("prefer terms with descriptions") {
    assert(winner(c("w", sidv = Some("2019-10-08")),
      c("l", sidv = Some("2019-10-08"), desc = None)) == "w")
  }

  test("lower source rank wins (jest :73-80)") {
    assert(winner(c("w", rank = 1), c("l", rank = 2)) == "w")
  }

  test("cross-source: better rank beats older version (graphkb.js:152-196)") {
    // graphkb.js only compares sourceIdVersion within same-(sourceId, source)
    // pairs; across sources, source.sort decides FIRST. An older-versioned
    // term from a worse-ranked source must NOT beat a newer term from a
    // better-ranked source.
    assert(winner(
      c("w", sidv = Some("2021-01-01"), rank = 1),
      c("l", sidv = Some("2019-01-01"), rank = 2)) == "w")
    assert(winner(
      c("l", sidv = Some("2019-01-01"), rank = 2),
      c("w", sidv = Some("2021-01-01"), rank = 1)) == "w")
  }

  test("cross-source: rank tie falls to older source.version (jest :81-88)") {
    assert(winner(
      c("w", srcv = Some("1"), rank = 1),
      c("l", srcv = Some("2"), rank = 1)) == "w")
  }

  test("cross-source: rank+version tie falls to description (jest :89-96)") {
    assert(winner(
      c("w", rank = 1),
      c("l", rank = 1, desc = None)) == "w")
  }
}
