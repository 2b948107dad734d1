package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random equivalence of the NCIt collision-resolution window +
  * vertex/edge derivation (resolvedFrom → vertices/edges) against a
  * straight-line simulation: duplicate-name groups renamed to their first
  * original-case synonym, species-bearing duplicates REJECTED (the branch
  * the sf-scaled bench palette never reaches), displayName kept from the
  * pre-rename name, alias self-exclusion against the POST-rename name,
  * SubClassOf only between live non-rejected primaries.
  */
object NcitResolvePropertySpec {
  // top-level so Spark can build an Encoder (an inner case class has no
  // accessible outer scope for the encoder's newInstance)
  case class S(sourceId: String, name: String, displayName: String,
      description: String, deprecated: Boolean, parents: Seq[String],
      synonyms: Seq[String], originalSynonyms: Seq[String], species: String,
      endpoint: String, url: String, error: String)
}

class NcitResolvePropertySpec extends AnyFunSuite {
  import NcitResolvePropertySpec.S
  lazy val spark = TestSpark.spark

  private def simulate(rows: Seq[S]) = {
    val live = rows.filter(r => r.error == null && !r.deprecated)
    val dups = live.groupBy(_.name).view.mapValues(_.size).toMap
    val resolved = live.map { r =>
      val d = dups(r.name)
      val newName =
        if (d > 1) r.originalSynonyms.headOption.getOrElse(r.name) else r.name
      (r, newName, d > 1 && r.species.nonEmpty)
    }
    val kept = resolved.filterNot(_._3)
    val verts = kept.flatMap { case (r, nm, _) =>
      (r.sourceId, nm, r.displayName, r.endpoint, false) +:
        r.synonyms.filter(_.toLowerCase != nm.toLowerCase)
          .map(s => (r.sourceId, s, s"$s [${r.sourceId}]", r.endpoint, true))
    }.toSet
    val prim = kept.map { case (r, nm, _) => r.sourceId -> nm }.toMap
    val edges = kept.flatMap { case (r, nm, _) =>
      r.synonyms.filter(_.toLowerCase != nm.toLowerCase)
        .map(s => (s"${r.sourceId}|$s", s"${r.sourceId}|$nm", "aliasof")) ++
        r.parents.flatMap(p => prim.get(p)
          .map(pn => (s"${r.sourceId}|$nm", s"$p|$pn", "SubClassOf")))
    }.toSet
    (verts, edges)
  }

  test("resolvedFrom+vertices+edges ≡ simulation on 3 seeded-random concept sets") {
    import spark.implicits._
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(31337 + trial)
      val rows = (0 until 150).map { i =>
        val name = s"name ${rnd.nextInt(60)}" // engineered collisions
        val syns = (0 until rnd.nextInt(3)).map(j => s"syn $i $j")
        val osyns = syns.map(s => s.capitalize)
        S(s"c$i", name, s"Name $i [c$i]", "d",
          deprecated = rnd.nextInt(10) == 0,
          parents = if (i > 0) Seq(s"c${rnd.nextInt(i)}") else Nil,
          synonyms = syns, originalSynonyms = osyns,
          species = if (rnd.nextInt(8) == 0) "mouse" else "",
          endpoint = "Disease", url = s"http://n/c$i",
          error = if (rnd.nextInt(20) == 0) "bad endpoint" else null)
      }
      val r = NcitLoad.resolvedFrom(spark.createDataset(rows).toDF())
      val gotV = NcitLoad.vertices(r)
        .select("sourceId", "name", "displayName", "endpoint", "alias")
        .as[(String, String, String, String, Boolean)].collect().toSet
      val gotE = NcitLoad.edges(r).select("out", "in", "edgeClass")
        .as[(String, String, String)].collect().toSet
      val (wantV, wantE) = simulate(rows)
      // non-triviality: renames, rejections, aliases and both edge kinds
      assert(wantV.exists(_._5) && wantE.exists(_._3 == "SubClassOf") &&
        wantE.exists(_._3 == "aliasof") &&
        rows.exists(r => r.species.nonEmpty),
        s"trial $trial degenerate corpus")
      assert(gotV == wantV, s"trial $trial vertices: " +
        s"only-engine=${gotV -- wantV}, only-sim=${wantV -- gotV}")
      assert(gotE == wantE, s"trial $trial edges: " +
        s"only-engine=${gotE -- wantE}, only-sim=${wantE -- gotE}")
    }
  }
}
