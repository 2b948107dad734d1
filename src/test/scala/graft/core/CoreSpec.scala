package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ResolverSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def candidates = Seq(
    // (key, name, deprecated, alias, sourceIdVersion, description, sourceRank)
    ("kras", "KRAS", false, false, null.asInstanceOf[String], "gene", 1),
    ("kras", "KRAS-dep", true, false, null.asInstanceOf[String], "old", 1),
    ("tp53", "TP53-alias", false, true, null.asInstanceOf[String], null.asInstanceOf[String], 1),
    ("tp53", "TP53", false, false, null.asInstanceOf[String], "gene", 1),
    ("tie", "A", false, false, null.asInstanceOf[String], "x", 1),
    ("tie", "B", false, false, null.asInstanceOf[String], "y", 1)
  ).toDF("k", "name", "deprecated", "alias", "sourceIdVersion", "description", "sourceRank")

  test("resolveUnique picks non-deprecated, non-alias winner and flags ties") {
    val lookups = Seq("kras", "tp53", "tie", "nope").toDF("gene")
    val pref = Resolver.ontologyPreference(
      dependency = lit(null), sourceVersion = lit(null),
      sourceRank = col("sourceRank")) :+ col("name").asc
    val r = Resolver.resolveUnique(lookups, "gene", candidates, "k", pref)

    val resolved = r.resolved.select("gene", "name").as[(String, String)].collect().toMap
    assert(resolved == Map("kras" -> "KRAS", "tp53" -> "TP53",
      "tie" -> "A")) // tie broken by name tiebreak → not ambiguous
    assert(r.missing.as[String].collect().toSeq == Seq("nope"))
    assert(r.ambiguous.count() == 0)
  }

  test("resolveUnique flags genuine rank-1 ties as ambiguous") {
    val lookups = Seq("tie").toDF("gene")
    val pref = Resolver.ontologyPreference(
      dependency = lit(null), sourceVersion = lit(null),
      sourceRank = col("sourceRank")) // no tiebreak
    val r = Resolver.resolveUnique(lookups, "gene", candidates, "k", pref)
    assert(r.ambiguous.as[String].collect().toSeq == Seq("tie"))
    assert(r.resolved.count() == 0)
  }
}

class GraphStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def target = Seq(
    (1L, Option("a"), Seq("s1", "s2"), Option("keep")),
    (2L, Option("b"), Seq("x"), Option("old")),
    (3L, None: Option[String], Seq[String](), Option("gone"))
  ).toDF("id", "ver", "subsets", "payload")

  test("classify: create/update/noop/delete with set-compare and null-safe keys") {
    val updates = Seq(
      (1L, Option("a"), Seq("s2", "s1"), Option("keep")),  // set-equal → noop
      (2L, Option("b"), Seq("x"), Option("new")),           // changed → update
      (4L, None: Option[String], Seq("n"), Option("fresh")) // → create
    ).toDF("id", "ver", "subsets", "payload")

    val c = GraphStore.classify(target, updates,
      keyCols = Seq("id", "ver"), compareCols = Seq("payload"),
      setCols = Seq("subsets"), softDelete = true)

    val actions = c.select("id", GraphStore.ACTION).as[(Long, String)].collect().toMap
    assert(actions == Map(1L -> "noop", 2L -> "update", 3L -> "delete", 4L -> "create"))

    assert(GraphStore.counts(c) == Map("noop" -> 1L, "update" -> 1L, "delete" -> 1L, "create" -> 1L))

    // merge result drops deletes (hard) or tombstones (soft)
    assert(GraphStore.apply(c).count() == 3)
    val soft = GraphStore.apply(c, tombstoneCol = Some("deletedAt"))
    assert(soft.filter(col("deletedAt")).select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("classify is idempotent: re-merging the merge result is all-noop") {
    val updates = target
    val c = GraphStore.classify(target, updates,
      Seq("id", "ver"), Seq("payload"), Seq("subsets"))
    assert(GraphStore.counts(c) == Map("noop" -> 3L))
  }

  test("null-safe key: null ver joins null ver (K8 null-padded variant keys)") {
    val updates = Seq((3L, None: Option[String], Seq[String](), Option("gone")))
      .toDF("id", "ver", "subsets", "payload")
    val c = GraphStore.classify(target, updates, Seq("id", "ver"), Seq("payload"), Seq("subsets"))
    val byId = c.select("id", GraphStore.ACTION).as[(Long, String)].collect().toMap
    assert(byId(3L) == "noop")
  }

  test("newEdges anti-joins existing adjacency") {
    val existing = Seq(("a", "b", "AliasOf")).toDF("out", "in", "edgeClass")
    val cand = Seq(("a", "b", "AliasOf"), ("a", "c", "AliasOf"), ("a", "b", "SubClassOf"))
      .toDF("out", "in", "edgeClass")
    val fresh = GraphStore.newEdges(existing, cand)
      .select("out", "in", "edgeClass").as[(String, String, String)].collect().toSet
    assert(fresh == Set(("a", "c", "AliasOf"), ("a", "b", "SubClassOf")))
  }
}

class DiffMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("contentMatch: tiered matching then deterministic zip, residues bucketed") {
    val incoming = Seq(
      (101L, "sid1", "condA"), // tier-1 exact
      (102L, "sid2", "condB"), // tier-2 (sid changed on existing side)
      (103L, "sid9", "condZ")  // unmatched → create
    ).toDF("iid", "sid", "cond")
    val existing = Seq(
      (201L, "sid1", "condA"),
      (202L, "sidX", "condB"),
      (203L, "sidY", "condQ")  // unmatched → delete
    ).toDF("eid", "sid", "cond")

    val m = DiffMerge.contentMatch(incoming, "iid", existing, "eid",
      tiers = Seq(Seq("sid", "cond"), Seq("cond")))

    val rows = m.select("incoming_id", "existing_id", "bucket", "tier")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getString(2), Option(r.get(3)))).toSet
    assert(rows == Set(
      (Some(101L), Some(201L), "match", Some(1)),
      (Some(102L), Some(202L), "match", Some(2)),
      (Some(103L), None, "create", None),
      (None, Some(203L), "delete", None)))
  }
}

class SpecsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("validate splits pass/fail with violation names") {
    val df = Seq(("ok", 5), (null.asInstanceOf[String], 5), ("ok", -1))
      .toDF("name", "n")
    val v = Specs.validate(df, Seq(
      "name_required" -> col("name").isNotNull,
      "n_positive" -> (col("n") > 0)))
    assert(v.valid.count() == 1)
    val errs = v.errors.select("violations").as[Seq[String]].collect().toSet
    assert(errs == Set(Seq("name_required"), Seq("n_positive")))
  }

  test("nullifyNoneLike maps 'None' and blank to null") {
    val df = Seq("None", "  ", "real").toDF("v")
    val out = Specs.nullifyNoneLike(df, Seq("v")).as[Option[String]].collect().toSet
    assert(out == Set(None, Some("real")))
  }
}
