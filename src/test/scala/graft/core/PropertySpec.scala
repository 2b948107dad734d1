package graft.core

import graft.TestSpark
import graft.variant.{HgvsParser, ProfileDnf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants for the grammar and merge primitives —
  * seeded random sampling (deterministic across runs; the
  * scalatest↔scalacheck bridge isn't on the offline classpath).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val AAs = "GAVLIPFYWSTCMNQDEKRH"
  private def aa(): String = AAs(rnd.nextInt(AAs.length)).toString

  test("HgvsParser: protein substitutions round-trip their fields (100 samples)") {
    (1 to 100).foreach { _ =>
      val (ref, p, alt) = (aa(), rnd.nextInt(99999) + 1, aa())
      val v = HgvsParser.parse(s"p.$ref$p$alt")
      assert(v.vtype == "substitution")
      assert(v.break1Start.get.pos.contains(p.toLong))
      assert(v.break1Start.get.refAA.contains(ref))
      assert(v.untemplatedSeq.contains(alt))
      assert(v.break1Repr.contains(s"p.$ref$p"))
    }
  }

  test("HgvsParser: parseOpt is total on arbitrary printable strings (500 samples)") {
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(20)).map(_ => (rnd.nextInt(95) + 32).toChar).mkString
      HgvsParser.parseOpt(s) // must not throw anything
    }
    // huge positions overflow Long.parseLong — must degrade to None, not blow up
    assert(HgvsParser.parseOpt("p.G99999999999999999999999D").isEmpty)
  }

  test("ProfileDnf: AND of k singletons is one size-k set; OR is k singletons") {
    (1 to 6).foreach { k =>
      val ids = (1 to k).map(_.toLong)
      assert(ProfileDnf.parse(ProfileDnf.tokenize(ids.mkString(" AND "))) == Seq(ids))
      assert(ProfileDnf.parse(ProfileDnf.tokenize(ids.mkString(" OR "))) ==
        ids.map(Seq(_)))
    }
  }

  test("DiffMerge: every id lands in exactly one bucket (random sizes)") {
    Seq((0, 7, 2), (12, 0, 3), (25, 17, 4), (8, 8, 1), (40, 31, 5)).foreach {
      case (nIn, nEx, nKeys) =>
        val incoming = (1 to nIn).map(i => (i.toLong, (i % nKeys).toLong))
          .toDF("iid", "k")
        val existing = (1 to nEx).map(i => ((i + 1000).toLong, (i % nKeys).toLong))
          .toDF("eid", "k")
        val out = DiffMerge.contentMatch(incoming, "iid", existing, "eid",
          tiers = Seq(Seq("k")), artificialFinal = true).collect()
        val iids = out.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
        val eids = out.flatMap(r => Option(r.get(1)).map(_.asInstanceOf[Long]))
        assert(iids.sorted.toSeq == (1 to nIn).map(_.toLong),
          s"incoming ids mangled for ($nIn,$nEx,$nKeys)")
        assert(eids.sorted.toSeq == (1 to nEx).map(i => (i + 1000).toLong))
        // with an artificial final pass, creates and deletes can't coexist
        val buckets = out.map(_.getString(2)).toSet
        assert(!(buckets.contains("create") && buckets.contains("delete")))
    }
  }

  test("GraphStore: classify(apply(classify(x))) is all-noop (random frames)") {
    Seq((5, 0), (17, 3), (30, 5)).foreach { case (n, nullEvery) =>
      val target = (1 to n).map { i =>
        (i.toLong,
          if (nullEvery > 0 && i % nullEvery == 0) null else s"v$i",
          i * 1.5)
      }.toDF("id", "tag", "score")
      val updates = target.withColumn("score",
        when(col("id") % 3 === 0, col("score") + 1).otherwise(col("score")))
      val merged = GraphStore.apply(GraphStore.classify(
        target, updates, Seq("id"), Seq("tag", "score")))
      val re = GraphStore.classify(merged, updates, Seq("id"), Seq("tag", "score"))
      assert(GraphStore.counts(re) == Map("noop" -> n.toLong))
    }
  }
}
