package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ClustersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain, triangle, and singleton components resolve to min ids") {
    // chain 1-2-3-4 (diameter 3, exercises pointer jumping),
    // triangle 10-11-12, singleton 99
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(verts, "id", pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("long path converges within the iteration cap (pointer jumping)") {
    val n = 64L // plain one-hop propagation would need 63 rounds
    val verts = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(verts, "id", pairs, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(got.length == n)
    assert(got.forall(_._2 == 1L))
  }

  test("random graph matches a brute-force union-find") {
    val rnd = new scala.util.Random(20260812)
    val n = 200
    val edges = (1 to 150).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    // reference union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    // min-relabel: union-find roots are not guaranteed min under this
    // naive linking, so normalize both sides by component min
    val byRoot = expect.groupBy(_._2).flatMap { case (_, m) =>
      val mn = m.keys.min; m.keys.map(_ -> mn)
    }
    val verts = (0L until n.toLong).toDF("id")
    val got = Clusters.connectedComponents(
      verts, "id", edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == byRoot)
  }

  test("empty vertex set returns empty, not NPE") {
    val verts = Seq.empty[Long].toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Clusters.connectedComponents(verts, "id", pairs, "id_a", "id_b").count() == 0L)
  }

  test("string ids cluster correctly (convergence is not numeric)") {
    // the old label-sum convergence cast labels to decimal — for string
    // ids the cast was null and everything silently stayed a singleton
    val verts = Seq("doc-a", "doc-b", "doc-c", "doc-z").toDF("id")
    val pairs = Seq(("doc-a", "doc-b"), ("doc-b", "doc-c")).toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(verts, "id", pairs, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    assert(got == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a",
      "doc-c" -> "doc-a", "doc-z" -> "doc-z"))
  }

  test("non-convergence within maxIter throws instead of returning wrong labels") {
    // a 9-node path has diameter 8; one round of neighbor-min + pointer
    // jump cannot close it, so maxIter = 1 must fail LOUDLY
    val verts = (1L to 9L).toDF("id")
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Clusters.connectedComponents(verts, "id", pairs, "id_a", "id_b", maxIter = 1).count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("incrementalClusters equals full recompute, including old-cluster merges") {
    // standing corpus: clusters {1,2}, {5,6}, singleton {9}
    val oldVerts = Seq(1L, 2L, 5L, 6L, 9L).toDF("id")
    val oldPairs = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val oldComp = Clusters.connectedComponents(oldVerts, "id", oldPairs, "id_a", "id_b")
    // new batch: 10 bridges BOTH old clusters (merge); 11-12 pair up;
    // 13 attaches to the singleton 9; 14 is isolated
    val newIds = Seq(10L, 11L, 12L, 13L, 14L).toDF("id")
    val newNew = Seq((11L, 12L)).toDF("id_a", "id_b")
    val newOld = Seq((10L, 2L), (10L, 6L), (13L, 9L)).toDF("id", "oid")
    val got = Clusters.incrementalClusters(oldComp, newIds, newNew, "id_a", "id_b", newOld)
      .as[(Long, Long)].collect().toMap
    // full recompute over the union for comparison
    val allVerts = Seq(1L, 2L, 5L, 6L, 9L, 10L, 11L, 12L, 13L, 14L).toDF("id")
    val allPairs = Seq((1L, 2L), (5L, 6L), (11L, 12L), (10L, 2L), (10L, 6L), (13L, 9L))
      .toDF("id_a", "id_b")
    val full = Clusters.connectedComponents(allVerts, "id", allPairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == full)
    // and the merge really happened: 1,2,5,6,10 share one cluster labeled 1
    assert(Seq(1L, 2L, 5L, 6L, 10L).forall(got(_) == 1L))
    assert(got(13L) == 9L && got(14L) == 14L && got(11L) == 11L)
  }

  test("incrementalClusters property: random graphs equal full recompute") {
    val rnd = new scala.util.Random(20260813)
    (1 to 5).foreach { trial =>
      val nOld = 30; val nNew = 10
      val oldIds = (0L until nOld.toLong)
      val newIds = (100L until (100L + nNew))
      def somePairs(ids: IndexedSeq[Long], n: Int) =
        (1 to n).map(_ => (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
          .filter { case (a, b) => a != b }
          .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val oldPairs = somePairs(oldIds.toIndexedSeq, 20)
      val newNew = somePairs(newIds.toIndexedSeq, 6)
      val newOld = (1 to 8).map(_ =>
        (newIds(rnd.nextInt(nNew)), oldIds(rnd.nextInt(nOld)))).distinct
      val oldComp = Clusters.connectedComponents(
        oldIds.toDF("id"), "id", oldPairs.toDF("id_a", "id_b"), "id_a", "id_b")
      val got = Clusters.incrementalClusters(oldComp, newIds.toDF("id"),
        newNew.toDF("id_a", "id_b"), "id_a", "id_b", newOld.toDF("id", "oid"))
        .as[(Long, Long)].collect().toMap
      val full = Clusters.connectedComponents(
        (oldIds ++ newIds).toDF("id"), "id",
        (oldPairs ++ newNew ++ newOld).toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(got == full, s"trial $trial diverged from full recompute")
    }
  }

  test("dedupClusters emits size and canonical flags") {
    val verts = Seq(1L, 2L, 3L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Clusters.dedupClusters(verts, "doc_id", pairs, "id_a", "id_b")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, 3L, true), (2L, 1L, 3L, false),
      (3L, 1L, 3L, false), (7L, 7L, 1L, true)))
  }

  test("mega-cluster sizes come from groupBy join-back (skew-safe), correctly") {
    // one degenerate cluster holding ~all docs — the boilerplate/empty-doc
    // shape web dedup hits; sizes must be exact and the plan must not pin
    // the cluster into a single window partition (partial aggs absorb it)
    val n = 500L
    val verts = (1L to n).toDF("doc_id")
    val pairs = (1L until n - 5).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Clusters.dedupClusters(verts, "doc_id", pairs, "id_a", "id_b")
    import org.apache.spark.sql.functions.col
    assert(got.filter(col("cluster_id") === 1L).count() == n - 5)
    assert(got.filter(col("cluster_id") === 1L)
      .filter(col("cluster_size") === (n - 5)).count() == n - 5)
    assert(got.filter(col("is_canonical")).count() == 6L) // 1 mega + 5 singletons
    // plan shape: no Window operator anywhere in dedupClusters' tree
    assert(!got.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("leakage-safe split: clusters move whole (no near-dup pair ever " +
    "straddles the split), and the split rule replays") {
    val rnd = new scala.util.Random(23)
    val verts = (1L to 200L).toDF("doc_id")
    // random sparse pairs → a mix of chains, cliques, singletons
    val rawPairs = (0 until 120).map { _ =>
      val a = 1L + rnd.nextInt(200); val b = 1L + rnd.nextInt(200)
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val pairs = rawPairs.toDF("id_a", "id_b")
    val asg = Clusters.leakageSafeSplit(verts, "doc_id", pairs,
      "id_a", "id_b", trainPct = 80)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    val byDoc = asg.map(r => r._1 -> r._3).toMap
    // cohesion: every pair's endpoints share a split
    rawPairs.foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) straddles the split")
    }
    // split rule replay: md5-prefix hash of the cluster root, %100 < 80
    def h64(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
          .map("%02x".format(_)).mkString.take(15), 16)
    asg.foreach { case (_, root, split) =>
      val want = if (h64(root.toString) % 100 < 80) "train" else "test"
      assert(split == want, s"root $root")
    }
    // both splits non-empty on 200 docs (sanity that the rule cuts)
    assert(asg.map(_._3).distinct.sorted.toSeq == Seq("test", "train"))
  }

  test("best-of-cluster: elects max score then min id per multi-member " +
    "cluster; singletons never appear") {
    val rnd = new scala.util.Random(41)
    val n = 120
    val docs = (1L to n.toLong).map(i => (i, rnd.nextInt(5).toLong * 100L))
    val docsDf = docs.toDF("doc_id", "score")
    val rawPairs = (0 until 80).map { _ =>
      val a = 1L + rnd.nextInt(n); val b = 1L + rnd.nextInt(n)
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val got = Clusters.bestOfCluster(docsDf, "doc_id", "score",
        rawPairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .select("cluster_id", "cluster_size", "rep_id", "rep_score", "n_dropped")
      .as[(Long, Long, Long, Long, Long)].collect()
    // straight-line replay: union-find over the pairs
    val parent = scala.collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    rawPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byCluster = (1L to n.toLong).groupBy(find)
    val want = byCluster.filter(_._2.size >= 2).map { case (root, members) =>
      val score = docs.toMap
      val rep = members.minBy(m => (-score(m), m))
      (root, members.size.toLong, rep, score(rep), members.size.toLong - 1)
    }.toSet
    assert(got.toSet == want)
    // ties exist by construction (5 score levels, 120 docs): at least one
    // multi-member cluster elected by the id tiebreak
    assert(got.nonEmpty)
  }
}
