package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a cycle is the exact fixed point: every rank stays 10^9 ppb") {
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val pr = Graphs.pageRankPpb(nodes, "id", edges, "src", "dst", iters = 5)
    assert(pr.filter(col("rank_ppb") =!= 1000000000L).count() == 0)
  }

  test("one superstep of a star graph matches hand arithmetic") {
    // leaves 1,2,3 -> hub 0; hub -> 1. All out-degrees 1.
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("src", "dst")
    val pr = Graphs.pageRankPpb(nodes, "id", edges, "src", "dst", iters = 1)
      .orderBy("id").select("rank_ppb").as[Long].collect().toSeq
    // hub: 0.15e9 + (85*3e9) div 100; node 1: 0.15e9 + 0.85e9;
    // nodes 2,3: teleport only
    assert(pr == Seq(2700000000L, 1000000000L, 150000000L, 150000000L))
  }

  test("dangling mass decays, ordering still favours the sink's source") {
    // 0 -> 1, 1 has no out-edges (dangling): total mass shrinks
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L), (2L, 0L)).toDF("src", "dst")
    val pr = Graphs.pageRankPpb(nodes, "id", edges, "src", "dst", iters = 3)
    val total = pr.agg(sum("rank_ppb")).as[Long].head()
    assert(total < 3L * 1000000000L)
    val byId = pr.orderBy("id").select("rank_ppb").as[Long].collect()
    assert(byId(1) > byId(2)) // 1 receives 0's mass; 2 receives none
  }

  test("trustrank starves components unreachable from the seeds") {
    // two 2-cycles; seed only in the first
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val tr = Graphs.trustRankPpb(nodes, "id", edges, "src", "dst", seeds, 8)
      .orderBy("id").select("rank_ppb").as[Long].collect()
    // seeded component holds authority; unseeded decays toward 0
    assert(tr(0) > 500000000L && tr(1) > 300000000L)
    assert(tr(2) < 300000000L && tr(3) < 300000000L)
    assert(tr(2) == tr(3)) // symmetric unseeded pair stays symmetric
  }

  test("bfs distances match the hand-traced hop counts; unreached absent") {
    // 0 -> 1 -> 2 -> 3, and isolated 9 reachable by nothing
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val d = Graphs.bfsDistance(edges, "src", "dst", seeds, "id", maxDepth = 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(d == Seq((0L, 0L), (1L, 1L), (2L, 2L))) // 3 beyond depth cap
  }

  test("bfs takes the minimum over multiple paths") {
    val edges = Seq((0L, 2L), (0L, 1L), (1L, 2L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val d = Graphs.bfsDistance(edges, "src", "dst", seeds, "id", 3)
      .filter(col("id") === 2L).select("dist").as[Long].head()
    assert(d == 1L) // direct edge wins over the 2-hop path
  }

  test("trustrank: ghost seeds (absent from nodes) are ignored") {
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val clean = Graphs.trustRankPpb(nodes, "id", edges, "src", "dst",
      Seq(0L).toDF("id"), 3)
    val ghosted = Graphs.trustRankPpb(nodes, "id", edges, "src", "dst",
      Seq(0L, 99L, 98L).toDF("id"), 3) // 99/98 not in the graph
    assert(clean.exceptAll(ghosted).isEmpty && ghosted.exceptAll(clean).isEmpty)
  }

  test("trustrank: all-ghost seed set fails loudly, not as zero teleport") {
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    assertThrows[IllegalArgumentException] {
      Graphs.trustRankPpb(nodes, "id", edges, "src", "dst",
        Seq(99L).toDF("id"), 3)
    }
  }

  test("trustrank: duplicated seed rows don't shrink the teleport share") {
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val once = Graphs.trustRankPpb(nodes, "id", edges, "src", "dst",
      Seq(0L).toDF("id"), 3)
    val dup = Graphs.trustRankPpb(nodes, "id", edges, "src", "dst",
      Seq(0L, 0L, 0L).toDF("id"), 3)
    assert(once.exceptAll(dup).isEmpty && dup.exceptAll(once).isEmpty)
  }

  test("triangle counts: hand-traced K4 and a dangling path") {
    // K4 = 4 triangles, each node in exactly 3; path 10-11-12 adds none
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val edges = (k4 ++ Seq((10L, 11L), (11L, 12L))).toDF("src", "dst")
    val out = Graphs.triangleCounts(edges, "src", "dst")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
  }

  test("triangle counts ignore direction, duplicates, and self-loops") {
    val messy = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (0L, 0L),
      (1L, 2L)).toDF("src", "dst")
    val out = Graphs.triangleCounts(messy, "src", "dst")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L), (1L, 1L), (2L, 1L))) // one triangle
  }

  test("triangle counts survive a hub: star graph has zero triangles") {
    // hub 0 connected to 50 leaves — unoriented wedge count at the hub
    // is 50*49; orientation sends every edge leaf->hub (degree 1 < 50),
    // so the hub has NO out-edges and zero wedges form
    val star = (1L to 50L).map((0L, _)).toDF("src", "dst")
    assert(Graphs.triangleCounts(star, "src", "dst").count() == 0)
  }

  test("label propagation: disjoint cliques converge to their min label") {
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L).toDF("id")
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L)) ++ clique(Seq(10L, 11L, 12L)))
      .toDF("src", "dst")
    val out = Graphs.labelPropagation(nodes, "id", edges, "src", "dst", 4)
      .orderBy("id").select("community").as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 0L, 10L, 10L, 10L))
  }

  test("label propagation: isolated nodes keep their own label") {
    val nodes = Seq(0L, 1L, 99L).toDF("id")
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val out = Graphs.labelPropagation(nodes, "id", edges, "src", "dst", 3)
      .filter(col("id") === 99L).select("community").as[Long].head()
    assert(out == 99L)
  }

  test("label propagation tie-breaks to the SMALLEST label on negative ids") {
    // two neighbours with equal counts → smallest community wins; with
    // negative ids this is where a label-negation tie-trick would invert
    // (−5 < 3 must win, but −(−5)=5 > −3 picks the wrong one)
    val nodes = Seq(-5L, 3L, 0L).toDF("id")
    val edges = Seq((0L, -5L), (0L, 3L)).toDF("src", "dst")
    val out = Graphs.labelPropagation(nodes, "id", edges, "src", "dst", 1)
      .filter(col("id") === 0L).select("community").as[Long].head()
    assert(out == -5L)
  }

  test("label propagation is deterministic under repartitioning") {
    val nodes = (0L until 120L).toDF("id")
    val edges = nodes.select(col("id").as("src"),
      ((col("id") * 7 + 3) % 120).as("dst"))
    val a = Graphs.labelPropagation(nodes, "id", edges, "src", "dst", 3)
    val b = Graphs.labelPropagation(nodes.repartition(9), "id",
      edges.repartition(4), "src", "dst", 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("ranks are deterministic under repartitioning and duplicate edges") {
    val nodes = (0L until 200L).toDF("id")
    val edges = nodes.select(col("id").as("src"),
        ((col("id") * 7 + 3) % 200).as("dst"))
      .unionByName(nodes.select(col("id").as("src"),
        ((col("id") * 13 + 5) % 200).as("dst")))
    val a = Graphs.pageRankPpb(nodes, "id", edges, "src", "dst", 4)
    val b = Graphs.pageRankPpb(nodes.repartition(11), "id",
      edges.repartition(5), "src", "dst", 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
