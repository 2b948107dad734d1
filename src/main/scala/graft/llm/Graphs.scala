package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for web-corpus curation. PageRank (Page et al.
  * 1999) is the classic page-authority prior a crawl-quality mixer feeds
  * on ("weight domains by link authority, not just volume").
  *
  * This is FIXED-POINT INTEGER PageRank: ranks live in parts-per-billion
  * of the mean (initial rank = 10^9 per node), the damping step is
  * `0.15·10^9 + (85·Σcontrib) div 100`, and a source's per-edge
  * contribution is `rank div out_degree` — every operation is integer
  * multiply/divide, so a fixed iteration count yields bit-identical
  * ranks in any engine (float PageRank diverges in the last ulp per
  * engine and iteration order). Truncation loses < out_degree ppb per
  * node per step — bounded and deterministic, not drift. Dangling-node
  * mass (no out-edges) is dropped, the standard simplification; total
  * mass then decays slightly instead of being redistributed, which
  * changes absolute ppb values but not the authority ORDERING this
  * signal feeds. Consequence: `rank_ppb` is comparable only WITHIN one
  * graph — two graphs with different dangling fractions decay different
  * total mass, so absolute ppb values must never be compared (or
  * thresholded) across graphs or across snapshots whose dangling
  * fraction moved; rank BY the values per graph instead.
  *
  * Scale: one iteration = one shuffle keyed on the edge source (join
  * ranks→edges; the edges⋈out-degree enrichment is precomputed ONCE) +
  * one partial-aggregated sum keyed on the destination + a left join
  * back to the node set. Lineage truncates per iteration
  * (`localCheckpoint` — the in-query analogue of the per-superstep
  * materialization every production Pregel run does), so iteration k+1
  * starts from a materialized frame, not a k-deep plan.
  */
object Graphs {

  /** PageRank over `nodes`/`edges`; returns (id, rank_ppb) with
    * rank_ppb a BIGINT in ppb of the uniform rank. Duplicate edges are
    * counted with multiplicity (each contributes separately and each
    * raises the out-degree); self-loops are legal and simply feed the
    * node itself.
    */
  def pageRankPpb(nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, iters: Int): DataFrame =
    iterateRanks(
      nodes.select(col(idCol), lit(150000000L).as("__tele")),
      idCol, edges, srcCol, dstCol, iters)

  /** Personalized PageRank (the TrustRank shape, Gyöngyi et al. 2004):
    * teleport mass returns ONLY to the `seeds` — authority flows outward
    * from a trusted whitelist, so link-spam clusters with no seed
    * in-path starve. Seed teleport is scaled `0.15·10^9·N div S` so
    * total teleport mass matches uniform PageRank's (N nodes, S seeds);
    * everything stays exact BIGINT arithmetic.
    */
  def trustRankPpb(nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, seeds: DataFrame,
      iters: Int): DataFrame = {
    // S counts DISTINCT seeds PRESENT IN `nodes` — a duplicated seed row
    // must not shrink every seed's teleport share, and a ghost seed (id
    // absent from the graph) must not siphon teleport mass into nothing
    val seedIds = seeds.select(col(idCol)).distinct()
      .join(nodes.select(col(idCol)), Seq(idCol), "left_semi")
      .localCheckpoint()
    require(!seedIds.isEmpty,
      "trustRankPpb: seed set is empty after intersecting with nodes")
    val counts = nodes.agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(seedIds.agg(count(lit(1)).as("__s"))))
    val seeded = nodes
      .join(seedIds.withColumn("__isSeed", lit(true)), Seq(idCol), "left")
      .crossJoin(broadcast(counts))
      .select(col(idCol),
        when(col("__isSeed"),
          expr("(150000000 * __n) div __s")).otherwise(lit(0L))
          .cast("long").as("__tele"))
    iterateRanks(seeded, idCol, edges, srcCol, dstCol, iters)
  }

  /** Shared superstep loop: `nodesTele` is (id, __tele) — each node's
    * per-iteration teleport income in ppb.
    */
  private def iterateRanks(nodesTele: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val nodes = nodesTele.localCheckpoint()
    val deg = edges.groupBy(col(srcCol)).agg(count(lit(1)).as("__deg"))
    // enrich once: every iteration reuses (src, dst, deg) materialized
    val edgesDeg = edges.select(col(srcCol), col(dstCol))
      .join(deg, Seq(srcCol))
      .localCheckpoint()
    var ranks = nodes.select(col(idCol), lit(1000000000L).as("rank_ppb"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = edgesDeg
        .join(ranks, edgesDeg(srcCol) === ranks(idCol))
        .select(col(dstCol),
          expr("rank_ppb div __deg").as("__c"))
        .groupBy(col(dstCol))
        .agg(sum(col("__c")).as("__sum"))
      ranks = nodes
        .join(contribs, nodes(idCol) === contribs(dstCol), "left")
        .select(col(idCol),
          (col("__tele") +
            expr("(85 * coalesce(__sum, CAST(0 AS BIGINT))) div 100"))
            .as("rank_ppb"))
        .localCheckpoint()
    }
    ranks
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for community
    * detection — the cheap "which pages cluster together" signal
    * (mirror farms, template families) next to the dedup components.
    * Each superstep every node adopts the most frequent label among its
    * UNDIRECTED neighbours, ties broken by the SMALLEST label — the
    * deterministic synchronous variant (classic LPA tie-breaks
    * randomly; random is exactly what an oracle-checked engine cannot
    * do). Isolated nodes keep their own label. A fixed iteration count
    * rather than convergence detection: sync LPA can oscillate on
    * bipartite structures, so bounded supersteps are the production
    * form anyway.
    *
    * Scale: one superstep = the symmetrized-edge join against current
    * labels, a (node, label) partial-agg count, and a per-node top-1
    * picked by a `min(struct(...))` partial aggregate — a hub node's
    * neighbour-label census folds map-side across every task holding a
    * slice of it, instead of window-sorting the hot node's rows in one
    * task; lineage truncates per superstep like the other iterative
    * operators.
    */
  def labelPropagation(nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iters >= 1, "iters must be >= 1")
    val sym = edges.select(col(srcCol).as("__u"), col(dstCol).as("__v"))
      .unionByName(edges.select(col(dstCol).as("__u"), col(srcCol).as("__v")))
      .localCheckpoint()
    var labels = nodes.select(col(idCol), col(idCol).cast("long").as("community"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val counts = sym
        .join(labels, sym("__v") === labels(idCol))
        .groupBy(col("__u"), col("community"))
        .agg(count(lit(1)).as("__cnt"))
      // top-1 by (count DESC, community ASC) as a partial-aggregate
      // min(struct(-cnt, community)) — the ivfAssign idiom. Negating the
      // COUNT (>= 1 by construction, so -cnt never wraps) instead of the
      // label keeps the tie-break correct for ARBITRARY caller ids,
      // negative included — max(struct(cnt, -community)) would invert
      // ties on a negative-id corpus and wrap on Long.MinValue.
      val picked = counts
        .groupBy(col("__u"))
        .agg(min(struct((-col("__cnt")).as("__negc"), col("community")))
          .as("best"))
        .select(col("__u"), col("best.community").as("__new"))
      val base = labels
      labels = base
        .join(picked, base(idCol) === picked("__u"), "left")
        .select(col(idCol),
          coalesce(col("__new"), col("community")).as("community"))
        .localCheckpoint()
    }
    labels
  }

  /** Multi-source BFS: link distance from the nearest seed, capped at
    * `maxDepth` hops — the TrustRank-adjacent "how far from the trusted
    * frontier is this page" curation signal. Returns only REACHED nodes
    * (id, dist); each superstep is one join + one min partial-agg, with
    * per-iteration lineage truncation. Deterministic: min over equal
    * paths is order-free.
    */
  def bfsDistance(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, idCol: String, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val edgesOnly = edges.select(col(srcCol), col(dstCol)).localCheckpoint()
    var dist = seeds.select(col(idCol)).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    for (_ <- 1 to maxDepth) {
      val next = edgesOnly
        .join(dist, edgesOnly(srcCol) === dist(idCol))
        .select(col(dstCol).as(idCol), (col("dist") + 1L).as("dist"))
      dist = dist.unionByName(next)
        .groupBy(col(idCol)).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /** Exact triangle counting with DEGREE ORIENTATION (the standard
    * scale formulation): undirect + dedup the edge list, then orient
    * every edge from its lower-(degree, id) endpoint to the higher —
    * each node's out-fanout is then bounded by O(√m) on any graph
    * (arboricity bound), so the wedge join cannot blow up on hubs the
    * way a naive src-join does (a 10⁶-degree hub contributes 10¹²
    * wedges unoriented, but only its ~√m out-edges oriented). Wedges
    * (a→b, b→c) close iff a→c is also an oriented edge; each triangle
    * appears EXACTLY once. Returns per-node participation counts
    * (every triangle credits all 3 corners).
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v")) // AFTER the union: both directions
      .distinct()
    val deg = und.groupBy(col("u").as("n")).agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u"), col("v"))
      .localCheckpoint() // consumed by both wedge sides and the closer
    val wedges = oriented.select(col("u").as("a"), col("v").as("b"))
      .join(oriented.select(col("u").as("b"), col("v").as("c")), Seq("b"))
    val tris = wedges
      .join(oriented.select(col("u").as("a"), col("v").as("c")),
        Seq("a", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
