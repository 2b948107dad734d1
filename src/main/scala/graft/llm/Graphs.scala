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
  * signal feeds.
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
      srcCol: String, dstCol: String, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
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
      val base = nodes.select(col(idCol))
      ranks = base
        .join(contribs, base(idCol) === contribs(dstCol), "left")
        .select(col(idCol),
          (lit(150000000L) +
            expr("(85 * coalesce(__sum, CAST(0 AS BIGINT))) div 100"))
            .as("rank_ppb"))
        .localCheckpoint()
    }
    ranks
  }
}
