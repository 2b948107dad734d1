package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-cluster formation: the step AFTER near-dup pair generation in a
  * training-data pipeline. Near-dup relations are not transitive (A~B and
  * B~C does not imply A~C above threshold), so pair lists must be closed
  * into connected components before a keep/drop decision — otherwise
  * chained duplicates survive pairwise dedup.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each round every vertex takes the min of its own label, its neighbors'
  * labels (one hop), and its current label's label (pointer jump). The
  * neighbor step alone needs O(diameter) rounds; the pointer jump halves
  * label-chain depth each round, giving O(log d) convergence — the same
  * asymptotics as the large-star/small-star MapReduce formulation but with
  * a stable per-round plan (two shuffle joins on the vertex id, which AQE
  * can coalesce) instead of an edge-list rewrite.
  *
  * Scale notes for the 100 TB shape:
  * - The edge list for near-dup clustering is SPARSE (pairs above a high
  *   threshold); rounds shuffle |V| labels + |E| edges on the id key.
  * - `localCheckpoint` after every round truncates the lineage — without
  *   it the plan doubles per iteration and the optimizer re-walks the
  *   whole history each round. A cluster deployment would use reliable
  *   `checkpoint` to survive executor loss; local mode has no HDFS.
  * - Convergence is detected by counting changed labels per round: the
  *   previous label rides the round's result frame, so the count is one
  *   filter+count on the already-checkpointed output — no extra join, and
  *   (unlike a numeric label-sum) it works for ANY id type, string doc
  *   ids included.
  * - Labels are vertex-id minima — fully deterministic, so the output is
  *   hash-comparable against a transitive-closure oracle.
  */
object Clusters {

  /** Connected components over an undirected pair list. `vertices` must
    * contain every id exactly once (rows with no pair become singleton
    * components). Returns (id, comp) where comp = min id in the component.
    *
    * Throws if `maxIter` rounds elapse before the labels stabilize: a
    * silently-unconverged result is a WRONG answer for a correctness-gated
    * engine, and with pointer jumping `maxIter` rounds cover component
    * diameter ~2^maxIter, so a legitimate hit means the caller's graph is
    * pathological, not that the default is too small.
    */
  def connectedComponents(
      vertices: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    // both directions, so one groupBy(u) sees the full neighborhood
    val sym = edges
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()

    var labels = vertices.select(col(idCol).as("id"))
      .withColumn("comp", col("id"))
      .localCheckpoint()

    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // one-hop neighbor minimum
      val nbrMin = sym
        .join(labels.select(col("id").as("v"), col("comp").as("vcomp")), Seq("v"))
        .groupBy(col("u").as("id")).agg(min("vcomp").as("nmin"))
      // previous label rides along so convergence is a change-count on the
      // checkpointed result — id-type-agnostic (no numeric cast)
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
      // pointer jump: comp := min(comp, label(comp))
      val ptr = stepped.select(col("id").as("pid"), col("comp").as("pcomp"))
      // NOTE (r19 negative result, kept for the record): folding the
      // convergence check into the checkpoint action via observe() —
      // one driver action per superstep instead of checkpoint + the
      // isEmpty scan below — was built and A/B'd (interleaved, 2 rounds
      // × 3 dedup rows at sf0.1) and LOST: llm_rolling_dedup cold
      // 16.4 → 21.8 s min, warm 5.0 → 6.0 s, same direction on
      // llm_dedup_clusters / llm_incremental_dedup. Observation.get
      // waits on the ASYNC listener bus once per superstep, and under
      // load that wait costs more than the synchronous isEmpty job it
      // replaced (which scans already-checkpointed blocks). The
      // two-action loop stays.
      val jumped = stepped
        .join(ptr, stepped("comp") === ptr("pid"), "left")
        .select(stepped("id"), stepped("prev"),
          least(stepped("comp"), coalesce(col("pcomp"), stepped("comp"))).as("comp"))
        .localCheckpoint()

      converged = jumped.filter(col("comp") =!= col("prev")).isEmpty
      labels = jumped.drop("prev")
      it += 1
    }
    require(converged,
      s"connectedComponents did not converge within $maxIter rounds " +
        "(component diameter ~2^maxIter exceeded — raise maxIter)")
    labels
  }

  /** Incremental cluster maintenance for a rolling ingest: fold ONE new
    * batch into an existing assignment without re-clustering the corpus.
    * `oldComp` is the standing (id, comp) assignment (comp = min id in
    * component, as [[connectedComponents]] produces); the batch brings its
    * within-batch verified pairs and its verified (new, old) cross pairs
    * (from [[TextOps.incrementalNearPairs]]'s index probe).
    *
    * The closure runs on a SMALL graph only: vertices are the new ids plus
    * the labels of touched old clusters (each old endpoint is collapsed to
    * its cluster label — correct because everything in an old cluster is
    * already connected). New docs joining two previously separate old
    * clusters merge them transitively, exactly as a full recompute would;
    * untouched old clusters never enter a shuffle. Labels stay min-doc-id,
    * so the result is IDENTICAL to re-running connected components over
    * the unioned corpus (oracle-pinned) at O(batch + touched) cost.
    */
  def incrementalClusters(
      oldComp: DataFrame, // (id, comp)
      newIds: DataFrame, // (id)
      newNewPairs: DataFrame, aCol: String, bCol: String,
      newOldPairs: DataFrame // (id, oid)
  ): DataFrame = {
    // collapse old endpoints to their cluster label
    val bridge = newOldPairs
      .join(oldComp.select(col("id").as("oid"), col("comp").as("ocomp")), Seq("oid"))
      .select(col("id").as("u"), col("ocomp").as("v"))
    val edges = newNewPairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(bridge)
    val verts = newIds.select(col("id"))
      .unionByName(bridge.select(col("v").as("id")))
      .distinct()
    val small = connectedComponents(verts, "id", edges, "u", "v")
    // new docs take their small-graph label; touched old clusters relabel
    // (possibly merging); untouched old clusters pass through
    val newAsg = newIds.select(col("id")).join(small, Seq("id"))
    val oldAsg = oldComp
      .join(small.select(col("id").as("comp"), col("comp").as("newc")),
        Seq("comp"), "left")
      .select(col("id"), coalesce(col("newc"), col("comp")).as("comp"))
    oldAsg.unionByName(newAsg.select(col("id"), col("comp")))
  }

  /** The dedup decision table: every document labeled with its cluster,
    * the cluster's size, and whether it is the canonical (kept) member —
    * min doc id wins, matching the exact-dedup canonical rule.
    */
  def dedupClusters(
      docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comp = connectedComponents(docs, idCol, pairs, aCol, bCol)
      .select(col("id").as(idCol), col("comp").as("cluster_id"))
    // cluster size via groupBy + join-back, NOT a window over cluster_id:
    // web dedup routinely produces one degenerate mega-cluster (boilerplate
    // / empty docs chain together), and a window would land that whole
    // cluster in one partition — a straggler task at scale. Partial
    // aggregation absorbs the skew; the join key is the same id the rows
    // already carry.
    val sizes = comp.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        (col(idCol) === col("cluster_id")).as("is_canonical"))
  }

  /** Leakage-safe train/test split: assign each near-dup CLUSTER (not
    * each document) to a split by hashing its canonical id — documents in
    * the same cluster always land together, so no near-duplicate pair can
    * straddle train/test (the eval-contamination mode a per-document
    * hash split silently permits: the model "memorizes" a training doc
    * and is scored on its near-copy).
    *
    * Split rule: `h64(cluster_id) % 100 < trainPct` — the repo's standard
    * md5-prefix hash, deterministic and engine-reproducible. Singleton
    * docs hash on themselves (their cluster_id is their own id). Scale:
    * one connected-components pass (pointer-jumping, lineage-truncated)
    * plus a map-side hash — nothing beyond dedupClusters' own cost.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      trainPct: Int = 80): DataFrame = {
    require(trainPct > 0 && trainPct < 100, s"trainPct in (0,100): $trainPct")
    dedupClusters(docs, idCol, pairs, aCol, bCol)
      .withColumn("split",
        when(TextOps.h64c(col("cluster_id").cast("string")) % 100 < trainPct,
          "train").otherwise("test"))
  }

  /** Quality-aware canonical pick: when a near-dup cluster collapses,
    * keep its HIGHEST-scoring member (tie → lowest id), not the min-id
    * one — the representative selection real curation runs (two crawls
    * of a page near-dup together; the better-extracted copy should
    * survive). Returns one row per multi-member cluster with the elected
    * representative and the drop count.
    *
    * Scale: `docs` must carry (id, score); the election is a partial
    * aggregate `max(struct(score, −id))` per cluster — the same
    * skew-absorbing shape as dedupClusters' size count (a degenerate
    * boilerplate mega-cluster partial-aggregates instead of landing in
    * one window task).
    */
  def bestOfCluster(docs: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comp = dedupClusters(docs.select(col(idCol)), idCol, pairs, aCol, bCol)
    comp.join(docs.select(col(idCol), col(scoreCol)), Seq(idCol))
      .groupBy(col("cluster_id"), col("cluster_size"))
      .agg(max(struct(col(scoreCol), negate(col(idCol)).as("negid"))).as("m"))
      .filter(col("cluster_size") >= 2)
      .select(col("cluster_id"), col("cluster_size"),
        negate(col("m.negid")).as("rep_id"),
        col("m").getField(scoreCol).as("rep_score"),
        (col("cluster_size") - 1).as("n_dropped"))
  }
}
