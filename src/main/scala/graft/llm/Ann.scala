package graft.llm

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exactness baseline and
  * two scale paths — difference-hyperplane LSH bucketing and an
  * IVF-partitioned index (coarse quantizer cells + multi-probe re-rank).
  *
  * Determinism: vectors are first quantized to integers
  * (`floor(x * 100)`), so dot products and norms are exact 64-bit integer
  * arithmetic; the final cosine is one sqrt + one division on identical
  * integers — IEEE-correctly-rounded, hence bit-identical between Spark and
  * the DuckDB oracle. (A production deployment would keep floats; the
  * integer grid exists so the correctness gate is exact, and it changes
  * ranking only where two neighbors are closer than the grid resolution.)
  *
  * Scale: the brute path broadcasts the (small) query set against the
  * corpus — a map-side nested loop with a per-query top-k window, no
  * shuffle of the corpus. The LSH path buckets both sides on a
  * sign-pattern key and joins bucket-local — candidate count per bucket is
  * corpus/2^bits in expectation, and the join key is high-cardinality.
  */
object Ann {

  /** Quantized vector + its exact integer self-dot. */
  def withQuantized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("vq",
        // widen float→double BEFORE the multiply: a float-precision product
        // could floor() differently than the oracle's double product
        expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT))"))
      .withColumn("norm2", dot("vq", "vq"))

  /** Exact integer dot of two quantized vectors — the native codegen'd
    * [[graft.plans.QuantizedDot]] (same 64-bit integer math as the
    * composed `aggregate(zip_with(...))` form, without the per-pair
    * intermediate array or the CodegenFallback interpretation).
    */
  def dot(a: String, b: String): Column =
    graft.plans.QuantizedDot.qdot(col(a), col(b))

  /** Cosine from integer dot + norms (deterministic double). */
  def cosine(dotCol: Column, n2a: Column, n2b: Column): Column =
    dotCol.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /** The shared ranking tail of every cosine tier: top-k per query under
    * the (score DESC, nid ASC) law, canonical (groupCols…, rank, nid,
    * score) output. Ranking goes through the k-bounded
    * [[graft.plans.TopKScored]] aggregate, not a window: a window
    * row_number ships and SORTS every candidate pair of a query in one
    * task (measured 18.6 s vs 3.9 s on the 8M-pair Hamming lane — the
    * same shape), while the aggregate partial-folds each map slice to
    * ≤ k pairs and shuffles #tasks·k rows per query — the hot-query sort
    * stops existing at any scale. Same tie law (Double.compare ordering,
    * exactly Spark's sort order for doubles), row-identical output; the
    * AnnTopKAggSpec pins aggregate ≡ window on adversarial tie fixtures.
    */
  private def rankTopK(scored: DataFrame, k: Int, groupCols: Seq[String],
      scoreName: String): DataFrame =
    scored.groupBy(groupCols.map(col): _*)
      .agg(graft.plans.TopKScored.topkScored(col(scoreName), col("nid"), k)
        .as("top"))
      .select(groupCols.map(col) :+
        posexplode(col("top")).as(Seq("pos", "p")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("p.id").as("nid"), col("p.score").as(scoreName)): _*)

  /** [[rankTopK]] with the default per-query cosine shape. */
  private def rankByCos(scored: DataFrame, k: Int): DataFrame =
    rankTopK(scored, k, Seq("qid"), "cos")

  /** Brute-force cosine top-k: every query row against the corpus.
    * `queries` is expected to be small (it is broadcast).
    */
  def bruteTopK(
      queries: DataFrame, // (qid, vq, norm2)
      corpus: DataFrame, // (nid, vq, norm2)
      k: Int): DataFrame = {
    val q = queries.select(col("qid"), col("vq").as("qv"), col("norm2").as("qn"))
    val c = corpus.select(col("nid"), col("vq").as("nv"), col("norm2").as("nn"))
    val scored = c.join(broadcast(q), col("qid").isNotNull && col("nid") =!= col("qid"))
      .withColumn("dp", dot("qv", "nv"))
      .withColumn("cos", cosine(col("dp"), col("qn"), col("nn")))
    rankByCos(scored, k)
  }

  /** Difference-hyperplane LSH bucket key: bit m = [vq[i_m] >= vq[j_m]]
    * for fixed coordinate pairs — each is the hyperplane e_i - e_j, valid
    * for cosine LSH and free of stored projection matrices (the fixed
    * index pairs reproduce in any engine).
    */
  def withBucket(df: DataFrame, pairs: Seq[(Int, Int)]): DataFrame = {
    val bits = pairs.zipWithIndex.map { case ((i, j), m) =>
      s"CASE WHEN element_at(vq, $i) >= element_at(vq, $j) THEN ${1L << m} ELSE 0 END"
    }
    df.withColumn("bucket", expr(bits.mkString("CAST(", " + ", " AS BIGINT)")))
  }

  val DefaultPairs: Seq[(Int, Int)] =
    Seq((1, 33), (2, 34), (3, 35), (4, 36), (5, 37), (6, 38))

  /** LSH-bucketed top-k: candidates are corpus rows sharing the query's
    * bucket; scoring identical to the brute path.
    */
  def lshTopK(
      queries: DataFrame, // (qid, vq, norm2, bucket)
      corpus: DataFrame, // (nid, vq, norm2, bucket)
      k: Int): DataFrame = {
    val q = queries.select(col("qid"), col("vq").as("qv"),
      col("norm2").as("qn"), col("bucket"))
    val c = corpus.select(col("nid"), col("vq").as("nv"),
      col("norm2").as("nn"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("dp", dot("qv", "nv"))
      .withColumn("cos", cosine(col("dp"), col("qn"), col("nn")))
    rankTopK(scored, k, Seq("qid", "bucket"), "cos")
  }

  /** Multi-probe LSH top-k: each query probes its OWN bucket plus every
    * single-bit-flip neighbor (`bits`+1 buckets total) — the standard
    * recall repair for sign-pattern LSH, whose single-bucket form loses
    * any true neighbor differing in even one bit (the recall@k gate
    * exposed it on the fixture corpus). Probe buckets are distinct by
    * construction, so no candidate pair is scored twice; the corpus side
    * still never shuffles — the probe explode multiplies only the
    * (small, broadcast) query side by `bits`+1.
    */
  def lshMultiProbeTopK(
      queries: DataFrame, // (qid, vq, norm2, bucket)
      corpus: DataFrame, // (nid, vq, norm2, bucket)
      k: Int,
      bits: Int): DataFrame = {
    val q = queries.select(col("qid"), col("vq").as("qv"),
      col("norm2").as("qn"), col("bucket"))
      .withColumn("bucket", explode(expr(
        s"concat(array(bucket), transform(sequence(0, ${bits - 1}), " +
          "m -> CAST(bucket ^ shiftleft(CAST(1 AS BIGINT), m) AS BIGINT)))")))
    val c = corpus.select(col("nid"), col("vq").as("nv"),
      col("norm2").as("nn"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("dp", dot("qv", "nv"))
      .withColumn("cos", cosine(col("dp"), col("qn"), col("nn")))
    // the multi-probe explode can land the same (qid, nid) pair only once
    // (probe buckets are distinct and each corpus row holds one bucket),
    // so the flat top-k over all probed candidates is the window's answer
    rankByCos(scored, k)
  }

  /** IVF seed centroids: picked from the corpus by a deterministic id
    * rule. This is only the k-means INITIALIZATION — [[kmeansCentroids]]
    * refines it; using the seeds directly is the untrained fallback.
    */
  def ivfCentroids(corpus: DataFrame, step: Long): DataFrame =
    corpus.filter(col("nid") % step === 0)
      .select(col("nid").as("cid"), col("vq").as("cv"), col("norm2").as("cn"))

  /** Deterministic spherical k-means refinement of the seed quantizer:
    * fixed iteration count, seeded init from [[ivfCentroids]], and
    * INTEGER centroid components (floor of each cell's per-dimension
    * mean) — every step is exact integer arithmetic plus one
    * IEEE-correctly-rounded floor(double/long), so the DuckDB oracle
    * reproduces training bit-for-bit. Trained centroids track the actual
    * embedding distribution, so cell populations stay balanced under the
    * skew real corpora have (the id-rule seeds do not).
    *
    * Scale: each iteration is one assign (broadcast centroids, map-side
    * score + per-id top-1 window) and one update (posexplode → two-level
    * partial agg on (cell, pos) — dims × cells groups, no skew). The
    * centroid frame never exceeds nCells rows; empty cells drop out
    * naturally (both engines aggregate only assigned cells).
    */
  def kmeansCentroids(corpus: DataFrame, step: Long, iters: Int = 2): DataFrame = {
    var cent = ivfCentroids(corpus, step)
    for (_ <- 1 to iters) {
      val assign = ivfAssign(
        corpus.select(col("nid").as("id"), col("vq"), col("norm2")), cent, nProbe = 1)
      val asg = corpus.join(assign.select(col("id").as("nid"), col("cell")), Seq("nid"))
      // per-(cell, dimension) floor(mean): integer sum + count, one double
      // division, floor — exact while |sum| < 2^53 (quantized components
      // are ~|x|*100, far below)
      val comp = asg.select(col("cell"), posexplode(col("vq")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .withColumn("v", floor(col("s").cast("double") / col("n")).cast("long"))
      cent = comp.groupBy(col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, v))), x -> x.v)").as("cv"))
        .select(col("cell").as("cid"), col("cv"))
        .withColumn("cn", dot("cv", "cv"))
        // the centroid frame is nCells rows: checkpointing it truncates
        // the per-iteration lineage (otherwise iteration N's plan replays
        // iterations 1..N-1 — the whole training history — every action)
        .localCheckpoint()
    }
    cent
  }

  /** Score every vector against the (broadcast) centroid set and keep its
    * `nProbe` closest cells — nProbe=1 is the index-build assignment,
    * nProbe>1 is query-side probing.
    *
    * The nProbe=1 path (the CORPUS-side cost: every k-means iteration and
    * the index build run it) is an aggregation, not a window: scoring is
    * map-side (broadcast centroids), so each id's nCells scored rows are
    * co-located and `max(struct(ccos, -cid))` collapses them in the
    * partial aggregate — the shuffle ships ONE row per vector instead of
    * sorting |corpus|×nCells rows per partition. Tie-break matches the
    * window form exactly: highest cosine, then lowest cid (the negated
    * cid makes lexicographic max pick it). nProbe>1 keeps the window —
    * that side is queries, small by contract.
    */
  def ivfAssign(vecs: DataFrame, centroids: DataFrame, nProbe: Int): DataFrame = {
    val scored = vecs.crossJoin(broadcast(centroids))
      .withColumn("cdp", dot("vq", "cv"))
      .withColumn("ccos", cosine(col("cdp"), col("norm2"), col("cn")))
    if (nProbe == 1) {
      scored.groupBy(col("id"))
        .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("best"))
        .select(col("id"), (-col("best.ncid")).as("cell"))
    } else {
      val w = Window.partitionBy(col("id")).orderBy(col("ccos").desc, col("cid").asc)
      scored.withColumn("probe", row_number().over(w))
        .filter(col("probe") <= nProbe)
        .select(col("id"), col("cid").as("cell"))
    }
  }

  /** IVF top-k: corpus rows live in exactly one cell, queries probe their
    * `nProbe` closest cells, candidates re-rank with the same exact
    * integer cosine as the brute path. The candidate join ships only
    * probed cells — corpus/nCells × nProbe expected candidates per query —
    * and at scale the corpus side would be WRITTEN partitioned by `cell`,
    * making each probe a partition-pruned read instead of a join.
    */
  def ivfTopK(
      queries: DataFrame, // (qid, vq, norm2)
      corpus: DataFrame, // (nid, vq, norm2)
      centroids: DataFrame, // (cid, cv, cn)
      k: Int,
      nProbe: Int): DataFrame = {
    val cells = ivfAssign(corpus.select(col("nid").as("id"), col("vq"),
      col("norm2")), centroids, nProbe = 1)
      .select(col("id").as("nid"), col("cell"))
    ivfTopK(queries, corpus, centroids, cells, k, nProbe)
  }

  /** [[ivfTopK]] against a PREBUILT corpus cell assignment (`cells`:
    * (nid, cell), e.g. [[IvfPqIndex.cells]] loaded from parquet) — the
    * standing-index probe path: nothing corpus-wide is recomputed per
    * query batch; at scale `corpus ⋈ cells` is the cell-partitioned
    * table and each probe is a partition-pruned read.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame,
      cells: DataFrame,
      k: Int,
      nProbe: Int): DataFrame = {
    val c = corpus.join(cells, Seq("nid"))
      .select(col("nid"), col("vq").as("nv"), col("norm2").as("nn"), col("cell"))
    val probes = ivfAssign(queries.select(col("qid").as("id"), col("vq"),
      col("norm2")), centroids, nProbe)
      .select(col("id").as("qid"), col("cell"))
    val q = queries.join(probes, Seq("qid"))
      .select(col("qid"), col("vq").as("qv"), col("norm2").as("qn"), col("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("dp", dot("qv", "nv"))
      .withColumn("cos", cosine(col("dp"), col("qn"), col("nn")))
    // a corpus row lives in exactly one cell, so a (qid, nid) candidate
    // appears at most once even under multi-probe — flat top-k is exact
    rankByCos(scored, k)
  }

  /** IVF × SQ8 composition — the claim the SQ tier's docs make, as an
    * executable search path: coarse cells prune the corpus (queries probe
    * `nProbe` cells), and within probed cells candidates are ranked by
    * cosine against the exact 255-scaled SQ reconstruction instead of the
    * raw grid. The memory cut (8-bit codes) and the compute cut (cell
    * pruning) stack: per query the work is |probed cells|·d over codes,
    * and the corpus-side artifacts (bounds, codes, cells) are all
    * build-once. Tie law matches every other ranking row.
    */
  def ivfSqSearch(
      queries: DataFrame, // (qid, vq, norm2)
      corpus: DataFrame, // (nid, vq, norm2)
      centroids: DataFrame, // (cid, cv, cn)
      cells: DataFrame, // (nid, cell)
      k: Int,
      nProbe: Int): DataFrame =
    ivfSqSearch(queries, buildSqIndex(corpus), centroids, cells, k, nProbe)

  /** Composed probe against a prebuilt [[IvfSqIndex]] — the standing-index
    * lifecycle form of [[ivfSqSearch]].
    */
  def ivfSqSearch(queries: DataFrame, index: IvfSqIndex, k: Int,
      nProbe: Int): DataFrame =
    ivfSqSearch(queries, index.sq, index.coarse, index.cells, k, nProbe)

  /** IVF × SQ8 against a prebuilt [[SqIndex]] with an externally-supplied
    * coarse tier (the shared IVF index's centroids/cells) — no training,
    * no corpus re-encode inside the call.
    */
  def ivfSqSearch(
      queries: DataFrame,
      sq: SqIndex,
      centroids: DataFrame, // (cid, cv, cn)
      cells: DataFrame, // (nid, cell)
      k: Int,
      nProbe: Int): DataFrame = {
    val cand = sqIndexRecon(sq)
      .join(cells, Seq("nid"))
      .select(col("nid"), col("rv"), col("rn2"), col("cell"))
    val probes = ivfAssign(queries.select(col("qid").as("id"), col("vq"),
      col("norm2")), centroids, nProbe)
      .select(col("id").as("qid"), col("cell"))
    val q = queries.join(probes, Seq("qid"))
      .select(col("qid"), col("vq").as("qv"), col("norm2").as("qn"), col("cell"))
    val scored = cand.join(broadcast(q), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("dp", dot("qv", "rv"))
      .withColumn("cos", cosine(col("dp"), col("qn"), col("rn2")))
    rankByCos(scored, k)
  }

  /** Recall@k of an approximate ANN path against exact ground truth: the
    * fraction of true top-k (qid, nid) hits the approximate path found,
    * as one summary row (path, n_hits, n_truth, recall). Both inputs are
    * hit sets from [[bruteTopK]]/[[lshTopK]]/[[ivfTopK]] on the SAME
    * queries and k. Exact integer counting (a left-semi join on the hit
    * pair) → one division, so the measurement itself is deterministic and
    * oracle-checkable — the gate that keeps bucket/probe tuning from
    * silently trading recall away.
    */
  def recallAtK(path: String, truth: DataFrame, approx: DataFrame): DataFrame = {
    val t = truth.select(col("qid"), col("nid"))
    val hits = t.join(approx.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_semi")
      .agg(count(lit(1)).cast("long").as("n_hits"))
    val tot = t.agg(count(lit(1)).cast("long").as("n_truth"))
    hits.crossJoin(broadcast(tot)).select(lit(path).as("path"), col("n_hits"), col("n_truth"),
      // empty truth pins recall = 0.0 rather than NaN (0/0), keeping the
      // summary row comparable against any oracle's handling of the edge
      when(col("n_truth") === 0, lit(0.0))
        .otherwise(col("n_hits").cast("double") / col("n_truth")).as("recall"))
  }

  // ===== Scalar quantization (SQ8) =====

  /** Per-dimension SQ8 bounds trained over the corpus: ONE row holding the
    * d-length `mns`/`mxs` arrays (the per-coordinate min/max of the
    * fixed-point grid values). The train pass is a posexplode + a d-group
    * partial aggregation — its output is d rows collapsed to one, constant
    * in corpus size, so the bounds frame broadcasts for free at any scale.
    */
  def sqTrain(corpus: DataFrame): DataFrame =
    corpus.select(posexplode(col("vq")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .agg(
        expr("transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)")
          .as("mns"),
        expr("transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)")
          .as("mxs"))

  /** SQ8 encode against trained bounds: per coordinate,
    * `code_i = floor((v_i - mn_i) · 255 / (mx_i - mn_i)) ∈ [0, 255]`
    * (flat dimensions pin code 0), CLAMPED to [0, 255]. For in-sample
    * values the clamp is the identity (the numerator is non-negative and
    * the quotient ≤ 255, so truncating integer division IS floor in both
    * Spark and the oracle — every pre-existing oracle row is unchanged).
    * The clamp exists for the OUT-OF-SAMPLE update path (new vectors
    * encoded against frozen bounds, llm_sq_update): a value outside the
    * trained range must saturate, and clamping is also what makes the
    * negative-numerator case engine-safe — Spark `div` truncates toward
    * zero while DuckDB `//` floors, but both land ≤ 0 and clamp to 0.
    * This is the storage tier between raw vectors and PQ —
    * 8 bits per coordinate (4× under the 64-bit grid, 8× under doubles)
    * with per-coordinate (not per-subspace) fidelity; entirely map-side
    * after the broadcast of the one-row bounds frame.
    */
  def sqEncode(corpus: DataFrame, bounds: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(bounds))
      .withColumn("codes", expr(
        """transform(vq, (x, i) ->
          |  CASE WHEN element_at(mxs, i + 1) = element_at(mns, i + 1)
          |       THEN CAST(0 AS BIGINT)
          |       ELSE greatest(CAST(0 AS BIGINT), least(CAST(255 AS BIGINT),
          |            CAST((x - element_at(mns, i + 1)) * 255 AS BIGINT)
          |            div (element_at(mxs, i + 1) - element_at(mns, i + 1))))
          |  END)""".stripMargin))

  /** 255-scaled exact integer reconstruction of SQ8 codes:
    * `rv_i = 255·recon_i = mn_i·255 + code_i·(mx_i − mn_i)` — keeping the
    * ×255 factor makes the reconstruction an exact BIGINT, and the factor
    * cancels in cosine (it scales `dp` and `sqrt(rn2)` identically), so
    * ranking against `rv` is bit-identical to ranking against the real
    * dequantized values with zero floating-point in the distance kernel.
    */
  def sqRecon(encoded: DataFrame): DataFrame =
    encoded
      .withColumn("rv", expr(
        """transform(codes, (c, i) ->
          |  element_at(mns, i + 1) * 255
          |    + c * (element_at(mxs, i + 1) - element_at(mns, i + 1)))"""
          .stripMargin))
      .withColumn("rn2", dot("rv", "rv"))

  /** SQ8 asymmetric search: raw (grid) queries score the ENCODED corpus
    * through the exact 255-scaled reconstruction — the scalar-quantization
    * analogue of PQ's ADC, ranked by cosine-against-reconstruction with
    * the brute path's (cos DESC, nid ASC) tie law.
    *
    * Scale: train is a constant-size aggregate; encode+recon are
    * map-side; the scoring join broadcasts only the query batch — the
    * corpus never shuffles, per-row work is one d-length integer dot over
    * 8-bit codes. Composes with IVF cells exactly like PQ when cell
    * pruning is wanted on top of the memory cut.
    */
  def sqSearch(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    sqSearch(queries, buildSqIndex(corpus), k)

  /** Persistable SQ8 index: the one-row trained bounds plus the encoded
    * corpus codes, as plain parquet-roundtrippable DataFrames — the same
    * build-once/probe-many treatment [[PqIndex]] gives product
    * quantization. At 100 TB, bounds training + corpus encode is a
    * ONE-TIME build; every query batch then reads the 8-bit code table
    * instead of retraining bounds and re-encoding the corpus per call
    * (which is what the inline [[sqSearch]] overload does — kept for the
    * correctness gate, wrong shape for a standing index). Training and
    * encode are deterministic integer arithmetic, so the loaded index is
    * bit-identical to an inline rebuild (SqIndexSpec pins it).
    */
  case class SqIndex(
      bounds: DataFrame, // one row: (mns, mxs) — d-length trained bounds
      codes: DataFrame // (nid, codes) — 8-bit encoded corpus
  ) {
    def save(path: String): Unit = {
      bounds.write.mode("overwrite").parquet(s"$path/bounds")
      codes.write.mode("overwrite").parquet(s"$path/codes")
    }
  }

  object SqIndex {
    def load(spark: org.apache.spark.sql.SparkSession, path: String): SqIndex =
      SqIndex(
        bounds = spark.read.parquet(s"$path/bounds"),
        codes = spark.read.parquet(s"$path/codes"))
  }

  /** [[SqIndex]] plus the coarse tier (full-vector centroids + one-cell
    * corpus assignment) — everything the composed IVF × SQ8 probe needs,
    * mirroring [[IvfPqIndex]]. At scale `codes ⋈ cells` is written
    * partitioned by `cell`, so each probe is a partition-pruned read.
    */
  case class IvfSqIndex(
      coarse: DataFrame, // (cid, cv, cn) — full-vector coarse centroids
      cells: DataFrame, // (nid, cell) — corpus coarse assignment
      sq: SqIndex) {
    def save(path: String): Unit = {
      coarse.write.mode("overwrite").parquet(s"$path/coarse")
      cells.write.mode("overwrite").parquet(s"$path/cells")
      sq.save(path)
    }
  }

  object IvfSqIndex {
    def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfSqIndex =
      IvfSqIndex(
        coarse = spark.read.parquet(s"$path/coarse"),
        cells = spark.read.parquet(s"$path/cells"),
        sq = SqIndex.load(spark, path))
  }

  /** One-time SQ8 index build: train the per-dimension bounds, encode the
    * corpus. (The training/encode cost every inline search call was
    * paying, paid once.)
    */
  def buildSqIndex(corpus: DataFrame): SqIndex = {
    val bounds = sqTrain(corpus)
    SqIndex(bounds, sqEncode(corpus, bounds).select(col("nid"), col("codes")))
  }

  /** One-time IVF × SQ8 index build: coarse quantizer + cell assignment
    * on top of [[buildSqIndex]].
    */
  def buildIvfSqIndex(corpus: DataFrame, step: Long, iters: Int = 2): IvfSqIndex = {
    val coarse = kmeansCentroids(corpus, step, iters)
    val cells = ivfAssign(corpus.select(col("nid").as("id"), col("vq"),
        col("norm2")), coarse, nProbe = 1)
      .select(col("id").as("nid"), col("cell"))
    IvfSqIndex(coarse, cells, buildSqIndex(corpus))
  }

  /** Exact 255-scaled reconstructions off a standing (possibly
    * parquet-loaded) index: the 8-bit code table joined with the
    * broadcast one-row bounds, entirely map-side.
    */
  private def sqIndexRecon(index: SqIndex): DataFrame =
    sqRecon(index.codes.crossJoin(broadcast(index.bounds)))

  /** SQ8 search against a prebuilt [[SqIndex]]: the standing-index path —
    * no training, no corpus re-encode inside the call.
    */
  def sqSearch(queries: DataFrame, index: SqIndex, k: Int): DataFrame = {
    val enc = sqIndexRecon(index).select(col("nid"), col("rv"), col("rn2"))
    val q = queries.select(col("qid"), col("vq").as("qv"), col("norm2").as("qn"))
    val scored = enc.join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("dp", dot("qv", "rv"))
      .withColumn("cos", cosine(col("dp"), col("qn"), col("rn2")))
    rankByCos(scored, k)
  }

  // ===== Binary sign sketch (Hamming tier) =====

  /** 64-bit sign sketch of the d = 64 grid: bit j = 1 iff vq_j > 0,
    * packed as TWO 32-bit words `blo` (dims 0–31) / `bhi` (dims 32–63) —
    * the two-word split keeps every shift below bit 32 (an engine-checked
    * `1 << 63` overflows BIGINT in DuckDB; same convention as the aHash
    * words). This is the cheapest ANN storage tier: 8 bytes per vector
    * (64× under the long grid), with similarity = Hamming distance — the
    * classic sign-random-projection/binary-code shortlist that fronts an
    * exact re-rank. The pack is a 32-step indicator transform folded by
    * the native [[graft.plans.QuantizedDot]] against a literal
    * powers-of-two vector; encode runs once per corpus, map-side.
    */
  def binSketch(df: DataFrame): DataFrame = {
    // fail LOUDLY on d ≠ 64: slice() would silently truncate a wider
    // corpus to its first 64 dims and recall would degrade with no error
    // (round-13 verdict); wider/narrower corpora go through
    // [[binSketchWords]], whose word count follows d
    val guard = expr(
      """CASE WHEN size(vq) <> 64 THEN raise_error(concat(
        |  'binSketch requires d = 64, got d = ', CAST(size(vq) AS STRING),
        |  '; use binSketchWords for other dimensions'))
        |ELSE true END""".stripMargin)
    // one pack implementation: the d = 64 fast path IS binSketchWords'
    // two words (SimplifyExtractValueOps folds the array indexing away,
    // so the plan is the same two scalar qdot packs); both output words
    // carry the guard because column pruning may drop either one
    binSketchWords(df, 64)
      .withColumn("blo", when(guard, col("bsk")(0)))
      .withColumn("bhi", when(guard, col("bsk")(1)))
      .drop("bsk")
  }

  /** Generalized binary sign sketch for ANY dimension: `ceil(d/32)`
    * 32-bit words packed into one `bsk: array<bigint>` column (word w,
    * bit j = 1 iff vq[32w + j] > 0; the tail word packs the `d mod 32`
    * remaining dims). Semantics per word match [[binSketch]]'s
    * `blo`/`bhi` exactly at d = 64 (spec-pinned); the per-word pack is
    * the same native-qdot fold against a literal powers-of-two vector,
    * map-side, 4·ceil(d/32) bytes per vector. `d` is a required caller
    * argument (the corpus dimension is schema knowledge, not derivable
    * statically from an array column); qdot nulls loudly on rows whose
    * actual length disagrees with the slice the word expects.
    */
  def binSketchWords(df: DataFrame, d: Int): DataFrame = {
    require(d > 0, s"binSketchWords requires d > 0, got $d")
    val nWords = (d + 31) / 32
    val words = (0 until nWords).map { wi =>
      val len = math.min(32, d - wi * 32)
      graft.plans.QuantizedDot.qdot(
        expr(s"""transform(slice(vq, ${wi * 32 + 1}, $len),
          |  x -> CASE WHEN x > 0 THEN CAST(1 AS BIGINT)
          |            ELSE CAST(0 AS BIGINT) END)""".stripMargin),
        typedlit((0 until len).map(j => 1L << j)))
    }
    df.withColumn("bsk", array(words: _*))
  }

  /** [[hammingTopK]] over the generalized word-array sketches: distance =
    * Σ_w popcount(bsk_w XOR qsk_w), same (ham ASC, nid ASC) law and
    * k-bounded [[graft.plans.TopKPairs]] ranking tail. The per-pair kernel
    * is `zip_with` XOR+POPCNT folded by `aggregate` — ceil(d/32) word ops
    * per candidate.
    */
  def hammingTopKWords(queries: DataFrame, corpus: DataFrame, d: Int,
      k: Int): DataFrame = {
    val q = binSketchWords(queries, d).select(col("qid"), col("bsk").as("qsk"))
    val c = binSketchWords(corpus, d).select(col("nid"), col("bsk"))
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("ham", expr(
        """aggregate(zip_with(bsk, qsk, (a, b) -> CAST(bit_count(a ^ b) AS BIGINT)),
          |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin))
    rankByHam(scored, k)
  }

  /** Hamming top-k over the binary sketches: distance = popcount of the
    * two XORed words, ranked (ham ASC, nid ASC) — the mirror of every
    * other tier's deterministic tie law. Per candidate pair the kernel
    * is two XOR+POPCNT instructions, which is why this tier exists: at
    * 100 TB the shortlist scan touches 8 bytes/vector instead of 512,
    * and the [[recallAtK]] gate prices what the 1-bit quantization
    * costs. Query and corpus frames carry (qid|nid, vq); both are
    * sketched here so the same packing applies to each side.
    *
    * Ranking goes through the k-bounded [[graft.plans.TopKPairs]]
    * aggregate, not a window: a window row_number ships and SORTS every
    * candidate pair of a query in one task (measured 18.6 s on the
    * 8M-pair 20k-vector lane — sort-bound, not kernel-bound), while the
    * aggregate partial-folds each map slice to ≤ k pairs and shuffles
    * #tasks·k rows per query. Same (ham, nid) lexicographic law, exact
    * same output (the TopKPairs spec pins aggregate ≡ window).
    */
  /** The shared Hamming ranking tail: (ham ASC, nid ASC) top-k per query
    * through the k-bounded [[graft.plans.TopKPairs]] aggregate — the long
    * twin of [[rankTopK]] (scored carries (qid, nid, ham)).
    */
  private def rankByHam(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("qid"))
      .agg(graft.plans.TopKPairs.topkPairs(col("ham"), col("nid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("p.id").as("nid"), col("p.ord").as("ham"))

  def hammingTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = binSketch(queries)
      .select(col("qid"), col("blo").as("qlo"), col("bhi").as("qhi"))
    val c = binSketch(corpus).select(col("nid"), col("blo"), col("bhi"))
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("ham",
        (bit_count(col("blo").bitwiseXOR(col("qlo"))) +
          bit_count(col("bhi").bitwiseXOR(col("qhi")))).cast("long"))
    rankByHam(scored, k)
  }

  /** Two-stage binary search: Hamming shortlist of `shortlist`
    * candidates per query (8-byte sketches, XOR+POPCNT), then EXACT
    * cosine re-rank of just those candidates to top-k — the classic
    * cheap-filter/exact-refine composition (the binary analogue of
    * [[ivfPqSearchRerank]]). At 100 TB the full-precision vectors are
    * touched only for |queries|·shortlist rows; the corpus-wide scan
    * reads 8 bytes/vector. Recall recovers from the raw Hamming tier's
    * because the exact stage re-orders everything the shortlist caught
    * (llm_hamming_rerank_recall prices the remaining shortlist misses).
    */
  def hammingRerank(queries: DataFrame, corpus: DataFrame, k: Int,
      shortlist: Int): DataFrame = {
    val cand = hammingTopK(queries, corpus, shortlist)
      .select(col("qid"), col("nid"))
    val scored = cand
      .join(corpus.select(col("nid"), col("vq").as("nv"), col("norm2").as("nn")),
        Seq("nid"))
      .join(broadcast(queries.select(col("qid"), col("vq").as("qv"),
        col("norm2").as("qn"))), Seq("qid"))
      .withColumn("dp", dot("qv", "nv"))
      .withColumn("cos", cosine(col("dp"), col("qn"), col("nn")))
    rankByCos(scored, k)
  }

  // ===== Random-projection (Johnson–Lindenstrauss) reduction =====

  /** Deterministic projection sign for flattened index `idx = j·dOut + k`:
    * a two-round multiply–xorshift avalanche over mod 2³¹, then
    * `mod 3 − 1 ∈ {−1, 0, +1}` (the Achlioptas-density sparse JL scheme
    * with the stored matrix replaced by a pure integer formula any engine
    * replays bit-exactly). The mixer matters: a plain LCG here is a trap —
    * 1103515245 ≡ 0 (mod 3), which collapses `h mod 3` to a function of
    * the slowly-stepping wrap count alone, making adjacent sign COLUMNS
    * near-duplicates and silently shrinking the projection's effective
    * rank. Both multipliers are ≢ 0 (mod 3) and each round is followed by
    * a high-bit xor-shift, so the mod-3 verdict sees avalanche-mixed bits.
    * All values stay non-negative, so `%` agrees across engines.
    */
  private[llm] def rpSign(idx: Long): Long = {
    var h = (2654435761L * idx) % 2147483648L
    h ^= h >> 13
    h = (h * 1274126177L) % 2147483648L
    h ^= h >> 16
    h % 3 - 1
  }

  /** Sparse signed random projection to `dOut` dimensions:
    * `y_k = Σ_j vq_j · s(j,k)` with `s(j,k) = rpSign(j·dOut + k)`.
    * All arithmetic is 64-bit integer; the projected self-dot `rpn2` is
    * exact. The signs are compile-time constants, so each output
    * coordinate is one native [[graft.plans.QuantizedDot]] against a
    * LITERAL sign vector — the whole projection stays inside whole-stage
    * codegen with zero higher-order-function interpretation and no
    * stored/shuffled matrix. `dIn` must match the corpus dimension
    * (qdot nulls loudly on ragged input).
    *
    * Scale: entirely map-side — O(d·dOut) multiply-adds per row, no
    * state, no join; the reduction is what makes downstream brute/LSH
    * scoring d/dOut× cheaper per candidate at 100 TB, priced by the
    * [[recallAtK]] gate (on the synthetic iid-noise embeddings fixture
    * that recall is LOW for any projection — dense Gaussian included,
    * measured ≈ 0.03–0.17 at d′ = 16/32 — because iid vectors have no
    * neighborhood structure to preserve; the gate reports it honestly
    * rather than the operator overfitting the fixture).
    */
  def rpProject(df: DataFrame, dOut: Int, dIn: Int = 64): DataFrame = {
    val cols = (0 until dOut).map { k =>
      val signs: Seq[Long] = (0 until dIn).map(j => rpSign(j.toLong * dOut + k))
      graft.plans.QuantizedDot.qdot(col("vq"), typedlit(signs))
    }
    df.withColumn("rp", array(cols: _*)).withColumn("rpn2", dot("rp", "rp"))
  }

  /** Brute cosine top-k in the PROJECTED space: the [[bruteTopK]] ranking
    * law over `rp`/`rpn2` — what a reduced-dimension scoring tier returns.
    * Query and corpus frames carry (qid|nid, vq, norm2); both are
    * projected here so the same LCG signs apply to each side.
    */
  def rpTopK(queries: DataFrame, corpus: DataFrame, dOut: Int, k: Int): DataFrame = {
    val q = rpProject(queries, dOut)
      .select(col("qid"), col("rp").as("qv"), col("rpn2").as("qn"))
    val c = rpProject(corpus, dOut)
      .select(col("nid"), col("rp").as("nv"), col("rpn2").as("nn"))
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("dp", dot("qv", "nv"))
      .withColumn("cos", cosine(col("dp"), col("qn"), col("nn")))
    rankByCos(scored, k)
  }

  /** Product quantization (two subspaces): split each quantized vector
    * into halves, train an INDEPENDENT deterministic k-means codebook per
    * subspace ([[kmeansCentroids]] verbatim on the half-vectors), and
    * encode every vector as its per-subspace nearest-centroid code pair —
    * the storage layout that collapses a 100 TB embedding column to
    * 2·log₂(k) bits per vector plus two small codebooks. `recon_cos`
    * (exact cosine between the vector and its concatenated-centroid
    * reconstruction: sub-dots and sub-norms ADD across subspaces) is the
    * honesty metric — the PQ analogue of the ANN recall gate.
    *
    * Scale: each subspace's training is the audited k-means shape
    * (broadcast centroids, partial-agg top-1 assign, (cell, dim) partial
    * aggs); encode is two broadcast joins on codes keyed by the
    * high-cardinality id. Nothing quadratic, nothing collected.
    */
  /** Half-split of a (id-col, vq, norm2) frame: the two PQ subspaces. */
  private def pqHalf(df: DataFrame, idCol: String, sub: Int): DataFrame = {
    val slice =
      if (sub == 0) "slice(vq, 1, size(vq) div 2)"
      else "slice(vq, size(vq) div 2 + 1, size(vq) - size(vq) div 2)"
    df.select(col(idCol), expr(slice).as("vq"))
      .withColumn("norm2", dot("vq", "vq"))
  }

  /** Encode one subspace half against a (trained or loaded) codebook:
    * nearest-centroid assignment + the reconstruction terms (dp, cn) —
    * one pass, no training.
    */
  private def pqCodesFor(sf: DataFrame, book: DataFrame, sub: Int): DataFrame =
    ivfAssign(sf.select(col("nid").as("id"), col("vq"),
        col("norm2")), book, nProbe = 1)
      .select(col("id").as("nid"), col("cell").as(s"code$sub"))
      .join(broadcast(book.select(col("cid").as(s"code$sub"), col("cv"),
        col("cn").as(s"cn$sub"))), Seq(s"code$sub"))
      .join(sf.select(col("nid"), col("vq")), Seq("nid"))
      .withColumn(s"dp$sub", dot("vq", "cv"))
      .select(col("nid"), col(s"code$sub"), col(s"dp$sub"), col(s"cn$sub"))

  /** Codebooks + per-vector codes for both subspaces. Each element:
    * (centroids (cid, cv, cn), codes (nid, code, dp, cn)).
    */
  private[llm] def pqParts(corpus: DataFrame, step: Long, iters: Int)
      : Seq[(DataFrame, DataFrame)] =
    Seq(0, 1).map { sub =>
      val sf = pqHalf(corpus, "nid", sub)
      val cent = kmeansCentroids(sf, step, iters)
      (cent, pqCodesFor(sf, cent, sub))
    }

  private def pqEncodeAssemble(corpus: DataFrame, c0: DataFrame,
      c1: DataFrame): DataFrame =
    corpus.join(c0, Seq("nid")).join(c1, Seq("nid"))
      .withColumn("recon_cos", (col("dp0") + col("dp1")).cast("double") /
        (sqrt(col("norm2").cast("double")) *
          sqrt((col("cn0") + col("cn1")).cast("double"))))
      .select(col("nid").as("vec_id"), col("code0"), col("code1"),
        col("recon_cos"))

  def pqEncode(corpus: DataFrame, step: Long, iters: Int = 2): DataFrame = {
    val Seq((_, c0), (_, c1)) = pqParts(corpus, step, iters)
    pqEncodeAssemble(corpus, c0, c1)
  }

  /** Encode against a prebuilt (possibly parquet-loaded) [[PqIndex]]'s
    * codebooks — the standing-index encode for NEW corpus batches: one
    * assignment pass per subspace, no codebook training. Output is
    * identical to the inline [[pqEncode]] when the index was trained on
    * this corpus (training is deterministic).
    */
  def pqEncode(corpus: DataFrame, index: PqIndex): DataFrame = {
    val Seq(c0, c1) = Seq((0, index.book0), (1, index.book1)).map {
      case (sub, book) => pqCodesFor(pqHalf(corpus, "nid", sub), book, sub)
    }
    pqEncodeAssemble(corpus, c0, c1)
  }

  /** PQ asymmetric-distance top-k: queries score the ENCODED corpus
    * through per-subspace lookup tables — `LUT_s[qid, code] =
    * dot(q_half_s, centroid)` — so scoring a corpus vector is two table
    * lookups and an add, never a d-dimensional dot. approx_cos divides by
    * the RECONSTRUCTION norm (√(cn0+cn1)): the score ranks corpus
    * vectors exactly as cosine-against-reconstruction does.
    *
    * Scale: the LUTs are (queries × k) rows — broadcast; the corpus side
    * touches only its code pair (two ints per vector, the whole point of
    * PQ storage). The scored frame is |corpus|·|queries| logical rows
    * pruned by the per-query top-k window; a production deployment
    * composes this with IVF cells (IVF-PQ) so each query scores one
    * cell's codes, not the corpus.
    */
  /** Per-subspace query lookup tables: LUT_s[qid, code] = dot(q_half_s,
    * centroid) — (queries × k) rows each, broadcast by every consumer.
    */
  private[llm] def pqLuts(queries: DataFrame,
      book0: DataFrame, book1: DataFrame): Seq[DataFrame] =
    Seq((0, book0), (1, book1)).map { case (sub, book) =>
      pqHalf(queries, "qid", sub)
        .crossJoin(broadcast(book))
        .withColumn(s"ld$sub", dot("vq", "cv"))
        .select(col("qid"), col("cid").as(s"code$sub"), col(s"ld$sub"))
    }

  /** (nid, code0, code1, cnsum) — the stored representation ADC scores. */
  private def pqCodeTable(parts: Seq[(DataFrame, DataFrame)]): DataFrame =
    parts(0)._2.join(parts(1)._2, Seq("nid"))
      .select(col("nid"), col("code0"), col("code1"),
        (col("cn0") + col("cn1")).as("cnsum"))

  private def adcTopK(scored: DataFrame, k: Int): DataFrame = {
    val ranked = scored
      .withColumn("approx_cos", (col("ld0") + col("ld1")).cast("double") /
        (sqrt(col("qn").cast("double")) * sqrt(col("cnsum").cast("double"))))
    rankTopK(ranked, k, Seq("qid"), "approx_cos")
  }

  /** Persistable PQ index: the two subspace codebooks plus the encoded
    * corpus, as plain parquet-roundtrippable DataFrames — the same
    * build-once/probe-many treatment [[graft.llm.TextOps.DedupIndex]]
    * gives text dedup. At 100 TB, codebook training + corpus encode is a
    * ONE-TIME index build; every query batch then reads three small/
    * code-width tables instead of retraining the quantizer per call
    * (which is what the inline [[pqSearch]] overload does — kept for the
    * correctness gate, wrong shape for a standing index).
    */
  case class PqIndex(
      book0: DataFrame, // (cid, cv, cn) — subspace-0 codebook
      book1: DataFrame, // (cid, cv, cn) — subspace-1 codebook
      codes: DataFrame // (nid, code0, code1, cnsum) — encoded corpus
  ) {
    def save(path: String): Unit = {
      book0.write.mode("overwrite").parquet(s"$path/book0")
      book1.write.mode("overwrite").parquet(s"$path/book1")
      codes.write.mode("overwrite").parquet(s"$path/codes")
    }
  }

  object PqIndex {
    def load(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex =
      PqIndex(
        book0 = spark.read.parquet(s"$path/book0"),
        book1 = spark.read.parquet(s"$path/book1"),
        codes = spark.read.parquet(s"$path/codes"))
  }

  /** [[PqIndex]] plus the coarse tier: full-vector trained quantizer and
    * the corpus's one-cell assignment — everything [[ivfPqSearch]] needs.
    * At scale `codes ⋈ cells` is WRITTEN partitioned by `cell`, so each
    * probe is a partition-pruned read.
    */
  case class IvfPqIndex(
      coarse: DataFrame, // (cid, cv, cn) — full-vector coarse centroids
      cells: DataFrame, // (nid, cell) — corpus coarse assignment
      pq: PqIndex) {
    def save(path: String): Unit = {
      coarse.write.mode("overwrite").parquet(s"$path/coarse")
      cells.write.mode("overwrite").parquet(s"$path/cells")
      pq.save(path)
    }
  }

  object IvfPqIndex {
    def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfPqIndex =
      IvfPqIndex(
        coarse = spark.read.parquet(s"$path/coarse"),
        cells = spark.read.parquet(s"$path/cells"),
        pq = PqIndex.load(spark, path))
  }

  /** Tombstone DELETE from a standing [[IvfPqIndex]] — the ANN leg of
    * the takedown lifecycle ([[graft.llm.Retrieval.deleteFromInvIndex]]
    * is the keyword twin): the cell assignment and the PQ code table
    * drop the tombstoned rows through a broadcast anti-join (lazy; the
    * next save/layout write compacts), so no probe can ever score a
    * deleted vector. The TRAINED artifacts (coarse centroids, subspace
    * codebooks) deliberately stay frozen — a delete is not a retrain
    * (assignment/encode of the survivors is unchanged, so the deleted
    * index IS the survivors probed against the same quantizers, exactly;
    * when accumulated deletes shift the distribution, the drift gate —
    * not the delete — says retrain). Ids not in the index drop nothing:
    * idempotent by construction.
    */
  def deleteFromIvfPqIndex(index: IvfPqIndex,
      deletedIds: DataFrame): IvfPqIndex = {
    val tomb = deletedIds.select(col(deletedIds.columns.head).as("nid"))
    IvfPqIndex(index.coarse,
      index.cells.join(broadcast(tomb), Seq("nid"), "left_anti"),
      index.pq.copy(codes =
        index.pq.codes.join(broadcast(tomb), Seq("nid"), "left_anti")))
  }

  /** Tombstone DELETE from a standing [[SqIndex]] — same contract as
    * [[deleteFromIvfPqIndex]]: the code table drops rows, the trained
    * bounds stay frozen (survivor encodes are unchanged; the drift
    * gate's saturation leg owns the retrain decision).
    */
  def deleteFromSqIndex(index: SqIndex, deletedIds: DataFrame): SqIndex = {
    val tomb = deletedIds.select(col(deletedIds.columns.head).as("nid"))
    index.copy(codes =
      index.codes.join(broadcast(tomb), Seq("nid"), "left_anti"))
  }

  /** One-time PQ index build: train both subspace codebooks, encode the
    * corpus. (The training/encode cost every inline search call was
    * paying, paid once.)
    */
  def buildPqIndex(corpus: DataFrame, step: Long, iters: Int = 2): PqIndex = {
    val parts = pqParts(corpus, step, iters)
    PqIndex(parts(0)._1, parts(1)._1, pqCodeTable(parts))
  }

  /** Vectors-per-cell step yielding nCells ≈ 4·√n — the standard IVF
    * sizing (FAISS's nlist guidance). WHY this matters at scale: with a
    * CONSTANT step, nCells grows linearly with the corpus and the
    * train/assign pass costs O(n·nCells) = O(n²/step) — measured on the
    * sf lanes: 2k→20k→40k vectors at step=25 built in 5.9 s → 77 s →
    * 310 s warm (a clean 2.0 scaling exponent on the last doubling).
    * With step = √n/4 the same doubling costs 48.5 s → 107 s (exponent
    * ~1.1 at this size; O(n^1.5) asymptotically), and per-query probe
    * work stays corpus/nCells·nProbe = O(√n). The fixed-step overloads
    * remain for the oracle rows, whose DuckDB replays pin step=25.
    */
  def autoStep(n: Long): Long =
    math.max(1L, (math.sqrt(n.toDouble) / 4).round)

  /** [[buildIvfPqIndex]] with the √n-cells sizing: counts the corpus
    * once (build-time only) and derives the step from [[autoStep]].
    */
  def buildIvfPqIndexAuto(corpus: DataFrame, iters: Int = 2): IvfPqIndex =
    buildIvfPqIndex(corpus, autoStep(corpus.count()), iters)

  /** One-time IVF-PQ index build: coarse quantizer + cell assignment on
    * top of [[buildPqIndex]].
    */
  def buildIvfPqIndex(corpus: DataFrame, step: Long, iters: Int = 2): IvfPqIndex = {
    val coarse = kmeansCentroids(corpus, step, iters)
    val cells = ivfAssign(corpus.select(col("nid").as("id"), col("vq"),
        col("norm2")), coarse, nProbe = 1)
      .select(col("id").as("nid"), col("cell"))
    IvfPqIndex(coarse, cells, buildPqIndex(corpus, step, iters))
  }

  /** Write the IVF-PQ code table PHYSICALLY PARTITIONED BY CELL — the
    * on-disk layout every IVF scaladoc in this file promises ("at scale
    * `codes ⋈ cells` is WRITTEN partitioned by `cell`"): one directory
    * per coarse cell holding that cell's (nid, code0, code1, cnsum)
    * rows. Build-once, alongside the index artifacts.
    */
  def writeCellLayout(index: IvfPqIndex, path: String): Unit =
    index.pq.codes.join(index.cells, Seq("nid"))
      .write.partitionBy("cell")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** IVF-PQ probe as a PARTITION-PRUNED READ of the cell layout: the
    * query batch's probed cells become an `IN` filter on the partition
    * column, so the scan lists and reads ONLY the probed cells'
    * directories — `PartitionFilters` in the plan, zero bytes of any
    * other cell touched (spec-pinned). This is the executable form of
    * the claim [[ivfPqSearch]]'s join-based probe stands in for at
    * fixture scale, and it returns EXACTLY [[ivfPqSearch]]'s rows.
    *
    * The probed-cell set is collected driver-side: it is ≤ |queries| ×
    * nProbe values by construction (the query batch is bounded by
    * contract — same contract every broadcast(q) in this file rests
    * on), and a literal IN-list on the partition column is precisely
    * the mechanism Spark's planner prunes partitions with. At 100 TB
    * nothing else changes: the layout write is the one-time index
    * build, and each query batch reads corpus/nCells × nProbe rows.
    */
  def ivfPqSearchPruned(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, index: IvfPqIndex, layoutPath: String, k: Int,
      nProbe: Int): DataFrame = {
    import spark.implicits._
    // ONE probe job: the (qid, cell) rows are ≤ |queries|·nProbe by
    // construction, so collect once and reuse driver-side as both the
    // partition-pruning IN-list and a local join frame (re-running
    // ivfAssign for each consumer would score the query batch against
    // the centroids twice)
    val probeRows = ivfAssign(queries.select(col("qid").as("id"), col("vq"),
        col("norm2")), index.coarse, nProbe)
      .select(col("id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val probedCells = probeRows.map(_._2).distinct.sorted
    val probes = probeRows.toDF("qid", "cell")
    val codes = spark.read.parquet(layoutPath)
      .filter(col("cell").isin(probedCells: _*))
    val luts = pqLuts(queries, index.pq.book0, index.pq.book1)
    val scored = codes
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(luts(0)), Seq("qid", "code0"))
      .join(broadcast(luts(1)), Seq("qid", "code1"))
      .filter(col("nid") =!= col("qid"))
      .join(broadcast(queries.select(col("qid"), col("norm2").as("qn"))), Seq("qid"))
    adcTopK(scored, k)
  }

  /** ADC search against a prebuilt (possibly parquet-loaded) [[PqIndex]]:
    * the standing-index search path — no training inside the call.
    */
  def pqSearch(queries: DataFrame, index: PqIndex, k: Int): DataFrame = {
    val luts = pqLuts(queries, index.book0, index.book1)
    val scored = index.codes
      .join(broadcast(luts(0)), Seq("code0"))
      .join(broadcast(luts(1)), Seq("code1", "qid"))
      .filter(col("nid") =!= col("qid"))
      .join(broadcast(queries.select(col("qid"), col("norm2").as("qn"))), Seq("qid"))
    adcTopK(scored, k)
  }

  def pqSearch(queries: DataFrame, corpus: DataFrame, step: Long,
      iters: Int = 2, k: Int = 3): DataFrame =
    pqSearch(queries, buildPqIndex(corpus, step, iters), k)

  /** IVF-PQ: the production 100 TB ANN layout — corpus vectors live in
    * one coarse cell (full-vector trained quantizer) and are STORED as
    * PQ code pairs; a query probes its `nProbe` closest cells and
    * ADC-scores only those cells' codes through the broadcast LUTs. Per
    * query the work is (corpus/nCells)·nProbe lookup-adds instead of
    * |corpus| d-dim dots, and at scale the code table is WRITTEN
    * partitioned by `cell`, so each probe is a partition-pruned read of
    * a few-byte-per-vector file — the reason a 100 TB embedding column
    * becomes searchable at all.
    */
  /** IVF-PQ ADC search against a prebuilt [[IvfPqIndex]] — the
    * standing-index form of the production layout: a query batch probes
    * its `nProbe` closest coarse cells and ADC-scores only those cells'
    * codes; no training inside the call.
    */
  def ivfPqSearch(queries: DataFrame, index: IvfPqIndex, k: Int,
      nProbe: Int): DataFrame = {
    val probes = ivfAssign(queries.select(col("qid").as("id"), col("vq"),
        col("norm2")), index.coarse, nProbe)
      .select(col("id").as("qid"), col("cell"))
    val luts = pqLuts(queries, index.pq.book0, index.pq.book1)
    val scored = index.pq.codes.join(index.cells, Seq("nid"))
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(luts(0)), Seq("qid", "code0"))
      .join(broadcast(luts(1)), Seq("qid", "code1"))
      .filter(col("nid") =!= col("qid"))
      .join(broadcast(queries.select(col("qid"), col("norm2").as("qn"))), Seq("qid"))
    adcTopK(scored, k)
  }

  def ivfPqSearch(queries: DataFrame, corpus: DataFrame, step: Long,
      iters: Int = 2, k: Int = 3, nProbe: Int = 2): DataFrame =
    ivfPqSearch(queries, buildIvfPqIndex(corpus, step, iters), k, nProbe)

  /** Exact integer-cosine re-rank of a (qid, nid) candidate set: the
    * second stage that recovers accuracy ADC's 2-lookup scoring trades
    * away. The candidate pairs (|queries|·shortlist rows, id-only) and
    * the query vectors broadcast; the corpus-side join touches only
    * shortlisted rows — per query the full-dimension dots number
    * `shortlist`, not |corpus|.
    */
  def rerankExact(queries: DataFrame, corpus: DataFrame, cand: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("qid"), col("vq").as("qv"), col("norm2").as("qn"))
    val scored = corpus
      .select(col("nid"), col("vq").as("nv"), col("norm2").as("nn"))
      .join(broadcast(cand.select(col("qid"), col("nid"))), Seq("nid"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("dp", dot("qv", "nv"))
      .withColumn("cos", cosine(col("dp"), col("qn"), col("nn")))
    rankByCos(scored, k)
  }

  /** Production IVF-PQ answer quality: ADC top-`shortlist` per query
    * (cheap, lossy) → exact re-rank of the shortlist (full-precision
    * dots on `shortlist` vectors) → top-k. Recall is bounded by the
    * coarse tier (a true neighbor outside every probed cell is
    * unreachable), but within probed cells the re-rank returns exactly
    * what brute force would — the standard two-stage PQ deployment.
    */
  def ivfPqSearchRerank(queries: DataFrame, corpus: DataFrame,
      index: IvfPqIndex, k: Int, nProbe: Int, shortlist: Int): DataFrame = {
    val short = ivfPqSearch(queries, index, shortlist, nProbe)
    rerankExact(queries, corpus, short.select(col("qid"), col("nid")), k)
  }

  /** Tag every corpus vector with its coarse k-means cell — the SemDeDup
    * blocking key. With trained centroids ([[kmeansCentroids]]) the cells
    * track the embedding distribution, so within-cell populations stay
    * balanced and the quadratic within-cell pair join stays bounded.
    * Scale: assignment is the nProbe=1 partial-agg max (broadcast
    * centroids, one shuffled row per vector); the join back is on the
    * high-cardinality id the rows already carry.
    */
  def withCells(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.join(
      ivfAssign(corpus.select(col("nid").as("id"), col("vq"), col("norm2")),
        centroids, nProbe = 1).select(col("id").as("nid"), col("cell")),
      Seq("nid"))

  /** Embedding-cosine near-duplicate pairs, blocked by a partition column
    * (label here; at scale this is the shard/bucket key that keeps the
    * pair join local), with a block-size cap. The quadratic within-block
    * pair join is only safe while blocks stay small; a caller choosing a
    * low-cardinality block column would otherwise get an all-pairs
    * blow-up. Blocks over `maxBlockSize` rows are routed through the
    * sign-pattern LSH buckets instead (bucket folded into the join key, so
    * pairs stay within one block); routed candidates are verified with the
    * same exact integer cosine, so routed pairs are still true positives —
    * LSH only trades away recall on cross-bucket pairs.
    */
  def nearDupPairs(df: DataFrame, idCol: String, blockCol: String,
      threshold: Double, maxBlockSize: Long = 10000L,
      lshPairs: Seq[(Int, Int)] = DefaultPairs): DataFrame = {
    // block sizes are a tiny (block, count) frame even when the corpus is
    // huge — broadcast it so tagging rows is map-side
    val sizes = df.groupBy(col(blockCol)).agg(count(lit(1)).as("__bn"))
    val tagged = df.join(broadcast(sizes), Seq(blockCol))
    val small = pairsWithin(
      tagged.filter(col("__bn") <= maxBlockSize), idCol, blockCol,
      Seq("blk"), threshold)
    val big = pairsWithin(
      withBucket(tagged.filter(col("__bn") > maxBlockSize), lshPairs),
      idCol, blockCol, Seq("blk", "bucket"), threshold)
    small.unionByName(big)
  }

  /** Per-label integer centroid SUMS over the quantized grid — one
    * posexplode + (label, pos) partial aggregate (map-side combine to
    * |labels|·d rows), regrouped to a sum-vector per label. Sums, not
    * means: cosine is scale-invariant, so `cos(S_a, S_b) ≡
    * cos(S_a/n_a, S_b/n_b)` and the centroid similarity needs ZERO
    * division — exact integers into the standard cosine kernel.
    * Overflow: the pairwise dot is Σ_d (n·B)², so at extreme per-label
    * counts (n·B approaching 2³¹·√(1/d)) pre-scale with the kmeans
    * floor-mean idiom first; fixture magnitudes sit far below.
    */
  def labelCentroids(df: DataFrame, labelCol: String): DataFrame =
    df.select(col(labelCol).as("lbl"), posexplode(col("vq")))
      .groupBy(col("lbl"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("lbl"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, s))), x -> x.s)")
        .as("sv"), max(col("n")).as("n"))
      .withColumn("sn", dot("sv", "sv"))

  /** Class-prototype similarity audit: the cosine between every pair of
    * label centroids — the "are my class prototypes separable / which
    * labels collide" check run before training a classifier on the
    * embedding column. |labels|² pairs over broadcast label-cardinality
    * frames; the corpus is touched once (inside [[labelCentroids]]).
    */
  def labelCentroidCosine(df: DataFrame, labelCol: String): DataFrame = {
    val c = labelCentroids(df, labelCol)
    val a = c.select(col("lbl").cast("long").as("label_a"),
      col("sv").as("av"), col("sn").as("an"), col("n").as("n_a"))
    val b = c.select(col("lbl").cast("long").as("label_b"),
      col("sv").as("bv"), col("sn").as("bn"), col("n").as("n_b"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .withColumn("cos", cosine(dot("av", "bv"), col("an"), col("bn")))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("cos"))
  }

  /** Maximal-marginal-relevance rerank: brute top-`m` candidates per
    * query, then `k` greedy picks maximizing `rel(d) − max_{p∈picked}
    * sim(d, p)` (the λ = ½ MMR objective with the monotone ½ dropped) —
    * the standard diversification pass between retrieval and a context
    * window, so near-duplicate hits don't crowd out coverage.
    *
    * Scale shape: the corpus is touched exactly once (inside
    * [[bruteTopK]], or swap in any ANN tier that yields the same
    * (qid, nid, cos) candidates); everything after operates on the
    * |queries|·m candidate frame, which is `localCheckpoint`ed so the
    * k−1 greedy steps never rescan the corpus. Pairwise sims are
    * m²-per-query (≤ 64 rows here), never corpus-pairs. Determinism:
    * cosine from exact integer dots, ties broken (score DESC, nid ASC).
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame,
      m: Int = 8, k: Int = 3): DataFrame =
    mmrRerankFrom(bruteTopK(queries, corpus, m), corpus, k)

  /** [[mmrRerank]] over a PRE-COMPUTED candidate frame — any ANN tier's
    * (qid, nid, cos) output slots in (brute, IVF, IVF-PQ rerank, …); the
    * greedy diversification is tier-agnostic.
    */
  def mmrRerankFrom(top: DataFrame, corpus: DataFrame,
      k: Int = 3): DataFrame = {
    val cand = corpus
      .join(broadcast(top.select(col("qid"), col("nid"), col("cos").as("rel"))),
        Seq("nid"))
      .select(col("qid"), col("nid"), col("vq").as("nv"),
        col("norm2").as("nn"), col("rel"))
      .localCheckpoint()
    val a = cand.select(col("qid"), col("nid").as("a"), col("nv").as("av"),
      col("nn").as("an"))
    val b = cand.select(col("qid"), col("nid").as("b"), col("nv").as("bv"),
      col("nn").as("bn"))
    val sims = a.join(b, Seq("qid")).filter(col("a") =!= col("b"))
      .withColumn("sim", cosine(dot("av", "bv"), col("an"), col("bn")))
      .select(col("qid"), col("a"), col("b"), col("sim"))
      .localCheckpoint()
    val w1 = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("nid").asc)
    var picked = cand
      .withColumn("rnk", row_number().over(w1)).filter(col("rnk") === 1)
      .select(col("qid"), lit(1L).as("mmr_rank"), col("nid"),
        col("rel").as("score"))
    var step = 2
    while (step <= k) {
      val chosen = picked.select(col("qid"), col("nid"))
      val pen = sims
        .join(chosen, sims("qid") === chosen("qid") && sims("b") === chosen("nid"))
        .groupBy(sims("qid").as("qid"), col("a").as("nid"))
        .agg(max(col("sim")).as("maxsim"))
      val scored = cand.join(chosen, Seq("qid", "nid"), "left_anti")
        .join(pen, Seq("qid", "nid"))
        .withColumn("score", col("rel") - col("maxsim"))
      val ws = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
      val next = scored.withColumn("rnk", row_number().over(ws))
        .filter(col("rnk") === 1)
        .select(col("qid"), lit(step.toLong).as("mmr_rank"), col("nid"),
          col("score"))
      picked = picked.unionByName(next).localCheckpoint()
      step += 1
    }
    picked
  }

  /** Exact-cosine pair join over rows sharing `joinCols` (which always
    * includes the block key, so pairs never cross blocks). Each row carries
    * exactly one bucket in the LSH tier, so no pair is emitted twice.
    */
  private def pairsWithin(base: DataFrame, idCol: String, blockCol: String,
      joinCols: Seq[String], threshold: Double): DataFrame = {
    val keyed = base.withColumn("blk", col(blockCol))
    val l = keyed.select((col(idCol).as("id_a") +: col("vq").as("va") +:
      col("norm2").as("na") +: joinCols.map(col)): _*)
    val r = keyed.select((col(idCol).as("id_b") +: col("vq").as("vb") +:
      col("norm2").as("nb") +: joinCols.map(col)): _*)
    l.join(r, joinCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dp", dot("va", "vb"))
      .withColumn("cos", cosine(col("dp"), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("blk").as("block"), col("cos"))
  }
}
