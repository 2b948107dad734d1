package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Standing-index DRIFT GATE — the maintenance telemetry every
  * build-once/probe-many index needs under rolling ingest: the trained
  * artifacts (IVF centroids, SQ bounds, PQ codebooks, BM25 vocabulary)
  * are frozen at build time, so when the incoming distribution wanders,
  * recall degrades SILENTLY — probes keep returning k rows, they're just
  * the wrong rows. At 100 TB with continuous ingest this report is the
  * operator that says "retrain now": each metric compares an
  * out-of-sample batch against the index's own base corpus, in EXACT
  * integer units (basis points / micro-cosine), oracle-replayable like
  * every other llm_* row.
  *
  * Metrics (output rows are (metric STRING, key BIGINT, value BIGINT);
  * key = −1 for scalars, the cell id for per-cell rows):
  *
  *  - `ivf_cell_bp_base` / `ivf_cell_bp_batch`: per-coarse-cell
  *    occupancy share in basis points (count·10⁴ div total) of the base
  *    corpus vs the batch's nearest-centroid assignment, and
  *    `ivf_tv_bp` = Σ_cells |batch − base| — 2× the total-variation
  *    distance between the two occupancy distributions in bp. An iid
  *    batch lands near the base shares (small TV); a shifted batch
  *    piles into few cells (TV → 2·10⁴), which is exactly the regime
  *    where fixed-nProbe IVF recall collapses.
  *  - `sq_sat_bp_base` / `sq_sat_bp_batch`: share of vector COMPONENTS
  *    encoding to the clamp rails (code 0 or 255) in bp. In-sample
  *    values saturate only AT the trained min/max; out-of-range values
  *    clamp, so a rising batch rate means the frozen bounds no longer
  *    cover the data and quantization error is unbounded.
  *  - `pq_recon_micro_base` / `pq_recon_micro_batch`: mean
  *    reconstruction cosine (⌊10⁶·cos(v, decode(encode(v)))⌋, integer
  *    mean = sum div count) of encoding against the frozen codebooks.
  *    A dropping batch value means the codebooks don't span the new
  *    data — ADC scores degrade even though every probe still "works".
  *  - `bm25_oov_bp`: batch token occurrences absent from the index
  *    vocabulary, in bp of all batch tokens. OOV tokens contribute
  *    NOTHING to any BM25 score (no postings), so a rising rate is
  *    lost retrieval signal, not just noise.
  *
  * Scale: every metric is one partial-agg pass over the batch (plus the
  * one-time base passes, themselves index-artifact-sized reads): the
  * assignment/encode steps are the SAME standing-index paths the probes
  * use (`Ann.ivfAssign`, `Ann.sqEncode`, `Ann.pqEncode`,
  * vocabulary anti-join), nothing retrains, and the report is
  * O(nCells) rows. Determinism: counts and integer divisions
  * throughout; the one double (reconstruction cosine) uses the same
  * fixed IEEE op sequence as the PQ rows, floored to micro before the
  * order-independent integer sum.
  */
object Drift {

  private def metricRow(df: DataFrame, metric: String): DataFrame =
    df.select(lit(metric).as("metric"), lit(-1L).as("key"),
      col("value").cast("long").as("value"))

  /** Per-cell occupancy in basis points: count·10⁴ div total. */
  private def sharesBp(assigned: DataFrame): DataFrame = {
    val cnt = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    cnt.crossJoin(broadcast(cnt.agg(sum(col("n")).as("t"))))
      .select(col("cell"), expr("n * 10000 div t").as("bp"))
  }

  /** IVF occupancy drift: base shares from the index's stored cell
    * assignment, batch shares from a nearest-centroid assignment against
    * the FROZEN coarse centroids (the same `ivfAssign` the probe runs),
    * full-outer-joined so cells empty on either side read as 0 bp.
    */
  def ivfOccupancyDrift(index: Ann.IvfPqIndex, batch: DataFrame): DataFrame = {
    val asg = Ann.ivfAssign(batch.select(col("nid").as("id"), col("vq"),
      col("norm2")), index.coarse, nProbe = 1)
    val joined = sharesBp(index.cells)
      .select(col("cell"), col("bp").as("bp_base"))
      .join(sharesBp(asg).select(col("cell"), col("bp").as("bp_batch")),
        Seq("cell"), "full_outer")
      .select(col("cell"), coalesce(col("bp_base"), lit(0L)).as("bp_base"),
        coalesce(col("bp_batch"), lit(0L)).as("bp_batch"))
      .localCheckpoint() // three consumers; cells-sized (tiny)
    joined.select(lit("ivf_cell_bp_base").as("metric"),
        col("cell").cast("long").as("key"), col("bp_base").as("value"))
      .unionByName(joined.select(lit("ivf_cell_bp_batch").as("metric"),
        col("cell").cast("long").as("key"), col("bp_batch").as("value")))
      .unionByName(metricRow(joined.agg(
        sum(abs(col("bp_batch") - col("bp_base"))).as("value")), "ivf_tv_bp"))
  }

  /** SQ8 clamp-rail saturation (components at code 0 or 255) in bp of
    * all components — base from the index's stored codes, batch encoded
    * against the FROZEN bounds.
    */
  def sqSaturation(index: Ann.SqIndex, batch: DataFrame): DataFrame = {
    def satBp(codes: DataFrame, metric: String): DataFrame =
      metricRow(codes.agg(expr(
        """sum(size(filter(codes, c -> c = 0 OR c = 255))) * 10000
          | div sum(size(codes))""".stripMargin.replace("\n", ""))
        .as("value")), metric)
    satBp(index.codes, "sq_sat_bp_base")
      .unionByName(satBp(
        Ann.sqEncode(batch, index.bounds).select(col("codes")),
        "sq_sat_bp_batch"))
  }

  /** Mean PQ reconstruction cosine in micro units (⌊10⁶·cos⌋, integer
    * mean) of encoding `base` and `batch` against the index's FROZEN
    * codebooks — the out-of-sample `pqEncode` path, no training.
    */
  def pqReconDrift(index: Ann.PqIndex, base: DataFrame,
      batch: DataFrame): DataFrame = {
    // FLOOR division for the mean: per-row micro values can be negative
    // (a badly-drifted vector can anti-correlate with its reconstruction)
    // and Spark's `div` truncates toward zero while DuckDB's `//` floors
    // — (a - pmod(a, b)) div b is exact floor division in Spark for any
    // sign of a (pmod is non-negative), matching the oracle bit-for-bit
    def meanMicro(vecs: DataFrame, metric: String): DataFrame =
      metricRow(Ann.pqEncode(vecs, index)
        .withColumn("m",
          floor(col("recon_cos") * lit(1000000.0)).cast("long"))
        .agg(expr("(sum(m) - pmod(sum(m), count(1))) div count(1)")
          .as("value")), metric)
    meanMicro(base, "pq_recon_micro_base")
      .unionByName(meanMicro(batch, "pq_recon_micro_batch"))
  }

  /** Batch out-of-vocabulary token rate in bp: occurrences whose word
    * has no posting in the index vocabulary, over all batch tokens.
    */
  def bm25OovBp(index: Retrieval.InvIndex, batchDocs: DataFrame,
      textCol: String): DataFrame = {
    val words = batchDocs
      .select(explode(Retrieval.toks(textCol)).as("word"))
    metricRow(words
      .join(index.dfTable.select(col("word")).withColumn("__in", lit(1L)),
        Seq("word"), "left")
      .agg(count(lit(1)).as("t"),
        coalesce(sum(when(col("__in").isNull, 1L).otherwise(0L)), lit(0L))
          .as("oov"))
      .select(expr("CASE WHEN t = 0 THEN 0 ELSE oov * 10000 div t END")
        .as("value")), "bm25_oov_bp")
  }

  /** The full drift report over one vector batch + one document batch —
    * the union of all four metric families against the shared standing
    * indexes. `base` is the corpus the indexes were trained on (needed
    * only for the PQ base reconstruction pass; IVF/SQ base stats read
    * the index artifacts themselves).
    */
  def report(ivf: Ann.IvfPqIndex, sq: Ann.SqIndex,
      inv: Retrieval.InvIndex, base: DataFrame, batch: DataFrame,
      batchDocs: DataFrame, textCol: String): DataFrame =
    ivfOccupancyDrift(ivf, batch)
      .unionByName(sqSaturation(sq, batch))
      .unionByName(pqReconDrift(ivf.pq, base, batch))
      .unionByName(bm25OovBp(inv, batchDocs, textCol))

  /** The SQ-saturation and BM25-OOV gate legs of a (possibly partial)
    * drift report, fully relational — no driver collect, so a composed
    * row can chain gate → retrain → gate in one lazy plan. Output:
    * (check, observed, threshold, triggered); same delta orientation as
    * [[gate]] (worse is positive). Used by the retrain-composition row,
    * which retrains exactly these two legs' artifacts.
    */
  def sqOovGate(report: DataFrame, satDeltaBpMax: Long,
      oovBpMax: Long): DataFrame = {
    val s = report.filter(col("key") === -1L)
    // each leg aggregates its metric to EXACTLY one row and raises if the
    // row count is anything else: a partial report missing a metric (or a
    // renamed one) previously emitted an empty leg — a shorter gate table
    // that read as nothing-triggered. The agg keeps the gate fully
    // relational (no driver collect), consistent with gate()'s fail-fast.
    def v(metric: String, as: String): DataFrame =
      s.filter(col("metric") === metric)
        .agg(count(lit(1)).as("__n"), min(col("value")).as("__v"))
        .select(expr(
          s"""CASE WHEN __n <> 1 THEN CAST(raise_error(concat(
             |'sqOovGate: expected exactly one $metric scalar row in the
             | drift report, got ', __n)) AS BIGINT)
             |ELSE __v END""".stripMargin.replace("\n", ""))
          .as(as))
    val sat = v("sq_sat_bp_batch", "__b")
      .crossJoin(broadcast(v("sq_sat_bp_base", "__a")))
      .select(lit("sq_sat_delta_bp").as("check"),
        (col("__b") - col("__a")).as("observed"),
        lit(satDeltaBpMax).as("threshold"))
    val oov = v("bm25_oov_bp", "__o")
      .select(lit("bm25_oov_bp").as("check"), col("__o").as("observed"),
        lit(oovBpMax).as("threshold"))
    sat.unionByName(oov)
      .withColumn("triggered", col("observed") > col("threshold"))
  }

  /** Gate a drift report against per-metric thresholds: (check,
    * observed, threshold, triggered) — `triggered` when the observed
    * drift EXCEEDS its threshold. Deltas are oriented so "worse" is
    * positive (saturation rises, reconstruction cosine falls). The
    * report is O(nCells) rows, so the collect is bounded by the index's
    * cell count.
    */
  def gate(report: DataFrame, tvBpMax: Long, satDeltaBpMax: Long,
      reconDeltaMicroMax: Long, oovBpMax: Long): DataFrame = {
    val spark = report.sparkSession
    import spark.implicits._
    val v = report.filter(col("key") === -1L && col("value").isNotNull)
      .collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // fail fast with the missing names instead of a bare
    // NoSuchElementException from a raw Map lookup: a report missing a
    // scalar metric (filtered upstream, or a renamed metric) is a caller
    // bug worth a diagnosable message
    val expected = Set("ivf_tv_bp", "sq_sat_bp_base", "sq_sat_bp_batch",
      "pq_recon_micro_base", "pq_recon_micro_batch", "bm25_oov_bp")
    require(expected.subsetOf(v.keySet),
      s"drift report is missing scalar metrics ${(expected -- v.keySet).toSeq.sorted.mkString(", ")} " +
        s"(got ${v.keySet.toSeq.sorted.mkString(", ")})")
    Seq(
      ("ivf_tv_bp", v("ivf_tv_bp"), tvBpMax),
      ("sq_sat_delta_bp", v("sq_sat_bp_batch") - v("sq_sat_bp_base"),
        satDeltaBpMax),
      ("pq_recon_delta_micro",
        v("pq_recon_micro_base") - v("pq_recon_micro_batch"),
        reconDeltaMicroMax),
      ("bm25_oov_bp", v("bm25_oov_bp"), oovBpMax))
      .toDF("check", "observed", "threshold")
      .withColumn("triggered", col("observed") > col("threshold"))
  }
}
