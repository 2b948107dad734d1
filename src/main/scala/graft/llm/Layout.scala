package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional pruning —
  * the "cluster the corpus so BOTH `domain = x` and `length BETWEEN a
  * AND b` scans prune files" primitive (the Delta/Iceberg OPTIMIZE
  * ZORDER idea, re-expressed as plain deterministic column algebra).
  *
  * Interleaving the bits of two 16-bit dimensions gives a 32-bit key
  * whose RANGES are axis-aligned rectangles: rows sharing the top
  * `2·k` z-bits agree on the top `k` bits of BOTH dimensions, so a
  * file holding one z-range covers a `2^(16−k) × 2^(16−k)` rectangle
  * — a predicate on either dimension prunes by file min/max stats.
  * At 100 TB the write path is `repartitionByRange(zvalue)` + sorted
  * parquet (range exchange + per-file stats, no extra shuffle beyond
  * the one the layout IS); the query rows here audit the guarantee
  * that makes it work: every cell's bounding rectangle is provably
  * small, which is exactly what file-skipping consumes.
  *
  * Everything is shift/mask integer arithmetic — bit-identical in any
  * engine, no floats anywhere.
  */
object Layout {

  /** Morton interleave of two 16-bit dimensions (x in even bits, y in
    * odd bits). Callers clamp/scale inputs into [0, 65535] — out-of-
    * range bits would silently alias, so the domain is required here.
    * Unrolled into 32 shift/mask terms: stays inside whole-stage
    * codegen (a higher-order `aggregate` lambda would not).
    */
  def zValue16(x: Column, y: Column): Column = {
    val guarded = (c: Column) => when(c < 0L || c > 65535L,
      raise_error(lit("zValue16: dimension out of [0, 65535]"))
        .cast("long")).otherwise(c)
    val gx = guarded(x); val gy = guarded(y)
    (0 until 16).map { i =>
      shiftleft(shiftright(gx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(gy, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Assign each row a z-curve cell: the top `2·prefixBits` bits of the
    * interleaved key, i.e. `4^prefixBits` cells, each covering a
    * `2^(16−prefixBits)`-square rectangle of (x, y) space. The cell id
    * is the file/partition id a layout writer ranges on.
    */
  def zCell(x: Column, y: Column, prefixBits: Int): Column = {
    require(prefixBits >= 1 && prefixBits <= 16, "prefixBits in [1, 16]")
    shiftright(zValue16(x, y), 32 - 2 * prefixBits)
  }

  /** Layout audit: per-cell row count and per-dimension min/max spans.
    * By construction every span is < `2^(16−prefixBits)` — the bound
    * file-skipping relies on; `bounded` carries the check in-row.
    */
  def zLayoutStats(df: DataFrame, xCol: String, yCol: String,
      prefixBits: Int): DataFrame = {
    val side = 1L << (16 - prefixBits)
    df.withColumn("__cell", zCell(col(xCol), col(yCol), prefixBits))
      .groupBy(col("__cell").as("cell_id"))
      .agg(count(lit(1)).as("n_rows"),
        (max(col(xCol)) - min(col(xCol))).as("x_span"),
        (max(col(yCol)) - min(col(yCol))).as("y_span"))
      .withColumn("bounded",
        col("x_span") < side && col("y_span") < side)
  }

  /** Compaction plan over a file LISTING (`keyCol` = the layout's sort
    * key — shard index, z-address, partition ordinal; `bytesCol` = file
    * size): pack order-adjacent files into output bins of ~`targetBytes`
    * each, preserving the layout order (compacting a z-ordered or
    * range-sharded table must not interleave distant key ranges, or the
    * min/max file stats the layout exists for are destroyed).
    *
    * Rule: `bin = (cum_bytes − bytes) div targetBytes` — the bin the
    * file's first byte falls in under a running fill. Deterministic, a
    * pure function of (key order, sizes); a file larger than the target
    * starts its own bin and pushes the fill forward, never splits.
    *
    * Scale: the listing is METADATA (one row per file — ~10⁶ rows for
    * 100 TB at 100 MB files), but a global-window cumsum would still
    * serialize it through one task, so the running sum uses the same
    * two-level decomposition as `Sampling.tokenBudget`: monotonic
    * coarse buckets (`keyCol >> bucketShift` — order-preserving, so
    * per-bucket cumsums concatenate to the global one), per-bucket
    * totals folded into start offsets by one window over the small
    * bucket frame, and in-bucket running sums partitioned by bucket.
    * The offsets join is a plain equi-join (bucket count is
    * keyRange >> bucketShift — caller-bounded, not broadcast-pinned;
    * AQE decides).
    */
  def compactionPlan(files: DataFrame, keyCol: String, bytesCol: String,
      targetBytes: Long, bucketShift: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val b = files.withColumn("__b", shiftright(col(keyCol), bucketShift))
    val offsets = b.groupBy(col("__b"))
      .agg(sum(col(bytesCol)).as("__bt"))
      .withColumn("__off", coalesce(
        sum(col("__bt")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    val w = Window.partitionBy(col("__b")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(offsets, Seq("__b"))
      .withColumn("cum_bytes", col("__off") + sum(col(bytesCol)).over(w))
      .withColumn("bin",
        expr(s"(cum_bytes - $bytesCol) div $targetBytes"))
      .select(col(keyCol), col(bytesCol), col("cum_bytes"), col("bin"))
  }
}
