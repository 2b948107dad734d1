package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch (HyperLogLog, Flajolet et al. 2007) in
  * pure integer/string column algebra — the cardinality telemetry a
  * 100 TB curation run wants ("distinct urls per crawl", "vocab size per
  * domain") without `count(distinct)`'s full shuffle of every distinct
  * value. The sketch state is 512 one-byte registers per group: constant
  * size however large the group, partial-aggregated map-side, and
  * MERGEABLE — the union of two corpora is the bucket-wise max of their
  * registers, so per-shard sketches roll up to a global one without
  * touching rows again (the property that matters at 1000 executors).
  *
  * Determinism: the usual HLL rank (count of leading zeros) is taken
  * here from `length(bin(x))` — an integer/string op with identical
  * semantics in Spark and DuckDB — never floating `log2`, whose
  * libm rounding flips floor() at register boundaries. The harmonic-mean
  * denominator Σ 2^(−M_j) is scaled by 2^52 into an EXACT BIGINT sum
  * (every term is a power of two ≥ 1, max total 512·2^52 < 2^62), so the
  * only floating-point op in the whole sketch is the single final
  * division — bit-identical in any IEEE engine.
  *
  * Range contract: the raw estimator is accurate (±1.04/√512 ≈ 4.6%
  * standard error) above ≈2.5·m ≈ 1280 distinct values; BELOW that it
  * reads ≈α·m ≈ 369 regardless of n (the well-known small-range bias).
  * The standard fix — linear counting `m·ln(m/V)` — needs `ln`, which
  * is NOT IEEE-pinned across engines, so instead of silently blending a
  * non-replayable number the estimate row carries `small_range` and the
  * occupancy count: below the cutoff `n_occupied` itself is the
  * near-exact reading (collision loss < 10% there), and a consumer that
  * wants textbook linear counting has V = m − n_occupied in hand.
  *
  * Hash domain: the corpus-standard h64 (md5 → 60 bits, TextOps.h64c).
  * Top 9 bits pick the bucket (m = 512), the remaining 51 bits feed the
  * rank, so rank ∈ [1, 52] (rem = 0 ⇒ 52).
  */
object Sketches {

  /** Number of registers (2^9). */
  val M = 512L

  /** 2^51 — splits the 60-bit hash into bucket (top 9) and rank field. */
  val RemMod = 2251799813685248L

  /** 2^52 — the fixed-point scale of the harmonic-mean denominator. */
  val SumScale = 4503599627370496L

  /** Per-group HLL registers of the values in `valueCol`: one row per
    * (group, occupied bucket) with the max rank. Constant ≤ m rows per
    * group; `max` partial-aggregates map-side.
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val h = TextOps.h64c(col(valueCol))
    // bucket = top 9 bits (bit shift, not `/` — Column `/` is DOUBLE
    // division); rem = low 51 bits (h is always positive, % is exact)
    df.select(col(groupCol),
        shiftright(h, 51).as("bucket"),
        (h % RemMod).as("__rem"))
      .withColumn("rank",
        when(col("__rem") === 0L, lit(52L))
          .otherwise(lit(52L) - length(bin(col("__rem"))).cast("long")))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rank")).as("reg"))
  }

  /** Merge register sets across ALL groups into one sketch labelled
    * `label` — bucket-wise max, the sketch-union law.
    */
  def hllMerge(registers: DataFrame, groupCol: String, label: String): DataFrame =
    registers.groupBy(col("bucket"))
      .agg(max(col("reg")).as("reg"))
      .withColumn(groupCol, lit(label))
      .select(col(groupCol), col("bucket"), col("reg"))

  /** Cardinality estimate per group from its registers. `register_sum` is
    * the exact integer Σ 2^(52−M_j) over ALL 512 buckets (empty buckets
    * contribute 2^52); `hll_estimate` = α_m·m²·2^52 / register_sum is the
    * one floating division.
    */
  def hllEstimate(registers: DataFrame, groupCol: String): DataFrame =
    registers
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_occupied"),
        // variable shift distance needs the SQL form — the Scala
        // `shiftleft(col, int)` overload only takes a literal distance
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(52 - reg AS INT))"))
          .as("__occ_sum"))
      .select(col(groupCol),
        col("n_occupied"),
        (col("__occ_sum") + (lit(M) - col("n_occupied")) * SumScale)
          .as("register_sum"))
      .withColumn("hll_estimate",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
          lit(262144.0) * lit(4503599627370496.0) /
          col("register_sum").cast("double"))
      .withColumn("small_range", col("hll_estimate") < lit(1280.0))

  // ---------------------------------------------------------------- count-min

  /** Count-min sketch (Cormode & Muthukrishnan 2005): frequency
    * estimates from a d×w counter grid — the heavy-hitter telemetry
    * ("how often does this n-gram / url / token occur") with d·w
    * counters of state instead of a full census shuffle of every
    * distinct value. Counters are MERGEABLE by plain addition (the
    * groupBy sum below IS the merge), and estimates are one-sided:
    * `min_j counter[j][h_j(x)]` NEVER undercounts, only collisions
    * overcount — the property the spec pins.
    *
    * Hash family: h_j(x) = h64("j:" ++ x) mod w — the corpus-standard
    * md5 recipe, replayable in the oracle. All arithmetic integer.
    */
  val CmDepth = 4
  val CmWidth = 1024L

  private def rowIds(depth: Int) =
    explode(array((0 until depth).map(lit): _*)).as("j")

  /** Build the d×w counter grid over `valueCol` occurrences: one row per
    * occupied (j, slot), `cnt` summed map-side. ≤ d·w rows total.
    */
  def countMinCounters(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("string").as("__v"), rowIds(CmDepth))
      .select(col("j"),
        (TextOps.h64c(concat(col("j").cast("string"), lit(":"), col("__v")))
          % CmWidth).as("slot"))
      .groupBy(col("j"), col("slot"))
      .agg(count(lit(1)).as("cnt"))

  /** JOIN-SIZE estimate from two count-min grids (the AGMS/CM
    * inner-product estimator, Cormode & Muthukrishnan 2005 §4.2):
    * |A ⋈ B| on the sketched key is Σ_k fA(k)·fB(k), estimated per
    * depth as Σ_slot cA[j][slot]·cB[j][slot] and folded by min over
    * the d depths. ONE-SIDED like the point estimate — hash collisions
    * only ADD non-negative products, so the estimate never undercounts
    * the true join size. This is the "how big is this join going to
    * be" planner probe: two d×w grids (mergeable, built map-side)
    * answer it without shuffling either table's keys. All integer.
    */
  def cmInnerProduct(countersA: DataFrame, countersB: DataFrame): DataFrame = {
    // the slot products ride DECIMAL(38,0): two hot slots at cnt ≈ 3e9
    // would wrap a plain long multiply past 2^63; only the final min
    // (bounded by the true join size a caller expects as a count)
    // returns to long
    val prods = countersA
      .select(col("j"), col("slot"), col("cnt").as("__ca"))
      .join(countersB.select(col("j"), col("slot"), col("cnt").as("__cb")),
        Seq("j", "slot")) // inner: a missing slot contributes 0
      .groupBy(col("j"))
      .agg(sum(col("__ca").cast("decimal(38,0)") * col("__cb")).as("__prod"))
    // a depth with NO shared slots has estimate 0 — it must reach the
    // min fold (dropping it would discard the tightest bound and leave
    // fully-disjoint inputs with an empty/NULL estimate)
    countersA.sparkSession.range(CmDepth)
      .select(col("id").cast("int").as("j"))
      .join(prods, Seq("j"), "left")
      .agg(min(coalesce(col("__prod"), lit(0).cast("decimal(38,0)")))
        .cast("long").as("cm_join_estimate"))
  }

  /** Point estimates for `probes`: each probe joins its d counters
    * (grid broadcasts — it is ≤ d·w rows by construction) and takes the
    * row-wise min; an unoccupied slot reads 0.
    */
  def countMinLookup(counters: DataFrame, probes: DataFrame,
      valueCol: String): DataFrame =
    probes.select(col(valueCol), rowIds(CmDepth))
      .withColumn("slot",
        TextOps.h64c(concat(col("j").cast("string"), lit(":"),
          col(valueCol).cast("string"))) % CmWidth)
      .join(broadcast(counters), Seq("j", "slot"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(col(valueCol))
      .agg(min(col("cnt")).as("cm_estimate"))

  // ------------------------------------------------------------------- bloom

  /** Bloom filter: 2^16 bits packed 32 per word (2048 BIGINT rows; bits
    * 32-62 stay clear — a shift into bit 63 overflows DuckDB's CHECKED
    * `<<` while Spark's wraps, so the portable packing stops below the
    * sign bit), k = 4 hashes — the membership pre-gate a decontamination
    * pass runs BEFORE the exact gram join: ship ~16 KB of filter to
    * every executor instead of the eval set, and only bloom-positive
    * rows pay the exact check. MERGEABLE by bitwise OR; false positives
    * only (a set bit never clears), never false negatives — at 2^16
    * bits / n inserted keys the FP rate is ≈ (1 − e^(−4n/65536))^4
    * (~0.24% at n = 4096; ~2.4% at n ≈ 16k). All bit arithmetic is
    * integer and replays exactly in the oracle.
    */
  val BloomBits = 65536L
  val BloomHashes = 4

  /** Build: one row per occupied 32-bit-packed word, `bits` OR-folded. */
  def bloomBuild(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("string").as("__v"), rowIds(BloomHashes))
      .select((TextOps.h64c(concat(col("j").cast("string"), lit(":"),
        col("__v"))) % BloomBits).as("__pos"))
      .select(expr("__pos div 32").as("word_idx"),
        expr("__pos % 32").as("__bit"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(__bit AS INT)))")
        .as("bits"))

  /** Probe: a value is `in_bloom` iff ALL k of its bits are set; a
    * missing word row means those bits are 0. The filter broadcasts
    * (≤ 1024 rows).
    */
  def bloomProbe(bloom: DataFrame, probes: DataFrame,
      valueCol: String): DataFrame =
    probes.select(col(valueCol), rowIds(BloomHashes))
      .withColumn("__pos",
        TextOps.h64c(concat(col("j").cast("string"), lit(":"),
          col(valueCol).cast("string"))) % BloomBits)
      .withColumn("word_idx", expr("__pos div 32"))
      .withColumn("__bit", expr("__pos % 32"))
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .withColumn("__hit", col("bits").isNotNull &&
        expr("(bits & shiftleft(CAST(1 AS BIGINT), CAST(__bit AS INT))) != 0"))
      .groupBy(col(valueCol))
      .agg(min(col("__hit")).as("in_bloom"))

  // ------------------------------------------------------- quantile sketch

  /** Log-linear quantile histogram (the DDSketch idea — Masson, Rim &
    * Lee, VLDB 2019 — re-derived in exact integer arithmetic): value
    * `v ≥ 1` lands in bucket `16·bitlen(v) + sub` where
    * `bitlen = length(bin(v))` (the HLL rank trick — never floating
    * `log2`) and `sub = (16·v div 2^(bitlen−1)) − 16 ∈ [0, 16)` splits
    * each power-of-two range into 16 linear cells, giving a guaranteed
    * ≤ 1/16 relative quantile error. The sketch is a plain (bucket_id,
    * count) histogram: ≤ ~1000 rows however large the input, SUM-
    * mergeable (per-shard histograms roll up map-side, partial-agg),
    * and every step replays bit-exact in any engine — the percentile
    * telemetry ("P99 doc length per crawl") a 100 TB run wants without
    * `percentile_approx`'s opaque, engine-specific sketch state.
    *
    * Domain: `v ≥ 1` (rows below are dropped — callers histogram
    * lengths/counts, where 0 means empty); every positive long
    * buckets correctly (the sub-cell never forms the `16·v` product
    * above bitlen 5, see [[logBucket]]).
    */
  def logHistogram(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v") >= 1L)
      .withColumn("bucket_id", logBucket("__v"))
      .groupBy(col("bucket_id"))
      .agg(count(lit(1)).as("c"))

  /** The `logHistogram` bucket id of the named value column (callers
    * guarantee `v ≥ 1`): `16·bitlen(v) + 16·v div 2^(bitlen−1) − 16`.
    * For bitlen ≥ 5 the sub-cell is computed as `v div 2^(bitlen−5)`
    * (identical value, since 16 = 2^4 divides out exactly) so the
    * `16·v` product never forms — the bucket is overflow-free for
    * EVERY positive long, not just v < 2^59. Takes a column NAME: the
    * sub-bucket needs an integral `div` by a column-valued power of
    * two, which only the SQL form expresses.
    */
  def logBucket(vCol: String): Column = expr(
    s"""CAST(length(bin($vCol)) AS BIGINT) * 16
       | + (CASE WHEN length(bin($vCol)) >= 5
       |    THEN $vCol div shiftleft(CAST(1 AS BIGINT),
       |      CAST(length(bin($vCol)) - 5 AS INT))
       |    ELSE ($vCol * 16) div shiftleft(CAST(1 AS BIGINT),
       |      CAST(length(bin($vCol)) - 1 AS INT)) END) - 16""".stripMargin)

  /** WEIGHTED `logHistogram`: bucket mass is Σ weight instead of a row
    * count — "50% of TOKENS live in docs shorter than X" instead of
    * "50% of docs". Same bucket algebra, same mergeability (sum), and
    * `histQuantiles` reads it unchanged (its cumulative is over `c`,
    * whatever `c` measures).
    */
  def logHistogramWeighted(df: DataFrame, valueCol: String,
      weightCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("__v"),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__v") >= 1L)
      .withColumn("bucket_id", logBucket("__v"))
      .groupBy(col("bucket_id"))
      .agg(sum(col("__w")).as("c"))

  /** Per-key `logHistogram`: one bounded histogram per group. */
  def logHistogramPerKey(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame =
    df.select(col(keyCol), col(valueCol).cast("long").as("__v"))
      .filter(col("__v") >= 1L)
      .withColumn("bucket_id", logBucket("__v"))
      .groupBy(col(keyCol), col("bucket_id"))
      .agg(count(lit(1)).as("c"))

  /** Extract percentiles `qs` (integers, 1–99) from a `logHistogram`:
    * the q-th percentile bucket is the first whose cumulative count
    * reaches `q·N/100`. The only window runs over the ≤ ~1000 bucket
    * ids — constant work at any input scale.
    */
  def histQuantiles(hist: DataFrame, qs: Seq[Int]): DataFrame =
    histQuantilesPerKey(hist.withColumn("__g", lit(1)), "__g", qs)
      .select(col("q"), col("sketch_v"))

  /** Decode a bucket id (`__bk`) back to its lower-bound value
    * `2^(b−1)·(16 + sub)/16` — the quoted quantile; the true quantile
    * sits in `[bound, bound·17/16)`.
    */
  private def bucketLowerBound: Column = expr(
    """shiftleft(CAST(1 AS BIGINT), CAST(__bk div 16 - 1 AS INT))
      | + (CASE WHEN __bk div 16 >= 5
      |    THEN (__bk % 16) * shiftleft(CAST(1 AS BIGINT), CAST(__bk div 16 - 5 AS INT))
      |    ELSE ((__bk % 16) * shiftleft(CAST(1 AS BIGINT), CAST(__bk div 16 - 1 AS INT))) div 16 END)""".stripMargin)

  /** Per-key percentile extraction from a `logHistogramPerKey`: the
    * cumulative window is partitioned by key and ordered over the
    * ≤ ~1000 bucket ids inside it — bounded work per key at any scale.
    */
  def histQuantilesPerKey(hist: DataFrame, keyCol: String,
      qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 99),
      "percentiles must be in [1, 99]")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("bucket_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("__cum", sum(col("c")).over(w))
      .join(hist.groupBy(col(keyCol)).agg(sum(col("c")).as("__n")), Seq(keyCol))
    broadcast(qs.toDF("q")).crossJoin(cum)
      .filter(col("__cum") * 100 >= col("q") * col("__n"))
      .groupBy(col(keyCol), col("q"))
      .agg(min(col("bucket_id")).as("__bk"))
      .withColumn("sketch_v", bucketLowerBound)
      .select(col(keyCol), col("q"), col("sketch_v"))
  }

  /** Lower median off an exact value histogram via the two-level coarse-
    * bucket fold: `min v with ascending-cum(v) ≥ (N+1) quot 2`. The
    * histogram is value-cardinality-sized, the coarse offsets frame
    * (`v >> 10`, arithmetic shift so negatives floor consistently) is
    * ≤ grid/1024 rows, and the inner running sum partitions ON the
    * coarse bucket — no task ever window-sorts the whole histogram.
    * Returns a one-row frame named `colName`.
    */
  private def histLowerMedian(hist: DataFrame, v: String, c: String,
      colName: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val n = hist.agg(sum(col(c)).as("__n"))
    val h = hist.withColumn("__cb", shiftright(col(v), 10))
    val off = h.groupBy(col("__cb")).agg(sum(col(c)).as("__bt"))
      .withColumn("__boff", coalesce(
        sum(col("__bt")).over(W.orderBy(col("__cb"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("__cb"), col("__boff"))
    h.join(broadcast(off), Seq("__cb"))
      .withColumn("__cum", col("__boff") + sum(col(c)).over(
        W.partitionBy(col("__cb")).orderBy(col(v))
          .rowsBetween(W.unboundedPreceding, 0)))
      .crossJoin(broadcast(n))
      .filter(col("__cum") >= expr("(__n + 1) div 2"))
      .agg(min(col(v)).as(colName))
  }

  /** Keyed lower median off a (key, value) histogram via the two-level
    * fold partitioned by (key, coarse bucket): `min v with per-key
    * ascending cum ≥ (n_key + 1) quot 2`. High-cardinality partition
    * keys — no task ever window-sorts one key's whole histogram, so a
    * mega-key decomposes across its value buckets. One row per key.
    */
  private def histLowerMedianByKey(hist: DataFrame, key: String, v: String,
      c: String, colName: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val n = hist.groupBy(col(key)).agg(sum(col(c)).as("__n"))
    val h = hist.withColumn("__cb", shiftright(col(v), 10))
    val off = h.groupBy(col(key), col("__cb")).agg(sum(col(c)).as("__bt"))
      .withColumn("__boff", coalesce(
        sum(col("__bt")).over(W.partitionBy(col(key)).orderBy(col("__cb"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col(key), col("__cb"), col("__boff"))
    h.join(off, Seq(key, "__cb"))
      .withColumn("__cum", col("__boff") + sum(col(c)).over(
        W.partitionBy(col(key), col("__cb")).orderBy(col(v))
          .rowsBetween(W.unboundedPreceding, 0)))
      .join(n, Seq(key))
      .filter(col("__cum") >= expr("(__n + 1) div 2"))
      .groupBy(col(key)).agg(min(col(v)).as(colName))
  }

  /** Per-key [[madOutliers]]: exact lower median, MAD and outlier count
    * WITHIN each key (source, language, domain) — the per-feed robust
    * fence, since a clean feed's outliers vanish inside a global gate
    * when another feed's tail dominates. Same shape as the global form:
    * the corpus is scanned once into a (key, value) histogram; the
    * per-key deviation histogram derives from it; both medians use the
    * keyed two-level fold. Returns (key, n_rows, median, mad,
    * n_outliers).
    */
  def madOutliersByKey(df: DataFrame, keyCol: String, valueCol: String,
      k: Int = 2): DataFrame = {
    val hist = df.groupBy(col(keyCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // read by both medians + the outlier count
    val med = histLowerMedianByKey(hist, keyCol, "__v", "__c", "median")
    val dh = hist.join(med, Seq(keyCol))
      .groupBy(col(keyCol), abs(col("__v") - col("median")).as("__dv"))
      .agg(sum(col("__c")).as("__dc"))
      .localCheckpoint()
    val mad = histLowerMedianByKey(dh, keyCol, "__dv", "__dc", "mad")
    val n = hist.groupBy(col(keyCol)).agg(sum(col("__c")).as("n_rows"))
    val outs = dh.join(mad, Seq(keyCol))
      .filter(col("__dv") > lit(k.toLong) * col("mad"))
      .groupBy(col(keyCol))
      .agg(sum(col("__dc")).as("n_outliers"))
    n.join(med, Seq(keyCol)).join(mad, Seq(keyCol))
      .join(outs, Seq(keyCol), "left")
      .withColumn("n_outliers", coalesce(col("n_outliers"), lit(0L)))
      .select(col(keyCol), col("n_rows"), col("median"), col("mad"),
        col("n_outliers"))
  }

  /** Median-absolute-deviation outlier gate — the robust companion to the
    * sketch-bounds winsorize: exact lower median `m` of an integral
    * metric, exact MAD = median(|v − m|), and the count of records with
    * |v − m| > k·MAD. Robust where mean/stddev gates break (a few
    * gigadocument-length crawl artifacts drag a stddev fence arbitrarily
    * wide; the median pair is immune to any minority of extremes).
    *
    * Scale: the corpus is scanned ONCE into a value histogram (map-side
    * combine to value-grid cardinality); the deviation histogram derives
    * from the value histogram — never from rows — and both medians use
    * the two-level fold. Output is one audit row
    * (n_rows, median, mad, n_outliers).
    */
  def madOutliers(df: DataFrame, valueCol: String, k: Int = 2): DataFrame = {
    val hist = df.groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // read by both medians + the outlier count
    val med = histLowerMedian(hist, "__v", "__c", "median")
    val dh = hist.crossJoin(broadcast(med))
      .groupBy(abs(col("__v") - col("median")).as("__dv"))
      .agg(sum(col("__c")).as("__dc"))
      .localCheckpoint() // read by the MAD median + the outlier count
    val mad = histLowerMedian(dh, "__dv", "__dc", "mad")
    val n = hist.agg(sum(col("__c")).as("n_rows"))
    val outs = dh.crossJoin(broadcast(mad))
      .filter(col("__dv") > lit(k.toLong) * col("mad"))
      .agg(coalesce(sum(col("__dc")), lit(0L)).as("n_outliers"))
    n.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .crossJoin(broadcast(outs))
      .select(col("n_rows"), col("median"), col("mad"), col("n_outliers"))
  }
}
