package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data curation.
  *
  * `df.sample()` is seed-dependent per partitioning (RDD sampling draws
  * per-partition), so re-runs over re-partitioned data select different
  * rows — useless for reproducible corpus construction or A/B data
  * ablations. Hash-gating on a stable id (`md5(id) mod 100 < pct`) is the
  * standard fix: membership is a pure function of the row's identity, so
  * any engine, any partitioning, any day selects the same sample — and
  * the DuckDB oracle can re-derive it exactly.
  *
  * Scale: a narrow map-side predicate — no shuffle, no state, pushes into
  * the scan's codegen stage. Stratified rates are a broadcast dim join of
  * a tiny (stratum, pct) table.
  */
object Sampling {

  /** 60-bit positive hash of the id column's string form, mod 100 —
    * uniform enough for percentage gates (the md5 low bits are unbiased).
    * Shares [[TextOps.h64c]] so the hash recipe can never drift from the
    * rest of the engine's md5 convention.
    */
  def hashBucket(idCol: Column): Column =
    TextOps.h64c(idCol.cast("string")) % 100

  /** Uniform deterministic sample: keep rows whose hash bucket < pct. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.withColumn("__bucket", hashBucket(col(idCol)))
      .filter(col("__bucket") < pct)
      .drop("__bucket")

  /** Stratified deterministic sample: per-stratum percentage from a tiny
    * rates table (broadcast), e.g. downsample web text to 10% while
    * keeping 100% of books. Strata absent from `rates` default to
    * `defaultPct`.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF(stratumCol, "__pct")
    df.join(broadcast(rateDf), Seq(stratumCol), "left")
      .withColumn("__pct", coalesce(col("__pct"), lit(defaultPct)))
      .withColumn("__bucket", hashBucket(col(idCol)))
      .filter(col("__bucket") < col("__pct"))
      .drop("__pct", "__bucket")
  }

  /** Deterministic global shuffle + shard layout — the export step that
    * turns a curated corpus into training shards. Every document gets
    * (shard, seq): shard = h64(id) mod `nShards`, seq = the document's
    * rank by (h64(id), id) within its shard. Both are pure functions of
    * row identity, so the training order is reproducible across engines,
    * partitionings and re-runs — the property `orderBy(rand())` shuffles
    * lack — and hash order is corpus order-free, so adjacent source
    * documents (same crawl host, same book) land far apart: the
    * decorrelation a global shuffle exists to provide.
    *
    * Scale: one shuffle on the shard key + a per-shard sort — exactly the
    * exchange+sort a writer needs anyway ([[writeShards]] runs the same
    * layout as `repartition(shard).sortWithinPartitions`). The window
    * partitions on `shard`, whose population is corpus/nShards by hash
    * uniformity — sized to the target output file, not to a skewed key.
    */
  def shardPlan(df: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = TextOps.h64c(col(idCol).cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", col("__h") % nShards)
      .withColumn("n_tokens",
        size(split(lower(col(textCol)), " ")).cast("long"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("seq"), col("n_tokens"))
  }

  /** Materialize [[shardPlan]]'s layout: one directory per shard, rows in
    * deterministic hash order within each shard file. The exchange is the
    * same one the plan's window needs, so the write adds no extra shuffle.
    */
  def writeShards(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, outPath: String): Unit = {
    val h = TextOps.h64c(col(idCol).cast("string"))
    df.withColumn("__h", h)
      .withColumn("shard", col("__h") % nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), col(idCol))
      .drop("__h")
      .write.mode("overwrite").partitionBy("shard").parquet(outPath)
  }

  /** Curriculum-ordered export: [[shardPlan]]'s deterministic shard
    * layout, but within-shard order is (quality bin DESC, hash, id) —
    * every shard streams its highest-quality documents first, the
    * easy-to-hard schedule curriculum training wants, while hash order
    * inside each bin keeps the decorrelation of the global shuffle.
    * The heuristic quality score quantizes to `nBins` integer levels
    * (floor(q·nBins) — one extra IEEE multiply on an already
    * engine-exact score) so the ordering key is reproducible anywhere.
    * Expects the standard `text` column ([[TextOps.qualityScore]]'s
    * contract). Same single exchange + per-shard sort as the plain plan.
    */
  def curriculumPlan(df: DataFrame, idCol: String, nShards: Int,
      nBins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("q_bin").desc, col("__h"), col(idCol))
    df.withColumn("ws", TextOps.words("text"))
      // clamp: a document scoring exactly 1.0 would otherwise land in an
      // nBins+1-th bin (floor(1.0 * nBins) = nBins); q_bin is 0..nBins-1
      .withColumn("q_bin", least(lit((nBins - 1).toLong),
        floor(TextOps.qualityScore * nBins).cast("long")))
      .withColumn("__h", TextOps.h64c(col(idCol).cast("string")))
      .withColumn("shard", col("__h") % nShards)
      .withColumn("n_tokens", size(col("ws")).cast("long"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("q_bin"), col("seq"),
        col("n_tokens"))
  }

  // --- domain-mixing shared plumbing ---------------------------------
  // Both mixers must stay ORACLE-EXACT integer arithmetic; sharing the
  // tokenize/rate-cap/hash-gate steps keeps them from silently diverging.

  /** (docs + n_tokens, per-source token sums) — the two mixers' input. */
  private def mixTokens(df: DataFrame, textCol: String,
      srcCol: String): (DataFrame, DataFrame) = {
    val withTok = df.withColumn("n_tokens",
      size(split(lower(col(textCol)), " ")).cast("long"))
    val perSrc = withTok.groupBy(col(srcCol))
      .agg(sum(col("n_tokens")).as("__src_tokens"))
    (withTok, perSrc)
  }

  /** Target tokens for the source → acceptance rate in basis points —
    * integer floor division throughout, capped at keep-everything.
    * Expects `__total_tokens`, `__w_bp`, `__src_tokens` bound.
    */
  private def rateBpCol: Column = least(lit(10000L),
    expr("(__total_tokens * __w_bp div 10000) * 10000 div __src_tokens"))

  /** Broadcast the tiny rate table back and apply the deterministic
    * id-hash membership gate; `extra` columns ride along in the output.
    */
  private def applyMixGate(withTok: DataFrame, rates: DataFrame,
      idCol: String, srcCol: String, extra: Seq[Column]): DataFrame =
    withTok.join(broadcast(rates), Seq(srcCol))
      .withColumn("keep",
        TextOps.h64c(col(idCol).cast("string")) % 10000 < col("__rate_bp"))
      .select(Seq(col(idCol), col(srcCol), col("n_tokens")) ++ extra :+
        col("keep"): _*)

  /** Domain mixing: resample each source toward a TARGET TOKEN share of
    * the total budget (the static data-mixture step of corpus assembly).
    * `weightsBp` gives each source's target share in basis points of the
    * corpus's total token count; each source's acceptance rate is
    * `min(1, target_tokens / source_tokens)` quantized to basis points,
    * and membership is the deterministic id-hash gate. Sources absent
    * from the map default to `defaultBp`.
    *
    * Returns EVERY document with (source, n_tokens, keep) so acceptance
    * is auditable; filtering on `keep` is the caller's one-liner. All
    * rate arithmetic is integer (token sums, basis-point floor division),
    * so the mixture reproduces bit-exactly in any engine.
    *
    * Scale: two aggregates (per-source token sums — a handful of rows —
    * and their total), a broadcast join of that tiny rate table, then a
    * map-side hash predicate. The corpus never shuffles.
    */
  def domainMix(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, weightsBp: Map[String, Long],
      defaultBp: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (withTok, perSrc) = mixTokens(df, textCol, srcCol)
    val total = perSrc.agg(sum(col("__src_tokens")).as("__total_tokens"))
    val weights = weightsBp.toSeq.toDF(srcCol, "__w_bp")
    val rates = perSrc.crossJoin(broadcast(total))
      .join(broadcast(weights), Seq(srcCol), "left")
      .withColumn("__w_bp", coalesce(col("__w_bp"), lit(defaultBp)))
      .withColumn("__rate_bp", rateBpCol)
      .select(col(srcCol), col("__rate_bp"))
    applyMixGate(withTok, rates, idCol, srcCol, Seq.empty)
  }

  /** Temperature-scaled domain mixing (the α-sampling of mT5/XLM-R,
    * α = 0.5): target shares are DERIVED from the data — share_i ∝
    * √(tokens_i) — so token-poor sources are upweighted relative to their
    * natural share and token-rich heads are damped, without anyone
    * hand-writing a weights map. α is fixed at 0.5 because √ is the one
    * damping IEEE-754 guarantees correctly rounded (`pow(x, α)` for
    * arbitrary α is not), which keeps the mixture bit-reproducible across
    * engines: s_i = floor(√ tokens_i) as an exact integer, then every
    * downstream step is the same integer basis-point arithmetic as
    * [[domainMix]].
    *
    * Same audit contract and scale shape as [[domainMix]]: every doc
    * returned with (source, n_tokens, w_bp, keep); two tiny aggregates +
    * a broadcast rate join; the corpus never shuffles.
    */
  def domainMixTemperature(df: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame = {
    val (withTok, perSrc0) = mixTokens(df, textCol, srcCol)
    val perSrc = perSrc0.withColumn("__s",
      floor(sqrt(col("__src_tokens").cast("double"))).cast("long"))
    val totals = perSrc.agg(sum(col("__src_tokens")).as("__total_tokens"),
      sum(col("__s")).as("__s_sum"))
    val rates = perSrc.crossJoin(broadcast(totals))
      .withColumn("__w_bp", expr("__s * 10000 div __s_sum"))
      .withColumn("__rate_bp", rateBpCol)
      .select(col(srcCol), col("__w_bp"), col("__rate_bp"))
    applyMixGate(withTok, rates, idCol, srcCol,
      Seq(col("__w_bp").as("w_bp")))
  }

  /** Exact token-budget cut: documents stream in the deterministic
    * (h64(id), id) hash order and are kept while the cumulative token
    * count stays under `budget` — the "give me exactly N training
    * tokens" sampler, where a percentage gate can only approximate.
    * The document that crosses the budget boundary is kept (its START
    * offset is inside the budget); everything after it drops. Returns
    * every row with (n_tokens, cum_tokens, keep) so the cut is
    * auditable.
    *
    * Scale: a naive global running sum is one unpartitioned window — a
    * single-task straggler on the whole corpus. Instead the hash order
    * decomposes into 2¹⁰ RANGE buckets on the h64 prefix (`h >> 50` is
    * monotonic in h, so per-bucket order concatenates to the global
    * order): per-bucket token totals (1024 rows) fold into per-bucket
    * START OFFSETS with one tiny window, broadcast back, and the
    * per-bucket running sum windows partition on the bucket key — every
    * task sums ~corpus/1024, none sums the corpus.
    */
  def tokenBudget(df: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withTok = df
      .withColumn("__h", TextOps.h64c(col(idCol).cast("string")))
      .withColumn("n_tokens",
        size(split(lower(col(textCol)), " ")).cast("long"))
      .withColumn("__b", expr(s"__h div ${1L << 50}"))
    // 1024-row frame: running offset of every bucket = Σ earlier buckets
    val offsets = withTok.groupBy(col("__b"))
      .agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__off", coalesce(
        sum(col("__bt")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withTok.join(broadcast(offsets), Seq("__b"))
      .withColumn("cum_tokens", col("__off") + sum(col("n_tokens")).over(w))
      .select(col(idCol), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") - col("n_tokens") < budget).as("keep"))
  }

  /** Per-group exact token-budget cut — [[tokenBudget]] with an
    * independent budget per group (domain, source, language): within
    * each group, documents stream in the deterministic (h64(id), id)
    * order and are kept while the group's cumulative token count stays
    * under that group's budget (boundary doc kept, same rule). This is
    * the "exactly N tokens per domain" sampler a domain-mix plan
    * compiles down to. `budgets` is a (groupCol, budget) frame.
    *
    * Scale: the same 2¹⁰ hash-prefix range-bucket decomposition, now
    * keyed (group, bucket): per-(group,bucket) totals fold into bucket
    * start offsets with a window partitioned BY GROUP over ≤1024 rows
    * each (high-cardinality partition key — no straggler even with
    * millions of domains), and the running sums partition on
    * (group, bucket) so the biggest window task holds ~|group|/1024
    * rows. A mega-domain never serializes through one task — the exact
    * failure `perDomainCap`'s top-k agg retired, solved the same way.
    * The offsets join is a plain equi-join on (group, bucket) — it
    * scales with domain count, so it is NOT broadcast; `budgets` is
    * domain-count-sized and joins the same way.
    */
  /** Exact top-p% cut by a double score column — "keep the best fifth
    * of the corpus", with the threshold computed EXACTLY and without a
    * global sort: scores micro-quantize to BIGINT (floor(score·10⁶) —
    * the same quantize-before-rank recipe every ranking row uses), a
    * score HISTOGRAM aggregates map-side (≤ ~10⁶+1 rows regardless of
    * corpus size), and the threshold is the k-th largest quantized score
    * read off the histogram's descending cumulative counts
    * (k = ⌈N·pct/100⌉). Ties AT the threshold are kept (the cut is a
    * pure function of the score, never of row order), so `n ≥ k` rows
    * survive; the keep flag and threshold are returned for audit.
    *
    * Scale: two aggregations (per-score-bucket counts, then one total)
    * and the tokenBudget two-level fold over the histogram — the
    * descending cumulative decomposes into 1024-wide coarse buckets
    * (`score_micro >> 10`, arithmetic shift so negative scores floor
    * consistently; monotonic in the score, so per-bucket desc order
    * concatenates to the global desc order): per-bucket totals fold into
    * bucket start offsets with one tiny window over the ≤ ~10³-row
    * bucket frame, and the per-score running sums partition ON the
    * coarse bucket — no task ever window-sorts the whole 10⁶-row
    * histogram. One broadcast threshold join; the corpus is scanned
    * twice (histogram + flag) and never sorted or shuffled by score.
    */
  def qualityCut(df: DataFrame, idCol: String, scoreCol: String,
      pct: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pct > 0 && pct <= 100, s"pct must be in (0,100], got $pct")
    // both the histogram scan and the flag scan need only (id, score);
    // one 2-column materialization means the caller's score expression
    // (typically a regex-heavy quality formula) is evaluated exactly
    // once instead of twice (the 500k-doc lane measured the second
    // evaluation as the dominant per-row cost — PLANS.md)
    val quant = df.select(col(idCol), col(scoreCol))
      .withColumn("score_micro",
        floor(col(scoreCol) * lit(1000000.0)).cast("long"))
      .drop(scoreCol)
      .localCheckpoint()
    val hist = quant.groupBy(col("score_micro"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cb", shiftright(col("score_micro"), 10))
    val n = hist.agg(sum(col("__c")).as("__n"))
    // bucket offsets: Σ counts of strictly-HIGHER coarse buckets
    val offsets = hist.groupBy(col("__cb"))
      .agg(sum(col("__c")).as("__bt"))
      .withColumn("__boff", coalesce(
        sum(col("__bt")).over(Window.orderBy(col("__cb").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__cb"), col("__boff"))
    val wb = Window.partitionBy(col("__cb")).orderBy(col("score_micro").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.join(broadcast(offsets), Seq("__cb"))
      .withColumn("__cum", col("__boff") + sum(col("__c")).over(wb))
      .crossJoin(broadcast(n))
      // k-th largest quantized score, k = ceil(n * pct / 100) in integers
      .filter(col("__cum") >= expr(s"(__n * $pct + 99) DIV 100"))
      .agg(max(col("score_micro")).as("threshold"))
    quant.crossJoin(broadcast(cum))
      .select(col(idCol), col("score_micro"), col("threshold"),
        (col("score_micro") >= col("threshold")).as("keep"))
  }

  def tokenBudgetPerGroup(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, budgets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withTok = df
      .withColumn("__h", TextOps.h64c(col(idCol).cast("string")))
      .withColumn("n_tokens",
        size(split(lower(col(textCol)), " ")).cast("long"))
      .withColumn("__b", expr(s"__h div ${1L << 50}"))
    val offsets = withTok.groupBy(col(groupCol), col("__b"))
      .agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__off", coalesce(
        sum(col("__bt")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("__b"), col("__off"))
    val w = Window.partitionBy(col(groupCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withTok.join(offsets, Seq(groupCol, "__b"))
      .join(budgets, Seq(groupCol))
      .withColumn("cum_tokens", col("__off") + sum(col("n_tokens")).over(w))
      .select(col(groupCol), col(idCol), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") - col("n_tokens") < col("budget")).as("keep"))
  }

  /** Systematic PPS (probability-proportional-to-size) sampling: lay
    * the corpus out on an integer weight line in the deterministic
    * (h64(id), id) order, drop `n` evenly spaced pointers (spacing W/n,
    * a salted offset), and select every document whose weight interval
    * contains a pointer. Exactly `n` pointer hits total (Σ n_hits = n —
    * spec-pinned), selection probability ∝ weight, and any document
    * with weight ≥ W/n is ALWAYS selected (possibly with n_hits > 1 —
    * the multiplicity a Horvitz–Thompson estimator weights by). The
    * "sample 1M docs proportional to token count" primitive of survey
    * sampling, with zero randomness beyond the salt: any engine
    * reproduces the exact sample.
    *
    * Scale: the weight line is the SAME 2¹⁰ hash-prefix bucketed cumsum
    * as [[tokenBudget]] (no global window); per-document pointer hits
    * are counted by INVERTING the pointer arithmetic — j ranges over
    * `ceil(x·n/W) .. ceil(y·n/W)−1` — so no document ever scans the
    * pointer set. All arithmetic is exact BIGINT; the x·n products
    * bound the domain to W·n < 2^63 (a 10^13-token corpus sampling 10^5
    * docs — beyond that, split the multiply or sample per shard and
    * merge).
    *
    * Non-positive weights are excluded (they have no mass on the line).
    */
  def ppsSample(df: DataFrame, idCol: String, weightCol: String,
      n: Long, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "n must be positive")
    val withW = df
      .withColumn("__h", TextOps.h64c(col(idCol).cast("string")))
      .withColumn("weight", col(weightCol).cast("long"))
      .filter(col("weight") > 0)
      .withColumn("__b", expr(s"__h div ${1L << 50}"))
    val offsets = withW.groupBy(col("__b"))
      .agg(sum(col("weight")).as("__bt"))
      .withColumn("__off", coalesce(
        sum(col("__bt")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withW.join(broadcast(offsets), Seq("__b"))
      .withColumn("__end", col("__off") + sum(col("weight")).over(w))
      .withColumn("__start", col("__end") - col("weight"))
      // two consumers (the W total and the final projection) would each
      // re-run the scan + both window passes
      .localCheckpoint()
    val tot = cum.agg(max(col("__end")).as("__tw"))
      .withColumn("__offp",
        TextOps.h64c(lit(salt)) % greatest(expr(s"__tw div $n"), lit(1L)))
    cum.crossJoin(broadcast(tot))
      // pointer j sits at __offp + (j·W) div n; hits in [start, end) ⇔
      // j ∈ [ceil(x·n/W), ceil(y·n/W)) with x/y the offset-shifted bounds
      .withColumn("__x", greatest(col("__start") - col("__offp"), lit(0L)))
      .withColumn("__y", col("__end") - col("__offp"))
      .withColumn("__jlo", expr("(__x * " + n + " + __tw - 1) div __tw"))
      .withColumn("__jhi", expr(
        s"least((__y * $n + __tw - 1) div __tw - 1, ${n - 1})"))
      .withColumn("n_hits",
        when(col("__y") <= 0, lit(0L))
          .otherwise(greatest(col("__jhi") - col("__jlo") + 1, lit(0L))))
      .select(col(idCol), col("weight"), col("n_hits"),
        (col("n_hits") > 0).as("selected"))
  }

  /** Epoch/repeat-factor mixture plan — "given a total token budget and
    * per-source mixture weights, how many EPOCHS of each source does the
    * run consume, and where does supply run out": per source,
    * `target = budget · weight_bp div 10000` (weights in basis points),
    * `epochs_micro = min(cap, target·10⁶ div n_tokens)` (millionths of an
    * epoch — exact integer, no float ratio),
    * `planned = min(target, n_tokens · cap div 10⁶)` and
    * `deficit = target − planned` (> 0 ⟺ the repeat cap bites — the
    * under-supplied source a mixture designer rebalances around). An
    * empty source pins epochs 0 / planned 0 rather than dividing by zero.
    *
    * Scale: one per-source token aggregation (map-side partial) + a
    * plain equi-join against the domain-count-sized weights frame +
    * pure column arithmetic — nothing global, nothing collected.
    */
  def epochPlan(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, weights: DataFrame, budgetTokens: Long,
      maxEpochsMicro: Long = 10000000L): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochsMicro > 0, "maxEpochsMicro must be positive")
    df.withColumn("__t",
        size(split(lower(col(textCol)), " ")).cast("long"))
      .groupBy(col(groupCol))
      .agg(sum(col("__t")).as("n_tokens"))
      // right-join on weights: a weights-listed source with ZERO documents
      // must still appear in the plan (epochs 0, deficit = target) — that
      // fully-missing source is exactly the under-supplied case the
      // deficit column exists to surface
      .join(weights, Seq(groupCol), "right")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("target_tokens",
        expr(s"$budgetTokens * weight_bp div 10000"))
      .withColumn("epochs_micro",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(least(lit(maxEpochsMicro),
            expr("target_tokens * 1000000 div n_tokens"))))
      .withColumn("planned_tokens",
        least(col("target_tokens"),
          expr(s"n_tokens * $maxEpochsMicro div 1000000")))
      .withColumn("deficit", col("target_tokens") - col("planned_tokens"))
      .select(col(groupCol), col("n_tokens"), col("weight_bp"),
        col("target_tokens"), col("epochs_micro"), col("planned_tokens"),
        col("deficit"))
  }

  /** DSIR-style hashed-feature importance reweighting (the published
    * data-selection recipe: score raw documents by how target-like their
    * hashed n-gram distribution is — Xie et al.'s "Data Selection for
    * Language Models via Importance Resampling" — re-expressed under
    * this engine's exact-integer contract):
    *
    *  - features: non-empty lowercased whitespace tokens (plus, with
    *    `bigrams = true`, the adjacent-pair strings of the filtered
    *    sequence — the published recipe's unigram+bigram feature set),
    *    feature-hashed into `buckets` cells with the house md5→60-bit
    *    hash ([[graft.llm.TextOps.h64]]) — any engine replays the
    *    bucketing.
    *  - the bucket census splits token occurrences into TARGET (the
    *    caller's predicate column — e.g. a trusted/high-quality slice)
    *    vs RAW counts; Laplace-smoothed with +1 per bucket / +buckets
    *    per total, so empty cells stay finite.
    *  - per-bucket BIT-RESOLUTION log-likelihood ratio:
    *    `llr_b = ilog2((tgt_b+1)·(Rraw+B)) − ilog2((raw_b+1)·(Rtgt+B))`
    *    with `ilog2(n) = length(bin(n)) − 1` (floor log2 via the binary
    *    string — Spark `bin` and DuckDB `bin` agree; NO floating-point
    *    logarithm, whose last-ulp engine differences would break the
    *    hash gate). One-bit resolution in the exponent domain is the
    *    documented contract: importance ratios that matter span orders
    *    of magnitude, and the weight is Σ over hundreds of tokens, so
    *    sub-bit precision is noise.
    *  - document weight `imp_bits = Σ_b c_{doc,b} · llr_b` — the
    *    integer analogue of DSIR's summed log ratios.
    *
    * Scale: ONE corpus scan builds the (doc, bucket, c) grid (a
    * localCheckpoint feeds both consumers — the multi-consumer-recompute
    * trap measured at 500k docs, PLANS.md); the bucket census collapses
    * to `buckets` rows, so the llr table BROADCASTS at any corpus size;
    * the per-doc fold is one key-equi join + partial-agg sum. Nothing
    * global, nothing collected.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetCol: Column, buckets: Int = 1024,
      bigrams: Boolean = false): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // positions come from the FILTERED token sequence, so a bigram spans
    // adjacent real words even across collapsed whitespace; posexplode of
    // the filtered array runs the HOF once per row (an element_at over a
    // projection-chained array would inline the split per element — the
    // O(len²) lambda trap)
    // NULL target predicate counts as RAW (coalesce to false): the oracle's
    // `CASE WHEN tgt THEN .. ELSE c END` sends a NULL predicate to ELSE, and
    // without the coalesce the when(!__t) census counted such a row in
    // NEITHER column — latent (corpora never produce NULL lang) but a
    // Spark-vs-oracle divergence the moment one did
    val toks = df.select(col(idCol), coalesce(targetCol, lit(false)).as("__t"),
      posexplode(expr(
        s"filter(split(lower($textCol), ' '), w -> length(w) > 0)"))
        .as(Seq("__p", "__w")))
    val features =
      if (!bigrams) toks.select(col(idCol), col("__t"), col("__w"))
      else {
        // DSIR's unigram+bigram feature set: adjacent-pair strings via
        // lead() per document (docs are bounded-length — the per-doc
        // window sort is tiny and keys never skew)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col(idCol)).orderBy(col("__p"))
        val bg = toks
          .withColumn("__w2",
            concat(col("__w"), lit(" "), lead(col("__w"), 1).over(w)))
          .filter(col("__w2").isNotNull)
          .select(col(idCol), col("__t"), col("__w2").as("__w"))
        toks.select(col(idCol), col("__t"), col("__w")).unionByName(bg)
      }
    val grid = features
      .withColumn("__b", pmod(TextOps.h64c(col("__w")), lit(buckets.toLong)))
      .groupBy(col(idCol), col("__t"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val census = grid.groupBy(col("__b")).agg(
      sum(when(col("__t"), col("__c")).otherwise(0L)).as("__tgt"),
      sum(when(!col("__t"), col("__c")).otherwise(0L)).as("__raw"))
    val tot = census.agg(sum(col("__tgt")).as("__rt"), sum(col("__raw")).as("__rr"))
    def ilog2(e: Column): Column = (length(bin(e)) - 1).cast("long")
    val llr = census.crossJoin(broadcast(tot))
      .select(col("__b"),
        (ilog2((col("__tgt") + 1) * (col("__rr") + buckets)) -
          ilog2((col("__raw") + 1) * (col("__rt") + buckets))).as("__llr"))
    grid.join(broadcast(llr), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * col("__llr")).as("imp_bits"))
  }

  /** Cross-source score calibration by quantile mapping: each source's
    * score distribution is mapped onto the POOLED corpus distribution, so
    * "top decile of source A" and "top decile of source B" become
    * comparable numbers even when the sources' raw score scales differ
    * (the classic quantile-normalization move before a global quality
    * cut or curriculum order mixes heterogeneous feeds).
    *
    * Exact-integer law, deterministic under ties:
    *  - within-source MIN-rank `r = 1 + #{strictly smaller scores in
    *    the source}` (ties share a rank — calibration is a pure function
    *    of (source, score), never of row order);
    *  - mapped pooled position via MID-rank (ties map to the middle of
    *    their pooled span): `p = ((2·(r−1) + ce − 1)·N) quot (2·n_s) + 1
    *    ∈ [1, N]` with `ce` the tie-block size — min-rank mapping sent an
    *    all-tied source to the global MINIMUM; the [[calibrationKs]]
    *    gate caught it (0.49 → 0.10 max CDF gap at sf0.01). Overflow:
    *    2·N² must fit a long → N < 2·10⁹ (pre-divide beyond);
    *  - calibrated score = the pooled score whose ascending cumulative
    *    count range covers p (`gcum_prev < p ≤ gcum`).
    *
    * Scale shape: everything ranks over HISTOGRAMS, never rows. The
    * per-(source, score) census and the pooled census aggregate map-side
    * to score-grid cardinality (≤ 10⁶+1 for micro-quantized scores); both
    * cumulative sums use the two-level `score >> 10` coarse-bucket fold
    * (the qualityCut/tokenBudget recipe — no task ever window-sorts a
    * full histogram, and per-source partitions decompose by (source,
    * bucket) so a mega-source never serializes through one task). The
    * pooled-position lookup is a bucketized rank-space range join
    * ([[graft.core.RangeJoin]], W = 16): near-unique micro scores make
    * the cumulative frame corpus-sized, so a broadcast non-equi join
    * would be a quadratic BroadcastNestedLoopJoin (caught at 500k docs
    * by the scale lane — PLANS.md); every corpus-sized join here is
    * key-equi. `scoreCol` must be integral (micro-quantize doubles
    * first).
    */
  def calibrateScores(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // four census branches + the result join would each re-evaluate the
    // caller's score expression over the full corpus (scores are usually
    // regex-heavy quality formulas — measured 6 redundant scans at 500k
    // docs, PLANS.md); one 3-column materialization feeds every branch
    // AND supplies the returned rows, so the corpus is scored exactly once
    val slim = df.select(col(idCol), col(groupCol), col(scoreCol))
      .localCheckpoint()
    // per-(group, score) census + two-level within-group min-rank
    val hist = slim.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cb", shiftright(col(scoreCol), 10))
    val boff = hist.groupBy(col(groupCol), col("__cb"))
      .agg(sum(col("__c")).as("__bt"))
      .withColumn("__boff", coalesce(
        sum(col("__bt")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("__cb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("__cb"), col("__boff"))
    val wInner = Window.partitionBy(col(groupCol), col("__cb"))
      .orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist.join(boff, Seq(groupCol, "__cb"))
      .withColumn("src_rank",
        col("__boff") + coalesce(sum(col("__c")).over(wInner), lit(0L)) + 1L)
    // pooled census + two-level ascending cumulative intervals
    val gh = slim.groupBy(col(scoreCol).as("__gs"))
      .agg(count(lit(1)).as("__gc"))
      .withColumn("__gb", shiftright(col("__gs"), 10))
    val goff = gh.groupBy(col("__gb")).agg(sum(col("__gc")).as("__gt"))
      .withColumn("__goff", coalesce(
        sum(col("__gt")).over(Window.orderBy(col("__gb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gb"), col("__goff"))
    val wg = Window.partitionBy(col("__gb")).orderBy(col("__gs"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gcum = gh.join(broadcast(goff), Seq("__gb"))
      .withColumn("__gcum", col("__goff") + sum(col("__gc")).over(wg))
      .withColumn("__gprev", col("__gcum") - col("__gc"))
      .select(col("__gs"), col("__gprev"), col("__gcum"))
    val ns = slim.groupBy(col(groupCol)).agg(count(lit(1)).as("__ns"))
    val nTot = slim.agg(count(lit(1)).as("__n"))
    val mapped = ranked.join(ns, Seq(groupCol)).crossJoin(broadcast(nTot))
      .withColumn("mapped_rank",
        // MID-rank mapping: a tie block of ce rows maps to the middle of
        // its pooled span, not its first position — min-rank sent whole
        // tie blocks to the pooled MINIMUM of the block (an all-tied
        // source calibrated to the global min!); the calibrationKs gate
        // measured that as a 0.49 CDF gap vs midrank's 0.10 at sf0.01.
        // cs = src_rank − 1 strictly-smaller rows, ce = __c tie size.
        expr("((2 * (src_rank - 1) + __c - 1) * __n) div (2 * __ns) + 1"))
    // pooled value at position p: a rank-space INTERVAL lookup. With
    // near-unique scores the pooled cumulative frame is corpus-sized, so
    // a broadcast non-equi join would be a BroadcastNestedLoopJoin —
    // O(combos × intervals), measured quadratic at 500k docs (PLANS.md).
    // The bucketized range join keeps it linear: intervals explode onto a
    // 16-rank grid (a tie-block spanning many cells distributes across
    // them — no straggler even on a degenerate all-one-score corpus) and
    // the lookup is a plain shuffled equi-join on the cell id.
    val calib = graft.core.RangeJoin.pointInInterval(
        mapped, "mapped_rank",
        gcum.select(col("__gs"), (col("__gprev") + 1).as("__lo"),
          (col("__gcum") + 1).as("__hi")),
        "__lo", "__hi", bucketWidth = 16L)
      .select(col(groupCol), col(scoreCol), col("src_rank"),
        col("mapped_rank"), col("__gs").as("calib_micro"))
    // per-record result off the checkpointed frame — join back to the
    // caller's df by idCol when other columns are needed
    slim.join(calib, Seq(groupCol, scoreCol))
  }

  /** Calibration-effect gate: the exact integer KS-style statistic
    * between each source's CALIBRATED distribution and the pooled raw
    * distribution — `ks_scaled = max_v |cum_s(v)·N − gcum(v)·n_s|`, the
    * cross-multiplied form of `max |F_s(v) − F(v)|` (no division until
    * the one reported micro ratio). A perfect quantile map tracks the
    * pooled CDF within TIE granularity — the residual gap is bounded by
    * the largest pooled tie-block share, not 1/n_s — so per-source
    * `ks_micro = 1e6·ks quot (n_s·N)` is the "did calibration actually
    * align the feeds" audit, the analogue of the ANN recall gates (it
    * caught min-rank mapping collapsing tied sources to the pooled
    * minimum: 0.49 vs midrank's 0.10 at sf0.01). Overflow: cum·N ≤ N²,
    * fine while N < 3·10⁹ (beyond that, pre-divide both cums by 2^k).
    *
    * Scale: calibrated rows → per-(source, value) census → keyed
    * two-level cumulative (same fold family as the calibration itself);
    * the pooled cum joins by VALUE (calibrated values are pooled values
    * by construction), one row per source out.
    */
  def calibrationKs(calibrated: DataFrame, groupCol: String,
      calibCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = calibrated.groupBy(col(groupCol), col(calibCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cb", shiftright(col("__v"), 10))
      .localCheckpoint() // feeds the keyed cum, the pooled cum and ns
    val boff = hist.groupBy(col(groupCol), col("__cb"))
      .agg(sum(col("__c")).as("__bt"))
      .withColumn("__boff", coalesce(
        sum(col("__bt")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("__cb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("__cb"), col("__boff"))
    val cums = hist.join(boff, Seq(groupCol, "__cb"))
      .withColumn("__cum", col("__boff") + sum(col("__c")).over(
        Window.partitionBy(col(groupCol), col("__cb")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col(groupCol), col("__v"), col("__cum"))
    // pooled cum over the SAME calibrated values (two-level, unkeyed)
    val gh = hist.groupBy(col("__v")).agg(sum(col("__c")).as("__gc"))
      .withColumn("__gb", shiftright(col("__v"), 10))
    val goff = gh.groupBy(col("__gb")).agg(sum(col("__gc")).as("__gt"))
      .withColumn("__goff", coalesce(
        sum(col("__gt")).over(Window.orderBy(col("__gb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gb"), col("__goff"))
    val gcum = gh.join(broadcast(goff), Seq("__gb"))
      .withColumn("__gcum", col("__goff") + sum(col("__gc")).over(
        Window.partitionBy(col("__gb")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("__v"), col("__gcum"))
    val ns = hist.groupBy(col(groupCol)).agg(sum(col("__c")).as("n_s"))
    val nTot = hist.agg(sum(col("__c")).as("__n"))
    cums.join(gcum, Seq("__v")).join(ns, Seq(groupCol))
      .crossJoin(broadcast(nTot))
      .withColumn("__gap",
        abs(col("__cum") * col("__n") - col("__gcum") * col("n_s")))
      .groupBy(col(groupCol), col("n_s"), col("__n"))
      .agg(max(col("__gap")).as("ks_scaled"))
      .withColumn("ks_micro",
        expr("ks_scaled * 1000000 div (n_s * __n)"))
      .select(col(groupCol), col("n_s"), col("ks_scaled"), col("ks_micro"))
  }
}
