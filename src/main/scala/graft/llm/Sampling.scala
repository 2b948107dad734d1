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
}
