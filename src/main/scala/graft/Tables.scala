package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the harness's TPC-H-ish synthetic parquet tables.
  *
  * All engine operators take DataFrames; this is just the parquet glue.
  * At cluster scale the same reads work unchanged — parquet scans get
  * column pruning + predicate pushdown from Catalyst, and
  * `spark.sql.files.maxPartitionBytes` controls scan parallelism.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects outright (even when pruned away) unless given an
    * explicit schema. Read nanos as plain LONG and derive a proper
    * timestamp column — timestamp_micros(ts_ns div 1000) — for callers.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      // integer `div`, NOT `/`: epoch nanos exceed 2^53, so float division
      // loses up to ~0.13 us and can flip boundary rows into the wrong
      // window bucket
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
