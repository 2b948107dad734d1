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

  /** The test-data generator has shipped `events.ts` under two parquet
    * encodings across rounds: INT64 TIMESTAMP(NANOS) (which Spark's
    * schema conversion rejects outright, so it must be read as plain
    * LONG under a forced schema) and plain TIMESTAMP micros (which reads
    * natively). Probe the footer once — schema inference throws on the
    * nanos form, distinguishing the two without reading any data — and
    * normalize either to the same caller-facing shape.
    */
  private val tsEncodingCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[graft] def tsIsTimestamp(spark: SparkSession, sfDir: String): Boolean =
    // memoized per path — the encoding of a given dir never changes
    // mid-run, and the probe costs a file listing + footer read
    tsEncodingCache.computeIfAbsent(s"$sfDir/events.parquet", path =>
      // only the EXPECTED failure (schema conversion rejecting the legacy
      // INT64 TIMESTAMP(NANOS) form) maps to false; fatal errors propagate
      try spark.read.parquet(path).schema
        .find(_.name == "ts").exists(_.dataType.typeName.startsWith("timestamp"))
      catch { case scala.util.control.NonFatal(_) => false })

  /** Events with `ts_ns` (epoch nanos LONG — exact, integer-div friendly)
    * and `ts` (proper TIMESTAMP) regardless of the on-disk encoding.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = s"$sfDir/events.parquet"
    if (tsIsTimestamp(spark, sfDir))
      // native micros: force TIMESTAMP (not the inferred NTZ) so
      // unix_micros reads the stored epoch value directly — no session-tz
      // math anywhere; ts_ns = micros * 1000 keeps every downstream
      // `ts_ns div 1000` call site exact (micros ~1.7e15 → no overflow)
      spark.read
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(path)
        .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
        .select(col("event_id"), col("ts_ns"), col("user_id"),
          col("event_type"), col("value"), col("props"), col("ts"))
    else
      spark.read
        .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(path)
        .withColumnRenamed("ts", "ts_ns")
        // integer `div`, NOT `/`: epoch nanos exceed 2^53, so float
        // division loses up to ~0.13 us and can flip boundary rows into
        // the wrong window bucket
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Streaming source over the events table with the same encoding
    * normalization as [[events]]: emits `ts` TIMESTAMP + `ts_us` LONG
    * (epoch micros). File-stream sources need an explicit schema, so the
    * footer probe picks which one to force.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    if (tsIsTimestamp(spark, sfDir))
      spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .withColumn("ts_us", expr("unix_micros(ts)"))
    else
      spark.readStream
        .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
