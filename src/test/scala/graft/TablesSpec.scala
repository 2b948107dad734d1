package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events table has shipped under two parquet encodings across
  * test-data generations: INT64 TIMESTAMP(NANOS) (rounds 1-7) and native
  * TIMESTAMP micros (round 8+). [[Tables.events]] must normalize BOTH to
  * the same caller-facing (ts TIMESTAMP, ts_ns LONG) shape — this spec
  * drives each branch against a real file of its encoding.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val nanosDir = "src/test/resources/events_nanos"
  val microsDir = "/root/testdata/sf0.001"

  test("footer probe distinguishes the two on-disk ts encodings") {
    assert(!Tables.tsIsTimestamp(spark, nanosDir))
    assert(Tables.tsIsTimestamp(spark, microsDir))
  }

  test("legacy INT64-nanos branch: ts_ns is the raw stored nanos") {
    val rows = Tables.events(spark, nanosDir)
      .select(col("event_id"), col("ts_ns"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(
      1L -> 1704067200000000000L,
      2L -> 1704067260500000000L,
      3L -> 1704070000123456789L))
  }

  test("native micros branch: ts_ns = micros * 1000, consistent with an unforced read") {
    val viaTables = Tables.events(spark, microsDir)
      .select(col("event_id"), col("ts_ns")).limit(50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent read: schema inference (TIMESTAMP_NTZ) + wall-clock
    // micros since epoch — must equal the forced-TIMESTAMP read's
    // unix_micros because the stored INT64 is the same either way
    val independent = spark.read.parquet(s"$microsDir/events.parquet")
      .select(col("event_id"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) * 1000")
          .as("ns"))
      .limit(50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaTables.foreach { case (id, ns) =>
      assert(independent(id) == ns, s"event $id: $ns != ${independent(id)}")
    }
    // and every ts_ns is micros-resolution (the *1000 derivation)
    assert(viaTables.values.forall(_ % 1000 == 0))
  }

  test("streaming source matches the batch normalization (micros encoding)") {
    import org.apache.spark.sql.streaming.Trigger
    val q = Tables.eventsStream(spark, microsDir)
      .select(col("event_id"), col("ts_us"))
      .writeStream.format("memory").queryName("tables_spec_events")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("tables_spec_events")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, microsDir)
      .select(col("event_id"), expr("ts_ns div 1000"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
