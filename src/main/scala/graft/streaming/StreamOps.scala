package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming layer: the incremental flavors of the batch
  * operators — S2's streaming delimited scan, watermarked windowed
  * aggregation, and stateful first-wins dedup (P8's streaming analogue via
  * `mapGroupsWithState`).
  *
  * The reference's streaming is manual backpressure over files
  * (drugbank/index.js:279-333, cancerhotspots/index.js:282-333) plus
  * `--days` incremental re-pulls (clinicaltrialsgov/index.js:301-311);
  * Structured Streaming subsumes both: file sources feed micro-batches,
  * `Trigger.AvailableNow` gives the catch-up-then-stop batch mode, and
  * watermarks bound state for continuous runs.
  *
  * Scale: file-source listing is incremental; stateful ops shuffle on the
  * grouping key once per micro-batch and state is per-key in the state
  * store — the same partitioning discipline as the batch path.
  */
object StreamOps {

  /** S2 — streaming delimited scan: same options as Scans.delim (header,
    * quote/escape disabled); schema is mandatory for streams.
    */
  def streamDelim(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      sep: String = "\t"): DataFrame =
    spark.readStream
      .schema(schema)
      .option("sep", sep)
      .option("header", true)
      .option("quote", "\u0000")
      .option("escape", "\u0000")
      .csv(dir)

  /** Watermarked tumbling-window aggregation over an event-time column:
    * count + sum per (window, key). Late data beyond the watermark is
    * dropped (state stays bounded).
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowLen: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n_events"), col("total_value"))

  case class Keyed(key: String, payload: String)
  case class FirstSeen(key: String, payload: String)

  /** P8-streaming — first-wins dedup across micro-batches with explicit
    * per-key state: the first payload for a key is emitted once; later
    * occurrences are dropped. State never expires here (NoTimeout) —
    * [[firstWinsExpiring]] is the bounded-state variant for continuous
    * ingest.
    */
  def firstWins(input: Dataset[Keyed]): Dataset[FirstSeen] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.key)
      .mapGroupsWithState[String, Option[FirstSeen]](GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[String]) =>
          if (state.exists) None
          else {
            val first = rows.next()
            state.update(first.payload)
            Some(FirstSeen(key, first.payload))
          }
      }
      .flatMap(_.iterator)
  }

  case class Event(user_id: Long, ts: Long, event_id: Long, event_type: String)
  case class FirstEvent(user_id: Long, first_ts: Long, first_event_id: Long,
      first_event_type: String)

  /** Deterministic stateful reduction: the EARLIEST event per key by
    * (event time, event id) — unlike arrival-order first-wins, the result
    * is independent of micro-batch boundaries and iterator order, so it
    * can be verified against an exact SQL oracle. State holds one row per
    * key (the current minimum) and each micro-batch folds into it; with
    * Update output the sink sees a key again only when a new batch
    * improves its minimum.
    *
    * Scale: state is O(keys) with a fixed-size value; the shuffle is the
    * one stateful exchange per micro-batch on the grouping key. For
    * continuous deployment, [[firstEventPerKeyExpiring]] retires keys
    * past the watermark so state stays O(active keys).
    */
  def firstEventPerKey(input: Dataset[Event]): Dataset[FirstEvent] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.user_id)
      // flatMap (not map): a batch whose events don't improve the key's
      // minimum must emit NOTHING — re-emitting unchanged state would put
      // one row per (key, touching batch) into an update-mode sink
      .flatMapGroupsWithState[FirstEvent, FirstEvent](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid, rows, state: GroupState[FirstEvent]) =>
          val m = rows.minBy(e => (e.ts, e.event_id))
          val improved = state.getOption match {
            case Some(c) if c.first_ts < m.ts ||
              (c.first_ts == m.ts && c.first_event_id <= m.event_id) => None
            case _ => Some(FirstEvent(uid, m.ts, m.event_id, m.event_type))
          }
          improved.foreach(state.update)
          improved.iterator
      }
  }

  case class KeyMin(key: Long, min_id: Long)

  /** Deterministic streaming min-fold: the smallest id per key across all
    * micro-batches — the stateful core of streaming ingest DEDUP (key =
    * content hash, id = doc id: the first-crawled copy wins, re-crawls
    * drop). Same update-mode improvement contract as
    * [[firstEventPerKey]]: a batch that doesn't improve a key's minimum
    * emits nothing, so the result is independent of micro-batch
    * boundaries and arrival order — exactly SQL `min(id) GROUP BY key`,
    * hence oracle-checkable. State is one long per key; a continuous
    * deployment runs the event-time-timeout variant
    * [[minIdPerKeyExpiring]].
    */
  def minIdPerKey(input: Dataset[(Long, Long)]): Dataset[KeyMin] = {
    import input.sparkSession.implicits._
    input.groupByKey(_._1)
      .flatMapGroupsWithState[Long, KeyMin](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Long]) =>
          val m = rows.map(_._2).min
          val improved = state.getOption match {
            case Some(c) if c <= m => None
            case _ => Some(KeyMin(key, m))
          }
          improved.foreach(km => state.update(km.min_id))
          improved.iterator
      }
  }

  case class HllSketchRow(key: String, n_occupied: Long, register_sum: Long)

  /** Streaming HLL distinct sketch per key — the sketch family meeting
    * stateful streaming: each key's state is its 512 one-byte registers
    * (CONSTANT per key regardless of stream length — the whole point;
    * exact streaming distinct would grow state with every new value),
    * updated per micro-batch with the SAME md5→60-bit split as the
    * batch [[graft.llm.Sketches]] (top 9 bits bucket, rank =
    * 52 − bitlen of the low 51), so the streaming registers are
    * bit-identical to the batch ones on the same data — spec-pinned.
    *
    * Emits the running (n_occupied, register_sum) per (key, batch) in
    * update mode; `register_sum` strictly DECREASES whenever any
    * register rises, so the final sketch is the row-wise
    * min(register_sum) per key — equal sums imply identical states,
    * making the fold deterministic across any micro-batching.
    */
  def hllPerKey(input: Dataset[(String, String)]): Dataset[HllSketchRow] = {
    import input.sparkSession.implicits._
    input.groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], HllSketchRow](
        GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](512))
          val md = java.security.MessageDigest.getInstance("MD5")
          rows.foreach { case (_, v) =>
            md.reset()
            val hex = md.digest(v.getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString.substring(0, 15)
            val h = java.lang.Long.parseLong(hex, 16) // 60-bit positive
            val bucket = (h >>> 51).toInt
            val rem = h & ((1L << 51) - 1)
            val rank =
              if (rem == 0L) 52
              else 52 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
            if (rank > regs(bucket)) regs(bucket) = rank.toByte
          }
          state.update(regs)
          var occ = 0L
          var sum = 0L
          var i = 0
          while (i < 512) {
            if (regs(i) > 0) occ += 1
            sum += 1L << (52 - regs(i))
            i += 1
          }
          HllSketchRow(key, occ, sum)
      }
  }

  case class CmSlot(j: Int, slot: Long, cnt: Long)

  /** Streaming count-min counters — the frequency sibling of
    * [[hllPerKey]]: state is one 1024-long counter row per DEPTH key
    * (the grid's j), so total state is the fixed d×w grid however long
    * the stream runs. The caller computes (j, slot) COLUMN-side with
    * the same md5 family as the batch [[graft.llm.Sketches]], so the
    * streamed grid is bit-identical to the batch one on the same data.
    * Emits occupied slots per (depth, batch) in update mode; counters
    * only GROW, so max(cnt) per (j, slot) across emissions is the final
    * grid under any micro-batching.
    */
  def countMinRows(input: Dataset[(Int, Long)]): Dataset[CmSlot] = {
    import input.sparkSession.implicits._
    gridFold(input)((j, slot, n) => CmSlot(j, slot, n))
  }

  /** Shared stateful grid fold behind [[countMinRows]] and
    * [[histogramRows]]: per-key state is ONE fixed 1024-long counter
    * array, incremented at the caller-computed slot, with every
    * occupied slot re-emitted each batch (update mode; counters only
    * grow, so max per (key, slot) across emissions is the final grid).
    * Out-of-range slots fail loudly HERE — a silent modulo would
    * corrupt a neighbouring counter, and the exception surfaces before
    * the state array is half-mutated for the bad row. The emit output
    * is materialized BEFORE returning: the output iterator is drained
    * after this function exits, and `c` is the live state array the
    * next batch mutates.
    */
  private def gridFold[K, O](input: Dataset[(K, Long)])(
      emit: (K, Long, Long) => O)(implicit
      ke: org.apache.spark.sql.Encoder[K],
      oe: org.apache.spark.sql.Encoder[O],
      se: org.apache.spark.sql.Encoder[Array[Long]]): Dataset[O] = {
    input.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], O](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Array[Long]]) =>
          val c = state.getOption.getOrElse(new Array[Long](1024))
          rows.foreach { case (_, slot) =>
            require(slot >= 0L && slot < 1024L,
              s"gridFold: slot $slot outside the fixed [0, 1024) grid")
            c(slot.toInt) += 1L
          }
          state.update(c)
          c.iterator.zipWithIndex.collect {
            case (n, s) if n > 0 => emit(key, s.toLong, n)
          }.toVector.iterator
      }
  }

  case class HistSlot(key: String, bucket_id: Long, c: Long)

  /** Streaming per-key quantile histogram — the percentile sibling of
    * [[countMinRows]]: input is (key, bucket_id) with the bucket
    * computed COLUMN-side by the batch algebra
    * (`llm.Sketches.logBucket`), so streamed buckets are bit-identical
    * to batch ones. State is one fixed 1024-long grid per key (the
    * bucket domain maxes at 16·63 + 15 = 1023 for positive longs, so
    * the grid covers EVERY possible logBucket value) — CONSTANT
    * per-key state however long the stream runs. Counters only grow,
    * so the max per (key, bucket) across update-mode emissions is the
    * final histogram under any micro-batching — the same fold contract
    * as the streamed count-min grid.
    */
  def histogramRows(input: Dataset[(String, Long)]): Dataset[HistSlot] = {
    import input.sparkSession.implicits._
    gridFold(input)((key, bucket, n) => HistSlot(key, bucket, n))
  }

  /** Expiry timestamp for a key whose FIRST event was at `firstTsMicros`:
    * event-time ms + ttl, with a SATURATING add — a sentinel-large ttlMs
    * (a caller's "never expire") must not overflow to a negative target,
    * which the watermark clamp would turn into immediate expiry (the
    * opposite contract).
    */
  private def expiryTarget(firstTsMicros: Long, ttlMs: Long): Long = {
    val base = firstTsMicros / 1000
    if (ttlMs > Long.MaxValue - base) Long.MaxValue else base + ttlMs
  }

  case class KeyIdTs(key: Long, id: Long, ts: Long)
  case class KeyIdT(key: Long, id: Long, ts: Long,
      event_time: java.sql.Timestamp)

  /** [[minIdPerKey]] with EVENT-TIME state expiry — the variant a
    * CONTINUOUS ingest dedup runs, closing the NoTimeout state-growth
    * path (one long per content hash ever seen, forever). `ts` is
    * epoch-micros; each key's state retires once the watermark passes
    * its FIRST event by `ttlMs` — O(active keys) state.
    *
    * Contract mirrors [[firstEventPerKeyExpiring]]: for events arriving
    * while their key is live the output is IDENTICAL to the unexpiring
    * min-fold (spec-pinned); after retirement a re-crawl re-opens the
    * key and emits as a new first copy — the standard watermark trade
    * for a dedup window (re-crawls older than watermark+ttl are treated
    * as fresh content).
    */
  def minIdPerKeyExpiring(
      input: Dataset[KeyIdTs],
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 60000L): Dataset[KeyMin] = {
    import input.sparkSession.implicits._
    input
      .withColumn("event_time", expr("timestamp_micros(ts)"))
      .withWatermark("event_time", watermarkDelay)
      .as[KeyIdT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), KeyMin](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val events = rows.toSeq
            val m = events.map(_.id).min
            val t = events.map(_.ts).min
            // state = (held min id, first event-time): the min folds
            // monotonically, the base timestamp anchors the ttl
            val (heldMin, firstTs) = state.getOption match {
              case Some((c, f)) => (math.min(c, m), math.min(f, t))
              case None => (m, t)
            }
            val improved = state.getOption match {
              case Some((c, _)) if c <= m => None
              case _ => Some(KeyMin(key, m))
            }
            state.update((heldMin, firstTs))
            state.setTimeoutTimestamp(
              math.max(expiryTarget(firstTs, ttlMs), state.getCurrentWatermarkMs() + 1))
            improved.iterator
          }
      }
  }

  case class EventT(user_id: Long, ts: Long, event_id: Long, event_type: String,
      event_time: java.sql.Timestamp)

  /** [[firstEventPerKey]] with EVENT-TIME state expiry — the variant a
    * continuous 100 TB ingest runs, where NoTimeout state grows with every
    * key ever seen. `ts` is epoch-micros; a watermark rides a derived
    * event-time column, and each key's state retires once the watermark
    * passes its first event by `ttlMs` — O(active keys) state instead of
    * O(all keys ever).
    *
    * Contract: for events arriving while their key is live the output is
    * IDENTICAL to the unexpiring variant (spec-pinned). After a key
    * retires, a later event re-opens it and emits as a new "first" — the
    * standard watermark trade: events later than watermark+ttl are outside
    * the correctness window (and events older than the watermark itself
    * are dropped by the stateful operator's late-data filter).
    */
  def firstEventPerKeyExpiring(
      input: Dataset[Event],
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 60000L): Dataset[FirstEvent] = {
    import input.sparkSession.implicits._
    input
      .withColumn("event_time", expr("timestamp_micros(ts)"))
      .withWatermark("event_time", watermarkDelay)
      .as[EventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FirstEvent, FirstEvent](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[FirstEvent]) =>
          if (state.hasTimedOut) {
            // watermark passed this key's ttl: retire the state, emit
            // nothing — the key's memory cost ends here
            state.remove()
            Iterator.empty
          } else {
            val m = rows.map(e => (e.ts, e.event_id, e.event_type))
              .minBy(e => (e._1, e._2))
            val improved = state.getOption match {
              case Some(c) if c.first_ts < m._1 ||
                (c.first_ts == m._1 && c.first_event_id <= m._2) => None
              case _ => Some(FirstEvent(uid, m._1, m._2, m._3))
            }
            improved.foreach(state.update)
            // (re)arm expiry: ttl past the held first event (event-time
            // ms), clamped above the current watermark — Spark rejects
            // timeouts at or below it
            state.setTimeoutTimestamp(math.max(
              expiryTarget(state.get.first_ts, ttlMs),
              state.getCurrentWatermarkMs() + 1))
            improved.iterator
          }
      }
  }

  case class KeyedTs(key: String, payload: String, ts: Long)
  case class KeyedT(key: String, payload: String, ts: Long,
      event_time: java.sql.Timestamp)

  /** [[firstWins]] with event-time state expiry: same retire-on-watermark
    * contract as [[firstEventPerKeyExpiring]] (`ts` epoch-micros). A key
    * emits its first payload once per liveness window; after retirement a
    * later event re-opens the key.
    */
  def firstWinsExpiring(
      input: Dataset[KeyedTs],
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 60000L): Dataset[FirstSeen] = {
    import input.sparkSession.implicits._
    input
      .withColumn("event_time", expr("timestamp_micros(ts)"))
      .withWatermark("event_time", watermarkDelay)
      .as[KeyedT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[(String, Long), FirstSeen](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[(String, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = if (state.exists) None else {
              // deterministic "first" within a micro-batch: min (ts,
              // payload), not iterator order — same contract as
              // firstEventPerKeyExpiring's minBy
              val first = rows.minBy(e => (e.ts, e.payload))
              state.update((first.payload, first.ts))
              Some(FirstSeen(key, first.payload))
            }
            state.setTimeoutTimestamp(math.max(
              expiryTarget(state.get._2, ttlMs),
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** The `--days` incremental window as a batch predicate
    * (clinicaltrialsgov `--days` lookback): keep rows within `days` of
    * `asOf` — partition-prunable when the source is date-partitioned.
    */
  def lookbackFilter(df: DataFrame, tsCol: String, days: Int, asOf: java.sql.Timestamp): DataFrame =
    df.filter(col(tsCol) >= date_sub(lit(asOf), days))
}
