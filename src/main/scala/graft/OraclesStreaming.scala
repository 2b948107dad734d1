package graft

/** DuckDB oracle SQL for the streaming rows (each replays the bounded batch the stream consumed). */
private[graft] object OraclesStreaming {

  def registry: Map[String, String] = Map(

    "s2b_stream_state" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
        |SELECT user_id, ts_us AS first_ts, event_id AS first_event_id, event_type AS first_event_type
        |FROM r WHERE rn = 1""".stripMargin,
    // s2i_stream_quantile oracle: batch replay of the per-key log-linear
    // histogram + percentile pick + exact value-domain audit (streamed
    // buckets are bit-identical to batch by construction).
    "s2i_stream_quantile" ->
      """WITH e AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
        |    FROM events WHERE floor(value * 100) >= 1),
        |hb AS (SELECT event_type, v, CAST(length(bin(v)) AS BIGINT) AS b FROM e),
        |hist AS (SELECT event_type, b * 16 + (v * 16) // (1::BIGINT << (b - 1)) - 16 AS bucket_id,
        |    count(*) AS c FROM hb GROUP BY 1, 2),
        |tot AS (SELECT event_type, sum(c) AS n FROM hist GROUP BY 1),
        |cum AS (SELECT event_type, bucket_id,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY bucket_id) AS cum FROM hist),
        |qs AS (SELECT CAST(unnest([50, 95, 99]) AS BIGINT) AS q),
        |pick AS (SELECT c.event_type AS event_type, q, min(bucket_id) AS bk
        |  FROM qs, cum c JOIN tot t ON c.event_type = t.event_type
        |  WHERE c.cum * 100 >= q * t.n GROUP BY 1, 2),
        |skv AS (SELECT event_type, q, (1::BIGINT << (bk // 16 - 1))
        |    + ((bk % 16) * (1::BIGINT << (bk // 16 - 1))) // 16 AS sketch_v FROM pick),
        |vh AS (SELECT event_type, v, count(*) AS c FROM e GROUP BY 1, 2),
        |vc AS (SELECT event_type, v, sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum FROM vh),
        |ex AS (SELECT c.event_type AS event_type, q, min(v) AS exact_v
        |  FROM qs, vc c JOIN tot t ON c.event_type = t.event_type
        |  WHERE c.cum * 100 >= q * t.n GROUP BY 1, 2)
        |SELECT s.event_type AS event_type, s.q AS q, s.sketch_v, e2.exact_v,
        |  abs(s.sketch_v - e2.exact_v) * 16 <= e2.exact_v AS within_bound
        |FROM skv s JOIN ex e2 ON s.event_type = e2.event_type AND s.q = e2.q""".stripMargin,
    "s2_stream_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // s2c oracle: session_window merges [ts, ts+gap) overlaps — same
    // session iff delta < gap (half-open), end = last + gap
    "s2c_stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev >= 1800000000 THEN 1 ELSE 0 END AS ns FROM l),
        |c AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid FROM f)
        |SELECT make_timestamp(min(ts_us)) AS session_start,
        |  make_timestamp(max(ts_us) + 1800000000) AS session_end,
        |  user_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM c GROUP BY user_id, sid""".stripMargin,

    // s2d_stream_join oracle: the batch inequality join the watermarked
    // stream-stream join must equal (30-min inclusive lookback).
    "s2d_stream_join" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS vus, event_id AS view_event_id
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS cus, event_id AS click_event_id
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id, c.click_event_id, v.view_event_id,
        |  c.cus - v.vus AS gap_us
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND v.vus <= c.cus AND v.vus >= c.cus - 1800000000""".stripMargin,

    // s2e_stream_dedup_wm oracle: the original rows exactly once — the
    // self-union duplicates must all collapse.
    "s2e_stream_dedup_wm" ->
      "SELECT event_id, event_type, user_id FROM events",

    // s2f_stream_enrich oracle: the same 5-row dim as a CASE lookup.
    "s2f_stream_enrich" ->
      """SELECT event_id, event_type, user_id,
        |  CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 5
        |    WHEN 'purchase' THEN 20 WHEN 'signup' THEN 2 ELSE 0 END AS BIGINT) AS weight
        |FROM events""".stripMargin,

    // s2g_stream_hll oracle: the batch HLL replay per event type — the
    // streaming registers must land bit-identical.
    "s2g_stream_hll" ->
      """WITH ud AS (SELECT event_type,
        |    CAST(user_id AS VARCHAR) || '@' || CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS uday
        |  FROM events),
        |h AS (SELECT event_type, CAST(('0x' || substr(md5(uday), 1, 15)) AS BIGINT) AS h FROM ud),
        |b AS (SELECT event_type, h >> 51 AS bucket, h % 2251799813685248 AS rem FROM h),
        |rk AS (SELECT event_type, bucket,
        |  CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END AS rnk FROM b),
        |regs AS (SELECT event_type, bucket, CAST(max(rnk) AS BIGINT) AS reg
        |  FROM rk GROUP BY event_type, bucket),
        |est AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_occupied,
        |    sum(CAST(1 AS BIGINT) << CAST(52 - reg AS INT)) AS occ_sum
        |  FROM regs GROUP BY event_type),
        |fin AS (SELECT event_type, n_occupied,
        |  CAST(occ_sum + (512 - n_occupied) * 4503599627370496 AS BIGINT) AS register_sum
        |  FROM est)
        |SELECT event_type, n_occupied, register_sum,
        |  CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        |    * CAST(262144.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE)
        |    / CAST(register_sum AS DOUBLE) AS hll_estimate
        |FROM fin""".stripMargin,

    // s2h_stream_cm oracle: the batch count-min replay over user-days —
    // the streamed grid must land bit-identical.
    "s2h_stream_cm" ->
      """WITH ud AS (SELECT CAST(user_id AS VARCHAR) || '@' || CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS uday
        |  FROM events),
        |cnt AS (SELECT uday, CAST(count(*) AS BIGINT) AS exact_count FROM ud GROUP BY uday),
        |probe AS (SELECT uday, exact_count FROM cnt
        |  ORDER BY exact_count DESC, uday LIMIT 20),
        |grid AS (SELECT g.j,
        |    CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || ud.uday), 1, 15)) AS BIGINT) % 1024 AS slot
        |  FROM ud, generate_series(0, 3) g(j)),
        |counters AS (SELECT j, slot, CAST(count(*) AS BIGINT) AS cnt
        |  FROM grid GROUP BY j, slot),
        |pl AS (SELECT p.uday, p.exact_count, g.j,
        |    CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || p.uday), 1, 15)) AS BIGINT) % 1024 AS slot
        |  FROM probe p, generate_series(0, 3) g(j)),
        |est AS (SELECT pl.uday, pl.exact_count,
        |    CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS cm_estimate
        |  FROM pl LEFT JOIN counters c ON pl.j = c.j AND pl.slot = c.slot
        |  GROUP BY pl.uday, pl.exact_count)
        |SELECT uday, cm_estimate, exact_count,
        |  cm_estimate - exact_count AS overcount FROM est""".stripMargin,
  )
}
