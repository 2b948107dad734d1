#!/usr/bin/env python3
"""Generate the sf1 side-lane events table (driver testdata stops at
sf0.1; this synthesizes the sf1-equivalent: 1M events, 15k users — the
same density rules as the driver's tables).

user_id MUST be hash-derived, not a linear-congruential map: within one
ldr_fusion key the event_ids step by the key modulus, and a multiplier
map makes user_id step by a CONSTANT whose value mod 40 can be 0 — then
every group collapses to one distinct sample and the whole rollup dies
below the recurrence threshold (observed: user_id = i*5761 % 15000 steps
by 5000 per same-key event, and 5000 % 40 == 0).

Usage: python3 tools/gen_sf1_lane.py [outdir]   (default /tmp/sf1_lane)
"""
import sys

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_lane"
import os
os.makedirs(out, exist_ok=True)
duckdb.sql(f"""
COPY (
  SELECT
    i AS event_id,
    TIMESTAMP '2024-01-01' + INTERVAL (i % 86400) SECOND AS ts,
    CAST(hash(i) % 15000 AS BIGINT) AS user_id,
    ['click','view','purchase','scroll'][(i % 4) + 1] AS event_type,
    (i % 1000) / 10.0 AS value,
    '{{"k":' || CAST(i % 7 AS VARCHAR) || '}}' AS props
  FROM range(0, 1000000) t(i)
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
n, u = duckdb.sql(
    f"SELECT count(*), count(distinct user_id) FROM '{out}/events.parquet'"
).fetchone()
print(f"wrote {out}/events.parquet: {n} events, {u} users")
