#!/usr/bin/env python3
"""Generate the round-close-note counts FROM THE ARTIFACTS (round-13
verdict: two hand-written counts drifted — 431-vs-432 tests and an ask
claimed closed that wasn't). Paste this script's output into the PLANS.md
close note instead of typing numbers.

Reads:
  - target/test-reports/*.xml  (suite/test/failure/error totals)
  - the newest CORRECTNESS_r*.json or a check.py log (oracle row count)
  - src/main/scala/graft/SparkEntry.scala + Queries*.scala (registry size)

Usage: python3 tools/close_counts.py [check_log]
"""
import glob
import os
import re
import sys
import xml.etree.ElementTree as ET


def test_counts():
    suites = tests = failures = errors = 0
    for f in glob.glob("target/test-reports/*.xml"):
        try:
            r = ET.parse(f).getroot()
        except ET.ParseError:
            continue
        suites += 1
        tests += int(r.get("tests", 0))
        failures += int(r.get("failures", 0))
        errors += int(r.get("errors", 0))
    return suites, tests, failures, errors


def registry_size():
    src = ""
    for f in ["src/main/scala/graft/SparkEntry.scala"] + sorted(
            glob.glob("src/main/scala/graft/Queries*.scala")):
        src += open(f).read()
    # every query row is a 4-space-indented '"name" ->' Map entry (the
    # value may be a ((s, dir) => ...) lambda OR an eta-expansion like
    # (upsertClassify(_, _)) — match the entry key, not the value shape)
    return len(set(re.findall(r'^    "([a-z0-9_]+)" ->', src, re.M)))


def oracle_counts(check_log):
    if check_log and os.path.exists(check_log):
        txt = open(check_log).read()
        m = re.search(r"== (\d+) pass / (\d+) fail ==", txt)
        if m:
            return int(m.group(1)), int(m.group(2))
    # fallback: the newest driver-written CORRECTNESS_r*.json
    rounds = sorted(glob.glob("CORRECTNESS_r*.json"),
                    key=lambda f: int(re.search(r"r(\d+)", f).group(1)))
    if rounds:
        import json
        rows = json.load(open(rounds[-1]))
        ok = sum(1 for v in rows.values()
                 if v.get("rows_match") and v.get("schema_match")
                 and v.get("hash_match") and not v.get("err"))
        return ok, len(rows) - ok
    return None, None


if __name__ == "__main__":
    s, t, f, e = test_counts()
    print(f"test reports: {s} suites / {t} tests "
          f"({f} failures, {e} errors)")
    reg = registry_size()
    print(f"query registry: {reg} rows")
    p, fl = oracle_counts(sys.argv[1] if len(sys.argv) > 1 else None)
    if p is not None:
        print(f"oracle sweep: {p} pass / {fl} fail")
    # The FINAL GATE line, tool-emitted so post-close addenda can't drift
    # (round-14 verdict ask #8: the "283/283" line was hand-written).
    # GREEN requires: zero test failures/errors, zero oracle fails, and
    # the oracle sweep covering every registry row.
    if p is not None:
        # t > 0: zero-because-never-ran must not read as zero failures
        ok = (t > 0 and f == 0 and e == 0 and fl == 0 and p == reg)
        status = "GREEN" if ok else "NOT GREEN"
        detail = "no test reports found! " if t == 0 else ""
        print(f"final gate: {status} — {detail}oracle {p}/{p + fl} pass, "
              f"registry {reg} rows ({'covered' if p == reg else 'MISMATCH'}), "
              f"tests {t} ({f} failures, {e} errors)")
