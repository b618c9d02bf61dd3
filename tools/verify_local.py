#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only — the
Scala library has no Python dependency).

Runs DuckDB on SparkEntry.oracleSql against the sfDir parquet tables and
compares with the parquet files graft.Verify wrote, mimicking the driver:
row count, schema (column names sorted), and exact values.

Usage: sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/graft-verify'
       python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/graft-verify

`compare_key` / `connect` are importable — tools/scale_ramp.py reuses them
for the per-decade sweep artifact.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # The driver hashes raw bytes, where -0.0 != +0.0; Python == would
        # equate them and hide the mismatch (bit us in round 4:
        # embed_covariance). Tag the sign of zero to match driver semantics.
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def connect(sf_dir):
    """DuckDB connection with one view per testdata table. Driver testdata
    ships single-file tables; GenScale-expanded dirs (scale-ramp sweeps) are
    Spark directory-parquet — glob those. Table-subset scale dirs omit
    tables no sweep key reads — skip the view, the key list must match."""
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def compare_key(con, out_dir, name, sql):
    """Run one oracle SQL and compare with the Spark dump. Returns
    (status, detail): status in {"pass", "fail", "error"}."""
    try:
        want = con.sql(sql)
        wcols = sorted(want.columns)
        wrows = [tuple(norm(r[want.columns.index(c)]) for c in wcols)
                 for r in want.fetchall()]
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        gcols = sorted(got.columns)
        grows = [tuple(norm(r[got.columns.index(c)]) for c in gcols)
                 for r in got.fetchall()]
        wtypes = {c: str(t) for c, t in zip(want.columns, want.types)}
        gtypes = {c: str(t) for c, t in zip(got.columns, got.types)}
        dt = [f"{c}: spark={gtypes[c]} oracle={wtypes[c]}"
              for c in wcols if c in gtypes and gtypes[c] != wtypes[c]]
        if dt:
            print(f"WARN {name}: dtype drift — {'; '.join(dt)}")
    except Exception as e:
        return "error", str(e)
    if gcols != wcols:
        return "fail", f"schema spark={gcols} oracle={wcols}"
    if len(grows) != len(wrows):
        return "fail", f"rows spark={len(grows)} oracle={len(wrows)}"
    if grows != wrows:
        bad = next(i for i, (g, w) in enumerate(zip(grows, wrows)) if g != w)
        return "fail", (f"first diff at row {bad}: spark={grows[bad]} "
                        f"oracle={wrows[bad]}")
    return "pass", f"{len(grows)} rows"


def main(sf_dir, out_dir, skip=(), only=None, json_out=None):
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    verdicts = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        if name in skip:
            print(f"SKIP {name}")
            verdicts[name] = {"status": "skip", "detail": ""}
            continue
        status, detail = compare_key(con, out_dir, name, sql)
        verdicts[name] = {"status": status, "detail": detail}
        if status == "pass":
            print(f"PASS {name} ({detail})")
            n_pass += 1
        else:
            print(f"FAIL {name}: {detail}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(verdicts, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    # optional: --skip q1,q2 (e.g. quadratic dedup oracles at sf0.1)
    #           --only q1,q2 (dev loop: compare just these keys)
    #           --json out.json (per-key verdict map, for harnesses)
    skip = ()
    only = None
    json_out = None
    args = sys.argv[1:]
    if "--skip" in args:
        i = args.index("--skip")
        skip = tuple(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], skip, only, json_out))
