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
    # Spill, don't balloon: the sf100 dedup oracles materialize string
    # shingles for ~5M docs and were observed >100 GB RSS on a 125 GB box
    # shared with Spark JVMs — an OOM kill would record a bare "worker
    # died" row. A memory limit makes DuckDB spill to disk instead;
    # override with GRAFT_ORACLE_MEM for a dedicated box.
    mem = os.environ.get("GRAFT_ORACLE_MEM", "64GB")
    con.sql(f"SET memory_limit='{mem}'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


# Above this many result rows the Python fetchall+norm compare dominates
# the oracle budget (at sf10 json_nested_event's 20M-row result runs 61 s
# in DuckDB but >900 s through fetchall), so the compare stays inside the
# engine. The in-engine path checks MULTISET equality — the driver's own
# semantics (sort rows, then hash) — instead of the small-result path's
# stricter positional compare, which additionally pins Verify's dump order.
BIG_RESULT_ROWS = 2_000_000


def _depths(s):
    """Paren depth per char, -1 inside string literals (quote-aware scan)."""
    out, depth, q = [], 0, None
    for c in s:
        if q is not None:
            out.append(-1)
            if c == q:
                q = None
            continue
        if c in ("'", '"'):
            out.append(-1)
            q = c
        elif c == "(":
            out.append(depth)
            depth += 1
        elif c == ")":
            depth -= 1
            out.append(depth)
        else:
            out.append(depth)
    return out


def _top_level_order_by(sql):
    """Expressions of the OUTERMOST query's ORDER BY, directions stripped;
    None when absent or unparseable. Subquery/window ORDER BYs sit at paren
    depth > 0 and are skipped; a trailing depth-0 LIMIT/OFFSET is cut."""
    import re
    d = _depths(sql)
    last = None
    for m in re.finditer(r"\bORDER\s+BY\b", sql, re.I):
        if d[m.start()] == 0:
            last = m
    if last is None:
        return None
    tail = sql[last.end():]
    td = _depths(tail)
    cut = len(tail)
    for m in re.finditer(r"\b(LIMIT|OFFSET)\b", tail, re.I):
        if td[m.start()] == 0:
            cut = m.start()
            break
    tail, td = tail[:cut], td[:cut]
    items, start = [], 0
    for i, c in enumerate(tail):
        if c == "," and td[i] == 0:
            items.append(tail[start:i])
            start = i + 1
    items.append(tail[start:])
    out = []
    for it in items:
        it = it.strip()
        it = re.sub(r"\s+NULLS\s+(FIRST|LAST)\s*$", "", it, flags=re.I)
        it = re.sub(r"\s+(ASC|DESC)\s*$", "", it, flags=re.I)
        if not it:
            return None
        out.append(it)
    return out


def _big_compare(con, out_dir, name, sql, wcols, wtypes, gtypes):
    """In-engine multiset compare for results too large to fetchall.

    Only reached when every shared column is scalar (no LIST/STRUCT/MAP):
    nested types would need element-wise zero-sign tagging, so they keep
    the fetchall path. FLOAT/DOUBLE columns carry a `c = 0 AND signbit(c)`
    tag column mirroring norm()'s -0.0 marker (the driver hashes raw bytes,
    where -0.0 != +0.0). NaN needs no tag: DuckDB set ops use total
    ordering, where NaN equals NaN — same as norm()'s "NaN" string."""
    keys, sel = [], []
    for c in wcols:
        keys.append(f'"{c}"')
        sel.append(f'"{c}"')
        if wtypes.get(c) in ("FLOAT", "DOUBLE") or \
           gtypes.get(c) in ("FLOAT", "DOUBLE"):
            keys.append(f'"{c}__negz"')
            sel.append(f'("{c}" = 0 AND signbit("{c}")) AS "{c}__negz"')

    # One pass per side, one hash aggregate: +1/-1 weighted union — a
    # group whose weights don't cancel is a multiset difference. A double
    # EXCEPT ALL would evaluate each (potentially 60s+) side twice.
    got_src = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
    diff = con.sql(
        f"SELECT count(*) FROM ("
        f"  SELECT {', '.join(keys)} FROM ("
        f"    SELECT {', '.join(sel)}, 1 AS __side FROM ({sql})"
        f"    UNION ALL"
        f"    SELECT {', '.join(sel)}, -1 AS __side FROM ({got_src}))"
        f"  GROUP BY {', '.join(keys)} HAVING sum(__side) <> 0)").fetchone()[0]
    if diff:
        return "fail", (f"multiset diff: {diff} distinct row groups differ "
                        f"(in-engine compare)")
    nrows = con.sql(f"SELECT count(*) FROM ({got_src})").fetchone()[0]
    # ADVICE r8: the multiset pass drops the positional check the small
    # path enforces, so a big key whose total ORDER BY regressed would
    # still pass local verify. Spot-check order on the head and tail: the
    # dump glob preserves file/row order (DuckDB preserve_insertion_order,
    # part files name-sorted = Spark's ordered output partitions) and the
    # oracle's LIMIT/OFFSET applies after its ORDER BY.
    # COST CEILING (ADVICE r9 #3): the two windows re-execute the full
    # oracle query once each, so a big key pays up to 3x its oracle cost
    # in this path — acceptable because it runs only on >2M-row keys and
    # the alternative (no order check at scale) already bit once (r8).
    # TIE ROWS (same ADVICE): when the key's ORDER BY is not a total
    # order, rows sharing a sort key are legitimately engine-ordered, so
    # a strict positional compare can fail nondeterministically. The
    # check now parses the oracle's top-level ORDER BY and asks the dump
    # whether that key is duplicate-free (one cheap in-engine GROUP BY):
    #   - total order (or no ties in this data) -> strict positional
    #     compare, unchanged semantics;
    #   - ties present -> the window's ORDER-BY-key projection must still
    #     match positionally (the sorted key sequence is deterministic),
    #     and the full-tuple window must match as a SORTED multiset; only
    #     the order WITHIN a tie group is left free.
    # Residual blind spot: tie groups STRADDLING a window boundary can
    # put different member rows inside the window — that manifests as a
    # sorted-window mismatch, i.e. a spurious FAIL, never a spurious
    # pass; total-order the key's ORDER BY if one ever surfaces.
    spot = 1000
    ob = _top_level_order_by(sql)
    ties = True  # unparseable ORDER BY -> assume ties (weaker check)
    if ob is not None:
        try:
            ties = con.sql(
                f"SELECT count(*) FROM (SELECT 1 AS o FROM ({got_src}) "
                f"GROUP BY {', '.join(ob)} HAVING count(*) > 1)"
            ).fetchone()[0] > 0
        except Exception:
            ties = True
    tie_note = ""
    for label, offset in (("head", 0), ("tail", max(0, nrows - spot))):
        grows = gkeys = None
        for side, src in (("spark", got_src), ("oracle", sql)):
            rel = con.sql(f"SELECT * FROM ({src}) LIMIT {spot} OFFSET {offset}")
            idx = [rel.columns.index(c) for c in wcols]
            rows = [tuple(norm(r[i]) for i in idx) for r in rel.fetchall()]
            okeys = None
            if ties and ob is not None:
                try:
                    okeys = [tuple(norm(v) for v in r) for r in con.sql(
                        f"SELECT {', '.join(ob)} FROM (SELECT * FROM ({src}) "
                        f"LIMIT {spot} OFFSET {offset})").fetchall()]
                except Exception:
                    okeys = None
            if side == "spark":
                grows, gkeys = rows, okeys
            elif not ties and grows != rows:
                bad = next(i for i, (g, w) in enumerate(zip(grows, rows))
                           if g != w)
                return "fail", (f"multiset equal but {label} ORDER differs "
                                f"at row {offset + bad}: spark={grows[bad]} "
                                f"oracle={rows[bad]}")
            elif ties and grows != rows:
                if gkeys is not None and okeys is not None and gkeys != okeys:
                    bad = next(i for i, (g, w) in enumerate(zip(gkeys, okeys))
                               if g != w)
                    return "fail", (f"multiset equal but {label} ORDER-BY-key "
                                    f"sequence differs at row {offset + bad}: "
                                    f"spark={gkeys[bad]} oracle={okeys[bad]}")
                if sorted(map(repr, grows)) != sorted(map(repr, rows)):
                    return "fail", (f"multiset equal but {label} window "
                                    f"content differs beyond tie reordering")
                tie_note = f"; order ties within {label} window"
    return "pass", (f"{nrows} rows (in-engine multiset + head/tail order"
                    f"{tie_note})")


def compare_key(con, out_dir, name, sql):
    """Run one oracle SQL and compare with the Spark dump. Returns
    (status, detail): status in {"pass", "fail", "error"}."""
    try:
        want = con.sql(sql)
        wcols = sorted(want.columns)
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        gcols = sorted(got.columns)
        wtypes = {c: str(t) for c, t in zip(want.columns, want.types)}
        gtypes = {c: str(t) for c, t in zip(got.columns, got.types)}
        dt = [f"{c}: spark={gtypes[c]} oracle={wtypes[c]}"
              for c in wcols if c in gtypes and gtypes[c] != wtypes[c]]
        if dt:
            print(f"WARN {name}: dtype drift — {'; '.join(dt)}")
        if gcols != wcols:
            return "fail", f"schema spark={gcols} oracle={wcols}"
        n_got = con.sql(
            f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        scalar = all("[" not in t and "STRUCT" not in t and "MAP" not in t
                     for t in list(wtypes.values()) + list(gtypes.values()))
        if n_got > BIG_RESULT_ROWS and scalar:
            return _big_compare(con, out_dir, name, sql, wcols, wtypes, gtypes)
        if scalar:
            # ADVICE r8: probe the oracle count BEFORE any fetchall — if a
            # regression makes the engine emit few rows on a big-result
            # key, the old routing (gated on n_got alone) dragged the full
            # oracle result through Python and timed out as 'error' instead
            # of failing fast. A count mismatch is also a complete verdict
            # on its own. Costs one count-only oracle execution per scalar
            # key (cheap relative to fetchall; bounded by the sweep budget).
            n_want = con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
            if n_want != n_got:
                return "fail", f"rows spark={n_got} oracle={n_want}"
        wrows = [tuple(norm(r[want.columns.index(c)]) for c in wcols)
                 for r in want.fetchall()]
        grows = [tuple(norm(r[got.columns.index(c)]) for c in gcols)
                 for r in got.fetchall()]
    except Exception as e:
        return "error", str(e)
    if len(grows) != len(wrows):
        return "fail", f"rows spark={len(grows)} oracle={len(wrows)}"
    if grows != wrows:
        bad = next(i for i, (g, w) in enumerate(zip(grows, wrows)) if g != w)
        return "fail", (f"first diff at row {bad}: spark={grows[bad]} "
                        f"oracle={wrows[bad]}")
    return "pass", f"{len(grows)} rows"


def selftest():
    """Pin the in-engine compare's driver-parity semantics (run with
    --selftest). These are the cases where an engine-level multiset
    compare could silently diverge from norm()'s fetchall semantics:
    -0.0 vs +0.0 must DIFFER (the driver hashes raw bytes), NaN must
    equal NaN (DuckDB total ordering = norm()'s "NaN" string), duplicate
    multiplicity must count, and a value/schema diff must fail."""
    import shutil
    import tempfile
    global BIG_RESULT_ROWS
    saved, BIG_RESULT_ROWS = BIG_RESULT_ROWS, 0  # force the in-engine path
    tmp = tempfile.mkdtemp(prefix="verify-selftest-")
    con = duckdb.connect()
    fails = []

    def case(label, dump_sql, oracle_sql, expect):
        d = f"{tmp}/k"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        con.sql(f"COPY ({dump_sql}) TO '{d}/part.parquet'")
        status, detail = compare_key(con, tmp, "k", oracle_sql)
        ok = status == expect
        print(f"{'ok' if ok else 'SELFTEST FAIL'}: {label} -> "
              f"{status} ({detail})")
        if not ok:
            fails.append(label)

    case("identical rows pass",
         "SELECT 1 AS id, 2.5::DOUBLE AS v",
         "SELECT 1 AS id, 2.5::DOUBLE AS v", "pass")
    case("-0.0 vs +0.0 differs",
         "SELECT 1 AS id, -0.0::DOUBLE AS v",
         "SELECT 1 AS id, 0.0::DOUBLE AS v", "fail")
    case("-0.0 vs -0.0 passes",
         "SELECT 1 AS id, -0.0::DOUBLE AS v",
         "SELECT 1 AS id, -0.0::DOUBLE AS v", "pass")
    case("NaN equals NaN",
         "SELECT 1 AS id, 'NaN'::DOUBLE AS v",
         "SELECT 1 AS id, 'NaN'::DOUBLE AS v", "pass")
    case("duplicate multiplicity counts",
         "SELECT 7 AS id FROM range(3)",
         "SELECT 7 AS id FROM range(2)", "fail")
    case("value diff fails",
         "SELECT range AS id FROM range(10)",
         "SELECT range + (range = 9)::INT AS id FROM range(10)", "fail")
    case("schema diff fails",
         "SELECT 1 AS id",
         "SELECT 1 AS wrong", "fail")
    case("NULL equals NULL",
         "SELECT 1 AS id, NULL::DOUBLE AS v",
         "SELECT 1 AS id, NULL::DOUBLE AS v", "pass")
    # ADVICE r8: an order regression on a big key must be caught by the
    # head/tail spot-check even though the multiset matches
    case("order diff on big key fails (head/tail spot-check)",
         "SELECT range AS id FROM range(10) ORDER BY id DESC",
         "SELECT range AS id FROM range(10) ORDER BY id", "fail")
    # ADVICE r9: reordering WITHIN a tie group of a non-total ORDER BY is
    # engine-legitimate and must pass; a wrong ORDER-BY-key sequence must
    # still fail even when ties exist
    case("tie-group reorder under non-total ORDER BY passes",
         "SELECT * FROM (VALUES (1, 'b'), (1, 'a')) AS t(k, v)",
         "SELECT * FROM (VALUES (1, 'a'), (1, 'b')) AS t(k, v) ORDER BY k",
         "pass")
    case("wrong key sequence under non-total ORDER BY fails",
         "SELECT * FROM (VALUES (2, 'a'), (1, 'a'), (1, 'b')) AS t(k, v)",
         "SELECT * FROM (VALUES (1, 'a'), (1, 'b'), (2, 'a')) AS t(k, v) "
         "ORDER BY k", "fail")
    # ADVICE r8: small dump + big oracle routes through the count probe and
    # fails fast on the count, never materializing the oracle in Python
    BIG_RESULT_ROWS = 10**9
    case("count mismatch fails fast via the oracle count probe",
         "SELECT 1 AS id",
         "SELECT range AS id FROM range(5)", "fail")
    BIG_RESULT_ROWS = saved
    shutil.rmtree(tmp, ignore_errors=True)
    print(f"== selftest {'PASS' if not fails else 'FAIL: ' + str(fails)} ==")
    return 1 if fails else 0


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
    if "--selftest" in args:
        sys.exit(selftest())
    sys.exit(main(args[0], args[1], skip, only, json_out))
