#!/usr/bin/env python3
"""Partition-invariance gate (round 8): the "1000 executors give the same
answer" property as a harness, not a claim.

Runs `graft.Verify` THREE times over the same sfDir — under the driver-like
default layout, under an adversarial one (different core count, a
PRIME shuffle-partition count, tiny input splits so every file shatters
into many tasks), and with AQE disabled entirely — and requires every
key's dump to be value-identical across all three.
Anything partition-order-dependent (float-sum ulps surviving a round(),
non-associative merges, per-partition state leaking into results, GK/HLL
merge asymmetries outside their exact regimes) flips a key here long
before it flakes on a real cluster.

    sbt -batch compile
    python3 tools/partition_invariance.py --sf /root/testdata/sf0.01 \
        --out PARTITION_INVARIANCE_r08.json

Verdicts per key:
  pass       — ordered rows identical (the driver-hash-level guarantee)
  reordered  — same multiset, different order (total ORDER BY is not
               total after all — a latent driver-gate flake, fix the key)
  fail       — value diff (first differing row recorded)
  error      — a side failed to dump or read

The adversarial layout reaches the engine through GraftSession's
SPARK_GRAFT_CONF hook; both runs use the UNCHANGED production queries.
"""
import argparse
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import verify_local  # noqa: E402
from scale_ramp import java_main  # noqa: E402

ADVERSARIAL = ";".join([
    # prime and small: no shuffle boundary lines up with the default run
    "spark.sql.shuffle.partitions=7",
    # shatter every input file into many splits
    "spark.sql.files.maxPartitionBytes=262144",
    "spark.sql.files.openCostInBytes=0",
    "spark.default.parallelism=5",
])

# Run C: AQE off entirely (runs A/B have it on, Spark's default) — pins
# that adaptive re-planning (partition coalescing, skew-join splitting,
# broadcast demotion) never changes ANSWERS, only plans. A key that agrees
# between A and B but flips here depends on AQE's post-shuffle layout.
NO_AQE = ";".join([
    "spark.sql.adaptive.enabled=false",
    "spark.sql.shuffle.partitions=13",
])


def assert_effective_conf(log_path, want_shuffle, want_split=None):
    """Positive control: Verify prints its effective layout confs to stderr;
    require the expected values in the log so a silently-detached
    SPARK_GRAFT_CONF hook can't make run B trivially equal run A and the
    whole invariance gate vacuous. Returns the effective maxPartitionBytes
    rendering; pass want_split=None for runs that don't override it (run A)
    — the caller then requires run C to match run A's value, instead of
    hardcoding Spark's default rendering, which a Spark upgrade could
    change and abort the gate (ADVICE r8)."""
    text = Path(log_path).read_text(errors="replace")
    m = re.search(r"\[verify\] effective shuffle\.partitions=(\S+) "
                  r"files\.maxPartitionBytes=(\S+)", text)
    got = (m.group(1), m.group(2)) if m else (None, None)
    want = (str(want_shuffle), want_split)
    if m is None or got[0] != want[0] or \
            (want_split is not None and got[1] != want[1]):
        sys.exit(f"POSITIVE CONTROL FAILED: {log_path} has "
                 f"shuffle.partitions={got[0]} maxPartitionBytes={got[1]}, "
                 f"wanted {want} — the conf hook did not reach the session")
    print(f"   control ok: shuffle.partitions={got[0]} "
          f"maxPartitionBytes={got[1]}", flush=True)
    return got[1]


def rows_of(con, path):
    rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    return cols, [tuple(verify_local.norm(r[i]) for i in idx)
                  for r in rel.fetchall()]


def compare(con, a_dir, b_dir, name):
    try:
        acols, arows = rows_of(con, f"{a_dir}/{name}")
        bcols, brows = rows_of(con, f"{b_dir}/{name}")
    except Exception as e:
        return "error", str(e)
    if acols != bcols:
        return "fail", f"schema a={acols} b={bcols}"
    if arows == brows:
        return "pass", f"{len(arows)} rows"
    if sorted(map(repr, arows)) == sorted(map(repr, brows)):
        return "reordered", f"{len(arows)} rows, order differs"
    if len(arows) != len(brows):
        return "fail", f"rows a={len(arows)} b={len(brows)}"
    bad = next(i for i, (x, y) in enumerate(zip(arows, brows)) if x != y)
    return "fail", f"first diff at row {bad}: a={arows[bad]} b={brows[bad]}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--work", default="/tmp/pinv")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--cpus-a", default="8")
    ap.add_argument("--cpus-b", default="3")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    a_dir, b_dir = work / "default", work / "adversarial"
    only = [s for s in args.only.split(",") if s]
    skip = set(s for s in args.skip.split(",") if s)
    key_arg = [",".join(only)] if only else []

    t0 = time.time()
    print(f"== run A (default layout, cpus={args.cpus_a})", flush=True)
    java_main("graft.Verify", [args.sf, str(a_dir), *key_arg],
              {"SPARK_GRAFT_CPUS": args.cpus_a},
              log=str(work / "verify_a.log"))
    split_default = assert_effective_conf(work / "verify_a.log", args.cpus_a)
    print(f"== run B (adversarial layout, cpus={args.cpus_b}, "
          f"{ADVERSARIAL})", flush=True)
    java_main("graft.Verify", [args.sf, str(b_dir), *key_arg],
              {"SPARK_GRAFT_CPUS": args.cpus_b,
               "SPARK_GRAFT_CONF": ADVERSARIAL},
              log=str(work / "verify_b.log"))
    assert_effective_conf(work / "verify_b.log", "7", "262144")
    c_dir = work / "no_aqe"
    print(f"== run C (AQE off, cpus={args.cpus_a}, {NO_AQE})", flush=True)
    java_main("graft.Verify", [args.sf, str(c_dir), *key_arg],
              {"SPARK_GRAFT_CPUS": args.cpus_a,
               "SPARK_GRAFT_CONF": NO_AQE},
              log=str(work / "verify_c.log"))
    assert_effective_conf(work / "verify_c.log", "13", split_default)

    con = verify_local.connect(args.sf)
    names = sorted(json.load(open(a_dir / "oracle_sql.json")).keys()
                   if not only else only)
    # rows-only keys have no oracle_sql entry — walk the dump dirs instead
    dumped = sorted(p.name for p in a_dir.iterdir() if p.is_dir())
    names = sorted(set(names) | set(dumped))

    verdicts, counts = {}, {"pass": 0, "reordered": 0, "fail": 0,
                            "error": 0, "skip": 0}
    for name in names:
        if name in skip:
            verdicts[name] = {"status": "skip", "detail": ""}
            counts["skip"] += 1
            print(f"SKIP {name}")
            continue
        status, detail = compare(con, a_dir, b_dir, name)
        # ADVICE r8: run the no-AQE axis for 'reordered' keys too (it was
        # skipped before, leaving run C uncovered for exactly the keys
        # already flagged latent-flaky); keep the WORST verdict of the two.
        severity = {"pass": 0, "reordered": 1, "fail": 2, "error": 3}
        if status in ("pass", "reordered"):
            c_status, c_detail = compare(con, a_dir, c_dir, name)
            if severity[c_status] > severity[status]:
                status, detail = c_status, f"[vs no-AQE run] {c_detail}"
        verdicts[name] = {"status": status, "detail": detail}
        counts[status] += 1
        tag = "PASS" if status == "pass" else status.upper()
        print(f"{tag} {name}" + ("" if status == "pass" else f": {detail}"),
              flush=True)

    artifact = {"sf": args.sf, "cpus_a": args.cpus_a, "cpus_b": args.cpus_b,
                "adversarial_conf": ADVERSARIAL, "no_aqe_conf": NO_AQE,
                "elapsed_sec": round(time.time() - t0, 1),
                "counts": counts, "keys": verdicts}
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"== {counts} -> {args.out}", flush=True)
    # 'reordered' is nonzero too (ADVICE r8): the docstring calls it a
    # latent driver-gate flake to fix — CI consuming the exit status must
    # not go green over it.
    return 1 if counts["fail"] or counts["error"] or counts["reordered"] else 0


if __name__ == "__main__":
    sys.exit(main())
