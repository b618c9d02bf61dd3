#!/usr/bin/env python3
"""Committed, repeatable scale-ramp harness (VERDICT r6 ask #1).

One entry point wires the four existing pieces — `graft.GenScale` (decade
data), `graft.Verify` (Spark dumps), the DuckDB oracle compare
(tools/verify_local.py), and `graft.Bench` (per-key timings) — into a
per-decade JSON artifact: for every oracle key a hash verdict at the decade
scale, and for every benched key the time ratio vs the base scale.

    # full sf1 sweep + bench ratios (compile first: sbt -batch compile)
    python3 tools/scale_ramp.py --base /root/testdata/sf0.1 \
        --work /tmp/scale --decades sf1:10 --out SCALE_RAMP_r07_sf1.json

    # third decade, scale-family tables only
    python3 tools/scale_ramp.py --base /root/testdata/sf0.1 --work /tmp/scale \
        --decades sf10:100:events,documents,embeddings --out SCALE_RAMP_r07_sf10.json

Per-key DuckDB oracles run under a wall-clock budget in worker processes
(`--timeout`, default 900 s): an oracle that cannot finish at the decade
scale is recorded as `timeout` with the elapsed time — a DIAGNOSED miss per
the round contract (most are the declared quadratic all-pairs oracles,
infeasible in any engine at sweep scale and verified instead at the sf0.01
driver gate), never a silent skip.

Known probabilistic-vs-exact flake bound (recorded here per ADVICE r6 #5):
`dedup_embedding` is SRP-LSH against an exact all-pairs cosine oracle. With
corpus-adaptive band width (bits = ceil(log2 n)+4, 96 bands) the per-true-
pair miss is <= ~5e-6 at sf1 (bits=20) and 4e-9 at the 16-bit driver gate;
at the synthetic corpora's O(100) qualifying pairs the sweep-level flake
probability stays < 1e-3 per decade. A `fail` on exactly this key with a
row-count diff of a few rows should be retried before being treated as a
regression.
"""
import argparse
import json
import multiprocessing as mp
import os
import queue
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import verify_local  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
CLASSES = REPO / "target" / "scala-2.13" / "classes"
SPARK_JARS = "/opt/spark/jars/*"

# mirror of build.sbt's jdk17AddOpens — raw `java` lacks sbt's injection
ADD_OPENS = [f
             for p in ["java.base/java.lang", "java.base/java.lang.invoke",
                       "java.base/java.lang.reflect", "java.base/java.io",
                       "java.base/java.net", "java.base/java.nio",
                       "java.base/java.util",
                       "java.base/java.util.concurrent",
                       "java.base/java.util.concurrent.atomic",
                       "java.base/sun.nio.ch", "java.base/sun.nio.cs",
                       "java.base/sun.security.action",
                       "java.base/sun.util.calendar"]
             for f in ("--add-opens", f"{p}=ALL-UNNAMED")]


def java_main(cls, args, env_extra=None, log=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    cmd = ["java", *ADD_OPENS,
           f"-Xmx{os.environ.get('SPARK_DRIVER_MEM', '8g')}",
           "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
           "-cp", f"{SPARK_JARS}:{CLASSES}", cls, *args]
    t0 = time.time()
    with (open(log, "ab") if log else open(os.devnull, "wb")) as lf:
        lf.write((" ".join(cmd) + "\n").encode())
        lf.flush()
        rc = subprocess.call(cmd, stdout=lf, stderr=lf, env=env)
    dt = time.time() - t0
    print(f"  [{cls.split('.')[-1]}] rc={rc} in {dt:.0f}s "
          f"({' '.join(args[:2])})", flush=True)
    if rc != 0:
        raise RuntimeError(f"{cls} {' '.join(args)} failed rc={rc}, see {log}")
    return dt


def _oracle_worker(sf_dir, out_dir, name, sql, q):
    try:
        con = verify_local.connect(sf_dir)
        t0 = time.time()
        status, detail = verify_local.compare_key(con, out_dir, name, sql)
        q.put((status, detail, time.time() - t0))
    except Exception as e:  # pragma: no cover — defensive
        q.put(("error", str(e), 0.0))


def oracle_sweep(sf_dir, out_dir, timeout, skip, only):
    """Per-key DuckDB compare in killable worker processes."""
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark_errors = {}
    err_path = f"{out_dir}/errors.json"
    if os.path.exists(err_path):
        spark_errors = json.load(open(err_path))
    verdicts = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if name in skip:
            verdicts[name] = {"status": "skip", "detail": "explicit --skip"}
            print(f"SKIP {name}", flush=True)
            continue
        if name in spark_errors:
            verdicts[name] = {"status": "spark_error",
                              "detail": spark_errors[name][:300]}
            print(f"SPARK_ERROR {name}: {spark_errors[name][:120]}", flush=True)
            continue
        q = mp.Queue()
        p = mp.Process(target=_oracle_worker,
                       args=(sf_dir, out_dir, name, sql, q))
        t0 = time.time()
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            verdicts[name] = {"status": "timeout",
                              "detail": f"oracle exceeded {timeout}s"}
            print(f"TIMEOUT {name} (> {timeout}s)", flush=True)
            continue
        # ADVICE r7 #4: after join(), q.empty() can transiently be True
        # while the feeder pipe still holds the worker's verdict — poll
        # with a bounded blocking get instead so a completed oracle is
        # never mis-recorded as a dead worker.
        try:
            status, detail, dt = q.get(timeout=5)
        except queue.Empty:
            status, detail, dt = (
                "error", "worker died without result", time.time() - t0)
        verdicts[name] = {"status": status, "detail": detail,
                          "oracle_sec": round(dt, 1)}
        print(f"{status.upper()} {name} ({detail if status != 'pass' else detail})",
              flush=True)
    return verdicts


def load_bench(path):
    with open(path) as f:
        d = json.loads(f.read())
    return d


def ratios(base_q, dec_q):
    out = {}
    for k, tb in base_q.items():
        td = dec_q.get(k)
        if td is None:
            continue
        out[k] = {"base_sec": round(tb, 3), "decade_sec": round(td, 3),
                  "ratio": round(td / tb, 2) if tb > 1e-6 else None}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/scale")
    ap.add_argument("--decades", nargs="+", default=["sf1:10"],
                    help="name:replicas[:table,subset] per decade")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", default="8")
    ap.add_argument("--reps", default="2")
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-key DuckDB oracle budget, seconds")
    ap.add_argument("--skip", default="",
                    help="comma-separated keys to skip in the oracle sweep")
    ap.add_argument("--only", default="",
                    help="comma-separated key subset (dev loop)")
    ap.add_argument("--no-bench", action="store_true",
                    help="sweep correctness only")
    ap.add_argument("--no-sweep", action="store_true",
                    help="bench ratios only (skip Verify + oracle compare)")
    ap.add_argument("--force-gen", action="store_true",
                    help="regenerate decade data even if present")
    args = ap.parse_args()

    if not CLASSES.is_dir():
        sys.exit("compile first: sbt -batch compile")
    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    skip = tuple(s for s in args.skip.split(",") if s)
    only = set(s for s in args.only.split(",") if s) or None
    env = {"SPARK_GRAFT_CPUS": args.cpus, "SPARK_GRAFT_REPS": args.reps}

    # Bench warm protocol wants an sf0.001 sibling next to the target dir
    warm_link = work / "sf0.001"
    warm_src = Path(args.base).parent / "sf0.001"
    if warm_src.is_dir() and not warm_link.exists():
        warm_link.symlink_to(warm_src)

    artifact = {"base": args.base, "cpus": args.cpus, "reps": args.reps,
                "oracle_timeout_sec": args.timeout,
                "skip": list(skip),
                "flake_note": ("dedup_embedding: LSH-vs-exact-oracle flake "
                               "bound < 1e-3 per decade (see module doc)"),
                "decades": {}}

    base_bench_q = None
    if not args.no_bench:
        print(f"== bench base {args.base}", flush=True)
        bpath = work / "bench_base.json"
        java_main("graft.Bench", list(only) if only else [],
                  {**env, "SPARK_GRAFT_SF_DIR": args.base,
                   "SPARK_GRAFT_BENCH_OUT": str(bpath)},
                  log=str(work / "bench_base.log"))
        base = load_bench(bpath)
        base_bench_q = base["queries"]
        artifact["base_bench"] = {"total": base["value"],
                                  "errors": base.get("errors", {})}

    for spec in args.decades:
        parts = spec.split(":")
        name, replicas = parts[0], parts[1]
        tables = parts[2] if len(parts) > 2 else None
        dec_dir = work / name
        dec = {"replicas": int(replicas), "tables": tables}
        print(f"== decade {name} ({replicas}x{' ' + tables if tables else ''})",
              flush=True)
        if args.force_gen or not dec_dir.is_dir():
            gs_args = [args.base, str(dec_dir), replicas]
            if tables:
                gs_args.append(tables)
            dec["gen_sec"] = java_main("graft.GenScale", gs_args, env,
                                       log=str(work / f"gen_{name}.log"))
        if not args.no_sweep:
            vdir = work / f"verify_{name}"
            v_args = [str(dec_dir), str(vdir)]
            if only:
                v_args.append(",".join(sorted(only)))
            dec["verify_sec"] = java_main("graft.Verify", v_args, env,
                                          log=str(work / f"verify_{name}.log"))
            dec["oracle"] = oracle_sweep(str(dec_dir), str(vdir), args.timeout,
                                         skip, only)
            counts = {}
            for v in dec["oracle"].values():
                counts[v["status"]] = counts.get(v["status"], 0) + 1
            dec["oracle_counts"] = counts
            print(f"== {name} oracle counts: {counts}", flush=True)

        if not args.no_bench:
            bpath = work / f"bench_{name}.json"
            java_main("graft.Bench", list(only) if only else [],
                      {**env, "SPARK_GRAFT_SF_DIR": str(dec_dir),
                       "SPARK_GRAFT_BENCH_OUT": str(bpath)},
                      log=str(work / f"bench_{name}.log"))
            b = load_bench(bpath)
            dec["bench"] = {"total": b["value"], "errors": b.get("errors", {}),
                            "keys": ratios(base_bench_q, b["queries"])}
            rs = sorted(r["ratio"] for r in dec["bench"]["keys"].values()
                        if r["ratio"] is not None)
            if rs:
                dec["bench"]["ratio_median"] = rs[len(rs) // 2]
                dec["bench"]["ratio_max"] = rs[-1]
        artifact["decades"][name] = dec
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"== wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
