#!/usr/bin/env python3
"""Core-scaling panel from two graft.Bench artifacts (VERDICT r10 ask #8).

Usage: python3 tools/core_panel.py <bench_hi.json> <bench_lo.json> <out.json>

Emits per-key ratio = t_lo / t_hi (ratio > 1 means the extra cores of the
hi run bought wall-clock), plus medians over the whole surface and over the
shuffle-heavy keys, so the "does parallelism exist at this scale" question
has a committed, recomputable answer.
"""
import json
import statistics
import sys


def main() -> None:
    hi_path, lo_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    hi = json.load(open(hi_path))
    lo = json.load(open(lo_path))
    qh, ql = hi["queries"], lo["queries"]
    common = sorted(set(qh) & set(ql))
    per_key = {k: round(ql[k] / qh[k], 3) for k in common}
    ratios = list(per_key.values())
    # keys whose plans are shuffle/sort-bound (the ones extra cores should
    # move): the two-level rank/bisection family, joins, dedup candidate
    # joins, grouping-set aggregates
    shuffleheavy = [k for k in common if k.split("_")[0] in
                    ("join", "dedup", "sim", "graph")
                    or k in ("agg_quantiles_multi", "agg_weighted_median",
                             "window_rank", "window_distribution",
                             "stat_anderson_darling", "market_basket_lift",
                             "agg_distinct", "agg_cube", "agg_rollup",
                             "set_ops_all", "text_tfidf",
                             "text_bigram_logprob", "ml_naive_bayes")]
    out = {
        "hi": {"path": hi_path, "cpus": None, "total": sum(qh[k] for k in common)},
        "lo": {"path": lo_path, "cpus": None, "total": sum(ql[k] for k in common)},
        "n_common": len(common),
        "median_ratio_all": round(statistics.median(ratios), 3),
        "median_ratio_shuffle_heavy": round(statistics.median(
            [per_key[k] for k in shuffleheavy]), 3),
        "n_ratio_gt_1_25": sum(1 for r in ratios if r > 1.25),
        "shuffle_heavy_keys": {k: per_key[k] for k in shuffleheavy},
        "per_key": per_key,
    }
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=False)
    print(f"panel -> {out_path}: median(all)={out['median_ratio_all']} "
          f"median(shuffle-heavy)={out['median_ratio_shuffle_heavy']} "
          f"n>1.25x={out['n_ratio_gt_1_25']}/{len(common)}")


if __name__ == "__main__":
    main()
