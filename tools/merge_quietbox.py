#!/usr/bin/env python3
"""Merge N graft.Bench JSON lines into the quiet-box artifact (dev tool,
the committed form of the hand process used rounds 6-11): per-query
minima across runs, merged-min total, per-run totals, and spread gates —
per-query (max observed / min observed) plus the best-two spread, so a
"floor moved" claim can be checked against observation stability instead
of being booked off one noisy run.

Usage: merge_quietbox.py <runs.jsonl> <out.json>
"""
import json
import sys


def main():
    runs_path, out_path = sys.argv[1], sys.argv[2]
    runs = [json.loads(line) for line in open(runs_path)
            if line.strip()]
    if not runs:
        sys.exit("merge_quietbox: no bench lines found")
    names = sorted(set(n for r in runs for n in r["queries"]))
    merged, spread, best_two, norm = {}, {}, {}, {}
    for n in names:
        obs = sorted(r["queries"][n] for r in runs
                     if n in r["queries"] and r["queries"][n] >= 0)
        if not obs:
            continue
        merged[n] = obs[0]
        spread[n] = round(obs[-1] / obs[0], 3) if obs[0] > 0 else None
        if len(obs) >= 2 and obs[0] > 0:
            best_two[n] = round(obs[1] / obs[0], 3)
        # sentinel-normalized floor (r12 VERDICT #3): each run's query
        # time divided by THAT run's sentinel (the box's own pure-CPU
        # speed), min across runs — a floor that moves in raw seconds
        # but not in ratio moved with the box, not the engine
        ratios = sorted(r["queries"][n] / r["sentinel"] for r in runs
                        if n in r["queries"] and r["queries"][n] >= 0
                        and r.get("sentinel", -1) > 0)
        if ratios:
            norm[n] = round(ratios[0], 3)
    flagged = sorted(n for n, s in best_two.items() if s and s > 1.3)
    out = {
        "note": ("quiet-box: merged per-query minima over "
                 f"{len(runs)} full Bench runs (tools/quietbox.sh); "
                 "flagged = best-two spread > 1.3x, treat those floors "
                 "as unpinned"),
        "runs": len(runs),
        "sf": runs[0].get("sf"),
        "totals": [r["value"] for r in runs],
        "merged_min_total": sum(merged.values()),
        "sentinels": [r.get("sentinel") for r in runs],
        "queries": merged,
        "ratio_to_sentinel": norm,
        "spread_max_over_min": spread,
        "best_two_spread": best_two,
        "flagged_unstable": flagged,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"merged_min_total={out['merged_min_total']:.2f} "
          f"runs={len(runs)} flagged={flagged}")


if __name__ == "__main__":
    main()
