"""Pool scaling-campaign legs into the least-interference estimator.

Host noise on this box is ONE-SIDED (hypervisor throttle waves only ever
slow a leg down), so the best available estimator of the engine's true
phase cost at each parallelism is the MINIMUM per phase per parallelism
across every retained leg — the same min-of-reps logic bench.py applies
per query. This tool reads any number of campaign summary files
(the ``scaling_last_run.json`` schema: ``lo_runs`` / ``hi_runs`` raw-leg
lists) and/or campaign logs containing that JSON, pools the legs, and
prints the pooled per-phase and end-to-end efficiencies.

Usage:
    python BENCH/pool_legs.py FILE [FILE...]
where FILE is a summary JSON or a run log whose tail contains one.
"""

from __future__ import annotations

import json
import re
import sys


def _load_summaries(paths: list[str]) -> list[dict]:
    out = []
    for p in paths:
        text = open(p).read()
        try:
            out.append(json.loads(text))
            continue
        except json.JSONDecodeError:
            pass
        # log file: find the last top-level JSON object (the campaign
        # summary is pretty-printed starting at column 0)
        starts = [m.start() for m in re.finditer(r"^\{", text, re.M)]
        found = None
        for s in reversed(starts):
            dec = json.JSONDecoder()
            try:
                obj, _ = dec.raw_decode(text[s:])
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and "lo_runs" in obj:
                found = obj
                break
        if found is None:
            print(f"warning: no campaign summary found in {p}", file=sys.stderr)
        else:
            out.append(found)
    return out


def pool(summaries: list[dict]) -> dict:
    lo = [r for s in summaries for r in s.get("lo_runs", [])]
    hi = [r for s in summaries for r in s.get("hi_runs", [])]
    if not lo or not hi:
        raise SystemExit("no legs found")
    # r5 ADVICE fix: refuse to pool campaigns with mismatched configs —
    # mixing core counts (or page counts, when recorded) silently produces
    # a wrong pooled efficiency
    for s in summaries[1:]:
        if (s["n_lo"], s["n_hi"]) != (summaries[0]["n_lo"], summaries[0]["n_hi"]):
            raise SystemExit(
                f"refusing to pool mismatched campaigns: ({s['n_lo']},{s['n_hi']}) "
                f"vs ({summaries[0]['n_lo']},{summaries[0]['n_hi']})"
            )
    n_lo = summaries[0]["n_lo"]
    n_hi = summaries[0]["n_hi"]
    ratio = n_hi / n_lo
    phases = [p for p in lo[0]["phases"]]

    def mins(runs):
        return {p: min(r["phases"][p] for r in runs if p in r.get("phases", {}))
                for p in phases}

    lo_min, hi_min = mins(lo), mins(hi)
    phase_eff = {p: round(lo_min[p] / hi_min[p] / ratio, 3) for p in phases}
    lo_e2e = sum(lo_min.values())
    hi_e2e = sum(hi_min.values())
    steady_phases = [p for p in ("merge", "pyramid", "polygon") if p in phases]
    lo_st = sum(lo_min[p] for p in steady_phases)
    hi_st = sum(hi_min[p] for p in steady_phases)
    return {
        "n_lo": n_lo,
        "n_hi": n_hi,
        "legs_pooled": {"lo": len(lo), "hi": len(hi)},
        "lo_phase_min_sec": lo_min,
        "hi_phase_min_sec": hi_min,
        "phase_efficiency": phase_eff,
        "pooled_end_to_end": {
            "lo_sec": round(lo_e2e, 2),
            "hi_sec": round(hi_e2e, 2),
            "efficiency": round(lo_e2e / hi_e2e / ratio, 3),
        },
        "pooled_steady": {
            "lo_sec": round(lo_st, 2),
            "hi_sec": round(hi_st, 2),
            "efficiency": round(lo_st / hi_st / ratio, 3),
        },
        "pooled_min_over_min_wall": round(
            min(r["wall_sec"] for r in lo) / min(r["wall_sec"] for r in hi) / ratio, 3
        ),
    }


if __name__ == "__main__":
    print(json.dumps(pool(_load_summaries(sys.argv[1:])), indent=2))
