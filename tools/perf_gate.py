#!/usr/bin/env python
"""Probe-normalized round-over-round perf adjudication (round-8).

Replaces the hand-built drift argument the r7 cert needed: compares
the current BENCH_DETAIL.json against a reference round's bench
artifact, normalizing the current per-key times by the run's own
probe ratio (head-of-segment times of three never-touched keys vs the
pinned clean baseline in tools/probe_baseline.json). A key is flagged
only when it is still >THRESHOLD x its reference time AFTER the
ambient slowdown measured on untouched keys is divided out.

Usage:
  python tools/perf_gate.py --ref BENCH_r07.json [--threshold 1.3]
  python tools/perf_gate.py --write-baseline   # pin current probes

--write-baseline reads BENCH_DETAIL.json (which must come from a
clean, uncontended certified run) and pins the MIN across segments of
each probe key as the baseline — min because the baseline should be
the uncontended floor, and any segment-local contention only inflates.

Exit code: 0 = no flagged keys, 1 = regressions flagged (printed).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")
BASELINE = os.path.join(REPO, "tools", "probe_baseline.json")


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _load_ref(spec: str) -> dict:
    """Load a reference bench artifact. Accepts a plain JSON path, a
    driver wrapper (BENCH_r{N}.json: {'parsed': {...}, 'tail': '...'}
    — unwrapped automatically; note the driver's compact line truncates
    'queries' to the 10 slowest), or '<commit>:<path>' git-show syntax
    for a full per-key BENCH_DETAIL.json from a past cert commit."""
    import subprocess

    p = os.path.join(REPO, spec)
    if os.path.exists(p):
        d = _load(p)
    elif ":" in spec:
        out = subprocess.run(
            ["git", "-C", REPO, "show", spec],
            capture_output=True, text=True, check=True,
        ).stdout
        d = json.loads(out)
    else:
        raise SystemExit(f"reference {spec!r} not found")
    if "queries" not in d and "parsed" in d and d["parsed"]:
        d = d["parsed"]
    if "queries" not in d and isinstance(d.get("tail"), str):
        d = json.loads(d["tail"])
    return d


def write_baseline() -> None:
    detail = _load(DETAIL)
    probes = [p for p in detail.get("segment_probes", []) if p]
    if not probes:
        raise SystemExit(
            "BENCH_DETAIL.json carries no segment_probes — rerun "
            "bench.py first"
        )
    keys = sorted({k for p in probes for k in p})
    base = {k: min(p[k] for p in probes if k in p) for k in keys}
    out = {
        "probe_secs": base,
        "source": {
            "sf": detail.get("sf"),
            "n_queries": detail.get("n_queries"),
            "loadavg_start": detail.get("loadavg_start"),
        },
    }
    with open(BASELINE, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"pinned probe baseline: {base}")


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return (s[n // 2] + s[(n - 1) // 2]) / 2.0 if n else None


def _probe_ratio(cur: dict) -> float:
    """Ambient-slowdown divisor for the current run: recomputed here
    from segment_probes + the baseline FILE (not the run's stored
    probe_ratio_median), so a baseline pinned AFTER a run was measured
    still normalizes that run. Falls back to the stored value, then to
    1.0 (no normalization) when no baseline exists."""
    if os.path.exists(BASELINE):
        base = _load(BASELINE)["probe_secs"]
        meds = [
            _median([p[k] / base[k] for k in p if base.get(k)])
            for p in cur.get("segment_probes", [])
            if p
        ]
        meds = [m for m in meds if m is not None]
        if meds:
            return _median(meds)
    return cur.get("probe_ratio_median") or 1.0


def gate(ref_path: str, threshold: float) -> int:
    cur = _load(DETAIL)
    ref = _load_ref(ref_path)
    ref_queries = ref.get("queries") or {}
    ratio = _probe_ratio(cur)
    flagged = []
    rows = []
    for key, t in sorted(cur.get("queries", {}).items()):
        r = ref_queries.get(key)
        if not r:
            continue  # new key this round — nothing to compare
        norm = t / ratio
        rel = norm / r
        rows.append((rel, key, t, norm, r))
        if rel > threshold:
            flagged.append(key)
    rows.sort(reverse=True)
    print(
        f"probe_ratio_median={ratio} (ambient divisor); "
        f"threshold={threshold}; compared={len(rows)} keys"
    )
    for rel, key, t, norm, r in rows[:15]:
        mark = "FLAG" if rel > threshold else "  ok"
        print(
            f"{mark} {key}: raw={t:.3f}s norm={norm:.3f}s "
            f"ref={r:.3f}s norm/ref={rel:.2f}"
        )
    if flagged:
        print(f"\nFLAGGED ({len(flagged)}): {', '.join(flagged)}")
        return 1
    print("\nno normalized regressions above threshold")
    return 0


def main() -> int:
    args = sys.argv[1:]
    if args[:1] == ["--write-baseline"]:
        write_baseline()
        return 0
    ref = None
    threshold = 1.3
    i = 0
    while i < len(args):
        if args[i] == "--ref":
            ref = args[i + 1]
            i += 2
        elif args[i] == "--threshold":
            threshold = float(args[i + 1])
            i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")
    if not ref:
        raise SystemExit("need --ref <bench json> or --write-baseline")
    return gate(ref, threshold)


if __name__ == "__main__":
    sys.exit(main())
