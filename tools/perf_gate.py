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
  python tools/perf_gate.py --check-baseline [0.10]  # probe floor
      re-measured isolated vs the pin; warns >10% drift either way
  python tools/perf_gate.py --write-bands [--force]  # pin per-key
      NORMALIZED history-band floors from the current BENCH_DETAIL
      (r13; refuses a loaded-host source run unless --force)

bench.py also runs the comparison AUTOMATICALLY after every full run
(reference: $SPARK_GRAFT_PERF_REF, default HEAD:BENCH_DETAIL.json —
the last committed cert) and embeds the result as the 'perf_gate'
block in BENCH_DETAIL.json, auto-adjudicating any flagged key with one
fresh-JVM head-position re-measure (the r8 manual recipe as tooling).

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
BANDS = os.path.join(REPO, "tools", "history_bands.json")


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


def pinned_bands() -> dict | None:
    """The PINNED per-key history bands (tools/history_bands.json,
    r13 — VERDICT r12 task 4): probe-NORMALIZED per-key seconds from
    one adjudicated run, written by ``--write-bands``. Rationale: the
    rolling ``committed_history`` band is the max of the last 4
    committed artifacts' RAW in-suite times — three consecutive
    loaded-host rounds compound that max upward until a genuinely
    regressed key fits inside it. The pin resets the band to one
    known-good floor in host-independent (normalized) units; keys
    missing from the pin (new this round) fall back to the rolling
    band. Returns {key: normalized_sec} or None when no pin exists."""
    if not os.path.exists(BANDS):
        return None
    return _load(BANDS)["queries"]


def write_bands(force: bool = False) -> int:
    """Pin tools/history_bands.json from the current
    BENCH_DETAIL.json: per-key band value = raw in-suite seconds /
    the run's probe ratio (normalized units, matched by
    ``adjudicate(band_normalized=True)``). Refuses a loaded-host
    source run (ambient entry loadavg >= 1.0 — the exact compounding
    this file exists to stop) unless ``force``; the source run's
    load and probe ratio are recorded either way so the pin's
    provenance is auditable."""
    detail = _load(DETAIL)
    load = float(detail.get("loadavg_start") or 0.0)
    ratio = _probe_ratio(detail)
    if load >= 1.0 and not force:
        print(
            f"refusing to pin bands from a loaded run (ambient entry "
            f"loadavg {load} >= 1.0) — rerun on a quiet host or pass "
            "--force (the probe normalization is recorded, but a "
            "quiet-host floor is the point of the pin)"
        )
        return 1
    queries = {
        k: round(t / ratio, 3)
        for k, t in (detail.get("queries") or {}).items()
    }
    out = {
        "queries": queries,
        "source": {
            "sf": detail.get("sf"),
            "n_queries": detail.get("n_queries"),
            "loadavg_start": detail.get("loadavg_start"),
            "probe_ratio_median": round(ratio, 3),
            "forced": bool(force and load >= 1.0),
        },
    }
    with open(BANDS, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"pinned {len(queries)} normalized band floors "
        f"(source load {load}, probe ratio {round(ratio, 3)})"
    )
    return 0


def committed_history(keys, n: int = 4, repo: str = REPO) -> dict:
    """Per-key committed bench history: the 'queries' values of each
    of the last ``n`` commits that touched BENCH_DETAIL.json, read
    mechanically from git (round-10: the judge had to do this by hand
    to refute three false 'regression' verdicts — the artifacts were
    in git all along). Returns {key: [sec, ...]} with one entry per
    commit that benched the key; a commit whose artifact is unreadable
    is skipped, never raised on."""
    import subprocess

    try:
        shas = subprocess.run(
            ["git", "-C", repo, "log", "-n", str(n), "--format=%H",
             "--", "BENCH_DETAIL.json"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
    except Exception:
        return {k: [] for k in keys}
    hist: dict[str, list[float]] = {k: [] for k in keys}
    for sha in shas:
        try:
            d = json.loads(
                subprocess.run(
                    ["git", "-C", repo, "show",
                     f"{sha}:BENCH_DETAIL.json"],
                    capture_output=True, text=True, check=True,
                ).stdout
            )
        except Exception:
            continue
        q = d.get("queries") or {}
        for k in keys:
            if k in q:
                hist[k].append(float(q[k]))
    return hist


def adjudicate(
    iso_norms: list[float],
    ref: float,
    threshold: float,
    history: list[float],
    band_tol: float = 1.10,
    iso_raws: list[float] | None = None,
    band_normalized: bool = False,
) -> str:
    """Pure verdict rule for a flagged key (round-10, pytest-driven):
    a key is a REGRESSION only when (a) EVERY fresh-JVM isolated
    re-measure stays above threshold x the reference — one noisy
    child reading can no longer convict alone — and (b) its BEST
    isolated time also sits above the committed history band
    (max of the key's last certified times x ``band_tol``); a time
    the repo has already certified is a host-window difference, not
    a code regression.

    UNITS (ADVICE r10 #2): the history band is built from RAW
    committed in-suite seconds, so the band comparison must use the
    RAW isolated child seconds (``iso_raws`` — the child time before
    probe division), not the probe-normalized ones: on a fast host
    (probe ratio < 1) a normalized time is deflated and a real
    regression could slip inside the band. The threshold check in (a)
    stays normalized — it compares against the probe-normalized
    reference the flag was raised from. Raw isolated times are
    head-of-segment single-key floors while the band is in-suite
    min-of-reps (position bias only ever INFLATES in-suite numbers),
    so raw-vs-raw is conservative in the safe direction: a genuinely
    regressed key reads slow even at the head position. When
    ``iso_raws`` is absent (older callers) the normalized times are
    used, preserving the pre-fix behavior.

    ``band_normalized`` (r13): a band read from the PINNED
    tools/history_bands.json is stored in probe-NORMALIZED units, so
    the comparison uses the normalized child measures (unit
    consistency the other way around — raw-vs-raw for the rolling
    committed band, normalized-vs-normalized for the pin).

    Verdicts:

    - 'position_noise'     — a re-measure came in under threshold
      (the in-suite flag was segment position / ambient load);
    - 'within_history_band' — all re-measures above threshold, but
      the best one is inside the committed band;
    - 'regression'         — confirmed by every re-measure AND
      outside the band: a real finding."""
    if not iso_norms:
        return "unadjudicated"
    rels = [x / ref for x in iso_norms]
    if min(rels) <= threshold:
        return "position_noise"
    if band_normalized:
        band_side = iso_norms
    else:
        band_side = iso_raws if iso_raws else iso_norms
    if history and min(band_side) <= max(history) * band_tol:
        return "within_history_band"
    return "regression"


def refcode_verdict(
    new_norms: list[float],
    old_norm: float | None,
    ref: float,
    threshold: float,
    tol: float = 1.15,
) -> str:
    """Final adjudication layer (round-10): a key whose regression
    verdict survived two children + the history band is re-measured
    with the REFERENCE COMMIT'S CODE in the SAME host window (git
    worktree child). If the unchanged old code also exceeds the
    threshold here AND the new code is not materially slower than the
    old code side-by-side (best new <= old x ``tol``), the window is
    guilty, not the code — verdict 'window_drift'. Only a key where
    the old code stays fast while the new code is slow (or the new
    code reads >``tol`` x the old code) remains a 'regression'. This
    is the r9 BENCH_AB device (same-code A/B in one window) as
    tooling instead of a judge's by-hand artifact."""
    if old_norm is None or not new_norms:
        return "regression"  # could not re-measure: keep the finding
    old_rel = old_norm / ref
    if old_rel > threshold and min(new_norms) <= old_norm * tol:
        return "window_drift"
    return "regression"


def compare(cur: dict, ref_queries: dict, threshold: float) -> dict:
    """Pure probe-normalized comparison of a BENCH_DETAIL-shaped dict
    against a reference's per-key times. Returns a JSON-able block —
    the same structure bench.py embeds into BENCH_DETAIL.json as
    'perf_gate' so the judge reads one artifact instead of re-running
    the tool."""
    ratio = _probe_ratio(cur)
    rows = []
    flagged: dict[str, dict] = {}
    for key, t in sorted(cur.get("queries", {}).items()):
        r = ref_queries.get(key)
        if not r:
            continue  # new key this round — nothing to compare
        norm = t / ratio
        rel = norm / r
        rows.append((rel, key, t, norm, r))
        if rel > threshold:
            flagged[key] = {
                "raw": round(t, 3),
                "norm": round(norm, 3),
                "ref": round(r, 3),
                "rel": round(rel, 2),
            }
    rows.sort(reverse=True)
    return {
        "probe_ratio": round(ratio, 3),
        "threshold": threshold,
        "compared": len(rows),
        "rows": rows,
        "flagged": flagged,
    }


def gate(ref_path: str, threshold: float) -> int:
    cur = _load(DETAIL)
    ref = _load_ref(ref_path)
    res = compare(cur, ref.get("queries") or {}, threshold)
    print(
        f"probe_ratio_median={res['probe_ratio']} (ambient divisor); "
        f"threshold={threshold}; compared={res['compared']} keys"
    )
    for rel, key, t, norm, r in res["rows"][:15]:
        mark = "FLAG" if rel > threshold else "  ok"
        print(
            f"{mark} {key}: raw={t:.3f}s norm={norm:.3f}s "
            f"ref={r:.3f}s norm/ref={rel:.2f}"
        )
    if res["flagged"]:
        print(f"\nFLAGGED ({len(res['flagged'])}): "
              f"{', '.join(res['flagged'])}")
        return 1
    print("\nno normalized regressions above threshold")
    return 0


def _eval_baseline_drift(
    base: dict, fresh: dict, max_drift: float
) -> list[tuple]:
    """(key, pinned, fresh, drift, stale) for EVERY pinned probe —
    stale when the fresh floor moved more than ``max_drift`` in either
    direction, or when the fresh run did not measure the key (renamed
    probe = stale pin too). One row per key so the caller prints the
    same numbers the verdict is computed from (one drift formula)."""
    rows = []
    for k, b in sorted(base.items()):
        f = fresh.get(k)
        if f is None:
            rows.append((k, b, None, None, True))
            continue
        drift = f / b - 1.0
        rows.append((k, b, f, drift, abs(drift) > max_drift))
    return rows


def check_baseline(max_drift: float = 0.10) -> int:
    """Re-measure the three probe keys ISOLATED (one fresh-JVM
    bench.py --child run with no suite keys) and compare their floor
    to the pinned tools/probe_baseline.json. The baseline silently
    goes stale after a Spark-conf or probe-plan change (the test suite
    guards key NAMES only); this mode detects a moved clean floor —
    >``max_drift`` in EITHER direction — and says to re-pin. Exit 0 =
    baseline holds, 1 = stale (re-measured floors printed), 2 = could
    not measure."""
    import subprocess
    import tempfile

    if not os.path.exists(BASELINE):
        print("no pinned baseline (tools/probe_baseline.json missing)")
        return 2
    base = _load(BASELINE)["probe_secs"]
    bench = os.path.join(REPO, "bench.py")
    with tempfile.NamedTemporaryFile(
        mode="r", suffix=".json", prefix="graft_probe_chk_", delete=False
    ) as fh:
        out_path = fh.name
    try:
        proc = subprocess.run(
            [sys.executable, bench, "--child", out_path],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        if proc.returncode != 0:
            print(f"probe re-measure child failed (exit {proc.returncode})")
            return 2
        fresh = _load(out_path)["probe_secs"]
    finally:
        if os.path.exists(out_path):
            os.unlink(out_path)
    rows = _eval_baseline_drift(base, fresh, max_drift)
    for k, b, f, drift, _stale in rows:
        if f is not None:
            print(f"{k}: pinned={b:.3f}s fresh={f:.3f}s drift={drift:+.1%}")
        else:
            print(f"{k}: pinned={b:.3f}s fresh=MISSING")
    stale = [r for r in rows if r[4]]
    if stale:
        print(
            f"\nBASELINE STALE ({len(stale)} probe(s) moved "
            f">{max_drift:.0%}): re-pin with --write-baseline after a "
            "clean certified run (a moved floor mis-normalizes every "
            "perf_gate comparison)"
        )
        return 1
    print("\nbaseline holds (all probes within drift band)")
    return 0


def main() -> int:
    args = sys.argv[1:]
    if args[:1] == ["--write-baseline"]:
        write_baseline()
        return 0
    if args[:1] == ["--write-bands"]:
        return write_bands(force="--force" in args[1:])
    if args[:1] == ["--check-baseline"]:
        drift = float(args[1]) if args[1:] else 0.10
        return check_baseline(drift)
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
        raise SystemExit(
            "need --ref <bench json>, --write-baseline, or "
            "--check-baseline [max_drift]"
        )
    return gate(ref, threshold)


if __name__ == "__main__":
    sys.exit(main())
