#!/usr/bin/env python3
"""Isolated before/after measurement for the optimization rounds.

Runs fixed GROUPS of bench keys through ``bench.py --child`` (fresh
JVM per group, head position, min-of-RUNS — the same statistic the
bench itself records) and writes one JSON with per-key seconds plus
each group's probe ratio vs tools/probe_baseline.json. Keeping the
group composition fixed between the before and after runs makes the
comparison position-fair.

    python tools/measure_groups.py OUT.json [group ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GROUPS: dict[str, list[str]] = {
    "g1_audit": ["rtbf_audit_report"],
    "g2_graph_loops": [
        "adamic_adar_linkpred", "graph_components", "bfs_hop_distance",
        "personalized_pagerank", "graph_kcore",
    ],
    "g3_graph_aggs": [
        "triangle_cooccurrence", "frequent_triples", "pagerank_suppliers",
        "item_similarity_topk", "corpus_funnel",
    ],
    "g4_dedup": [
        "corpus_release", "cluster_safe_split", "dedup_rate_by_source",
        "lsh_band_plan",
    ],
    "g5_stores": [
        "incremental_dup_clusters", "dup_clusters_forget",
        "incremental_graph_stats", "graph_stats_forget",
    ],
    "g6_vector": [
        "chunk_hybrid_retrieval", "chunk_ann_retrieval",
        "ivf_retrain_execute", "ivf_retrain_plan", "ivf_nprobe_plan",
        "pq_retrain_plan",
    ],
    "g7_python": [
        "streaming_dedup_watermark", "containment_dedup",
        "prefix_filter_join", "rerank_crossencoder", "corpus_to_sequences",
    ],
}


def _probe_ratio(probe_secs: dict) -> float | None:
    path = os.path.join(REPO, "tools", "probe_baseline.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        base = json.load(fh)["probe_secs"]
    rs = sorted(
        probe_secs[k] / base[k] for k in probe_secs if base.get(k)
    )
    if not rs:
        return None
    n = len(rs)
    return (rs[n // 2] + rs[(n - 1) // 2]) / 2.0


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:] or list(GROUPS)
    result: dict = {"groups": {}}
    for gname in names:
        keys = GROUPS[gname]
        with tempfile.NamedTemporaryFile(
            suffix=".json", prefix="graft_measure_", delete=False
        ) as fh:
            child_out = fh.name
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--child", child_out, *keys],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            if proc.returncode != 0:
                result["groups"][gname] = {"error": proc.returncode}
                continue
            with open(child_out) as fh:
                child = json.load(fh)
        finally:
            if os.path.exists(child_out):
                os.unlink(child_out)
        ratio = _probe_ratio(child.get("probe_secs", {}))
        result["groups"][gname] = {
            "timings": child["timings"],
            "spread_pct": child.get("spread_pct", {}),
            "train_secs": child.get("train_secs", {}),
            "probe_ratio": round(ratio, 3) if ratio else None,
            "loadavg_start": child.get("loadavg_start"),
        }
        print(gname, json.dumps(result["groups"][gname]["timings"]),
              "probe", result["groups"][gname]["probe_ratio"], flush=True)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
