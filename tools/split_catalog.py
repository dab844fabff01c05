#!/usr/bin/env python
"""One-shot mechanical splitter: queries.py / oracles.py -> packages.

Round-8 maintenance move requested by the round-7 review: the two
monolithic catalog files (15.7k / 7.7k LoC) become ``queries/`` and
``oracles/`` packages of domain modules, with ``__init__.py``
re-exporting every public AND underscore name so all existing
consumers (`from aproximacion_1_etl_spark.queries import ALL_QUERIES,
_trained_codebook, q_x...`) keep working unchanged.

The move is AST-driven and verbatim: each top-level node's source
segment (including its leading comments) is copied byte-for-byte into
exactly one generated module; nothing is rewritten. Invariants
asserted at the end: every q_ function and every helper lands exactly
once, every ALL_ORACLES key lands exactly once, and the regenerated
packages expose identical ALL_QUERIES / ALL_ORACLES mappings.

Prior analysis (this is what makes the split clean): zero q->q
references, zero helper->q references, zero `global` rebinding, zero
dynamic name access (globals()/eval) in either file.
"""

from __future__ import annotations

import ast
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "aproximacion_1_etl_spark")

# ---------------------------------------------------------------- domains

DOMAINS = [
    "etl",        # reference S/P/F/M chain, sources, formats
    "lakehouse",  # IVM, versioned tables, SCD, DQ, governance
    "tpch",       # relational joins/aggregates/SQL surface
    "windows",    # windows, as-of/range/temporal, funnels
    "profile",    # profiling, quantiles, sketches, samples, skyline
    "text",       # dedup, tokenization, corpus curation
    "vector",     # embeddings/ANN, multimodal, geo
    "graph",      # graph algorithms
    "streaming",  # structured streaming keys
    "analytics",  # stats / ML / experimentation (catch-all)
]

_RULES: list[tuple[str, str]] = [
    # (regex on the KEY name — function name minus the q_ prefix), domain
    (r"^streaming_", "streaming"),
    (r"^rest_stream_ingest$", "streaming"),
    (r"^(m\d+|p\d+|s\d+|f\d+)_", "etl"),
    (r"^(flagship_order_lifecycle|work_table_build|rest_datasource|"
     r"binary_file_source|csv_roundtrip|orc_roundtrip|xml_roundtrip|"
     r"auto_flatten|execute_immediate_param|sql_script_chain|pii_scrub|"
     r"log_parse|url_canonicalize|date_dim_gen)$", "etl"),
    (r"^(ivm_|incremental_rollup|cdf_|merge_on_read$|gated_publish$|"
     r"snapshot_|deletion_vector_read$|dynamic_overwrite$|scd2_|scd6_|"
     r"survivorship_golden$|compaction_plan$|backfill_plan$|table_diff$|"
     r"reconciliation_report$|ref_integrity$|fd_profile$|dq_checks$|"
     r"dq_observe$|zorder_pruned_scan$|bucketed_join_rollup$|"
     r"forget_user_cascade$|record_linkage$|k_anonymity$|"
     r"l_diversity_audit$)", "lakehouse"),
    (r"^q\d+_", "tpch"),
    (r"^(pricing_summary|topk_orders|join_|agg_|set_ops|pivot_status|"
     r"grouping_sets|skew_|sql_surface|recursive_cte|lateral_topn|"
     r"qualify_window_filter|correlated_scalar_subquery|sql_unpivot|"
     r"listagg_statuses|unpivot_status_counts|collated_group|"
     r"array_funcs|map_props|variant_props|share_of_parent|"
     r"drill_across|topn_with_other|revenue_concentration|"
     r"price_volume_mix|heavy_hitters_cms|approx_topk_types)", "tpch"),
    (r"^(window_|trailing_range_avg|ntile_quartiles|sessionize|"
     r"gap_fill_daily|multi_window_features|asof_|range_join_events|"
     r"max_concurrency|interpolate_missing|event_funnel|"
     r"cohort_retention|funnel_conversion_time|decayed_user_value|"
     r"cycle_time_stages|sequence_pattern_match|session_window_rollup|"
     r"new_users_daily|interval_|qualify_)", "windows"),
    (r"^(table_profile|incremental_profile|column_profile|"
     r"numeric_histogram|incremental_quantiles|event_value_quantiles|"
     r"grouped_quantiles|weighted_quantiles|approx_distinct|hll_|"
     r"segment_overlap_sketch|deterministic_sample|train_test_split|"
     r"stratified_sample|weighted_sample|robust_stats|winsorized_stats|"
     r"skyline_|incremental_skyline)", "profile"),
    (r"^(dedup_|sentence_dedup|ngram_jaccard|containment_dedup|"
     r"fuzzy_dedup_blocked|near_dup_verified|dup_clusters|"
     r"winnowed_duplicates|repeated_substrings|incremental_near_dup|"
     r"prefix_filter_join|text_profile|corpus_|token_|bpe_|"
     r"tfidf_top_terms|bm25_topk|lm_trigram_score|chunk_documents|"
     r"pack_sequences|training_batch_pack|length_bucketed_batches|"
     r"inverted_index|bigram_pmi|phrase_search|vocab_growth|"
     r"source_vocab_overlap|vocab_gini|zipf_fit|lang_confusion|"
     r"c4_boilerplate_filter|repetition_profile|doc_novelty|"
     r"length_histogram|domain_blocklist_filter|decontaminate|"
     r"temperature_mix_resample|domain_mix_resample|"
     r"rolling_hash_fingerprint|fingerprint_diff|top_tokens_per_lang|"
     r"udtf_sentences|naive_bayes_lang)", "text"),
    (r"^(ann_|embedding_|semantic_dedup|ivf_index_append|"
     r"hybrid_rrf_retrieval|rerank_crossencoder|kmeans_cluster_profile|"
     r"item_similarity_topk|hard_negative_mining|multimodal_|"
     r"frame_sample|geo_grid_knn|morton_cells|point_in_polygon_join|"
     r"haversine_nearest)", "vector"),
    (r"^(pagerank_suppliers|bfs_hop_distance|graph_|"
     r"triangle_cooccurrence|adamic_adar_linkpred|frequent_triples|"
     r"type_cooccurrence|event_bigrams|basket_rules)", "graph"),
]


def classify(key: str) -> str:
    for pat, dom in _RULES:
        if re.search(pat, key):
            return dom
    return "analytics"


# ---------------------------------------------------------------- helpers

def _segments(src: str):
    """(node, verbatim source incl. leading comments) per top-level node."""
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    out = []
    prev_end = 0
    for n in tree.body:
        seg = "".join(lines[prev_end: n.end_lineno])
        out.append((n, seg))
        prev_end = n.end_lineno
    tail = "".join(lines[prev_end:])
    return tree, out, tail


def _bound_names(imp) -> set[str]:
    names = set()
    for a in imp.names:
        if a.asname:
            names.add(a.asname)
        elif isinstance(imp, ast.ImportFrom):
            names.add(a.name)
        else:
            names.add(a.name.split(".")[0])
    return names


def _used_names(node) -> set[str]:
    used = {x.id for x in ast.walk(node) if isinstance(x, ast.Name)}
    used |= {
        x.value.id
        for x in ast.walk(node)
        if isinstance(x, ast.Attribute) and isinstance(x.value, ast.Name)
    }
    return used


def _needed_imports(import_segs, body_nodes) -> str:
    used = set()
    for n in body_nodes:
        used |= _used_names(n)
    keep = []
    for imp, seg in import_segs:
        if isinstance(imp, ast.ImportFrom) and imp.module == "__future__":
            keep.append(seg)
        elif _bound_names(imp) & used:
            keep.append(seg)
    return "".join(keep)


def _defined_names(nodes) -> list[str]:
    names = []
    for n in nodes:
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(n.name)
        elif isinstance(n, ast.Assign):
            for t in n.targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
        elif isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
            names.append(n.target.id)
    return names


def _all_literal(names: list[str]) -> str:
    body = "".join(f'    "{n}",\n' for n in names)
    return f"__all__ = [\n{body}]\n"


# ---------------------------------------------------------------- queries

def split_queries() -> None:
    path = os.path.join(PKG, "queries.py")
    src = open(path).read()
    tree, segs, tail = _segments(src)
    assert not tail.strip(), "unexpected trailing content"

    docstring = segs[0][1] if isinstance(segs[0][0], ast.Expr) else '"""queries"""\n'
    import_segs = [
        (n, s) for n, s in segs if isinstance(n, (ast.Import, ast.ImportFrom))
    ]

    common: list[tuple[ast.AST, str]] = []
    domains: dict[str, list[tuple[ast.AST, str]]] = {d: [] for d in DOMAINS}
    all_queries_seg = None
    for n, s in segs:
        if isinstance(n, (ast.Import, ast.ImportFrom)):
            continue
        if isinstance(n, ast.Expr) and s is docstring:
            continue
        if isinstance(n, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id == "ALL_QUERIES" for t in n.targets
        ):
            all_queries_seg = s
            continue
        if isinstance(n, ast.FunctionDef) and n.name.startswith("q_"):
            domains[classify(n.name[2:])].append((n, s))
        else:
            common.append((n, s))
    assert all_queries_seg is not None

    outdir = os.path.join(PKG, "queries")
    os.makedirs(outdir, exist_ok=True)

    # common.py — every helper/constant/cache, original order
    cnodes = [n for n, _ in common]
    cnames = _defined_names(cnodes)
    with open(os.path.join(outdir, "common.py"), "w") as fh:
        fh.write(
            '"""Shared helpers for the query catalog (mechanically moved '
            "from the\nmonolithic queries.py — every segment below is "
            'verbatim)."""\n\n'
        )
        fh.write(_needed_imports(import_segs, cnodes))
        fh.write("\n")
        for _, s in common:
            fh.write(s)
        fh.write("\n\n" + _all_literal(cnames))

    emitted_q: set[str] = set()
    for dom in DOMAINS:
        entries = domains[dom]
        if not entries:
            continue
        nodes = [n for n, _ in entries]
        qn = [n.name for n in nodes]
        emitted_q.update(qn)
        with open(os.path.join(outdir, f"{dom}.py"), "w") as fh:
            fh.write(
                f'"""Query catalog — {dom} domain (mechanically moved '
                'from queries.py)."""\n\n'
            )
            fh.write(_needed_imports(import_segs, nodes))
            fh.write("from .common import *  # noqa: F401,F403\n")
            fh.write("\n")
            for _, s in entries:
                fh.write(s)
            fh.write("\n\n" + _all_literal(qn))

    expected_q = {
        n.name
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name.startswith("q_")
    }
    assert emitted_q == expected_q, expected_q ^ emitted_q

    with open(os.path.join(outdir, "__init__.py"), "w") as fh:
        fh.write(docstring)
        fh.write("\nfrom .common import *  # noqa: F401,F403\n")
        for dom in DOMAINS:
            if domains[dom]:
                fh.write(f"from .{dom} import *  # noqa: F401,F403\n")
        fh.write("\n")
        fh.write(all_queries_seg)
    os.remove(path)


# ---------------------------------------------------------------- oracles

def split_oracles() -> None:
    path = os.path.join(PKG, "oracles.py")
    src = open(path).read()
    tree, segs, tail = _segments(src)
    assert not tail.strip()

    docstring = segs[0][1] if isinstance(segs[0][0], ast.Expr) else '"""oracles"""\n'
    import_segs = [
        (n, s) for n, s in segs if isinstance(n, (ast.Import, ast.ImportFrom))
    ]

    common: list[tuple[ast.AST, str]] = []
    dict_node = None
    # ALL_ORACLES["x"] = ... alias/extension lines after the literal
    post: list[tuple[ast.AST, str]] = []
    seen_dict = False
    for n, s in segs:
        if isinstance(n, (ast.Import, ast.ImportFrom)):
            continue
        if isinstance(n, ast.Expr) and s is docstring:
            continue
        if isinstance(n, (ast.Assign, ast.AnnAssign)):
            tgt = n.target if isinstance(n, ast.AnnAssign) else n.targets[0]
            if isinstance(tgt, ast.Name) and tgt.id == "ALL_ORACLES":
                dict_node = n
                seen_dict = True
                continue
            if isinstance(tgt, ast.Subscript):
                assert seen_dict
                post.append((n, s))
                continue
        common.append((n, s))
    assert dict_node is not None

    # split the big dict literal per key
    value = dict_node.value
    assert isinstance(value, ast.Dict)
    per_dom: dict[str, list[tuple[str, str, ast.AST]]] = {
        d: [] for d in DOMAINS
    }
    keys = []
    for k, v in zip(value.keys, value.values):
        assert isinstance(k, ast.Constant) and isinstance(k.value, str)
        seg = ast.get_source_segment(src, v)
        per_dom[classify(k.value)].append((k.value, seg, v))
        keys.append(k.value)
    assert len(keys) == len(set(keys))

    outdir = os.path.join(PKG, "oracles")
    os.makedirs(outdir, exist_ok=True)

    cnodes = [n for n, _ in common]
    cnames = _defined_names(cnodes)
    with open(os.path.join(outdir, "common.py"), "w") as fh:
        fh.write(
            '"""Shared DuckDB SQL builders/fragments for the oracle '
            "catalog\n(mechanically moved from the monolithic "
            'oracles.py)."""\n\n'
        )
        fh.write(_needed_imports(import_segs, cnodes))
        fh.write("\n")
        for _, s in common:
            fh.write(s)
        fh.write("\n\n" + _all_literal(cnames))

    for dom in DOMAINS:
        entries = per_dom[dom]
        if not entries:
            continue
        with open(os.path.join(outdir, f"{dom}.py"), "w") as fh:
            fh.write(
                f'"""Oracle SQL — {dom} domain (entries mechanically '
                'moved from oracles.py, values verbatim)."""\n\n'
            )
            fh.write(_needed_imports(import_segs, [v for _, _, v in entries]))
            fh.write("from .common import *  # noqa: F401,F403\n\n")
            # values are copied verbatim (no re-indentation: bytes
            # inside triple-quoted SQL strings must not change);
            # continuation lines keep their original dict-literal
            # indentation, which is valid anywhere inside a literal
            fh.write("ORACLES: dict[str, str] = {\n")
            for key, seg, _ in entries:
                fh.write(f'    "{key}": ' + seg + ",\n")
            fh.write("}\n")

    with open(os.path.join(outdir, "__init__.py"), "w") as fh:
        fh.write(docstring)
        fh.write("\n")
        fh.write(_needed_imports(import_segs, [n for n, _ in post]))
        fh.write("from .common import *  # noqa: F401,F403\n")
        doms = [d for d in DOMAINS if per_dom[d]]
        for dom in doms:
            fh.write(f"from . import {dom} as _{dom}\n")
        fh.write("\nALL_ORACLES: dict[str, str] = {}\n")
        for dom in doms:
            fh.write(f"ALL_ORACLES.update(_{dom}.ORACLES)\n")
        fh.write("\n")
        for _, s in post:
            fh.write(s)
    os.remove(path)


if __name__ == "__main__":
    split_queries()
    split_oracles()
    print("split done", file=sys.stderr)
