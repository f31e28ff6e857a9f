#!/usr/bin/env python3
"""Merge N bench invocation logs into one calm-window artifact.

Per-query MIN across invocations (each invocation is itself min-of-3
runs inside graft.Bench), the r13/r14 methodology: single-shot times on
a shared container are dominated by co-tenant load, the min is the
reproducible steady-state cost.

Usage: merge_bench.py OUT.json LOG1 LOG2 [LOG3 ...]
Queries absent from some invocations (registry grew mid-round) keep the
min over the invocations that ran them.
"""
import json
import re
import sys

# the frozen 32-query subset from Bench.scala (do not edit — the
# round-over-round bar)
HEADLINE = {
    "q1_agg", "q3_shipping", "q6_forecast", "q9_product_profit",
    "q18_large_orders",
    "scan_filter_compound", "scan_projection", "topn",
    "join_shuffle", "join_broadcast", "join_asof", "join_runtime_filter",
    "agg_rollup", "window_ranks", "window_running",
    "dedup_exact", "dedup_minhash", "dedup_substring_spans", "dedup_clusters",
    "text_quality", "text_tokens", "text_tfidf",
    "ann_scalable", "ann_indexed",
    "pipeline_pack_sequences", "pipeline_shuffle_shards",
    "catalog_upsert_mor", "catalog_sql_mor", "catalog_bucketed_join",
    "catalog_dynamic_bucket", "catalog_stream_changelog",
    "media_dedup_dhash",
}

def load(path):
    # a log with multiple appended bench runs keeps the LAST (freshest)
    # one — taking the first would silently merge a stale rerun
    with open(path) as f:
        ms = re.findall(r'\{"metric".*', f.read())
    if not ms:
        raise SystemExit(f"no bench JSON line in {path}")
    if len(ms) > 1:
        print(f"warning: {path} holds {len(ms)} bench runs, using the last")
    return json.loads(ms[-1])

def main():
    out, logs = sys.argv[1], sys.argv[2:]
    runs = [load(p) for p in logs]
    sfs = {str(r.get("sf", "?")) for r in runs}
    if len(sfs) > 1:
        raise SystemExit(f"refusing to merge mixed scale factors: {sorted(sfs)}")
    queries = {}
    for r in runs:
        for q, sec in r["queries"].items():
            if sec < 0:
                continue
            queries[q] = min(queries.get(q, float("inf")), sec)
    total = sum(queries.values())
    wh = sum(v for k, v in queries.items() if k.startswith("catalog_"))
    head = {k: v for k, v in queries.items() if k in HEADLINE}
    artifact = {
        "metric": "bench_total_sec",
        "value": round(total, 2),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in sorted(queries.items())},
        "warehouse_sec": round(wh, 2),
        "readpath_sec": round(total - wh, 2),
        "headline_sec": round(sum(head.values()), 2),
        "n_headline": len(head),
        "n_queries": len(queries),
        "n_invocations": len(runs),
        "sf": runs[-1].get("sf", "?"),
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{out}: total={artifact['value']} headline={artifact['headline_sec']}"
          f" (n={artifact['n_headline']}) queries={artifact['n_queries']}"
          f" invocations={artifact['n_invocations']}")

if __name__ == "__main__":
    main()
