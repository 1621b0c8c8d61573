#!/usr/bin/env python
"""Physical-plan inventory over the whole query registry → PLANS.md.

For every registered query (at sf0.01, vanilla-equivalent session) this
records the scale-relevant facts of the EXECUTED plan Catalyst chose:

- shuffle count (``Exchange`` operators, minus AQE re-uses)
- join strategies (BroadcastHashJoin / SortMergeJoin /
  BroadcastNestedLoopJoin / CartesianProduct)
- parquet scans, and whether pushed filters reached them
- Python boundaries (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)

The output is a committed artifact (PLANS.md) so plan regressions show
up in diffs: a new SortMergeJoin where a broadcast used to be, a scan
that lost its pushdown, or a query that silently gained a shuffle is a
one-line change in review.  tests/test_plans.py asserts the hard
invariants; this script makes the whole surface visible.

Usage: python scripts/explain_audit.py [sf_dir]   # default sf0.01
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafkastreamsproject_spark.plans.registry import all_queries
from kafkastreamsproject_spark.session import get_spark

# Queries whose BroadcastNestedLoopJoin is sanctioned: a bounded
# (≤ centroid-count / query-set, explicitly broadcast) side against a
# scaling corpus — the documented exact-baseline / assignment shape.
#
# Each entry declares a MACHINE-CHECKABLE bound kind (VERDICT r10 #3),
# verified per-plan by testing/bnljbounds.py against the build-side
# subtree of every BNLJ the query plans:
#   "dim"      — build side scans NO scaling table (literal relations,
#                dimension tables, or the query currently plans no
#                BNLJ at all and the kind guards future regressions);
#   "agg"      — every scaling-table scan on the build side sits below
#                an aggregate or limit (1-row totals, TakeOrdered
#                top-k, |groups|-bounded aggregates);
#   "filtered" — additionally allows a scan guarded by a non-trivial
#                selective filter (pushed into the scan or a
#                FilterExec above a cache boundary) — the bounded
#                query-set shape (vec_id < 10).
# A raw scaling-table broadcast fails ALL kinds, so the list can no
# longer silently absorb an unbounded case
# (tests/test_bnlj_bounds.py pins this with a mis-sanctioned query).
SANCTIONED_BNLJ = {
    # 10-row query side (vec_id < 10) broadcast against the corpus scan
    "ann_topk_cosine": "filtered",
    "neardup_cosine_pairs": "dim",  # currently plans no BNLJ
    "ann_lsh_buckets": "dim",  # currently plans no BNLJ
    "ann_lsh_neardup": "dim",  # currently plans no BNLJ
    "label_centroids": "dim",  # currently plans no BNLJ
    # centroid codebook derived by aggregation, broadcast for assignment
    "ivf_assign": "agg",
    # K=8 centroid rows cross-broadcast against the scanning corpus —
    # the Lloyd assignment step; centroids live behind a cache with the
    # bounding filter applied above it
    "kmeans_int8_lloyd": "filtered",
    # 10-query broadcast against the corpus for the TRUE-distance side
    # (the ADC side itself is codes-only) — same shape as ann_topk_cosine
    "pq_adc_topk": "filtered",
    # non-equi range join against a 6-row banding dimension (broadcast)
    "quantity_band_join": "dim",
    # 1-row corpus-size aggregate broadcast into every doc row
    "tfidf_top_terms": "agg",
    # 1-row totals aggregate broadcast into the 10-row heavy-key list
    "key_skew_audit": "agg",
    # 1-row max-|score| aggregate + 33-row threshold range broadcast
    # against the scored (y, s) pairs — the PR-sweep fan-out
    "quality_classifier_pr_curve": "agg",
    # 1-row global threshold / |sources|-row rate table broadcast
    "q22_idle_rich_customers": "agg",
    "mixture_resample": "agg",
    "above_segment_average": "dim",  # currently plans no BNLJ
    # 1-row (N, V) LM-total broadcast into the scoring scan
    "unigram_logprob_score": "agg",
    # 1-row (Nt, Nr) totals broadcast into the raw-side scoring scan
    # (the two frequency tables join as bounded equi-joins)
    "dsir_importance_weights": "agg",
    # 64 draw targets (range × 1-row total-weight aggregate) broadcast
    # against the corpus-CDF interval match
    "weighted_inverse_cdf_sample": "agg",
    # 1-row τ aggregate over the cached TakeOrdered(k+1) survivors,
    # broadcast back over the 64-row sample
    "priority_sample_topk": "agg",
    # 1-row df aggregate of the postings probe + 1-row N/avgdl
    # aggregate of the seen ledger, broadcast into the per-doc scoring
    # rollup (store scans, both below aggregates)
    "streaming_bm25_index": "agg",
    # bucketed_rank's 1-row (lo, hi) bounds broadcast — the gini/zipf
    # shape, ranking the hash permutation
    "training_order_shuffle": "agg",
    # per-FK-edge 1-row aggregate pairs (orphans × total) broadcast
    "fk_orphan_audit": "agg",
    # 1-row corpus stats (N, avgdl, per-term df) broadcast into the
    # per-document scoring scan — same shape as unigram_logprob_score
    "bm25_retrieval": "agg",
    # inherits bm25_retrieval's stats broadcast plus the 1-row query
    # embedding broadcast on the semantic side
    "hybrid_retrieval_rrf": "filtered",
    # 1-row region-total threshold broadcast into the per-part HAVING
    "q11_important_stock": "agg",
    # 1-row grand-total tokens broadcast into the R-row rank table
    "shard_assignment_plan": "agg",
    # 1-row corpus-max-date broadcast into the per-customer metrics
    "customer_rfm_segments": "agg",
    # 1-row order-count total broadcast for the share denominator
    "order_dow_seasonality": "agg",
    # 1-row session-count aggregate broadcast next to the 1-row peak
    "peak_concurrency": "agg",
    # 1-row (lo, hi) range broadcast feeding bucketed_rank's bucket
    # assignment (operators/prefixscan.py) — same 1-row-stat shape
    "gini_revenue_concentration": "agg",
    # same bucketed_rank (lo, hi) 1-row broadcast, ranking the
    # vocabulary frequency table for the Zipf fit
    "zipf_slope_fit": "agg",
    # same bucketed-rank shape as zipf: 1-row bounds + 1-row corpus
    # total broadcasts into the tercile test
    "ccnet_perplexity_buckets": "agg",
    # 10-query broadcast against the corpus scan on a non-equi
    # (vec_id != query_id) condition — ann_topk_cosine's exact shape
    "embedding_binary_hamming_recall": "filtered",
    # 1-row unigram/bigram grand totals broadcast into the PMI scan
    "pmi_collocations": "agg",
    # 1-row weighted-corpus-total broadcast into the domain-loss scan
    # (doc_surprisal_quality's N-broadcast shape, once per DRO round)
    "doremi_mixture_weights": "agg",
    # five 1-row count aggregates composed into the single stats row
    "batch_bloom_pushdown_stats": "agg",
    # 1-row pair-count aggregate x 1-row postings-kept aggregate
    # assembled for the 3-row df staircase (r12)
    "winnowing_recall_curve": "agg",
    # per-policy 1-row coverage/index/dup-count aggregates assembled
    # into the 4-row policy table (r12)
    "substring_policy_curve": "agg",
    # 1-row corpus-token-total broadcast into the surprisal scoring scan
    "doc_surprisal_quality": "agg",
    # 8-row coarse-centroid codebook broadcast against the corpus for
    # IVF cell assignment (codebook behind a cache, bounding filter
    # above it — same for the whole IVF/PQ family below)
    "ivf_pq_search": "filtered",
    # 1-row best-pair broadcasts into the vocab relation (merge apply)
    # and the 1-row × 1-row expansion joins — all bounded by design
    "bpe_merge_steps": "dim",
    # 10-query broadcast against the corpus for the exact-baseline side
    # of the recall measurement — same shape as ann_topk_cosine
    "ann_lsh_recall": "filtered",
    "ann_multiprobe_recall": "filtered",
    # 8-row coarse codebook broadcast for residual cell assignment —
    # same bounded shape as ivf_pq_search
    "ivf_pq_residual_search": "filtered",
    # ivf_pq_search's coarse broadcast + pq_adc_topk's 10-query truth
    # broadcast + a 3-row nprobe dimension on a non-equi (probe_rn <=
    # nprobe) join — every BNLJ side bounded by design
    "ivf_pq_recall_curve": "filtered",
    # phase-2 dominance confirm: broadcast non-equi anti-join over the
    # local-skyline candidate UNION (output-sized, not corpus-sized)
    "skyline3d_lineitem": "agg",
    # 1-row range and totals broadcasts into the 10-row bin table
    "value_psi_drift": "agg",
    # ivf_pq_search's coarse/truth broadcasts plus the exact re-rank's
    # |queries|xR shortlist join — every BNLJ side bounded by design
    "ivf_pq_rerank": "filtered",
    # same, plus a 4-row shortlist-depth dimension on a non-equi
    # (srn <= R) join — same bounded-dimension shape as the nprobe curve
    "ivf_pq_rerank_r_curve": "filtered",
    # the composed production stack (residual encoding + exact rerank):
    # ivf_pq_residual_search's coarse broadcast + the rerank tail's
    # 10-query truth broadcast + the 4-row R dimension — all bounded
    "ivf_pq_residual_rerank_r_curve": "filtered",
    # ~12-row corpus band histogram + 1-row (N, m) totals broadcast
    # into the |classes|x|bands| EMD grid — dimension-bounded by design
    "t_closeness_audit": "agg",
    # 10-query broadcast against the corpus scan (ann_topk_cosine's
    # exact-baseline shape) + a 4-row dimension sweep riding the pair
    # scan — every BNLJ side bounded by design
    "embedding_dim_truncation_recall": "filtered",
    # 1-row weight-total broadcast into the |sources|-row plan table
    "mixture_token_plan": "dim",
    # 1-row corpus-count + bucketed_rank's 1-row (lo, hi) bounds
    # broadcasts into the NTILE padding-waste legs
    "padding_waste_curve": "agg",
    # bm25_retrieval's 1-row stats broadcast plus the 1-row query
    # embedding broadcast into the 20-row lexical shortlist
    "bm25_semantic_rerank": "filtered",
}

_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "Window",
    "Expand",
    "Generate",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
)


def _plan(df, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit_one(name: str, df) -> dict:
    plan = _plan(df, "formatted")
    counts = Counter()
    for op in _OPS:
        # match operator headers like "(3) BroadcastHashJoin" so column
        # names containing an op substring don't inflate counts
        counts[op] = len(re.findall(rf"\(\d+\)\s+{op}", plan))
    shuffles = len(re.findall(r"\(\d+\)\s+Exchange", plan))
    scans = len(re.findall(r"\(\d+\)\s+Scan parquet", plan))
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
    return {
        "name": name,
        "shuffles": shuffles,
        "scans": scans,
        "pushed_scans": pushed,
        **{op: counts[op] for op in _OPS},
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain-audit")
    rows, shadow_rows, problems = [], [], []
    from kafkastreamsproject_spark.plans.registry import shadow_queries

    from kafkastreamsproject_spark.testing.bnljbounds import (
        bnlj_bound_violations,
    )
    from kafkastreamsproject_spark.testing.planaudit import (
        ALLOWED_UNBOUNDED_GLOBAL_WINDOW,
        global_window_findings,
    )

    tiers = [(all_queries(), rows), (shadow_queries(), shadow_rows)]
    for specs, bucket in tiers:
        for name, spec in specs.items():
            if name == "streaming_daily_agg":
                # streaming plan: audited via its batch twin daily_agg
                continue
            df = spec.spark(spark, sf_dir)
            r = audit_one(name, df)
            bucket.append(r)
            if r["CartesianProduct"]:
                problems.append(f"{name}: CartesianProduct")
            if r["BroadcastNestedLoopJoin"]:
                if name not in SANCTIONED_BNLJ:
                    problems.append(
                        f"{name}: unsanctioned BroadcastNestedLoopJoin"
                    )
                else:
                    # the sanction is a checkable claim, not prose: the
                    # declared bound kind must hold on every BNLJ build
                    # side the plan contains
                    for v in bnlj_bound_violations(df, SANCTIONED_BNLJ[name]):
                        problems.append(f"{name}: {v}")
            unbounded = [
                f for f in global_window_findings(df) if f == "unbounded"
            ]
            if unbounded and name not in ALLOWED_UNBOUNDED_GLOBAL_WINDOW:
                problems.append(
                    f"{name}: {len(unbounded)} unallowlisted unpartitioned "
                    "Window(s) over an unbounded input"
                )
            elif unbounded:
                # allowlisted: verify the declared bound kind per plan
                from kafkastreamsproject_spark.testing.planaudit import (
                    global_window_bound_violations,
                )

                kind, _ = ALLOWED_UNBOUNDED_GLOBAL_WINDOW[name]
                for v in global_window_bound_violations(df, kind):
                    problems.append(f"{name}: {v}")

    lines = [
        "# PLANS — physical-plan inventory (generated by scripts/explain_audit.py)",
        "",
        f"Scale factor directory: `{sf_dir}`.  One row per registered query",
        "(streaming_daily_agg audited via its batch twin).  Columns:",
        "shuffles = `Exchange` count; scans = parquet scans (pushed = scans",
        "with a non-empty `PushedFilters`);",
        "BHJ/SMJ/BNLJ = broadcast-hash / sort-merge / broadcast-nested-loop",
        "joins; HA = hash aggregates (≥2 ⇒ partial+final, map-side combine);",
        "Py = Arrow-batched Python boundaries (ArrowEval+MapInPandas+Grouped).",
        "BNLJ is sanctioned only for the ANN/IVF family (bounded broadcast",
        "side vs scaling corpus); CartesianProduct is never acceptable.",
        "",
        "Codegen coverage is not visible in pre-execution AQE plans, so it",
        "is asserted separately (tests/test_plans.py uses `codegen` mode).",
        "",
        "| query | shuffles | scans | pushed | BHJ | SMJ | BNLJ | HA | Win | Expand | Py |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        py = r["ArrowEvalPython"] + r["MapInPandas"] + r["FlatMapGroupsInPandas"]
        lines.append(
            f"| {r['name']} | {r['shuffles']} | {r['scans']} | {r['pushed_scans']} "
            f"| {r['BroadcastHashJoin']} | {r['SortMergeJoin']} "
            f"| {r['BroadcastNestedLoopJoin']} | {r['HashAggregate']} | {r['Window']} "
            f"| {r['Expand']} | {py} |"
        )
    total_shuffles = sum(r["shuffles"] for r in rows)
    lines += [
        "",
        f"Totals: {len(rows)} queries, {total_shuffles} shuffles, "
        f"{sum(r['SortMergeJoin'] for r in rows)} sort-merge joins, "
        f"{sum(r['BroadcastHashJoin'] for r in rows)} broadcast joins, "
        f"{sum(r['CartesianProduct'] for r in rows)} cartesian products.",
        "",
        "## Shadow tier (beyond the driver cap; locally oracle-checked)",
        "",
        "| query | shuffles | scans | pushed | BHJ | SMJ | BNLJ | HA | Win | Expand | Py |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in shadow_rows:
        py = r["ArrowEvalPython"] + r["MapInPandas"] + r["FlatMapGroupsInPandas"]
        lines.append(
            f"| {r['name']} | {r['shuffles']} | {r['scans']} | {r['pushed_scans']} "
            f"| {r['BroadcastHashJoin']} | {r['SortMergeJoin']} "
            f"| {r['BroadcastNestedLoopJoin']} | {r['HashAggregate']} | {r['Window']} "
            f"| {r['Expand']} | {py} |"
        )
    lines += [
        "",
        f"Shadow totals: {len(shadow_rows)} queries, "
        f"{sum(r['shuffles'] for r in shadow_rows)} shuffles, "
        f"{sum(r['CartesianProduct'] for r in shadow_rows)} cartesian products.",
        "",
    ]
    if problems:
        lines += ["## PROBLEMS", ""] + [f"- {p}" for p in problems] + [""]
    out = Path(__file__).resolve().parent.parent / "PLANS.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out} ({len(rows)} primary + {len(shadow_rows)} shadow rows)")
    for p in problems:
        print("PROBLEM:", p)
    if problems:
        # the audit is a gate, not a report: a plan regression (or a
        # stale allowlist) must fail the run, not hide in a table diff
        sys.exit(1)


if __name__ == "__main__":
    main()
