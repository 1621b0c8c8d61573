"""Plan-hygiene inspection: find unpartitioned Window nodes that would
single-task-sort a corpus-growing input.

``Window`` with an empty PARTITION BY moves every input row to one task
(Spark even warns "Moving all data to a single partition") — the
classic scale cliff.  Some global windows are legitimate because their
input is provably bounded; this module classifies each global Window in
an optimized logical plan as one of:

- ``bounded-by-limit`` — a Limit sits below the window, so it ranks at
  most k rows (the operators/topk.py shape);
- ``bounded-by-bucket-agg`` — the window's subtree aggregates by a
  ``__``-prefixed synthetic bucket column (the
  operators/prefixscan.py cross-bucket scan: |buckets| rows by
  construction, the device that REPLACES the global sort);
- ``unbounded`` — nothing in the plan bounds the window's input; the
  query must either be re-planned or carry an explicit, justified
  entry in tests/test_plans.py's allowlist (e.g. windows over
  calendar- or dimension-bounded aggregates, which are bounded by
  facts the plan cannot express).

Used by tests/test_plans.py (hard gate over the whole registry) and
scripts/explain_audit.py (PLANS.md inventory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Registry queries allowed to keep an ``unbounded``-tagged global
#: window.  Each entry is ``(bound_kind, reason)`` — the kind is a
#: MACHINE-CHECKED claim about the window's physical input subtree
#: (:func:`global_window_bound_violations`, the same upgrade the BNLJ
#: sanctions got in r11 — VERDICT r11 #6), not prose:
#:
#: - ``"agg"`` — every scaling-table scan feeding the window passes
#:   through an aggregate/limit first (|groups| rows reach the single
#:   task, never corpus rows);
#: - ``"dim"`` — the window's input scans no scaling table at all
#:   (literal/dimension relations only).
#:
#: Additions require the kind to verify per plan — a mis-declared
#: entry fails tests/test_window_bounds.py's audit, and an unlisted
#: unbounded global window fails tests/test_plans.py /
#: test_shadow_queries.py.
ALLOWED_UNBOUNDED_GLOBAL_WINDOW: dict[str, tuple[str, str]] = {
    # margins/statistic windows over the |langs|x|sources| contingency
    # aggregate — dimension-bounded (~dozens of cells), never corpus rows
    "lang_source_chisq": (
        "agg",
        "windows over the lang x source contingency cells",
    ),
    # RANGE moving average over the per-DAY revenue aggregate —
    # calendar-bounded (|days| rows regardless of order volume)
    "moving_avg_daily_revenue": (
        "agg",
        "window over calendar-day aggregate",
    ),
    # share-of-parent windows over the nation x region aggregate —
    # 25 rows by TPC-H dimension construction
    "revenue_share_report": (
        "agg",
        "windows over the 25-row nation aggregate",
    ),
    # corpus-total window over the per-SOURCE aggregate — |sources|
    # rows regardless of corpus size (replaced the 1-row-total
    # crossJoin that planned an unsanctioned BNLJ)
    "mixture_temperature_curve": (
        "agg",
        "window over the |sources| aggregate",
    ),
}

_WINDOW_KINDS = ("dim", "agg")


def global_window_bound_violations(df: DataFrame, kind: str) -> list[str]:
    """Verify an allowlist entry's declared bound ``kind`` against the
    PHYSICAL plan: for every empty-PARTITION-BY Window, no scan of a
    scaling table may reach the window without passing a bounding
    operator (``agg``) / at all (``dim``).  Returns human-readable
    violations (empty = the sanction holds).  Reuses the BNLJ bound
    machinery (testing/bnljbounds.py) — same walk, same scan
    classification, same notion of 'bounding operator'."""
    from kafkastreamsproject_spark.testing.bnljbounds import (
        _scaling_scan_findings,
        _walk as _pwalk,
    )

    if kind not in _WINDOW_KINDS:
        raise ValueError(
            f"unknown window bound kind {kind!r} (use {_WINDOW_KINDS})"
        )
    violations: list[str] = []
    plan = df._jdf.queryExecution().executedPlan()
    n = 0
    for node in _pwalk(plan):
        if (
            node.getClass().getSimpleName() != "WindowExec"
            or not node.partitionSpec().isEmpty()
        ):
            continue
        for s in _scaling_scan_findings(node.children().apply(0)):
            if kind == "dim":
                violations.append(
                    f"global Window#{n}: scaling table {s['table']} feeds "
                    "a 'dim'-sanctioned window"
                )
            elif not s["bounded"]:
                violations.append(
                    f"global Window#{n}: unbounded scan of scaling table "
                    f"{s['table']} (no aggregate/limit between scan and "
                    "window)"
                )
        n += 1
    return violations


def _walk(jnode):
    yield jnode
    children = jnode.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _has_limit_below(jwindow) -> bool:
    return any(
        n.nodeName() in ("GlobalLimit", "LocalLimit")
        for n in _walk(jwindow)
    )


def _has_bucket_agg_below(jwindow) -> bool:
    for n in _walk(jwindow):
        if n.nodeName() != "Aggregate":
            continue
        exprs = n.groupingExpressions()
        for i in range(exprs.size()):
            if exprs.apply(i).toString().startswith("__"):
                return True
    return False


def global_window_findings(df: DataFrame) -> list[str]:
    """Classify every empty-PARTITION-BY Window in ``df``'s optimized
    logical plan; returns one tag per such window (see module doc)."""
    out: list[str] = []
    plan = df._jdf.queryExecution().optimizedPlan()
    for node in _walk(plan):
        if node.nodeName() != "Window" or not node.partitionSpec().isEmpty():
            continue
        if _has_limit_below(node):
            out.append("bounded-by-limit")
        elif _has_bucket_agg_below(node):
            out.append("bounded-by-bucket-agg")
        else:
            out.append("unbounded")
    return out
