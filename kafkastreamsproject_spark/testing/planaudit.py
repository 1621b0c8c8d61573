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
#: window, each with the reason the input is in fact bounded by
#: something the plan cannot express.  Additions require the same
#: justification — an unlisted unbounded global window fails
#: tests/test_plans.py / test_shadow_queries.py.
ALLOWED_UNBOUNDED_GLOBAL_WINDOW: dict[str, str] = {
    # margins/statistic windows over the |langs|x|sources| contingency
    # aggregate — dimension-bounded (~dozens of cells), never corpus rows
    "lang_source_chisq": "windows over the lang x source contingency cells",
    # RANGE moving average over the per-DAY revenue aggregate —
    # calendar-bounded (|days| rows regardless of order volume)
    "moving_avg_daily_revenue": "window over calendar-day aggregate",
    # share-of-parent windows over the nation x region aggregate —
    # 25 rows by TPC-H dimension construction
    "revenue_share_report": "windows over the 25-row nation aggregate",
    # corpus-total window over the per-SOURCE aggregate — |sources|
    # rows regardless of corpus size (replaced the 1-row-total
    # crossJoin that planned an unsanctioned BNLJ)
    "mixture_temperature_curve": "window over the |sources| aggregate",
}


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
