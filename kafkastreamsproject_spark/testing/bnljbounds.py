"""Machine-checkable BroadcastNestedLoopJoin sanctions (VERDICT r10 #3).

The plan audit sanctions certain queries' BNLJs because their broadcast
side is bounded — by an aggregate, a limit, a pushed selective filter,
or a literal dimension.  Those justifications used to be prose; this
module makes each one a checkable claim: it walks the PHYSICAL plan
(the pre-run AQE initial plan, so subquery broadcasts are visible),
finds every BroadcastNestedLoopJoin, takes the build-side subtree, and
verifies that no scan of a SCALING table reaches the broadcast without
passing through a bounding operator.

Bound kinds, strongest first — a sanction entry declares the WEAKEST
kind any of its BNLJs needs:

- ``dim``     — the build side scans no scaling table at all (literal
                relations, Range, or dimension tables region/nation);
- ``agg``     — every scaling-table scan in the build side sits below
                an aggregate or limit (1-row totals, TakeOrdered top-k,
                |groups|-bounded aggregates);
- ``filtered`` — additionally allows a scaling-table scan guarded by
                a non-trivial selective filter (beyond IsNotNull):
                either pushed into the parquet scan, or a FilterExec
                on the path (the "10-row query side selected by
                vec_id < 10" shape — when the filter sits above a
                cache boundary it cannot reach the scan).  Weakest: a
                filter proves selectivity intent, not a hard row
                bound, so entries should prefer ``agg``/``dim`` when
                they apply.

A raw scaling-table scan broadcast with no aggregate, no limit, and no
pushed filter fails ALL kinds — the case the old prose list could
silently absorb (tests/test_bnlj_bounds.py pins this with a
deliberately mis-sanctioned query).

Scope: the build side only.  The probe (streamed) side of a BNLJ may
scan the corpus freely — that is the sanctioned shape's whole point.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: tables that grow with the corpus — a broadcast of one of these must
#: be bounded by an aggregate/limit (or at minimum a pushed filter)
SCALING_TABLES = (
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "events",
    "documents",
    "embeddings",
)

#: physical operators that bound the rows flowing above them
_BOUNDING = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)

_KINDS = ("dim", "agg", "filtered")


def _walk(jnode):
    """Every node in the physical tree, INCLUDING subquery plans (a
    scalar-subquery broadcast is a BNLJ the children() walk would
    miss), the plans cached behind InMemoryTableScan nodes, and the
    initial plans inside (nested) AdaptiveSparkPlan wrappers."""
    cls = jnode.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk(jnode.initialPlan())
        return
    yield jnode
    children = jnode.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))
    subs = jnode.subqueries()
    for i in range(subs.size()):
        yield from _walk(subs.apply(i))
    if cls == "InMemoryTableScanExec":
        yield from _walk(jnode.relation().cachedPlan())


def _scan_meta(jnode) -> dict[str, str]:
    md = jnode.metadata()
    out: dict[str, str] = {}
    it = md.iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = str(kv._2())
    return out


def _scan_table(jnode) -> str | None:
    loc = _scan_meta(jnode).get("Location", "")
    for t in SCALING_TABLES:
        if f"{t}.parquet" in loc:
            return t
    return None


def _has_nontrivial_pushdown(jnode) -> bool:
    pushed = _scan_meta(jnode).get("PushedFilters", "[]")
    inner = pushed.strip()[1:-1]
    return any(
        f.strip() and not f.strip().startswith("IsNotNull")
        for f in inner.split(",")
    )


def _is_nontrivial_filter(jnode) -> bool:
    """A FilterExec whose condition does more than null-reject."""
    if jnode.getClass().getSimpleName() != "FilterExec":
        return False
    cond = jnode.condition().toString()
    stripped = re.sub(r"isnotnull\([^)]*\)", "", cond)
    return bool(re.search(r"[<>=]", stripped))


def _scaling_scan_findings(jnode) -> list[dict]:
    """Every scaling-table scan in the subtree, annotated with whether
    a bounding operator sits on its path from the subtree root and
    whether a non-trivial selective filter guards it (pushed into the
    scan or a FilterExec on the path).
    Cached relations (InMemoryTableScan) are traversed THROUGH into
    the cached plan — a bounding operator below the cache point still
    bounds everything read from it, and a raw cached corpus scan is
    still a violation."""
    out: list[dict] = []

    def rec(n, bounded: bool, filtered: bool) -> None:
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            rec(n.initialPlan(), bounded, filtered)
            return
        name = n.nodeName()
        if any(b in name for b in _BOUNDING):
            bounded = True
        if _is_nontrivial_filter(n):
            filtered = True
        if cls == "FileSourceScanExec":
            t = _scan_table(n)
            if t is not None:
                out.append(
                    {
                        "table": t,
                        "bounded": bounded,
                        "filtered": filtered or _has_nontrivial_pushdown(n),
                    }
                )
            return
        if cls == "InMemoryTableScanExec":
            rec(n.relation().cachedPlan(), bounded, filtered)
            return
        children = n.children()
        for i in range(children.size()):
            rec(children.apply(i), bounded, filtered)

    rec(jnode, False, False)
    return out


def bnlj_build_sides(df: DataFrame) -> list[dict]:
    """One entry per BroadcastNestedLoopJoin in ``df``'s physical plan:
    ``{"build": "left"|"right", "scans": [...]}`` with the build-side
    scaling-scan findings of :func:`_scaling_scan_findings`.  Walks the
    EXECUTED (pre-run AQE initial) plan so subquery BNLJs are visible —
    PlanSubqueries only runs in the executedPlan preparations."""
    plan = df._jdf.queryExecution().executedPlan()
    out: list[dict] = []
    for node in _walk(plan):
        if node.nodeName() != "BroadcastNestedLoopJoin":
            continue
        side = node.buildSide().toString()
        child = node.children().apply(0 if side == "BuildLeft" else 1)
        out.append(
            {
                "build": "left" if side == "BuildLeft" else "right",
                "scans": _scaling_scan_findings(child),
            }
        )
    return out


def bnlj_bound_violations(df: DataFrame, kind: str) -> list[str]:
    """Check every BNLJ build side in ``df`` against the declared bound
    ``kind``; returns human-readable violations (empty = sanction
    holds).  ``dim`` forbids any scaling scan on the build side;
    ``agg`` requires each to sit below an aggregate/limit;
    ``filtered`` additionally accepts a non-trivial selective filter
    on the path (pushed or post-cache)."""
    if kind not in _KINDS:
        raise ValueError(f"unknown BNLJ bound kind {kind!r} (use {_KINDS})")
    violations: list[str] = []
    for i, side in enumerate(bnlj_build_sides(df)):
        for s in side["scans"]:
            if kind == "dim":
                violations.append(
                    f"BNLJ#{i} build-{side['build']}: scaling table "
                    f"{s['table']} on a 'dim'-sanctioned build side"
                )
            elif not s["bounded"] and not (
                kind == "filtered" and s["filtered"]
            ):
                violations.append(
                    f"BNLJ#{i} build-{side['build']}: unbounded scan of "
                    f"scaling table {s['table']} (no aggregate/limit on "
                    "path"
                    + (
                        ", no non-trivial selective filter"
                        if kind == "filtered"
                        else ""
                    )
                    + ")"
                )
    return violations
