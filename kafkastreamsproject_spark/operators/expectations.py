"""Declarative data-quality expectations over a DataFrame — the
dbt-test / Great-Expectations operator shape: a battery of named checks
compiled into as few passes as possible, emitting one row per check
with its violation count.

Check kinds and their compiled shape:

- ``not_null(col)``, ``in_range(col, lo, hi)``, ``accepted(col, vals)``
  — conditional counts, ALL folded into ONE aggregate pass over the
  table (a scan with a partial+final agg; adding a check adds a column
  to the agg, not a pass).
- ``unique(col)`` — count minus distinct-count, same single agg (the
  distinct adds an Expand, still one scan).
- ``fk(col, dim_df, dim_col)`` — orphan count via a left-anti join per
  edge (broadcast when the dimension is bounded), one extra pass each.

The single-agg row is unpivoted with ``stack`` into (check, count)
rows, so the whole battery is scan + agg + a constant-size reshape —
the 100 TB cost is one pass over the fact plus one anti-join per FK
edge, regardless of how many row-local checks are declared.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str
    violations: Column | None = None  # row-local predicate counting form
    fk: tuple[DataFrame, str, str] | None = field(default=None)


def not_null(col: str) -> Check:
    return Check(
        name=f"not_null_{col}",
        kind="not_null",
        violations=F.sum(F.col(col).isNull().cast("long")),
    )


def in_range(col: str, lo: float, hi: float) -> Check:
    bad = ~F.col(col).between(lo, hi) | F.col(col).isNull()
    return Check(
        name=f"range_{col}",
        kind="range",
        violations=F.sum(bad.cast("long")),
    )


def accepted(col: str, values: tuple) -> Check:
    bad = ~F.col(col).isin(*values) | F.col(col).isNull()
    return Check(
        name=f"accepted_{col}",
        kind="accepted_values",
        violations=F.sum(bad.cast("long")),
    )


def unique(col: str) -> Check:
    return Check(
        name=f"unique_{col}",
        kind="unique",
        violations=F.count(F.col(col)) - F.count_distinct(F.col(col)),
    )


def fk(col: str, dim: DataFrame, dim_col: str) -> Check:
    return Check(name=f"fk_{col}", kind="fk", fk=(dim, col, dim_col))


def run_expectations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run the battery; returns (check_name, kind, n_violations, passed)
    — one row per check, deterministic order-insensitive content."""
    row_checks = [c for c in checks if c.violations is not None]
    fk_checks = [c for c in checks if c.fk is not None]

    out: DataFrame | None = None
    if row_checks:
        agg = df.agg(
            *[c.violations.alias(f"v{i}") for i, c in enumerate(row_checks)]
        )
        # check names derive from COLUMN names — escape SQL string
        # metachars so a quoted column cannot break or inject into the
        # stack() expression (ADVICE r7)
        def q(s: str) -> str:
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

        pairs = ", ".join(
            f"{q(c.name)}, {q(c.kind)}, v{i}" for i, c in enumerate(row_checks)
        )
        out = agg.select(
            F.expr(
                f"stack({len(row_checks)}, {pairs}) "
                "AS (check_name, kind, n_violations)"
            )
        )
    for c in fk_checks:
        dim, col, dim_col = c.fk
        orphans = (
            df.select(F.col(col))
            .filter(F.col(col).isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
                col,
                "left_anti",
            )
            .agg(
                F.lit(c.name).alias("check_name"),
                F.lit(c.kind).alias("kind"),
                F.count(F.lit(1)).alias("n_violations"),
            )
        )
        out = orphans if out is None else out.unionByName(orphans)
    if out is None:
        raise ValueError("no checks declared")
    return out.select(
        "check_name",
        "kind",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
