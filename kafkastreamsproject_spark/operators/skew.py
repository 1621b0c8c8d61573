"""Skew mitigation: salted equi-joins.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime by splitting oversized shuffle partitions.  Salting is
the plan-level fallback for pathological keys (one key ≫ everything,
or skew on the BUILD side where AQE cannot split): the probe side gets
a deterministic salt in [0, n) appended to its key; the build side is
replicated n times (once per salt value); the join key becomes
(key, salt), spreading the hot key over n shuffle partitions.

Cost model: build-side bytes × n extra shuffle volume, in exchange for
an n-way split of the hottest partition — choose n ≈ (hot-key rows) /
(rows that fit one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an n-way salt on the probe side.

    Result is identical to ``probe.join(build, probe[probe_key] ==
    build[build_key], how)`` (tested), with the hot keys spread across
    ``n_salts`` partitions.  The salt is derived from the probe row
    (xxhash64 of all columns) — deterministic, no RNG.
    """
    salted_probe = probe.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    )
    replicated_build = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    joined = salted_probe.join(
        replicated_build,
        (salted_probe[probe_key] == replicated_build[build_key])
        & (salted_probe[_SALT] == replicated_build[_SALT]),
        how,
    )
    return joined.drop(_SALT)
