"""User-defined function surface (SURVEY.md §2.6).

The reference's only extensibility mechanism is the Processor API
(Transformer + state store, consumer/CustomTransformer.kt:15-88); its
Spark counterpart hierarchy, in preference order:

1. relational expressions (everything in plans/ needs NO UDF);
2. stateful per-key logic → applyInPandasWithState
   (streaming/punctuate.py);
3. vectorized scalar UDFs → ``pandas_udf`` (Arrow-batched);
4. grouped-map UDFs → ``applyInPandas``;
5. table functions → Python UDTF (Spark 3.5+).

This module carries reference implementations of tiers 3–5 so the
engine's UDF story is concrete and tested.  Rule: a Python UDF may
mirror a JVM expression (for escape-hatch parity, tested equal) or do
something JVM expressions cannot (true Python-library logic), but hot
paths always prefer the JVM version.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --- Tier 3: vectorized scalar UDF ---------------------------------------

@F.pandas_udf(T.DoubleType())
def quality_score_pandas(text: pd.Series) -> pd.Series:
    """Arrow-batched twin of functions.text.quality_score — used to
    validate the UDF escape hatch against the codegen'd expression
    (tests assert equality to 1e-9)."""
    toks = text.str.strip().str.split(r" +")
    n = toks.str.len().astype("float64")
    distinct = toks.map(lambda t: len(set(t)))
    ttr = distinct / n
    sw = toks.map(lambda t: sum(x in ("the", "a", "of", "and", "in", "to", "is") for x in t)) / n
    alen = text.str.strip().str.replace(" ", "", regex=False).str.len() / n
    len_ok = ((alen >= 3.0) & (alen <= 8.0)).map({True: 1.0, False: 0.5})
    return ttr * 0.6 + (1.0 - sw) * 0.3 + len_ok * 0.1


# --- Tier 4: grouped-map UDF ----------------------------------------------

def zscore_per_group(df, group_col: str, value_col: str):
    """Per-group z-score via applyInPandas — the grouped-map shape for
    logic that genuinely needs a whole group in memory (model scoring,
    per-entity normalization).  Shuffles once on the group key."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", zscore double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        pdf = pdf.copy()
        pdf["zscore"] = 0.0 if std == 0 else (pdf[value_col] - mean) / std
        return pdf

    return df.groupBy(group_col).applyInPandas(fn, schema=out_schema)


# --- Tier 5: Python UDTF --------------------------------------------------

@F.udtf(returnType="chunk_id int, chunk string, n_tokens int")
class ChunkDocument:
    """UDTF: split a document into fixed-size token chunks — the
    table-function shape of a training-data chunking stage (one input
    row → N chunk rows)."""

    def eval(self, text: str, chunk_tokens: int):
        if text is None:
            return
        toks = text.strip().split()
        for i in range(0, len(toks), chunk_tokens):
            chunk = toks[i : i + chunk_tokens]
            yield i // chunk_tokens, " ".join(chunk), len(chunk)
