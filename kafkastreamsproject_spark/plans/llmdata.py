"""LLM-training-data curation operators beyond the dedup/quality core:
benchmark-contamination detection (batch + streaming ingest gate),
corpus-frequency token rarity, native session-window sessionization,
configured-weight mixture sampling, and embedding×text near-dup fusion.

All are shadow-tier (the driver registry is capped at
DRIVER_QUERY_CAP) but carry full DuckDB oracles, so the local compare
gate (tests/test_shadow_queries.py) checks them exactly the way the
driver checks primary queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafkastreamsproject_spark.functions import hashing as H
from kafkastreamsproject_spark.functions import perceptron as P
from kafkastreamsproject_spark.functions import text as TX
from kafkastreamsproject_spark.operators.cache import scoped_persist
from kafkastreamsproject_spark.plans.registry import register
from kafkastreamsproject_spark.sources.testdata import fan_out, load_table

# ---------------------------------------------------------------------------
# Benchmark contamination: fraction of each training doc's n-grams that
# appear in a held-out evaluation set.  The standard pre-training hygiene
# check (eval-set leakage detection); here the "benchmark" is a
# deterministic 5% slice of the corpus (doc_id % 20 == 0) since the
# fixtures ship no separate eval table.
# ---------------------------------------------------------------------------

_SHINGLE_W = 5
_EVAL_MOD = 20  # doc_id % 20 == 0 → eval slice (5%)

_SQL_SHINGLE_HASHES = H.sql_hash_list(TX.sql_shingles(_SHINGLE_W))
_SQL_MIN_TOKS = f"len(string_split_regex(trim(text), ' +')) >= {_SHINGLE_W}"


@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, list_distinct({_SQL_SHINGLE_HASHES}) AS hs
      FROM documents WHERE {_SQL_MIN_TOKS}
    ),
    eval_set AS (
      SELECT DISTINCT unnest(hs) AS h FROM base WHERE doc_id % {_EVAL_MOD} = 0
    ),
    train AS (SELECT doc_id, hs FROM base WHERE doc_id % {_EVAL_MOD} != 0),
    ex AS (SELECT doc_id, unnest(hs) AS h FROM train),
    hits AS (
      SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
      FROM ex JOIN eval_set USING (h) GROUP BY ex.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.hs) AS INT) AS n_shingles,
           CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           ROUND(COALESCE(h.n_contaminated, 0) / CAST(len(t.hs) AS DOUBLE), 6)
             AS contamination_rate
    FROM train t LEFT JOIN hits h USING (doc_id)
    """,
    tags=("llmdata", "contamination", "dedup"),
    tier="shadow",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit: per TRAINING document, how many of
    its distinct 5-gram shingle hashes appear anywhere in the eval slice
    — the direction that decides which training docs to DROP.  The
    existing ``contamination_check`` (plans/shadow.py) scores the other
    direction (per held-out doc, containment in the train split — the
    measurement step); a decontamination pipeline runs both.

    Scale shape: the eval n-gram set is the DISTINCT hash table of the
    benchmark suite — a few million 8-byte longs even for a large eval
    battery — so it BROADCASTS and the per-doc counting is a map-side
    hash probe of the exploded training shingles: no shuffle of training
    text, one partial-agg shuffle of (doc_id, count) longs.  If the eval
    set ever outgrew broadcast, the same plan degrades gracefully to a
    shuffle semi-join keyed on the 8-byte hash (or a bloom pre-filter,
    operators/bloomjoin.py).  Shingles are hashed to 32 bits before any
    join (MMDS trick shared with plans/dedup.py) so neither side ever
    carries shingle STRINGS past the scan."""
    docs = fan_out(load_table(spark, "documents", sf_dir)).filter(
        F.size(TX.tokens(F.col("text"))) >= _SHINGLE_W
    )
    # The md5-shingle pipeline feeds three consumers (eval set, exploded
    # probe, per-doc stats) — persist the (doc_id, hash-array) relation
    # once or the dominant CPU stage runs 3×.  ~8 bytes/shingle: memory-
    # resident at any corpus size worth sharding (same call as minhash,
    # plans/dedup.py).
    base = scoped_persist(
        docs.select(
            "doc_id",
            F.array_distinct(
                H.hash_list(TX.shingles(F.col("text"), _SHINGLE_W))
            ).alias("hs"),
        )
    )
    eval_set = (
        base.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    train = base.filter(F.col("doc_id") % _EVAL_MOD != 0)
    hits = (
        train.select("doc_id", F.explode("hs").alias("h"))
        .join(F.broadcast(eval_set), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        train.select("doc_id", F.size("hs").alias("n_shingles"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_contaminated"), F.lit(0).cast("long")).alias(
                "n_contaminated"
            ),
            F.round(
                F.coalesce(F.col("n_contaminated"), F.lit(0))
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("contamination_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-frequency token rarity: the exact-arithmetic core of unigram-LM
# quality scoring (OOV/hapax rates flag gibberish, OCR noise, and
# boilerplate without any transcendental math the oracle could disagree
# on — ln() differs in the last ulp across libms, integer counts don't).
# ---------------------------------------------------------------------------

_RARE_MAX_COUNT = 5  # corpus frequency < 5 → "rare" token

_SQL_TOKENS = "string_split_regex(trim(text), ' +')"


@register(
    "token_rarity_quality",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN f.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(SUM(CASE WHEN f.c < {_RARE_MAX_COUNT} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rare,
           ROUND(SUM(CASE WHEN f.c < {_RARE_MAX_COUNT} THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS rare_rate
    FROM tok t JOIN freq f USING (tok)
    GROUP BY t.doc_id
    """,
    tags=("llmdata", "text", "quality"),
    tier="shadow",
)
def token_rarity_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token rarity against the corpus unigram table: total
    tokens, hapax legomena (corpus count == 1), rare tokens (corpus
    count < 5), and the rare-token rate.  Complements
    ``unigram_logprob_score`` (plans/shadow.py) — that query is the
    smoothed-LM surprisal score on a train/test split; this one is the
    exact integer rarity census over the whole corpus, usable as a
    filter predicate without any FP tolerance.

    Scale shape: the unigram table is groupBy(token) over the exploded
    corpus — partial aggregation means each partition ships one row per
    DISTINCT token it saw, not one per occurrence.  The frequency
    lookup is a join keyed on the token itself; at web scale the vocab
    is heavy-tailed but the table is still ~vocab-sized (≪ corpus), and
    Spark picks broadcast vs shuffle-hash by its statistics; the final
    per-doc rollup shuffles only (doc_id, three counters).  Token
    STRINGS cross the wire once (the freq join) — the docs' text never
    does."""
    docs = fan_out(load_table(spark, "documents", sf_dir))
    tok = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    rare = F.when(F.col("c") < _RARE_MAX_COUNT, 1).otherwise(0)
    hapax = F.when(F.col("c") == 1, 1).otherwise(0)
    return (
        tok.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(hapax).alias("n_hapax"),
            F.sum(rare).alias("n_rare"),
            F.round(
                F.sum(rare) / F.count(F.lit(1)).cast("double"), 6
            ).alias("rare_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Native session windows: Spark's session_window operator (dynamic-gap
# sessionization inside the aggregation itself) — a different physical
# plan from the lag/cumsum islands formulation the primary
# `sessionization` query pins (plans/relational.py).
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30

#: lag/cumsum islands formulation with the STRICT `>` break that
#: matches Spark's touching-windows-merge semantics — shared by the
#: batch query and its streaming twin below.
_SQL_SESSION_ORACLE = f"""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL {_SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL {_SESSION_GAP_MIN} MINUTE AS TIMESTAMP)
             AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """


@register(
    "session_window_stats",
    oracle=_SQL_SESSION_ORACLE,
    tags=("llmdata", "session", "reference"),
    tier="shadow",
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the NATIVE ``session_window`` aggregation:
    per (user, session) — session start, end (last event + the 30-min
    gap), and event count.  Merge semantics, pinned empirically by
    tests/test_llmdata.py: TOUCHING windows merge — an event at exactly
    last+gap joins the session (so the oracle's island break is a
    STRICT ``>`` on the gap; the lag-based primary `sessionization`
    query uses the same strict comparison).

    Scale shape: session_window aggregates after ONE shuffle on
    user_id; merging overlapping windows happens inside the aggregation
    operator (sorted within partition), so there is no self-join and no
    window-function second pass — the reason this beats the islands
    formulation at 100 TB, where lag+cumsum needs two full sorts.  The
    same expression is streaming-legal (groupBy(session_window(...))
    with a watermark), which the islands form is not."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Mixture sampling: per-source keep-rates (the "data mixture" step of a
# pre-training pipeline — upsample curated sources, downsample crawl).
# Deterministic per-row via the portable md5 id-hash (same device as
# deterministic_sample, plans/reference.py), so the sampled corpus is
# reproducible across engines, runs, and partitionings.
# ---------------------------------------------------------------------------

#: per-mille keep-rate per source bucket (source index mod 4) — integer
#: rates so the threshold compare is exact on both engines.
_MIXTURE_RATES_M = {0: 1000, 1: 500, 2: 250, 3: 100}


def _mixture_weights() -> list[tuple[str, int]]:
    return [(f"src{i}", _MIXTURE_RATES_M[i % 4]) for i in range(20)]


@register(
    "mixture_sample",
    oracle=f"""
    WITH w(source, rate_m) AS (VALUES {", ".join(f"('{s}', {m})" for s, m in [(f"src{i}", _MIXTURE_RATES_M[i % 4]) for i in range(20)])})
    SELECT d.doc_id, d.source
    FROM documents d JOIN w USING (source)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
          < w.rate_m
    """,
    tags=("llmdata", "sampling"),
    tier="shadow",
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: each source keeps a CONFIGURED
    per-mille fraction of its documents (hash-Bernoulli on the portable
    id hash) — the curated-weights counterpart of ``mixture_resample``
    (plans/shadow.py), which computes its rates from observed source
    shares to rebalance toward uniform; real pipelines need both (a
    human-chosen mixture and an automatic rebalance).  The weights
    relation is a handful of rows — broadcast joined, so the plan is
    scan → map-side probe → filter: zero shuffles, and the filter is a
    pure function of (doc_id, source), so re-running on a
    re-partitioned 100 TB corpus selects the SAME rows."""
    docs = load_table(spark, "documents", sf_dir)
    weights = spark.createDataFrame(_mixture_weights(), "source string, rate_m int")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        docs.join(F.broadcast(weights), "source")
        .filter(h % 1000 < F.col("rate_m"))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# Streaming contamination gate: the same eval-overlap check applied at
# INGEST time — documents arrive as a file stream, the benchmark
# n-gram set is a static broadcast side, contaminated docs surface
# incrementally.  The gate a pipeline runs BEFORE a crawl shard ever
# lands in the training corpus.
# ---------------------------------------------------------------------------


_CONTAM_TAUS = (5, 10, 20, 30, 50)  # contamination-rate cutoffs (percent)
_CONTAM_SHIFT = 1_000_000  # planted-gradient twin doc_id shift


@register(
    "contamination_threshold_curve",
    oracle=f"""
    WITH toks0 AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
      FROM documents WHERE {_SQL_MIN_TOKS}
    ),
    grad AS (
      SELECT t.doc_id + {_CONTAM_SHIFT} AS doc_id,
             array_to_string(list_cat(
               list_slice(e.toks, 1,
                 greatest(least((t.doc_id % 10) * 3,
                                len(e.toks), len(t.toks) - {_SHINGLE_W}), 0)),
               list_slice(t.toks,
                 greatest(least((t.doc_id % 10) * 3,
                                len(e.toks), len(t.toks) - {_SHINGLE_W}), 0) + 1,
                 len(t.toks))), ' ') AS text
      FROM toks0 t JOIN toks0 e
        ON e.doc_id = t.doc_id - (t.doc_id % {_EVAL_MOD})
      WHERE t.doc_id % {_EVAL_MOD} != 0 AND t.doc_id % 2 = 0
    ),
    corpus AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE {_SQL_MIN_TOKS}
      UNION ALL
      SELECT doc_id, text FROM grad
    ),
    base AS MATERIALIZED (
      SELECT doc_id, list_distinct({_SQL_SHINGLE_HASHES}) AS hs
      FROM corpus WHERE {_SQL_MIN_TOKS}
    ),
    eval_set AS (
      SELECT DISTINCT unnest(hs) AS h FROM base WHERE doc_id % {_EVAL_MOD} = 0
    ),
    train AS (SELECT doc_id, hs FROM base WHERE doc_id % {_EVAL_MOD} != 0),
    ex AS (SELECT doc_id, unnest(hs) AS h FROM train),
    hits AS (
      SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS nc
      FROM ex JOIN eval_set USING (h) GROUP BY ex.doc_id
    ),
    perdoc AS (
      SELECT t.doc_id, CAST(len(t.hs) AS BIGINT) AS ns,
             COALESCE(h.nc, 0) AS nc
      FROM train t LEFT JOIN hits h USING (doc_id)
    ),
    st AS (
      {" UNION ALL ".join(
          f"SELECT {t} AS tau_pct, doc_id, ns, nc FROM perdoc"
          for t in _CONTAM_TAUS
      )}
    )
    SELECT CAST(tau_pct AS INT) AS tau_pct,
      CAST(SUM(CASE WHEN 100 * nc > tau_pct * ns THEN 1 ELSE 0 END)
        AS BIGINT) AS n_docs_dropped,
      CAST(SUM(CASE WHEN 100 * nc > tau_pct * ns THEN 0 ELSE 1 END)
        AS BIGINT) AS n_docs_kept,
      CAST(SUM(CASE WHEN 100 * nc > tau_pct * ns THEN 0 ELSE nc END)
        AS BIGINT) AS n_contaminated_kept
    FROM st GROUP BY tau_pct
    """,
    tags=("llmdata", "contamination", "diagnostic"),
    tier="shadow",
)
def contamination_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination OPERATING CURVE — the cutoff-tuning readout for
    the drop-contaminated-docs policy: at each contamination-rate
    threshold τ ∈ {5, 10, 20, 30, 50}%, how many training docs the gate
    drops, how many survive, and how much contaminated shingle volume
    LEAKS THROUGH on the survivors (the quantity an eval-integrity
    review actually bounds).  The trade is explicit: a loose τ keeps
    data but leaks eval n-grams; a tight τ cleans the corpus at corpus
    cost — the same sweep-curve discipline as the classifier PR curve
    and the IVF recall curves.  The fixture's natural overlap is
    binary (a couple of fully-contaminated docs), so a CONTAMINATION
    GRADIENT is planted: every even training doc gets a twin whose
    leading (doc_id%10)·3 tokens are borrowed from its nearest eval
    doc — graded containment from 0 to ~30%, so each τ draws a
    different drop line and the curve actually bends.

    Exactness: the drop verdict is the pure-integer cross-product test
    100·contaminated > τ·shingles — no divided rate is ever compared —
    and every emitted cell is an integer count.

    Scale shape: per-doc counts come from the one broadcast-probe pass
    of contamination_ngram_overlap; the 5-threshold sweep is a stack
    over (doc_id, two longs) — the curve costs one probe, never
    |curve| probes."""
    docs = fan_out(load_table(spark, "documents", sf_dir)).filter(
        F.size(TX.tokens(F.col("text"))) >= _SHINGLE_W
    )
    toks0 = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("toks")
    )
    evald = toks0.select(
        F.col("doc_id").alias("eid"), F.col("toks").alias("etoks")
    ).filter(F.col("eid") % _EVAL_MOD == 0)
    tr = (
        toks0.filter(
            (F.col("doc_id") % _EVAL_MOD != 0) & (F.col("doc_id") % 2 == 0)
        )
        .withColumn("eid", F.col("doc_id") - F.col("doc_id") % _EVAL_MOD)
        .join(evald, "eid")
        .withColumn(
            "__j",
            F.greatest(
                F.least(
                    (F.col("doc_id") % 10) * 3,
                    F.size("etoks"),
                    F.size("toks") - _SHINGLE_W,
                ),
                F.lit(0),
            ).cast("int"),
        )
    )
    grad = tr.select(
        (F.col("doc_id") + _CONTAM_SHIFT).alias("doc_id"),
        F.array_join(
            F.concat(
                F.slice(F.col("etoks"), 1, F.col("__j")),
                F.slice(
                    F.col("toks"),
                    F.col("__j") + 1,
                    F.size("toks") - F.col("__j"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(grad).filter(
        F.size(TX.tokens(F.col("text"))) >= _SHINGLE_W
    )
    base = scoped_persist(
        corpus.select(
            "doc_id",
            F.array_distinct(
                H.hash_list(TX.shingles(F.col("text"), _SHINGLE_W))
            ).alias("hs"),
        )
    )
    eval_set = (
        base.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    train = base.filter(F.col("doc_id") % _EVAL_MOD != 0)
    hits = (
        train.select("doc_id", F.explode("hs").alias("h"))
        .join(F.broadcast(eval_set), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    perdoc = (
        train.select("doc_id", F.size("hs").cast("long").alias("ns"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "ns",
            F.coalesce(F.col("nc"), F.lit(0).cast("long")).alias("nc"),
        )
    )
    stack_args = ", ".join(str(t) for t in _CONTAM_TAUS)
    st = perdoc.select(
        "ns",
        "nc",
        F.expr(
            f"explode(array({stack_args})) AS tau_pct"
        ),
    )
    dropped = F.lit(100) * F.col("nc") > F.col("tau_pct") * F.col("ns")
    return (
        st.groupBy("tau_pct")
        .agg(
            F.sum(F.when(dropped, 1).otherwise(0)).alias("n_docs_dropped"),
            F.sum(F.when(dropped, 0).otherwise(1)).alias("n_docs_kept"),
            F.sum(F.when(dropped, F.lit(0).cast("long")).otherwise(F.col("nc"))).alias(
                "n_contaminated_kept"
            ),
        )
        .select(
            F.col("tau_pct").cast("int").alias("tau_pct"),
            "n_docs_dropped",
            "n_docs_kept",
            "n_contaminated_kept",
        )
    )


@register(
    "streaming_contamination_gate",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, list_distinct({_SQL_SHINGLE_HASHES}) AS hs
      FROM documents WHERE {_SQL_MIN_TOKS}
    ),
    eval_set AS (
      SELECT DISTINCT unnest(hs) AS h FROM base WHERE doc_id % {_EVAL_MOD} = 0
    ),
    ex AS (
      SELECT doc_id, unnest(hs) AS h FROM base WHERE doc_id % {_EVAL_MOD} != 0
    )
    SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
    FROM ex JOIN eval_set USING (h) GROUP BY ex.doc_id
    """,
    tags=("llmdata", "contamination", "streaming"),
    tier="shadow",
)
def streaming_contamination_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination counting executed by Structured Streaming: parquet
    file-stream of documents → stateless stream-static broadcast join
    against the (batch-computed) eval n-gram hash set → update-mode
    grouped count per doc_id → memory sink, availableNow trigger.  The
    emitted final state must equal the batch formulation restricted to
    contaminated docs — which the DuckDB oracle checks.

    Scale shape: the only stateful operator is the per-doc count whose
    key space is |contaminated docs| (tiny); the join side is static
    and broadcast once per epoch, so state stores never see shingle
    hashes — the property that keeps this runnable forever on an
    unbounded crawl feed."""
    import tempfile
    import uuid

    from pyspark.sql import types as T

    # static side: the eval slice's distinct shingle hashes (batch)
    docs = load_table(spark, "documents", sf_dir)
    eval_set = (
        docs.filter(
            (F.col("doc_id") % _EVAL_MOD == 0)
            & (F.size(TX.tokens(F.col("text"))) >= _SHINGLE_W)
        )
        .select(
            F.explode(H.hash_list(TX.shingles(F.col("text"), _SHINGLE_W))).alias("h")
        )
        .distinct()
    )

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(doc_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .filter(
            (F.col("doc_id") % _EVAL_MOD != 0)
            & (F.size(TX.tokens(F.col("text"))) >= _SHINGLE_W)
        )
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(H.hash_list(TX.shingles(F.col("text"), _SHINGLE_W)))
            ).alias("h"),
        )
        .join(F.broadcast(eval_set), "h")  # stream-static: stateless
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    # complete mode: the memory sink always holds exactly the final
    # aggregate state, regardless of how the file source batches the
    # input (update mode would append per-batch partials if the fixture
    # ever split into multiple files — ADVICE r5).  State is bounded by
    # |contaminated docs|, so complete output is cheap here.
    name = f"stream_contam_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_contam_")
    try:
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Hybrid near-dup fusion: embedding-LSH candidate generation CONFIRMED
# by textual shingle-Jaccard — the two signals modern dedup pipelines
# cross-check (semantic near-dups the text hash misses; templated text
# the embedding space smears).  Composes two verified operators.
# ---------------------------------------------------------------------------

_FUSION_TEXT_T = 0.5  # shingle-Jaccard confirmation threshold


#: exact Jaccard over the two shingle-hash sets, aliased sa/sb
_FUSION_JAC_SQL = (
    "len(list_intersect(sa.hs, sb.hs)) / CAST(len(sa.hs) + len(sb.hs) "
    "- len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)"
)


def _fusion_ctes() -> str:
    """Shared CTE block (sig → pairs → sh) for the fusion-family
    oracles.  Built lazily (registry's oracle_fn) because the similarity
    module can't be imported at THIS module's load time without a
    circular-import cycle."""
    from kafkastreamsproject_spark.functions import vectors as V
    from kafkastreamsproject_spark.plans.similarity import _LSH_T

    return f"""
    sig AS (
      SELECT vec_id, embedding,
             {V.sql_lsh_bucket_adaptive('embedding', V.sql_adaptive_n_planes())} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT id_a, id_b, score FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND({V.sql_cosine('a.embedding', 'b.embedding')}, 6) AS score
        FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      ) WHERE score >= {_LSH_T}
    ),
    sh AS (
      SELECT doc_id, list_distinct({_SQL_SHINGLE_HASHES}) AS hs
      FROM documents WHERE {_SQL_MIN_TOKS}
    )"""


def _fusion_oracle() -> str:
    return f"""
    WITH {_fusion_ctes()}
    SELECT p.id_a, p.id_b, p.score AS cosine,
           ROUND({_FUSION_JAC_SQL}, 6) AS jaccard,
           (ROUND({_FUSION_JAC_SQL}, 6) >= {_FUSION_TEXT_T}) AS text_confirmed
    FROM pairs p
    JOIN sh sa ON sa.doc_id = p.id_a
    JOIN sh sb ON sb.doc_id = p.id_b
    """


@register(
    "hybrid_neardup_fusion",
    oracle_fn=_fusion_oracle,
    tags=("llmdata", "dedup", "similarity"),
    tier="shadow",
)
def hybrid_neardup_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs from the bucketed embedding-LSH path
    (ann_lsh_neardup, cosine ≥ its threshold on the rounded score),
    each annotated with the exact shingle-hash Jaccard of the two
    DOCUMENTS (vec_id ≡ doc_id in the fixtures) and a text_confirmed
    verdict at Jaccard ≥ 0.5.

    Scale shape: pair generation stays bucketed (work ∝ Σ bucket², the
    LSH scale path); the textual confirmation joins the candidate list
    (small) against the 32-bit shingle-hash arrays — two hash-equi
    joins shuffling only (doc_id, hash-array) for docs that appear in
    candidates, never raw text.  A pipeline keeps pairs where either
    signal fires strongly; emitting both lets the threshold be tuned
    downstream without recomputation."""
    from kafkastreamsproject_spark.plans.similarity import ann_lsh_neardup

    pairs = ann_lsh_neardup(spark, sf_dir).select("id_a", "id_b", "score")
    docs = load_table(spark, "documents", sf_dir).filter(
        F.size(TX.tokens(F.col("text"))) >= _SHINGLE_W
    )
    sh = docs.select(
        "doc_id",
        F.array_distinct(H.hash_list(TX.shingles(F.col("text"), _SHINGLE_W))).alias(
            "hs"
        ),
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("h_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("h_b"))
    inter = F.size(F.array_intersect("h_a", "h_b"))
    jac = inter / (F.size("h_a") + F.size("h_b") - inter).cast("double")
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("score").alias("cosine"),
            F.round(jac, 6).alias("jaccard"),
            (F.round(jac, 6) >= _FUSION_TEXT_T).alias("text_confirmed"),
        )
    )




# ---------------------------------------------------------------------------
# Semantic dedup end-to-end (SemDeDup-style keep-one): the step a real
# curation run actually executes — two-signal confirmed near-dup pairs
# → connected components → keep the min-id survivor per cluster, with
# per-row removal accounting.  Composes hybrid_neardup_fusion (above)
# with functions/clustering.py; the hash-based twin is dedup_clusters
# (plans/dedup.py), which clusters MinHash pairs only.
# ---------------------------------------------------------------------------


def _semantic_dedup_oracle() -> str:
    return f"""
    WITH RECURSIVE {_fusion_ctes()},
    conf AS (
      SELECT p.id_a, p.id_b
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.id_a
      JOIN sh sb ON sb.doc_id = p.id_b
      WHERE ROUND({_FUSION_JAC_SQL}, 6) >= {_FUSION_TEXT_T}
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM conf
      UNION
      SELECT id_b AS u, id_a AS v FROM conf
    ),
    walk(u, comp) AS (
      SELECT u, u AS comp FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, w.comp FROM edges e JOIN walk w ON e.v = w.u
    ),
    comp AS (
      SELECT u AS doc_id, MIN(comp) AS cluster_id FROM walk GROUP BY u
    ),
    lab AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    sz AS (
      SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id
    )
    SELECT l.doc_id,
           CAST(l.cluster_id AS BIGINT) AS cluster_id,
           CAST(s.cluster_size AS BIGINT) AS cluster_size,
           (l.doc_id = l.cluster_id) AS kept
    FROM lab l JOIN sz s USING (cluster_id)
    """


@register(
    "semantic_dedup_keep",
    oracle_fn=_semantic_dedup_oracle,
    tags=("llmdata", "dedup", "clustering"),
    tier="shadow",
)
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style keep-one over the TWO-SIGNAL near-dup graph: pairs
    where the embedding-LSH candidate was confirmed by textual
    shingle-Jaccard (hybrid_neardup_fusion, text_confirmed) become
    edges, connected components label every implicated document with
    its cluster's min doc_id, and every document in the corpus gets a
    verdict row: (doc_id, cluster_id, cluster_size, kept) — kept iff
    the doc IS its cluster's canonical survivor (singletons keep
    themselves).  SUM(cluster_size - 1) grouped by kept gives the
    removal accounting a curation report publishes.

    Scale shape: pair generation stays LSH-bucketed and the confirm
    join ships only shingle-hash arrays for implicated docs (the fusion
    query's shape, unchanged); connected components is O(diameter)
    iterations of join+min-label over an edge list that is ~|near-dup
    pairs| — tiny relative to the corpus; the final labeling is one
    left join of (doc_id → cluster_id) longs against the corpus ids
    plus a |clusters|-sized count shuffle.  Text never shuffles."""
    from kafkastreamsproject_spark.functions.clustering import connected_components

    conf = (
        hybrid_neardup_fusion(spark, sf_dir)
        .filter(F.col("text_confirmed"))
        .select("id_a", "id_b")
    )
    comp = connected_components(conf).select(
        F.col("node").alias("doc_id"), F.col("component")
    )
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    lab = docs.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("cluster_id")
    )
    sizes = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return lab.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("kept"),
    )


@register(
    "streaming_session_windows",
    oracle=_SQL_SESSION_ORACLE,
    tags=("llmdata", "session", "streaming"),
    tier="shadow",
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native session_window aggregation executed by Structured
    Streaming — the MERGING-state operator (sessions extend and fuse as
    events arrive) that plain windowed aggs don't exercise: parquet
    file-stream of events → groupBy(user_id, session_window) → memory
    sink, availableNow.  Complete output mode, so the sink holds
    exactly the final merged sessions regardless of how the source
    batches files, and the emitted state must equal the batch
    ``session_window_stats`` — the shared islands oracle checks both.

    Scale shape: one shuffle on user_id into the session state store;
    state is bounded by OPEN sessions (a watermark retires closed ones
    in a production continuous run — complete mode here is the
    verification harness, not the deployment shape, same stance as
    streaming_daily_agg).  The session merge happens inside the
    streaming aggregation operator: no second pass, no self-join."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import types as T

    # UTC session zone while the stream runs (same absorb-and-restore as
    # streaming_daily_agg: fixtures store unzoned timestamp[us]).
    saved = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    agg = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy(
            "user_id",
            F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_sess_")
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        if saved is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", saved)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Deterministic train/val/test split: the final dataset-prep step after
# curation — hash-assigned so membership is a pure function of doc_id
# (stable under repartitioning, reshuffling, and engine choice), with a
# per-source stratification report to verify the split didn't skew any
# source.
# ---------------------------------------------------------------------------

_SPLIT_TRAIN_PCT = 80
_SPLIT_VAL_PCT = 10  # test = remainder


@register(
    "dataset_split_report",
    oracle=f"""
    WITH a AS (
      SELECT source,
             CASE
               WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
                    % 100 < {_SPLIT_TRAIN_PCT} THEN 'train'
               WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
                    % 100 < {_SPLIT_TRAIN_PCT + _SPLIT_VAL_PCT} THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY source)
                                 AS DOUBLE), 6) AS share
    FROM a GROUP BY source, split
    """,
    tags=("llmdata", "sampling"),
    tier="shadow",
)
def dataset_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic train/val/test assignment (80/10/10 on an
    md5 bucket of doc_id) with the per-source stratification report —
    counts and within-source shares per split.  The hash window is
    hex[9:16] (disjoint from the hex[1:8] window the mixture/sampling
    queries use), so split membership is INDEPENDENT of mixture
    selection: a doc's keep-decision and its split don't correlate.

    Scale shape: assignment is a row-local expression (zero shuffle —
    at 100 TB the split column is computed inline by any consumer, or
    written as a partition column); the report is one partial+final
    agg on (source, split) plus a window over the |sources|x3 result
    rows.  Membership is reproducible anywhere: the same doc lands in
    the same split on any engine that computes md5."""
    docs = load_table(spark, "documents", sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8), 16, 10
    ).cast("long")
    split = (
        F.when(h % 100 < _SPLIT_TRAIN_PCT, "train")
        .when(h % 100 < _SPLIT_TRAIN_PCT + _SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    a = docs.select("source", split.alias("split"))
    counts = a.groupBy("source", "split").agg(F.count(F.lit(1)).alias("n_docs"))
    w = W.partitionBy("source")
    return counts.select(
        "source",
        "split",
        "n_docs",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(w).cast("double"), 6
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# Epoch sharding: deterministic assignment of documents to data-parallel
# ranks, with the balance audit a training launcher checks before a run.
# ---------------------------------------------------------------------------

_N_RANKS = 8


@register(
    "shard_assignment_plan",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 8))::BIGINT
                  % {_N_RANKS} AS INT) AS rank,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    per_rank AS (
      SELECT rank, CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(n_tokens) AS total_tokens
      FROM assigned GROUP BY rank
    ),
    tot AS (SELECT CAST(SUM(total_tokens) AS DOUBLE) AS all_tokens
            FROM per_rank)
    SELECT p.rank, p.n_docs, p.total_tokens,
           ROUND(p.total_tokens / (t.all_tokens / {_N_RANKS}), 6)
             AS balance_ratio
    FROM per_rank p, tot t
    """,
    tags=("llm-data", "sharding"),
    tier="shadow",
)
def shard_assignment_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-parallel sharding: each document lands on
    rank = portable_hash(doc_id) mod R (R = 8), independent of
    partition layout, engine, or run — the property that makes a
    training run resumable and its data order auditable.  Emits the
    per-rank doc/token totals and the balance ratio (1.0 = perfectly
    even) a launcher checks before committing GPU-hours.

    One (rank) shuffle of (doc_id, n_tokens) pairs — text never moves;
    the rank table is R rows, the grand total a 1-row broadcast.  Uses
    a DIFFERENT md5 window (chars 17-24) than the train/val/test split
    (9-16) and the sample gates (1-8), so the three assignments stay
    statistically independent."""
    docs = load_table(spark, "documents", sf_dir)
    rank = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 17, 8), 16, 10
        ).cast("long")
        % _N_RANKS
    ).cast("int")
    assigned = docs.select(
        "doc_id",
        rank.alias("rank"),
        TX.n_tokens(F.col("text")).cast("long").alias("n_tokens"),
    )
    per_rank = assigned.groupBy("rank").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    tot = per_rank.agg(
        F.sum("total_tokens").cast("double").alias("all_tokens")
    )
    return per_rank.join(F.broadcast(tot)).select(
        "rank",
        "n_docs",
        "total_tokens",
        F.round(
            F.col("total_tokens") / (F.col("all_tokens") / F.lit(_N_RANKS)),
            6,
        ).alias("balance_ratio"),
    )


@register(
    "quality_filter_top_p",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             ROUND(len(list_distinct(string_split_regex(trim(text), ' +')))
                   / CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE),
                   6) AS ttr
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, ttr,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY ttr DESC, doc_id) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
      FROM scored
    )
    SELECT doc_id, source, ttr
    FROM ranked WHERE rn <= CAST(ceil(0.8 * n_src) AS BIGINT)
    """,
    tags=("llm-data", "quality"),
    tier="shadow",
)
def quality_filter_top_p(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-p quality gate: keep the best 80% of each source
    by type-token ratio — the RELATIVE quality filter curation runs use
    when an absolute threshold would gut some sources and pass others
    whole (quota by source, quality-ordered within it).

    One shuffle on source for the rank window; the quality signal is
    row-local and 6-dp-rounded BEFORE ranking, with a doc_id tie-break,
    so the kept set is cross-engine deterministic.  At 100 TB the exact
    window becomes a two-pass approximate-quantile cutoff per source
    (``approx_quantiles_envelope`` is the verified device); the exact
    formulation here is the oracle-checkable contract."""
    docs = load_table(spark, "documents", sf_dir)
    toks = TX.tokens(F.col("text"))
    ttr = F.round(
        F.size(F.array_distinct(toks))
        / F.size(toks).cast("double"),
        6,
    )
    scored = docs.select("doc_id", "source", ttr.alias("ttr"))
    w = W.partitionBy("source").orderBy(F.col("ttr").desc(), F.col("doc_id"))
    wc = W.partitionBy("source")
    ranked = scored.select(
        "doc_id",
        "source",
        "ttr",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_src"),
    )
    return ranked.filter(
        F.col("rn") <= F.ceil(F.lit(0.8) * F.col("n_src")).cast("long")
    ).select("doc_id", "source", "ttr")


# ---------------------------------------------------------------------------
# Dyadic-surprisal quality scoring: the unigram-LM perplexity filter
# (CCNet / Wenzek et al.'s KenLM gate) re-expressed in exact integer
# arithmetic.  -log2 p(tok) = log2(N) - log2(c) is approximated by
# bits(N) - bits(c) where bits(x) = floor(log2 x) + 1 = the binary-digit
# count — an INTEGER both engines compute identically (Spark
# length(bin(c)), DuckDB length(format('{:b}', c))), so no libm log
# whose last-ulp differences could flip the value hash.  Ranking quality
# is preserved: bits() is monotone in c, so high-surprisal docs under
# the dyadic score are high-perplexity docs under the real LM score.
# ---------------------------------------------------------------------------


def _bits(col: F.Column) -> F.Column:
    """floor(log2 x) + 1 for a positive integral column, exactly."""
    return F.length(F.bin(col)).cast("long")


@register(
    "doc_surprisal_quality",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM freq)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(length(format('{{:b}}', tot.n_total))
                    - length(format('{{:b}}', f.c))) AS BIGINT)
             AS sum_surprisal,
           ROUND(SUM(length(format('{{:b}}', tot.n_total))
                     - length(format('{{:b}}', f.c)))
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_surprisal
    FROM tok t JOIN freq f USING (tok) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    tags=("llmdata", "text", "quality"),
    tier="shadow",
)
def doc_surprisal_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean dyadic surprisal — the exact-arithmetic stand-in
    for unigram-LM perplexity scoring.  Each token instance contributes
    bits(N) - bits(c) (N = corpus token instances, c = the token's
    corpus frequency): rare tokens cost many bits, common tokens few, so
    a document full of rare/garbled tokens scores high exactly as it
    would under -mean log2 p.  The bits() coarsening keeps every value
    an integer (and the mean a ratio of two integers), so the oracle
    compare is bit-exact where a real ln()-based perplexity sits on
    libm's last ulp.  Companion to ``unigram_logprob_score``
    (plans/shadow.py) — the add-one-smoothed ln() formulation over a
    held-out split; this query is its tie-proof full-corpus twin, and
    the two rank documents near-identically (bits() is ln() coarsened
    to whole bits).

    Scale shape: one token-explode shuffle to build the vocab frequency
    table, one probe join back on tok (vocab-sized build side — at
    100 TB the freq table is ~|vocab| rows, broadcastable for natural-
    language vocabularies), a sanctioned one-row broadcast for N, and a
    final (doc_id) rollup.  Identical topology to token_rarity_quality,
    which shares the freq table if both run in one pass."""
    docs = fan_out(load_table(spark, "documents", sf_dir))
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    sur = _bits(F.col("n_total")) - _bits(F.col("c"))
    return (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", sur.alias("sur"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("sur").alias("sum_surprisal"),
            F.round(
                F.sum("sur") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_surprisal"),
        )
    )


_DSIR_B = 1024  # hashed-feature buckets (the DSIR paper's device)
_DSIR_TARGET_MOD = 10  # doc_id % 10 == 0 plays the target domain


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             doc_id % {_DSIR_TARGET_MOD} = 0 AS is_target,
             unnest(list_transform(range(1, len({_SQL_TOKENS})),
               i -> ('0x' || substr(md5(({_SQL_TOKENS})[i] || ' ' ||
                                        ({_SQL_TOKENS})[i+1]), 1, 8))::BIGINT
                    % {_DSIR_B})) AS f
      FROM documents WHERE len({_SQL_TOKENS}) >= 2
    ),
    ct AS (SELECT f, COUNT(*) AS c FROM feats WHERE is_target GROUP BY f),
    cr AS (SELECT f, COUNT(*) AS c FROM feats WHERE NOT is_target GROUP BY f),
    tot AS (
      SELECT CAST((SELECT COALESCE(SUM(c), 0) FROM ct) AS BIGINT) AS nt,
             CAST((SELECT COALESCE(SUM(c), 0) FROM cr) AS BIGINT) AS nr
    )
    SELECT fe.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_feats,
           CAST(SUM(
             (length(format('{{:b}}', COALESCE(ct.c, 0) + 1))
              - length(format('{{:b}}', tot.nt + {_DSIR_B})))
             - (length(format('{{:b}}', cr.c + 1))
                - length(format('{{:b}}', tot.nr + {_DSIR_B})))
           ) AS BIGINT) AS dyadic_logratio,
           ROUND(SUM(
             (length(format('{{:b}}', COALESCE(ct.c, 0) + 1))
              - length(format('{{:b}}', tot.nt + {_DSIR_B})))
             - (length(format('{{:b}}', cr.c + 1))
                - length(format('{{:b}}', tot.nr + {_DSIR_B})))
           ) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_logratio
    FROM feats fe
    JOIN cr ON cr.f = fe.f
    LEFT JOIN ct ON ct.f = fe.f
    CROSS JOIN tot
    WHERE NOT fe.is_target
    GROUP BY fe.doc_id
    """,
    tags=("llmdata", "sampling", "quality"),
    tier="shadow",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every RAW
    document by how much more likely its hashed-bigram features are
    under the TARGET domain than under the raw pool — the
    domain-matching signal that up-samples target-like pretraining
    data.  Features are bigrams hashed into 1024 buckets (the paper's
    hashed n-gram generative model); the log importance ratio
    Σ_f [log p_target(f) − log p_raw(f)] is computed with the repo's
    dyadic device — bits(c+1) − bits(N+B) per Laplace-smoothed term —
    so every per-feature term is an INTEGER and the per-doc sum is
    exact on both engines (a float Σ of libm ln() terms would hash-
    diverge on summation order; the bits() coarsening removes the
    class while preserving the ranking structure, the
    doc_surprisal_quality precedent).  The target split is
    doc_id % 10 == 0, standing in for a curated domain corpus.

    Scale shape: one corpus scan explodes (doc_id, feature-bucket)
    pairs; BOTH frequency tables are ≤1024 rows by construction
    (bounded by the bucket count, not the vocabulary — the reason DSIR
    hashes features), so they broadcast; totals are 1-row broadcasts
    and the rollup shuffles doc_ids.  Resampling from these weights is
    the deterministic hash-Bernoulli device mixture_sample already
    implements."""
    docs = fan_out(load_table(spark, "documents", sf_dir))
    toks = TX.tokens(F.col("text"))
    fhash = lambda s: (  # noqa: E731
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % _DSIR_B
    )
    # zip_with over slices, not element_at(toks, i) in a transform
    # lambda: interpreted HOF eval re-runs split(text) per element —
    # O(L²)/doc; the slice pair evaluates it O(1) times per row
    fcol = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: fhash(F.concat_ws(" ", a, b)),
    )
    feats = (
        docs.filter(F.size(toks) >= 2)
        .select(
            "doc_id",
            (F.col("doc_id") % _DSIR_TARGET_MOD == 0).alias("is_target"),
            F.explode(fcol).alias("f"),
        )
    )
    ct = feats.filter("is_target").groupBy("f").agg(
        F.count(F.lit(1)).alias("c_t")
    )
    cr = feats.filter(~F.col("is_target")).groupBy("f").agg(
        F.count(F.lit(1)).alias("c_r")
    )
    tot = ct.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("nt")).crossJoin(
        cr.agg(F.coalesce(F.sum("c_r"), F.lit(0)).alias("nr"))
    )
    bits = lambda c: F.length(F.bin(c)).cast("long")  # noqa: E731
    term = (
        bits(F.coalesce(F.col("c_t"), F.lit(0)) + 1)
        - bits(F.col("nt") + _DSIR_B)
    ) - (bits(F.col("c_r") + 1) - bits(F.col("nr") + _DSIR_B))
    return (
        feats.filter(~F.col("is_target"))
        .join(cr, "f")
        .join(F.broadcast(ct), "f", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", term.alias("t"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("t").alias("dyadic_logratio"),
            F.round(
                F.sum("t") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_logratio"),
        )
    )


_SQL_TRI_HASHES = H.sql_hash_list(TX.sql_shingles(3))


@register(
    "doc_novelty_audit",
    oracle=f"""
    WITH tri AS (
      SELECT doc_id, unnest({_SQL_TRI_HASHES}) AS h
      FROM documents
      WHERE len({_SQL_TOKENS}) >= 3
    ),
    fs AS (SELECT h, MIN(doc_id) AS first_seen FROM tri GROUP BY h)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(CASE WHEN f.first_seen = t.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           SUM(CASE WHEN f.first_seen = t.doc_id THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM tri t JOIN fs f ON f.h = t.h
    GROUP BY t.doc_id
    """,
    tags=("llmdata", "dedup", "diagnostic"),
    tier="shadow",
)
def doc_novelty_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus NOVELTY audit — per document, the fraction of its
    distinct word-trigrams never seen in any earlier document (doc_id
    order standing in for crawl/ingest order): the staleness readout a
    curation team tracks across crawl snapshots, where a falling
    novelty curve means new data is mostly re-crawl (diminishing
    returns per ingested byte) and a doc-level novelty near zero marks
    boilerplate/template content that exact and near-dup stages both
    miss (the doc differs, its phrasing doesn't).  A trigram is
    attributed to the MINIMUM doc_id containing it, so the first
    carrier scores it novel and every later carrier does not.

    Exactness: counts are integers; novelty is one int/int division.

    Scale shape: trigrams md5-hash within the row BEFORE the explode
    (the doc_repetition_stats discipline — text never shuffles), the
    first-seen table is one hash-keyed partial+final MIN aggregate,
    and the attribution is a hash equi-join of (h, doc_id) longs; the
    per-doc rollup shuffles doc_ids.  Nothing is corpus-length in any
    single task and nothing broadcasts unboundedly."""
    docs = fan_out(load_table(spark, "documents", sf_dir))
    toks = TX.tokens(F.col("text"))
    tri = (
        docs.filter(F.size(toks) >= 3)
        .select(
            "doc_id",
            F.explode(H.hash_list(TX.shingles(F.col("text"), 3))).alias("h"),
        )
    )
    tri = scoped_persist(tri)
    fs = tri.groupBy("h").agg(F.min("doc_id").alias("first_seen"))
    return (
        tri.join(fs, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(
                (F.col("first_seen") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
            (
                F.sum((F.col("first_seen") == F.col("doc_id")).cast("long"))
                / F.count(F.lit(1)).cast("double")
            ).alias("novelty"),
        )
    )


_TOKEN_BUDGET = 1_000_000  # planner's total training-token budget
_MIX_WEIGHT_SQL = ", ".join(
    f"('src{i}', {_MIXTURE_RATES_M[i % 4]})" for i in range(20)
)


@register(
    "mixture_token_plan",
    oracle=f"""
    WITH w(source, weight_m) AS (VALUES {_MIX_WEIGHT_SQL}),
    avail AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({TX.sql_n_bpe_tokens()}) AS BIGINT) AS available_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(weight_m) AS BIGINT) AS wsum FROM w)
    SELECT a.source, a.n_docs, a.available_tokens,
           CAST(w.weight_m AS BIGINT) AS weight_m,
           CAST(({_TOKEN_BUDGET} * w.weight_m) // t.wsum AS BIGINT)
             AS allocated_tokens,
           (({_TOKEN_BUDGET} * w.weight_m) // t.wsum)
             / CAST(a.available_tokens AS DOUBLE) AS epochs,
           ({_TOKEN_BUDGET} * w.weight_m) // t.wsum > a.available_tokens
             AS needs_repetition
    FROM avail a JOIN w USING (source) CROSS JOIN tot t
    """,
    tags=("llmdata", "sampling", "diagnostic"),
    tier="shadow",
)
def mixture_token_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture TOKEN-BUDGET planner — the "data recipe" table a
    training run is provisioned from: given a total token budget and
    per-source mixture weights (the mixture_sample configuration), how
    many tokens each source is allocated, how many it actually has,
    and the implied EPOCH count (allocated / available) — epochs > 1
    flags the sources the run will repeat (the multi-epoch/repetition
    regime the data-constrained scaling literature prices), epochs ≪ 1
    the sources mostly left on the floor.  Complements mixture_sample
    (which draws the per-doc sample) with the capacity arithmetic that
    decides whether those weights are even feasible.

    Exactness: allocation is integer FLOOR-division of
    budget × weight by the weight total on BOTH engines (Spark `div`,
    DuckDB `//` — a double `/` then cast would truncate on one engine
    and round on the other); the epoch ratio is one int/int double
    division (no round).

    Scale shape: one documents scan with a row-local token count, a
    |sources|-row aggregate, a broadcast weights join, and a 1-row
    weight-total broadcast — output is |sources| rows at any corpus
    size."""
    docs = fan_out(load_table(spark, "documents", sf_dir))
    spark_w = spark.createDataFrame(
        [(f"src{i}", _MIXTURE_RATES_M[i % 4]) for i in range(20)],
        "source string, weight_m int",
    )
    avail = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.n_bpe_tokens(F.col("text"))).alias("available_tokens"),
    )
    tot = spark_w.agg(F.sum("weight_m").cast("long").alias("wsum"))
    alloc = F.expr(
        f"({_TOKEN_BUDGET} * CAST(weight_m AS BIGINT)) div wsum"
    )
    return (
        avail.join(F.broadcast(spark_w), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "available_tokens",
            F.col("weight_m").cast("long").alias("weight_m"),
            alloc.alias("allocated_tokens"),
            (alloc / F.col("available_tokens").cast("double")).alias("epochs"),
            (alloc > F.col("available_tokens")).alias("needs_repetition"),
        )
    )


_TEMP_DOC_BUDGET = 100_000  # temperature planner's total document budget
_TEMP_SCALE = 1_000_000  # fixed-point scale for the exponentiated share


@register(
    "mixture_temperature_curve",
    oracle=f"""
    WITH avail AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM avail),
    taus(tau) AS (VALUES (1), (2), (4)),
    wq AS (
      SELECT a.source, a.n_docs, t.n_total, x.tau,
             CAST(FLOOR({_TEMP_SCALE} * CASE x.tau
               WHEN 1 THEN a.n_docs / CAST(t.n_total AS DOUBLE)
               WHEN 2 THEN sqrt(a.n_docs / CAST(t.n_total AS DOUBLE))
               ELSE sqrt(sqrt(a.n_docs / CAST(t.n_total AS DOUBLE)))
             END) AS BIGINT) AS weight_scaled
      FROM avail a CROSS JOIN tot t CROSS JOIN taus x
    )
    SELECT tau, source, n_docs, weight_scaled,
           weight_scaled /
             CAST(SUM(weight_scaled) OVER (PARTITION BY tau) AS DOUBLE)
             AS share,
           CAST(({_TEMP_DOC_BUDGET} * weight_scaled)
             // SUM(weight_scaled) OVER (PARTITION BY tau) AS BIGINT)
             AS alloc_docs,
           CAST(({_TEMP_DOC_BUDGET} * weight_scaled)
             // SUM(weight_scaled) OVER (PARTITION BY tau) AS BIGINT)
             / CAST(n_docs AS DOUBLE) AS epochs
    FROM wq
    """,
    tags=("llmdata", "sampling", "diagnostic", "curve"),
    tier="shadow",
)
def mixture_temperature_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-sampling mixture curve — the multilingual/source
    reweighting rule (q_i ∝ p_i^(1/τ), Devlin et al. mBERT exponent
    0.7, XLM-R τ≈3.3, Gopher/PaLM source temperatures) swept at
    τ ∈ {1, 2, 4}: τ=1 is proportional (natural) sampling, larger τ
    flattens the mixture toward uniform, up-sampling tail sources at
    the cost of repeating them (the epochs column prices exactly that,
    the same capacity arithmetic as mixture_token_plan).  This DERIVES
    the per-source weights from corpus statistics, complementing
    mixture_token_plan / mixture_sample which take weights as given
    config — together they close the recipe loop: measure → reweight →
    allocate → draw.

    Exactness (why τ ∈ {1,2,4} and not arbitrary exponents): p^(1/2)
    and p^(1/4) are computed as sqrt and sqrt∘sqrt — IEEE-754 square
    root is CORRECTLY ROUNDED on every engine, unlike pow(x, y) whose
    libm implementations differ in the last ulp between the JVM and
    DuckDB.  The input p is one int/int double division, the weight is
    then pinned to an integer (floor of the 1e6-scaled value), and
    every downstream number is integer arithmetic or a single int/int
    division: share = weight / Σweight (integer sum — exact), alloc =
    integer floor-division of budget × weight by Σweight (Spark `div`,
    DuckDB `//`), epochs = alloc/n_docs.  No float ever sums across
    rows, so aggregation order cannot perturb the hash.

    Scale shape: one documents scan collapsing to |sources| rows; the
    total attaches via a global window over that DIMENSION-BOUNDED
    aggregate (|sources| rows regardless of corpus size — allowlisted
    in testing/planaudit.py, the same justification as
    revenue_share_report); τ attaches by exploding a 3-element literal
    array in-row.  No join of any kind: the earlier 1-row-total +
    3-row-τ crossJoins planned BroadcastNestedLoopJoins, which the
    repo's plan audit sanctions only for the ANN/IVF family — this
    shape keeps PLANS.md's PROBLEMS section empty by construction.
    Output is tiny at any corpus size; the corpus is touched once."""
    docs = fan_out(load_table(spark, "documents", sf_dir))
    avail = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    p = F.col("n_docs") / F.col("n_total").cast("double")
    weight = F.floor(
        _TEMP_SCALE
        * F.when(F.col("tau") == 1, p)
        .when(F.col("tau") == 2, F.sqrt(p))
        .otherwise(F.sqrt(F.sqrt(p)))
    ).cast("long")
    wsum = F.sum("weight_scaled").over(W.partitionBy("tau"))
    alloc = F.expr(
        f"({_TEMP_DOC_BUDGET} * weight_scaled) div wsum"
    )
    return (
        avail.withColumn(
            "n_total",
            F.sum("n_docs").over(W.partitionBy()).cast("long"),
        )
        .withColumn(
            "tau", F.explode(F.array(F.lit(1), F.lit(2), F.lit(4)))
        )
        .withColumn("weight_scaled", weight)
        .withColumn("wsum", wsum)
        .select(
            "tau",
            "source",
            "n_docs",
            "weight_scaled",
            (F.col("weight_scaled") / F.col("wsum").cast("double")).alias(
                "share"
            ),
            alloc.alias("alloc_docs"),
            (alloc / F.col("n_docs").cast("double")).alias("epochs"),
        )
    )


# ---------------------------------------------------------------------------
# In-engine linear quality-classifier training (r9) — the TRAINABLE
# complement to the hand-written Gopher rules and the DSIR ratio: a
# fastText-style linear filter (Joulin et al. 2016; the quality-filter
# role in GPT-3 / CCNet data curation) trained INSIDE the engine with
# the full-batch perceptron rule (Rosenblatt 1958).  The perceptron is
# chosen deliberately: its update is pure integer arithmetic (no
# sigmoid/exp), so K training steps are EXACTLY reproducible in the
# DuckDB oracle — the same reason the DSIR device uses dyadic bits.
# The positive class is planted (spam-phrase injection), following the
# repo's planted-offender discipline: the signal is known, so the
# confusion matrix is a meaningful readout, not noise.
# ---------------------------------------------------------------------------

_QC_B = 32  # hashed-bigram feature buckets (DSIR's bounding trick)
_QC_DIMS = _QC_B + 1  # + bias
_QC_STEPS = 12  # fixed full-batch perceptron steps
_QC_SPAM = " click here" * 8
_QC_SHIFT = 1_000_000


def _qc_ctes() -> str:
    """corpus → hashed-bigram features (long format, + bias dim) → K
    chained perceptron steps w0..w{K}.  Every chained CTE MATERIALIZED
    (feats is referenced 2K+1 times; DuckDB would inline it)."""
    toks = _SQL_TOKENS
    fhash = (
        f"('0x' || substr(md5(({toks})[i] || ' ' || ({toks})[i+1]), 1, 8))"
        f"::BIGINT % {_QC_B}"
    )
    parts = [
        f"""corpus AS MATERIALIZED (
      SELECT doc_id, text, -1 AS y FROM documents WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id + {_QC_SHIFT} AS doc_id, text || '{_QC_SPAM}' AS text,
             1 AS y
      FROM documents WHERE doc_id % 2 = 0
    ),
    bg AS MATERIALIZED (
      SELECT doc_id, y,
             unnest(list_transform(range(1, len({toks})), i -> {fhash})) AS dim
      FROM corpus WHERE len({toks}) >= 2
    ),
    feats AS MATERIALIZED (
      SELECT doc_id, y, dim, CAST(COUNT(*) AS BIGINT) AS val
      FROM bg GROUP BY 1, 2, 3
      UNION ALL
      SELECT DISTINCT doc_id, y, {_QC_B} AS dim, CAST(1 AS BIGINT) AS val
      FROM bg
    ),
    w0 AS MATERIALIZED (
      SELECT unnest(range(0, {_QC_DIMS})) AS dim, CAST(0 AS BIGINT) AS wt
    )"""
    ]
    for k in range(_QC_STEPS):
        parts.append(f"""m{k} AS MATERIALIZED (
      SELECT d.doc_id, d.y FROM (
        SELECT f.doc_id, MIN(f.y) AS y, SUM(w.wt * f.val) AS s
        FROM feats f JOIN w{k} w ON w.dim = f.dim
        GROUP BY f.doc_id
      ) d WHERE d.y * d.s <= 0
    ),
    w{k + 1} AS MATERIALIZED (
      SELECT w.dim, w.wt + COALESCE(u.delta, 0) AS wt
      FROM w{k} w LEFT JOIN (
        SELECT f.dim, SUM(m.y * f.val) AS delta
        FROM m{k} m JOIN feats f ON f.doc_id = m.doc_id
        GROUP BY f.dim
      ) u ON u.dim = w.dim
    )""")
    return ",\n    ".join(parts)


def _qc_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, x): the labeled training corpus with its 33-dim
    integer feature vector, computed ROW-LOCALLY — bigrams hash into
    {0..31} in one pass, bucket counts come from in-row array filters,
    and the bias rides as dim 32.  Nothing but (doc_id, y, 33 longs)
    ever leaves the row."""
    docs = fan_out(load_table(spark, "documents", sf_dir).select("doc_id", "text"))
    clean = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", F.lit(-1).alias("y")
    )
    spam = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + _QC_SHIFT).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_QC_SPAM)).alias("text"),
        F.lit(1).alias("y"),
    )
    c = clean.unionByName(spam)
    toks = TX.tokens(F.col("text"))
    x = P.hashed_bigram_features(F.col("text"), _QC_B)
    return c.filter(F.size(toks) >= 2).select("doc_id", "y", x.alias("x"))


def _qc_train(feats: DataFrame) -> list[int]:
    """K full-batch perceptron steps.  Each step is ONE distributed
    job — the current weights fold into the plan as literals (whole-
    stage-codegen arithmetic, no UDF), the misclassified-set update
    Σ y·x comes back as 33 longs — the sanctioned bounded-driver-state
    iterative-trainer shape (kmeans_int8_lloyd / functions/bpe.py
    precedent).  All-integer, so the sequence is engine-exact."""
    return P.train_perceptron(feats, _QC_DIMS, _QC_STEPS)


@register(
    "quality_classifier_train",
    oracle_fn=lambda: f"""
    WITH {_qc_ctes()}
    SELECT CAST(dim AS INT) AS dim, CAST(wt AS BIGINT) AS weight
    FROM w{_QC_STEPS}
    """,
    tags=("llmdata", "quality", "ml"),
    tier="shadow",
)
def quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a fastText-style linear quality classifier IN the engine:
    12 full-batch perceptron steps over hashed-bigram count features
    (32 buckets + bias) on a planted task — odd docs are clean (y=−1),
    even docs get a spam phrase injected (y=+1) — and emit the final
    33 integer weights.  The perceptron update w += Σ_misclassified y·x
    is transcendental-free, so the oracle replays the identical K-step
    trajectory in chained CTEs and the weights match EXACTLY — in-engine
    trainable data curation with hard verification, complementing the
    fixed Gopher rule battery and the DSIR ratio (which selects toward
    a target domain; this learns to DETECT a planted contamination).

    Scale shape: features are row-local md5-bucket counts (dimension
    bounded at 32 — DSIR's hashing trick, so weights always broadcast);
    each training step is one distributed aggregate with the current
    weights folded in as codegen literals, returning 33 longs to the
    driver (the kmeans/BPE sanctioned iterative shape); at 100 TB the
    trainer runs on a sample while application (next query) is a pure
    scan."""
    feats = scoped_persist(_qc_feats(spark, sf_dir))
    w = _qc_train(feats)
    return spark.createDataFrame(
        [(j, int(w[j])) for j in range(_QC_DIMS)], "dim int, weight long"
    )


@register(
    "streaming_classifier_gate",
    oracle_fn=lambda: f"""
    WITH {_qc_ctes()},
    pred AS (
      SELECT f.doc_id, MIN(f.y) AS y,
             CASE WHEN SUM(w.wt * f.val) > 0 THEN 1 ELSE -1 END AS y_hat
      FROM feats f JOIN w{_QC_STEPS} w ON w.dim = f.dim
      GROUP BY f.doc_id
    )
    SELECT CAST(y AS INT) AS y, CAST(y_hat AS INT) AS y_hat,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    """,
    tags=("llmdata", "quality", "ml", "streaming"),
    tier="shadow",
)
def streaming_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained quality filter EXECUTED BY Structured Streaming —
    curation-at-ingest for the learned gate, completing the at-ingest
    family (contamination gate, near-dup/novelty/line-dedup stores):
    the perceptron trains once batch-side, then a parquet file-stream
    of documents flows through the literal-folded scoring filter
    (features row-local, 33 integer weights baked into the plan as
    codegen literals — the production shape: NO broadcast, NO state on
    the scoring path) into a complete-mode y×ŷ count.  The emitted
    confusion must equal the batch quality_classifier_confusion — the
    DuckDB oracle independently retrains AND re-applies, so a drift
    anywhere in trainer, featurizer, or the streaming filter surfaces
    as a value mismatch.

    Scale shape: the only stateful operator is the 4-cell confusion
    count; everything upstream is a stateless scan, so this runs
    forever on an unbounded crawl feed at constant state."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import types as T

    feats = scoped_persist(_qc_feats(spark, sf_dir))
    w = _qc_train(feats)

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    raw = (
        spark.readStream.schema(doc_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    # build the planted task ON the stream (odd = clean y=−1, even =
    # spam-injected y=+1), mirroring _qc_feats row-for-row; staged via
    # withColumn so no same-name re-alias coexists with a reader (the
    # lateral-column-alias hazard)
    odd = F.col("doc_id") % 2 == 1
    labeled = (
        raw.withColumn("y", F.when(odd, F.lit(-1)).otherwise(F.lit(1)))
        .withColumn(
            "text2",
            F.when(odd, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(_QC_SPAM))
            ),
        )
        .select(
            F.when(odd, F.col("doc_id"))
            .otherwise(F.col("doc_id") + _QC_SHIFT)
            .alias("doc_id2"),
            F.col("text2").alias("text"),
            "y",
        )
        .filter(F.size(TX.tokens(F.col("text"))) >= 2)
        # the fixture is ONE parquet file → one stream input partition;
        # without this stateless shuffle the hashed-bigram featurization
        # serializes on a single core (measured ~3.5 min at sf0.1 vs
        # ~20 s wide).  At 100 TB the feed has >> |cores| files and the
        # repartition is a no-op to remove.
        .repartition(spark.sparkContext.defaultParallelism)
    )
    dot = P.dot_weights_inline(
        P.hashed_bigram_features(F.col("text"), _QC_B), w
    )
    y_hat = F.when(dot > 0, F.lit(1)).otherwise(F.lit(-1))
    counts = (
        labeled.select("y", y_hat.alias("y_hat"))
        .groupBy("y", "y_hat")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"stream_clfgate_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_clfgate_")
    try:
        q = (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


_QC_TAUS = 16  # threshold sweep: k/16-of-max-|score| for k in -16..16


@register(
    "quality_classifier_pr_curve",
    oracle_fn=lambda: f"""
    WITH {_qc_ctes()},
    scored AS MATERIALIZED (
      SELECT f.doc_id, MIN(f.y) AS y, SUM(w.wt * f.val) AS s
      FROM feats f JOIN w{_QC_STEPS} w ON w.dim = f.dim
      GROUP BY f.doc_id
    ),
    mx AS (SELECT MAX(ABS(s)) AS m FROM scored),
    ks AS (SELECT unnest(range(-{_QC_TAUS}, {_QC_TAUS} + 1)) AS k),
    cells AS (
      SELECT k.k,
        SUM(CASE WHEN {_QC_TAUS} * s.s > k.k * mx.m AND s.y = 1
            THEN 1 ELSE 0 END) AS tp,
        SUM(CASE WHEN {_QC_TAUS} * s.s > k.k * mx.m AND s.y = -1
            THEN 1 ELSE 0 END) AS fp,
        SUM(CASE WHEN {_QC_TAUS} * s.s <= k.k * mx.m AND s.y = 1
            THEN 1 ELSE 0 END) AS fn,
        SUM(CASE WHEN {_QC_TAUS} * s.s <= k.k * mx.m AND s.y = -1
            THEN 1 ELSE 0 END) AS tn
      FROM scored s CROSS JOIN mx CROSS JOIN ks k
      GROUP BY k.k
    )
    SELECT CAST(k AS INT) AS k,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6)
           END AS precision_at_k,
           ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_at_k
    FROM cells
    """,
    tags=("llmdata", "quality", "ml", "diagnostic"),
    tier="shadow",
)
def quality_classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep over the trained classifier: precision/recall
    of "drop iff w·x > τ" at 33 thresholds τ = k·max|score|/16,
    k ∈ −16..16 — the operating-curve readout a deployment tunes
    against before screening a 100 TB crawl (pick τ for the tolerable
    clean-data loss, read off the spam leak-through).  Pure-integer
    threshold test (16·s > k·max|s| — never a divided float), so the
    oracle's independently retrained trajectory lands on bit-identical
    cells; the only doubles are the final exact-integer-ratio rates.

    Scale shape: scores come from the literal-folded scan (one pass);
    the sweep is one aggregate over a 33× bounded fan-out of (y, s)
    pairs against two broadcast dimensions (the 1-row max-|score|
    aggregate and the 33-row k range) — corpus text is never rescanned
    per threshold."""
    feats = scoped_persist(_qc_feats(spark, sf_dir))
    w = _qc_train(feats)
    scored = feats.select(
        "y", P.dot_weights(F.col("x"), w).alias("s")
    )
    mx = scored.agg(F.max(F.abs(F.col("s"))).alias("m"))
    ks = spark.range(-_QC_TAUS, _QC_TAUS + 1).select(
        F.col("id").cast("int").alias("k")
    )
    pred = (F.lit(_QC_TAUS) * F.col("s")) > (F.col("k") * F.col("m"))
    cells = (
        scored.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(pred & (F.col("y") == 1), 1).otherwise(0)).alias("tp"),
            F.sum(F.when(pred & (F.col("y") == -1), 1).otherwise(0)).alias("fp"),
            F.sum(F.when(~pred & (F.col("y") == 1), 1).otherwise(0)).alias("fn"),
            F.sum(F.when(~pred & (F.col("y") == -1), 1).otherwise(0)).alias("tn"),
        )
    )
    return cells.select(
        "k",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            (F.col("tp") + F.col("fp")) > 0,
            F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6),
        ).alias("precision_at_k"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6).alias(
            "recall_at_k"
        ),
    )


@register(
    "quality_classifier_confusion",
    oracle_fn=lambda: f"""
    WITH {_qc_ctes()},
    pred AS (
      SELECT f.doc_id, MIN(f.y) AS y,
             CASE WHEN SUM(w.wt * f.val) > 0 THEN 1 ELSE -1 END AS y_hat
      FROM feats f JOIN w{_QC_STEPS} w ON w.dim = f.dim
      GROUP BY f.doc_id
    )
    SELECT CAST(y AS INT) AS y, CAST(y_hat AS INT) AS y_hat,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    """,
    tags=("llmdata", "quality", "ml", "diagnostic"),
    tier="shadow",
)
def quality_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained classifier back over the corpus and emit the
    confusion matrix (y × ŷ counts; ŷ = sign(w·x), ties to −1).  The
    planted spam signal is linearly separable up to hash-bucket
    collisions, so the diagonal dominating is the readout that the
    12-step trainer actually learned the injected phrase's buckets —
    and because the oracle independently retrains AND re-applies, a
    divergence anywhere in the trajectory surfaces as a value mismatch.

    Scale shape: application is the production path of a quality
    filter — the 33 weights fold into the scan as literals (zero
    shuffle, zero UDF, pure whole-stage codegen); this is exactly how
    a fastText-style filter screens a 100 TB crawl."""
    feats = scoped_persist(_qc_feats(spark, sf_dir))
    w = _qc_train(feats)
    dot = P.dot_weights(F.col("x"), w)
    y_hat = F.when(dot > 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        feats.select("y", y_hat.alias("y_hat"))
        .groupBy("y", "y_hat")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "ccnet_perplexity_buckets",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM freq),
    d AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(length(format('{{:b}}', tot.n_total))
                      - length(format('{{:b}}', f.c))) AS BIGINT) AS sum_sur
      FROM tok t JOIN freq f USING (tok) CROSS JOIN tot
      GROUP BY t.doc_id
    ),
    scored AS (
      SELECT d.doc_id, doc.source, d.n_tokens,
             d.sum_sur / CAST(d.n_tokens AS DOUBLE) AS ms
      FROM d JOIN documents doc USING (doc_id)
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY ms, doc_id) AS r,
             COUNT(*) OVER () AS n
      FROM scored
    ),
    b AS (
      SELECT source, n_tokens,
             CASE WHEN 3 * r <= n THEN 'head'
                  WHEN 3 * r <= 2 * n THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM rk
    ),
    per_source AS (SELECT source, COUNT(*) AS n_src FROM b GROUP BY source)
    SELECT b.source, b.ppl_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b.n_tokens) AS BIGINT) AS n_tok_total,
           ROUND(COUNT(*) / CAST(MIN(ps.n_src) AS DOUBLE), 6)
             AS share_of_source
    FROM b JOIN per_source ps USING (source)
    GROUP BY b.source, b.ppl_bucket
    """,
    tags=("llmdata", "text", "quality"),
    tier="shadow",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020): rank every
    document by LM score and split the corpus into equal head / middle
    / tail terciles — THE published device for grading crawl text by
    fluency (CCNet keeps head+middle; tail is the noise pool), here
    reported as each source's composition across the three buckets so
    a mixture designer can see which sources contribute fluent text.
    The LM score is the repo's exact-integer dyadic surprisal
    (doc_surprisal_quality's bits(N)-bits(c) device), so the ranking
    is oracle-exact: the mean is one int/int double division and the
    tercile test is pure integer (3·rank <= n, 3·rank <= 2n).

    Scale shape: the global rank comes from the bucketed two-level
    scan (operators/prefixscan.py:bucketed_rank — range-bucket on the
    score, rank within buckets in parallel, offset by the |buckets|-row
    prefix sum), NEVER a single-task sort of the corpus; the corpus
    total n is a sanctioned 1-row broadcast; everything downstream
    aggregates |sources| x 3 rows."""
    from kafkastreamsproject_spark.operators.prefixscan import bucketed_rank

    docs = fan_out(load_table(spark, "documents", sf_dir))
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    sur = _bits(F.col("n_total")) - _bits(F.col("c"))
    d = (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", sur.alias("sur"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("sur").alias("sum_sur"),
        )
    )
    scored = d.join(docs.select("doc_id", "source"), "doc_id").select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("sum_sur") / F.col("n_tokens").cast("double")).alias("ms"),
    )
    ranked = bucketed_rank(scored, "ms", "doc_id", out_col="r")
    n = scored.agg(F.count(F.lit(1)).alias("n"))
    bucket = (
        F.when(3 * F.col("r") <= F.col("n"), F.lit("head"))
        .when(3 * F.col("r") <= 2 * F.col("n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    b = ranked.crossJoin(F.broadcast(n)).select(
        "source", "n_tokens", bucket.alias("ppl_bucket")
    )
    per_source = b.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    return (
        b.groupBy("source", "ppl_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tok_total"),
        )
        .join(F.broadcast(per_source), "source")
        .select(
            "source",
            "ppl_bucket",
            "n_docs",
            "n_tok_total",
            F.round(
                F.col("n_docs") / F.col("n_src").cast("double"), 6
            ).alias("share_of_source"),
        )
    )


_DRM_T = 3  # Group-DRO multiplicative-weight rounds
_DRM_CLAMP = 4  # |q| bound: weights span 2^-4 .. 2^4 around uniform


def _drm_ctes() -> str:
    """sc (source × token counts) → T chained rounds, each re-fitting
    the weighted unigram LM and updating the per-source dyadic
    exponents; every chained CTE MATERIALIZED (sc is referenced twice
    per round)."""
    bits_nw = "length(format('{:b}', n.nw))"
    bits_cw = "length(format('{:b}', c.cw))"
    parts = [
        f"""corpus AS MATERIALIZED (
      SELECT source, text FROM documents
      UNION ALL
      SELECT 'planted_hard' AS source,
             array_to_string(list_transform({_SQL_TOKENS},
               t -> t || '_u' || CAST(doc_id AS VARCHAR)), ' ') AS text
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT 'planted_easy' AS source, trim(repeat('the ', 50)) AS text
      FROM documents WHERE doc_id % 7 = 3
    ),
    tok AS MATERIALIZED (
      SELECT source, unnest({_SQL_TOKENS}) AS tok FROM corpus
    ),
    sc AS MATERIALIZED (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
      FROM tok GROUP BY 1, 2
    ),
    q0 AS (SELECT DISTINCT source, 0 AS q FROM sc)"""
    ]
    for t in range(_DRM_T + 1):
        parts.append(f"""cw{t} AS MATERIALIZED (
      SELECT s.tok, CAST(SUM(s.n * (1 << (w.q + {_DRM_CLAMP}))) AS BIGINT) AS cw
      FROM sc s JOIN q{t} w USING (source) GROUP BY s.tok
    ),
    nw{t} AS (SELECT CAST(SUM(cw) AS BIGINT) AS nw FROM cw{t}),
    dom{t} AS MATERIALIZED (
      SELECT s.source,
             CAST(SUM(s.n * ({bits_nw} - {bits_cw})) AS BIGINT) AS ss,
             CAST(SUM(s.n) AS BIGINT) AS nt
      FROM sc s JOIN cw{t} c USING (tok) CROSS JOIN nw{t} n
      GROUP BY s.source
    )""")
        if t < _DRM_T:
            parts.append(f"""tot{t} AS (
      SELECT CAST(SUM(ss) AS BIGINT) AS sa, CAST(SUM(nt) AS BIGINT) AS na
      FROM dom{t}
    ),
    q{t + 1} AS (
      SELECT d.source,
        LEAST({_DRM_CLAMP}, GREATEST(-{_DRM_CLAMP}, w.q + CASE
          WHEN 8 * (d.ss * t.na - t.sa * d.nt) >= d.nt * t.na THEN 1
          WHEN 8 * (d.ss * t.na - t.sa * d.nt) <= -(d.nt * t.na) THEN -1
          ELSE 0 END)) AS q
      FROM dom{t} d JOIN q{t} w USING (source) CROSS JOIN tot{t} t
    )""")
    return ",\n    ".join(parts)


@register(
    "doremi_mixture_weights",
    oracle_fn=lambda: f"""
    WITH {_drm_ctes()},
    wsum AS (
      SELECT CAST(SUM(1 << (q + {_DRM_CLAMP})) AS BIGINT) AS ws
      FROM q{_DRM_T}
    )
    SELECT d.source, d.nt AS n_tokens, CAST(w.q AS INT) AS q,
           CAST((1 << (w.q + {_DRM_CLAMP})) AS BIGINT) AS w_num,
           ROUND((1 << (w.q + {_DRM_CLAMP})) / CAST(ws.ws AS DOUBLE), 6)
             AS mixture_weight,
           CAST((1000000 * d.ss) // d.nt AS BIGINT) AS loss_ppm
    FROM dom{_DRM_T} d JOIN q{_DRM_T} w USING (source)
    CROSS JOIN wsum ws
    """,
    tags=("llmdata", "mixture", "ml"),
    tier="shadow",
)
def doremi_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023) IN the engine:
    Group-DRO multiplicative weights over per-source excess loss, with
    the paper's proxy model replaced by the repo's exact-integer device
    — a unigram LM RE-FIT each round on the currently-reweighted corpus
    (weighted counts are Σ 2^(q_k)·n_k — exact integers, the DSIR
    dyadic trick), domain loss = mean dyadic surprisal under that LM,
    and the exponentiated-gradient update coarsened to its sign: a
    domain whose excess loss exceeds 1/8 bit doubles its weight, one
    more than 1/8 bit BELOW the mixture average halves it (clamped to
    2^±4).  The loop is a true fixpoint iteration — reweighting changes
    the LM, which changes every domain's loss — exactly the dynamic the
    paper's proxy-model loop exhibits, minus the transcendentals.  The
    final row per source: its token count, exponent, normalized mixture
    weight, and loss under the final mixture's LM.

    Planted dynamics: two synthetic domains join the real sources —
    ``planted_hard`` (every token uniquified per doc → near-maximal
    surprisal) and ``planted_easy`` (one token repeated → near-zero) —
    so the trajectory is actually exercised: hard climbs to q=+3
    (≈0.75 mixture weight — the worst-domain concentration Group-DRO's
    minimax objective drives and the paper reports for high-entropy
    domains), easy and the homogeneous real sources decay to −3, and
    both update branches fire every round.

    Exactness: the excess-loss test is the pure-integer comparison
    8·(ss_k·na − sa·nt_k) vs ±(nt_k·na) (no float loss ever exists),
    so the oracle's chained-CTE replay reproduces the identical weight
    trajectory.  (At extreme corpus sizes the cross-products want
    DECIMAL(38) / hugeint — a documented widening, not a redesign.)

    Scale shape: the iterative-trainer shape (functions/perceptron.py
    / functions/bpe.py precedent): per round ONE distributed job —
    re-aggregate the weighted vocab (broadcast 20-row weight table,
    one tok shuffle), score domains (vocab-side build join, source
    rollup), and return |sources| integer triples to the driver via a
    single collect_list row; T=3 rounds + final eval = 4 bounded jobs
    over the persisted (source, tok, n) base."""
    base = fan_out(load_table(spark, "documents", sf_dir))
    toks = TX.tokens(F.col("text"))
    hard = base.filter(F.col("doc_id") % 7 == 0).select(
        F.lit("planted_hard").alias("source"),
        F.array_join(
            F.transform(
                toks,
                lambda t: F.concat(
                    t, F.lit("_u"), F.col("doc_id").cast("string")
                ),
            ),
            " ",
        ).alias("text"),
    )
    easy = base.filter(F.col("doc_id") % 7 == 3).select(
        F.lit("planted_easy").alias("source"),
        F.trim(F.repeat(F.lit("the "), 50)).alias("text"),
    )
    docs = (
        base.select("source", "text").unionByName(hard).unionByName(easy)
    )
    tok = docs.select(
        "source", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    sc = scoped_persist(
        tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    )

    def dom_losses(q: dict[str, int]) -> DataFrame:
        wdf = spark.createDataFrame(
            [(s, 1 << (qv + _DRM_CLAMP)) for s, qv in sorted(q.items())],
            "source string, w long",
        )
        cw = (
            sc.join(F.broadcast(wdf), "source")
            .groupBy("tok")
            .agg(F.sum(F.col("n") * F.col("w")).alias("cw"))
        )
        nw = cw.agg(F.sum("cw").alias("nw"))
        sur = _bits(F.col("nw")) - _bits(F.col("cw"))
        return (
            sc.join(cw, "tok")
            .crossJoin(F.broadcast(nw))
            .select("source", "n", (F.col("n") * sur).alias("sbits"))
            .groupBy("source")
            .agg(
                F.sum("sbits").alias("ss"),
                F.sum("n").alias("nt"),
            )
        )

    srcs = (
        sc.select("source")
        .distinct()
        .groupBy()
        .agg(F.collect_list("source").alias("s"))
        .first()
        .s
    )
    q: dict[str, int] = {s: 0 for s in srcs}
    for _ in range(_DRM_T):
        row = dom_losses(q).groupBy().agg(
            F.collect_list(F.struct("source", "ss", "nt")).alias("d")
        ).first()
        sa = sum(r.ss for r in row.d)
        na = sum(r.nt for r in row.d)
        for r in row.d:
            excess8 = 8 * (r.ss * na - sa * r.nt)
            step = 1 if excess8 >= r.nt * na else (
                -1 if excess8 <= -(r.nt * na) else 0
            )
            q[r.source] = max(-_DRM_CLAMP, min(_DRM_CLAMP, q[r.source] + step))
    ws = sum(1 << (qv + _DRM_CLAMP) for qv in q.values())
    qdf = spark.createDataFrame(
        [(s, qv, 1 << (qv + _DRM_CLAMP)) for s, qv in sorted(q.items())],
        "source string, q int, w_num long",
    )
    return (
        dom_losses(q)
        .join(F.broadcast(qdf), "source")
        .select(
            "source",
            F.col("nt").alias("n_tokens"),
            "q",
            "w_num",
            F.round(F.col("w_num") / F.lit(float(ws)), 6).alias(
                "mixture_weight"
            ),
            F.expr("cast((1000000 * ss) div nt as bigint)").alias(
                "loss_ppm"
            ),
        )
    )


_PK_BUDGET = 96
_PK_SHARDS = 4
_PK_SHARD = (
    f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    f" % {_PK_SHARDS})"
)


@register(
    "packing_ffd_replay",
    oracle=f"""
    WITH RECURSIVE meta AS MATERIALIZED (
      SELECT doc_id, CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens,
             CAST({_PK_SHARD} AS INT) AS shard_id
      FROM documents
    ),
    seq AS MATERIALIZED (
      SELECT shard_id, doc_id, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY shard_id
                                ORDER BY n_tokens DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY shard_id) AS n_docs
      FROM meta
    ),
    ffd AS (
      SELECT shard_id, 0 AS rn,
             CAST([] AS BIGINT[]) AS rem, CAST([] AS BIGINT[]) AS asg
      FROM (SELECT DISTINCT shard_id FROM seq)
      UNION ALL
      SELECT f.shard_id, f.rn + 1,
        CASE
          WHEN s.n_tokens > {_PK_BUDGET}
            THEN list_append(f.rem, CAST(-1 AS BIGINT))
          WHEN list_min(list_filter(range(1, len(f.rem) + 1),
                 i -> f.rem[i] >= s.n_tokens)) IS NOT NULL
            THEN list_transform(range(1, len(f.rem) + 1),
                 i -> CASE WHEN i = list_min(list_filter(
                        range(1, len(f.rem) + 1),
                        j -> f.rem[j] >= s.n_tokens))
                      THEN f.rem[i] - s.n_tokens ELSE f.rem[i] END)
          ELSE list_append(f.rem, CAST({_PK_BUDGET} AS BIGINT) - s.n_tokens)
        END,
        list_append(f.asg, CAST(
          CASE
            WHEN s.n_tokens > {_PK_BUDGET} THEN len(f.rem)
            WHEN list_min(list_filter(range(1, len(f.rem) + 1),
                   i -> f.rem[i] >= s.n_tokens)) IS NOT NULL
              THEN list_min(list_filter(range(1, len(f.rem) + 1),
                     i -> f.rem[i] >= s.n_tokens)) - 1
            ELSE len(f.rem)
          END AS BIGINT))
      FROM ffd f JOIN seq s
        ON s.shard_id = f.shard_id AND s.rn = f.rn + 1
    ),
    final AS (
      SELECT f.shard_id, f.asg
      FROM ffd f JOIN (SELECT shard_id, MAX(n_docs) AS n FROM seq
                       GROUP BY shard_id) t
        ON t.shard_id = f.shard_id AND f.rn = t.n
    ),
    assigned AS (
      SELECT s.shard_id, s.doc_id, s.n_tokens,
             fin.asg[s.rn] AS pack_idx
      FROM seq s JOIN final fin ON fin.shard_id = s.shard_id
    )
    SELECT shard_id,
           CAST(shard_id AS VARCHAR) || '-' || CAST(pack_idx AS VARCHAR)
             AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           CAST((1000000 * SUM(n_tokens)) // {_PK_BUDGET} AS BIGINT)
             AS fill_ppm,
           MAX(n_tokens > {_PK_BUDGET}) AS overflow
    FROM assigned
    GROUP BY shard_id, pack_id
    """,
    tags=("llmdata", "packing"),
    tier="shadow",
)
def packing_ffd_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing's oracle row — the last major operator family
    that was pytest-only: the corpus's whitespace token counts pack
    into 96-token shards (budget chosen inside the fixture's 10..99
    token range so the oversize-doc branch actually fires) via operators/packing.py's
    first-fit-decreasing (one applyInPandas task per shard, only
    (id, count) ever shuffles), and the DuckDB oracle replays the
    ENTIRE sequential FFD fold in one recursive CTE — per step, the
    first-fit index is the min of the filtered capacity list, oversize
    docs close their own pack at capacity −1, ties broken by
    (n_tokens DESC, doc_id ASC) exactly as the numpy sweep orders.
    Per resulting pack: doc count, token fill (exact ppm of budget),
    overflow flag.  Sharding for this query is the md5-derived column
    (pack_documents' shard_col override) because the default xxhash64
    has no DuckDB twin; the hash legs are equivalent for balance and
    the default leg stays pinned by tests/test_packing.py.

    Scale shape: unchanged from the operator (FFD is NP-hard and
    sequential, so the distributed shape is hash-sharded independent
    FFD instances — 11/9·OPT + 6/9 per shard; the recursion exists
    ONLY in the oracle, the engine side is one vectorized sweep per
    shard)."""
    from kafkastreamsproject_spark.functions import hashing as _H
    from kafkastreamsproject_spark.operators.packing import pack_documents

    docs = fan_out(load_table(spark, "documents", sf_dir))
    meta = docs.select(
        "doc_id",
        F.size(TX.tokens(F.col("text"))).cast("long").alias("n_tokens"),
        (
            _H.token_hash32(F.col("doc_id").cast("string")) % _PK_SHARDS
        ).cast("int").alias("shard"),
    )
    packed = pack_documents(
        meta, _PK_BUDGET, shard_col="shard"
    )
    return packed.groupBy("shard_id", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("pack_tokens").alias("pack_tokens"),
        F.expr(
            f"cast((1000000 * max(pack_tokens)) div {_PK_BUDGET} as bigint)"
        ).alias("fill_ppm"),
        F.max("overflow").alias("overflow"),
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching: the padding-waste knob (r11)
# ---------------------------------------------------------------------------

_PAD_TILES = (1, 2, 4, 8)


@register(
    "padding_waste_curve",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), ' +')) AS n_toks
      FROM documents
    ),
    legs AS (
      {" UNION ALL ".join(
          f'''SELECT {b} AS n_len_buckets,
                 NTILE({b}) OVER (ORDER BY n_toks, doc_id) AS tile,
                 n_toks
          FROM toks'''
          for b in _PAD_TILES
      )}
    ),
    per_tile AS (
      SELECT n_len_buckets, tile,
             MAX(n_toks) AS pad_len,
             COUNT(*) AS n_docs,
             SUM(n_toks) AS real_toks
      FROM legs GROUP BY 1, 2
    ),
    totals AS (
      -- CAST: DuckDB SUM(BIGINT) returns HUGEINT, which pandas renders
      -- as float64 — BIGINT keeps the frame integer-clean like Spark's
      SELECT n_len_buckets,
             CAST(SUM(pad_len * n_docs) AS BIGINT) AS padded_tokens,
             CAST(SUM(real_toks) AS BIGINT) AS real_tokens
      FROM per_tile GROUP BY 1
    )
    SELECT n_len_buckets, padded_tokens, real_tokens,
           (1000000 * (padded_tokens - real_tokens)) // padded_tokens
               AS waste_ppm
    FROM totals ORDER BY 1
    """,
    tags=("llmdata", "packing", "curve"),
    tier="shadow",
)
def padding_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding waste vs length-bucket count — the sorted-batching knob
    every training pipeline tunes (bucket sequences by length, pad each
    bucket to its max): one row per B ∈ {1, 2, 4, 8} quantile buckets
    with the padded/real token totals and the waste in exact parts per
    million (integer floor-division on both engines — a ROUND(double)
    here would expose Spark's HALF_UP vs DuckDB's C-style rounding at
    boundary values, a latent cross-engine hash flake).  B=1 is
    the no-bucketing baseline (pad everything to the corpus max); the
    curve shows how fast waste collapses as buckets narrow, i.e. how
    much a dynamic-batching loader saves over fixed-shape batches.

    Quantile assignment is NTILE over (n_tokens, doc_id) — computed
    WITHOUT a single-task global sort via the bucketed two-level rank
    (operators/prefixscan.py:bucketed_rank + ntile_from_rank, the
    ccnet-terciles device), so the plan scales: one bucket-key shuffle,
    a |buckets|-row offset scan, and a ≤(4·B)-row final aggregate.  The
    1-row count and (lo, hi) bounds broadcasts are the sanctioned 'agg'
    BNLJ shape.  Exactly NTILE's contract on a deterministic total
    order, so the DuckDB window formulation matches hash-for-hash.
    """
    from kafkastreamsproject_spark.operators.prefixscan import (
        bucketed_rank,
        ntile_from_rank,
    )

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.size(TX.tokens(F.col("text"))).cast("long").alias("n_toks"),
    )
    n_total = toks.agg(F.count(F.lit(1)).alias("__n"))
    ranked = bucketed_rank(toks, "n_toks", "doc_id").join(
        F.broadcast(n_total)
    )

    legs = None
    for b in _PAD_TILES:
        leg = ranked.select(
            F.lit(b).alias("n_len_buckets"),
            ntile_from_rank(F.col("rk"), F.col("__n"), b).alias("tile"),
            "n_toks",
        )
        legs = leg if legs is None else legs.unionByName(leg)
    per_tile = legs.groupBy("n_len_buckets", "tile").agg(
        F.max("n_toks").alias("pad_len"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("real_toks"),
    )
    return (
        per_tile.groupBy("n_len_buckets")
        .agg(
            F.sum(F.col("pad_len") * F.col("n_docs")).alias("padded_tokens"),
            F.sum("real_toks").alias("real_tokens"),
        )
        .select(
            "n_len_buckets",
            "padded_tokens",
            "real_tokens",
            # exact long arithmetic end-to-end (`div` is Spark's
            # integer floor-division, DuckDB's `//` twin) — never a
            # double, so the hash compare can't flake on rounding mode
            F.expr(
                "(1000000 * (padded_tokens - real_tokens)) div padded_tokens"
            ).alias("waste_ppm"),
        )
        .orderBy("n_len_buckets")
    )


# ---------------------------------------------------------------------------
# Best-fit-decreasing packing — the FFD replay's policy twin (r11)
# ---------------------------------------------------------------------------

#: the 1-based index BFD picks from the remaining-capacity list ``rem``
#: for an item of size ``t``: among packs that fit, the smallest
#: remaining capacity, ties to the lowest index.  Inlined (SQL has no
#: let-binding); NULL when nothing fits.
def _sql_bfd_pick(rem: str, t: str) -> str:
    fits = f"list_filter(range(1, len({rem}) + 1), j -> {rem}[j] >= {t})"
    min_rem = f"list_min(list_transform({fits}, j -> {rem}[j]))"
    return (
        f"list_min(list_filter(range(1, len({rem}) + 1), "
        f"i -> {rem}[i] >= {t} AND {rem}[i] = {min_rem}))"
    )


_BFD_PICK = _sql_bfd_pick("f.rem", "s.n_tokens")


@register(
    "packing_bfd_replay",
    oracle=f"""
    WITH RECURSIVE meta AS MATERIALIZED (
      SELECT doc_id, CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens,
             CAST({_PK_SHARD} AS INT) AS shard_id
      FROM documents
    ),
    seq AS MATERIALIZED (
      SELECT shard_id, doc_id, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY shard_id
                                ORDER BY n_tokens DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY shard_id) AS n_docs
      FROM meta
    ),
    bfd AS (
      SELECT shard_id, 0 AS rn,
             CAST([] AS BIGINT[]) AS rem, CAST([] AS BIGINT[]) AS asg
      FROM (SELECT DISTINCT shard_id FROM seq)
      UNION ALL
      SELECT f.shard_id, f.rn + 1,
        CASE
          WHEN s.n_tokens > {_PK_BUDGET}
            THEN list_append(f.rem, CAST(-1 AS BIGINT))
          WHEN {_BFD_PICK} IS NOT NULL
            THEN list_transform(range(1, len(f.rem) + 1),
                 i -> CASE WHEN i = {_BFD_PICK}
                      THEN f.rem[i] - s.n_tokens ELSE f.rem[i] END)
          ELSE list_append(f.rem, CAST({_PK_BUDGET} AS BIGINT) - s.n_tokens)
        END,
        list_append(f.asg, CAST(
          CASE
            WHEN s.n_tokens > {_PK_BUDGET} THEN len(f.rem)
            WHEN {_BFD_PICK} IS NOT NULL THEN {_BFD_PICK} - 1
            ELSE len(f.rem)
          END AS BIGINT))
      FROM bfd f JOIN seq s
        ON s.shard_id = f.shard_id AND s.rn = f.rn + 1
    ),
    final AS (
      SELECT f.shard_id, f.asg
      FROM bfd f JOIN (SELECT shard_id, MAX(n_docs) AS n FROM seq
                       GROUP BY shard_id) t
        ON t.shard_id = f.shard_id AND f.rn = t.n
    ),
    assigned AS (
      SELECT s.shard_id, s.doc_id, s.n_tokens,
             fin.asg[s.rn] AS pack_idx
      FROM seq s JOIN final fin ON fin.shard_id = s.shard_id
    )
    SELECT shard_id,
           CAST(shard_id AS VARCHAR) || '-' || CAST(pack_idx AS VARCHAR)
             AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           CAST((1000000 * SUM(n_tokens)) // {_PK_BUDGET} AS BIGINT)
             AS fill_ppm,
           MAX(n_tokens > {_PK_BUDGET}) AS overflow
    FROM assigned
    GROUP BY shard_id, pack_id
    """,
    tags=("llmdata", "packing"),
    tier="shadow",
)
def packing_bfd_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing packing, oracle-replayed: identical
    distributed shape to packing_ffd_replay (hash-sharded independent
    per-task packing over (id, n_tokens) metadata) with the BEST-fit
    placement rule — each doc goes to the open pack with the smallest
    remaining capacity that fits, ties to the lowest index.  The
    DuckDB oracle replays the same sequential fold in a recursive CTE
    with the pick rule swapped, so the engine's ``policy="bfd"``
    kernel (property-tested against a sequential simulation in
    tests/test_exactness_properties.py) is verified end-to-end on real
    data too.  BFD packs at least as tightly as FFD on adversarial
    mixes; both share the 11/9-OPT family bound."""
    from kafkastreamsproject_spark.functions import hashing as _H
    from kafkastreamsproject_spark.operators.packing import pack_documents

    docs = fan_out(load_table(spark, "documents", sf_dir))
    meta = docs.select(
        "doc_id",
        F.size(TX.tokens(F.col("text"))).cast("long").alias("n_tokens"),
        (
            _H.token_hash32(F.col("doc_id").cast("string")) % _PK_SHARDS
        ).cast("int").alias("shard"),
    )
    packed = pack_documents(
        meta, _PK_BUDGET, shard_col="shard", policy="bfd"
    )
    return packed.groupBy("shard_id", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("pack_tokens").alias("pack_tokens"),
        F.expr(
            f"cast((1000000 * max(pack_tokens)) div {_PK_BUDGET} as bigint)"
        ).alias("fill_ppm"),
        F.max("overflow").alias("overflow"),
    )


# ---------------------------------------------------------------------------
# Weighted inverse-CDF sampling: k EXACT weight-proportional draws
# (with replacement) via cumulative-weight inversion — the alias-table
# sampler's distributed form.  Complements the Bernoulli-thinning
# family (mixture_sample / mixture_resample keep each doc
# independently): a fixed-size draw needs the global CDF, and at scale
# the CDF is the interesting part — a prefix sum over the corpus that
# must NOT be a single-task window.
# ---------------------------------------------------------------------------

_ICDF_K = 64  # draws per sample
_ICDF_BUCKETS = 64  # monotone doc_id ranges for the two-level scan


@register(
    "weighted_inverse_cdf_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             greatest(coalesce(n_chars, 0), 1) AS w
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, w,
             CAST(SUM(w) OVER (ORDER BY doc_id) AS BIGINT) AS hi
      FROM w
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w),
    t AS (
      SELECT r.j AS draw,
             ('0x' || substr(md5(CAST(r.j AS VARCHAR)), 1, 8))::BIGINT
               % (SELECT tw FROM tot) AS target
      FROM range({_ICDF_K}) r(j)
    )
    SELECT t.draw, c.doc_id, c.source, c.w AS weight, t.target
    FROM t JOIN c ON t.target >= c.hi - c.w AND t.target < c.hi
    """,
    tags=("llmdata", "sampling"),
    tier="shadow",
)
def weighted_inverse_cdf_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k = 64 EXACTLY weight-proportional draws (with replacement) from
    the corpus, weight = max(n_chars, 1): each draw j maps a portable
    target ``md5(j) mod total_weight`` through the inverse of the
    corpus's cumulative-weight CDF — the doc whose half-open interval
    [hi − w, hi) contains the target is selected, so P(doc) = w/Σw
    exactly, in pure integers, deterministically across engines and
    repartitionings.  This is the fixed-size companion to the
    hash-Bernoulli mixture family: epoch composition ("draw N docs
    proportional to quality weight") needs k draws, not a keep-rate.

    Scale shape: the cumulative sum is the two-level scan
    (operators/prefixscan.py:bucketed_running_sum over monotone doc_id
    range buckets — per-bucket windows in parallel, one
    |buckets|-row cross-bucket carry, never a single-task global
    window).  The k targets (range → 1-row total-weight aggregate
    broadcast) are the build side of the interval-match BNLJ — a
    machine-checked 'agg' sanction (scripts/explain_audit.py): the
    only scaling-table scan under the broadcast sits below the 1-row
    SUM aggregate.  One corpus scan, one bucket-key shuffle, k·|docs|
    interval tests map-side."""
    from kafkastreamsproject_spark.operators.prefixscan import (
        bucketed_running_sum,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        "source",
        F.greatest(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(1)).alias("w"),
    )
    bounds = docs.agg(F.max("doc_id").alias("__maxid"))
    rows = (
        docs.join(F.broadcast(bounds))
        .withColumn(
            "__cdf_bucket",
            F.floor(
                F.col("doc_id") * _ICDF_BUCKETS / (F.col("__maxid") + 1)
            ).cast("long"),
        )
        .drop("__maxid")
    )
    cdf = bucketed_running_sum(
        rows, "__cdf_bucket", [F.col("doc_id")], "w", out_col="hi"
    ).drop("__cdf_bucket")

    tot = docs.agg(F.sum("w").alias("tw"))
    h = F.conv(
        F.substring(F.md5(F.col("draw").cast("string")), 1, 8), 16, 10
    ).cast("long")
    targets = (
        spark.range(_ICDF_K)
        .select(F.col("id").alias("draw"))
        .join(F.broadcast(tot))
        .select("draw", (h % F.col("tw")).alias("target"))
    )
    hit = (F.col("target") >= F.col("hi") - F.col("w")) & (
        F.col("target") < F.col("hi")
    )
    return (
        F.broadcast(targets)
        .join(cdf, hit)
        .select(
            "draw", "doc_id", "source", F.col("w").alias("weight"), "target"
        )
    )


@register(
    "training_order_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))::BIGINT
               AS hpos
      FROM documents
    ),
    p AS (
      SELECT doc_id, hpos,
             row_number() OVER (ORDER BY hpos, doc_id) AS pos
      FROM h
    )
    SELECT doc_id, hpos, pos,
           CAST((pos - 1) % {_N_RANKS} AS INT) AS shard,
           (pos - 1) // {_N_RANKS} AS step
    FROM p
    """,
    tags=("llmdata", "sharding", "sampling"),
    tier="shadow",
)
def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-order last mile: a DETERMINISTIC global shuffle of
    the corpus — every doc gets a dense 1..N position by portable hash
    (md5 chars 25–32: independent of the split (9–16), sample (1–8)
    and shard (17–24) windows), then round-robin over the shuffled
    order assigns (shard, step): each rank reads its docs in step
    order and the interleaved global order is the hash permutation.
    shard_assignment_plan balances WHO gets each doc; this fixes WHEN
    every doc is seen — the property that makes a run's data order
    reproducible and auditable from the corpus alone (no RNG state),
    resumable mid-epoch from a (shard, step) cursor.

    Scale shape: the permutation is the two-level bucketed rank
    (operators/prefixscan.py — range-bucket on the hash, rank within
    buckets in parallel, |buckets|-row offset scan), never a
    single-task global sort; text never moves, only (doc_id, hash)
    pairs shuffle once."""
    from kafkastreamsproject_spark.operators.prefixscan import bucketed_rank

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    hpos = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 25, 8), 16, 10
    ).cast("long")
    ranked = bucketed_rank(
        docs.select("doc_id", hpos.alias("hpos")),
        "hpos",
        "doc_id",
        out_col="pos",
    )
    pos = F.col("pos").cast("long")
    return ranked.select(
        "doc_id",
        "hpos",
        pos.alias("pos"),
        ((pos - 1) % _N_RANKS).cast("int").alias("shard"),
        F.expr(f"(cast(pos as bigint) - 1) div {_N_RANKS}").alias("step"),
    )


# ---------------------------------------------------------------------------
# Priority sampling (Duffield–Lund–Thorup, JACM 2007): k weight-biased
# draws WITHOUT replacement plus the threshold estimator that makes the
# sample answer subset-sum queries unbiasedly.  Complements
# weighted_inverse_cdf_sample (with replacement): an epoch-composition
# draw tolerates repeats; an audit sample ("estimate total tokens from
# 64 docs") must not double-count, and DLT is the scheme with
# near-optimal subset-sum variance for that regime.
# ---------------------------------------------------------------------------

_DLT_K = 64
_DLT_SCALE = 4294967296  # 2^32: u = h/2^32 ∈ (0,1], priority = w/u


@register(
    "priority_sample_topk",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             greatest(coalesce(n_chars, 0), 1) AS w,
             1 + ('0x' || substr(
                    md5('prio-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               AS h
      FROM documents
    ),
    p AS (
      SELECT doc_id, source, w, (w * {_DLT_SCALE}) // h AS priority
      FROM w
    ),
    r AS (
      SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rk
      FROM p
    ),
    tau AS (
      SELECT CAST(min(priority) AS BIGINT) AS tau
      FROM r WHERE rk <= {_DLT_K} + 1
    )
    SELECT r.doc_id, r.source, CAST(r.w AS BIGINT) AS weight,
           CAST(r.priority AS BIGINT) AS priority,
           CAST(greatest(r.w, t.tau) AS BIGINT) AS w_hat
    FROM r, tau t
    WHERE r.rk <= {_DLT_K}
    """,
    tags=("llmdata", "sampling"),
    tier="shadow",
)
def priority_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k = 64 weight-biased draws WITHOUT replacement by priority
    sampling (Duffield, Lund & Thorup 2007): each doc gets a portable
    uniform u = h/2^32 from a salted hash (md5('prio-'||doc_id) chars
    1-8, +1 so u ∈ (0,1]), priority q = w·2^32 // h in exact integers,
    and the sample is the k highest priorities (ties broken by doc_id).
    τ is the (k+1)-th priority; each sampled doc carries the threshold
    estimator ŵ = max(w, τ), whose sum is an unbiased estimate of the
    corpus's total weight — and of any subset's weight, restricted to
    the subset — with near-optimal variance among k-sample schemes
    (property-tested over salts in tests/test_priority_sample.py).
    Weight = max(n_chars, 1), the mixture family's convention.

    Scale shape: the k+1 survivors come from ONE TakeOrdered over the
    corpus scan — per-partition top-(k+1) heaps, a (k+1)·|partitions|
    driver merge, never a global sort Exchange.  τ (a 1-row aggregate
    of the 65 cached rows) broadcasts back over the 64-row sample — a
    machine-checked 'agg'-bounded BNLJ (testing/bnljbounds.py).  Only
    (id, source, two longs) ever leave the scan; text stays put.
    Overflow bound: exact while w < 2^31 (w·2^32 < 2^63), i.e. docs
    under 2 GiB of chars — any real corpus row."""
    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id",
        "source",
        F.greatest(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(1)).alias("w"),
    )
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("prio-"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    )
    p = (
        docs.withColumn("h", h)
        .select(
            "doc_id",
            "source",
            "w",
            F.expr(f"(w * cast({_DLT_SCALE} as bigint)) div h").alias(
                "priority"
            ),
        )
    )
    survivors = scoped_persist(
        p.orderBy(F.desc("priority"), "doc_id").limit(_DLT_K + 1)
    )
    tau = survivors.agg(F.min("priority").cast("long").alias("tau"))
    sample = survivors.orderBy(F.desc("priority"), "doc_id").limit(_DLT_K)
    return sample.join(F.broadcast(tau)).select(
        "doc_id",
        "source",
        F.col("w").cast("long").alias("weight"),
        F.col("priority").cast("long").alias("priority"),
        F.greatest(F.col("w"), F.col("tau")).cast("long").alias("w_hat"),
    )


@register(
    "sketch_distinct_trigrams_by_source",
    oracle=f"""
    WITH tri AS (
      SELECT source, unnest({_SQL_TRI_HASHES}) AS h
      FROM documents
      WHERE len({_SQL_TOKENS}) >= 3
    )
    SELECT source,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS exact_distinct_trigrams,
           TRUE AS within_3sigma
    FROM tri
    GROUP BY source
    """,
    tags=("llmdata", "approx", "diagnostic"),
    tier="shadow",
)
def sketch_distinct_trigrams_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source distinct-trigram vocabulary size — the batch twin of
    the mergeable-sketch ingest store (streaming/distinctsketch.py),
    verified the approx_distinct_users way: DataSketches HLL values are
    engine-specific, so the oracle-hashed columns are the EXACT
    distinct count (DuckDB reproduces it) plus a Spark-computed
    ``within_3sigma`` flag asserting the store's own estimation path
    (hll_sketch_agg at lg_k=12 → hll_sketch_estimate, rse ≈ 1.6%)
    lands within ±5% (~3σ) of exact.  The exact side is the one-shot
    cost the store amortizes away: at 100 TB the countDistinct shuffles
    every distinct (source, h) pair once, while the sketch path
    shuffles |sources|·|partitions| fixed-size register blocks — the
    readout a dashboard polls per epoch without touching the corpus.

    Trigram hashes build in-row before the explode (text never
    shuffles), the repetition/novelty discipline."""
    docs = fan_out(load_table(spark, "documents", sf_dir))
    toks = TX.tokens(F.col("text"))
    tri = docs.filter(F.size(toks) >= 3).select(
        "source",
        F.explode(H.hash_list(TX.shingles(F.col("text"), 3))).alias("h"),
    )
    exact = F.countDistinct("h")
    est = F.hll_sketch_estimate(F.hll_sketch_agg("h", F.lit(12)))
    return tri.groupBy("source").agg(
        exact.alias("exact_distinct_trigrams"),
        ((F.abs(est - exact) / exact) <= F.lit(0.05)).alias("within_3sigma"),
    )
