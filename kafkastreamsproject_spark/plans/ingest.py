"""Driver-visible verification of the streaming near-dup ingest path.

``streaming/neardup.py``'s verdicts are pytest-equal to the batch
MinHash family, but until round 3 the store-probe join had no
hard-signal CORRECTNESS row.  This query replays the doubled corpus
through :func:`ingest_batch` as two micro-batches — batch 1 = the
original documents, batch 2 = the shifted copies (guaranteed dups of
batch 1) — and emits the admitted-canonical set.  The DuckDB oracle
re-derives acceptance from the same confirmed-pair relation the batch
family oracles use (``_SQL_MINHASH_CTES``): a batch-1 doc is rejected
iff a lower-id batch-1 doc confirms against it; a batch-2 doc is
rejected iff an ACCEPTED batch-1 doc (the store) or a lower-id batch-2
doc confirms against it.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.plans.dedup import (
    _SHIFT,
    _SQL_MINHASH_CTES,
    sql_minhash_ctes,
)
from kafkastreamsproject_spark.plans.registry import register
from kafkastreamsproject_spark.sources.testdata import fan_out, load_table
from kafkastreamsproject_spark.streaming.neardup import (
    dedup_shard_against_store,
    ingest_batch,
    materialize_banded_store,
)


@register(
    "streaming_neardup_ingest",
    oracle=f"""
    WITH {_SQL_MINHASH_CTES},
    b1 AS (SELECT doc_id FROM sigs WHERE doc_id < {_SHIFT}),
    b2 AS (SELECT doc_id FROM sigs WHERE doc_id >= {_SHIFT}),
    rej1 AS (
      SELECT DISTINCT id_b AS doc_id FROM pairs
      WHERE id_a < {_SHIFT} AND id_b < {_SHIFT}
    ),
    acc1 AS (
      SELECT doc_id FROM b1
      WHERE doc_id NOT IN (SELECT doc_id FROM rej1)
    ),
    rej2 AS (
      -- ids only increase across batches, so a store match always has
      -- id_a in batch 1 and id_b in batch 2; a batch-internal match has
      -- both ids in batch 2 with id_a the earlier (lower) doc
      SELECT DISTINCT id_b AS doc_id FROM pairs
      WHERE id_b >= {_SHIFT}
        AND (id_a >= {_SHIFT} OR id_a IN (SELECT doc_id FROM acc1))
    ),
    acc2 AS (
      SELECT doc_id FROM b2
      WHERE doc_id NOT IN (SELECT doc_id FROM rej2)
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, 1 AS batch FROM acc1
    UNION ALL
    SELECT CAST(doc_id AS BIGINT) AS doc_id, 2 AS batch FROM acc2
    """,
    tags=("dedup", "minhash", "streaming"),
)
def streaming_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch replay of dedup-at-ingest: fold the original documents,
    then their shifted copies, through the persistent-signature-store
    loop; return who survived as canonical.  Exercises end-to-end: batch
    signaturing, the store-probe banded equi-join, within-batch LSH,
    Jaccard confirmation, and the store append/anti-join bookkeeping.

    The store lives in a throwaway temp dir; both ``ingest_batch`` calls
    eagerly localCheckpoint their results, so the returned DataFrame has
    no lineage into the deleted files.  The driver-local temp path is a
    single-machine (local[*]) harness choice — this query VERIFIES the
    ingest loop; a production deployment runs
    ``to_neardup_ingest_sink`` against a shared store URI (HDFS/S3),
    which the loop's Hadoop-FS probes already handle.
    """
    # fan_out: the local documents file is one row group, so without it
    # each batch's shingle+md5 signaturing serializes on one core (the
    # streaming sink doesn't need this — its micro-batches arrive
    # already partitioned by the source).
    docs = fan_out(load_table(spark, "documents", sf_dir).select("doc_id", "text"))
    shifted = docs.select((F.col("doc_id") + _SHIFT).alias("doc_id"), "text")
    store = tempfile.mkdtemp(prefix="neardup_ingest_store_")
    try:
        _, acc1 = ingest_batch(docs, store)
        _, acc2 = ingest_batch(shifted, store)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return acc1.select("doc_id", F.lit(1).alias("batch")).unionByName(
        acc2.select("doc_id", F.lit(2).alias("batch"))
    )


# ---------------------------------------------------------------------------
# Cross-snapshot incremental batch dedup (VERDICT r5 #2): the snapshot
# is the even-id half of the corpus, persisted as a signature store +
# bucketed band table; the "new shard" is the odd-id half plus shifted
# twins of every 10th even doc (guaranteed cross-snapshot dups at any
# scale factor).  The oracle re-derives every verdict from the
# confirmed-pair relation over the full union — proving the
# incremental probe equals full-corpus minhash_lsh_pairs semantics.
# ---------------------------------------------------------------------------

_SQL_INC_UNION = f"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_SHIFT} AS doc_id, text FROM documents
      WHERE doc_id % 10 = 0
"""

_SQL_IS_SNAP = f"(doc_id < {_SHIFT} AND doc_id % 2 = 0)"


@register(
    "incremental_shard_dedup",
    oracle=f"""
    WITH {sql_minhash_ctes(_SQL_INC_UNION)},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b AS a, id_a AS b FROM pairs
    ),
    snap AS (SELECT doc_id FROM corpus0 WHERE {_SQL_IS_SNAP}),
    shard AS (SELECT doc_id FROM corpus0 WHERE NOT {_SQL_IS_SNAP}),
    acc_snap AS (
      -- snapshot was seeded as ONE batch: a snapshot doc is rejected
      -- iff a LOWER-id snapshot doc confirms against it (pair-based,
      -- not chain-canonical -- ingest_batch's documented fold)
      SELECT s.doc_id FROM snap s
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e
        WHERE e.a = s.doc_id AND e.b < s.doc_id
          AND e.b IN (SELECT doc_id FROM snap)
      )
    ),
    m AS (
      SELECT e.a AS doc_id, e.b AS matched
      FROM edges e
      JOIN shard d ON d.doc_id = e.a
      WHERE e.b IN (SELECT doc_id FROM acc_snap)
         OR (e.b < e.a AND e.b IN (SELECT doc_id FROM shard))
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_matches, MIN(matched) AS first_match_id
      FROM m GROUP BY doc_id
    )
    SELECT d.doc_id,
           (a.doc_id IS NULL) AS accepted,
           CAST(COALESCE(a.n_matches, 0) AS BIGINT) AS n_matches,
           CAST(a.first_match_id AS BIGINT) AS first_match_id
    FROM shard d LEFT JOIN agg a USING (doc_id)
    """,
    tags=("dedup", "minhash", "incremental"),
    tier="shadow",
)
def incremental_shard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup a NEW shard against a PERSISTED corpus snapshot without
    recomputing the corpus: seed the signature store with the even-id
    half of the corpus (one ``ingest_batch`` fold — snapshot-internal
    dups resolve canonical-first), materialize its LSH bands as a
    BUCKETED table, then verdict the shard (odd ids + shifted twins of
    every 10th even doc) via :func:`dedup_shard_against_store` through
    the bucketed probe path.

    Scale shape: this is THE at-scale dedup loop — the store-side band
    table is bucketed on the candidate join key, so the probe equi-join
    scans store buckets in place (zero store-side Exchange; asserted in
    tests/test_neardup_ingest.py) and only the incoming shard shuffles;
    Jaccard confirmation then ships signature rows for implicated docs
    only.  Store cost is O(|unique corpus|) once, probe cost is
    O(|shard| + collisions) per shard — never O(|corpus| x |shard|).
    """
    import shutil
    import tempfile
    import uuid

    docs = fan_out(load_table(spark, "documents", sf_dir).select("doc_id", "text"))
    snapshot = docs.filter(F.col("doc_id") % 2 == 0)
    shard = docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + _SHIFT).alias("doc_id"), "text"
        )
    )
    store = tempfile.mkdtemp(prefix="inc_shard_store_")
    table = f"inc_banded_{uuid.uuid4().hex[:8]}"
    try:
        ingest_batch(snapshot, store)
        materialize_banded_store(spark, store, table, n_buckets=8)
        return dedup_shard_against_store(shard, store, banded_table=table)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


@register(
    "jsonl_roundtrip_fingerprint",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(CAST(
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT
             AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS content_fp
    FROM documents
    GROUP BY source
    """,
    tags=("io", "integrity"),
    tier="shadow",
)
def jsonl_roundtrip_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL interchange losslessness, driver-visibly verified: the
    documents table is written through ``sources/jsonl.py`` and read
    back with its explicit schema, and the ORDER-INDEPENDENT content
    fingerprint of the round-tripped rows must equal the fingerprint
    of the original parquet (the ``dataset_fingerprint`` oracle
    verbatim) — any encoding loss, row drop, or column mangling in the
    interchange path flips the DECIMAL sum.

    Shard layout and row order are deliberately NOT preserved (JSONL
    re-shards at write parallelism); the commutative fingerprint is
    exactly the device that makes the equality meaningful anyway."""
    import shutil
    import tempfile

    from kafkastreamsproject_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    scratch = tempfile.mkdtemp(prefix="jsonl_rt_")
    out_dir = f"{scratch}/docs"  # write target must not pre-exist
    try:
        write_jsonl(docs, out_dir)
        back = read_jsonl(spark, out_dir, schema=docs.schema)
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("text"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        fp = back.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(h.cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("content_fp"),
        )
        # materialize before the temp dir is removed
        return fp.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "snapshot_diff",
    oracle="""
    WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
    new_snap AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 11 = 0 THEN text || ' amended'
                      ELSE text END) AS h
      FROM documents WHERE doc_id % 7 != 0
      UNION ALL
      SELECT doc_id + 1000000, md5(text || ' fork')
      FROM documents WHERE doc_id % 13 = 0
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change
    FROM old o FULL OUTER JOIN new_snap n ON n.doc_id = o.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h != n.h
    """,
    tags=("ingest", "versioning"),
    tier="shadow",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot content diff: per document, whether it was
    added, removed, or changed between two corpus versions — the
    data-versioning primitive behind incremental reprocessing (only
    'added'/'changed' rows re-enter the curation funnel) and audit
    trails.  The second snapshot is derived deterministically from the
    fixture (every 7th doc removed, every 11th amended, every 13th
    forked into a new id) so both engines diff identical inputs.

    Scale shape: each side reduces to (doc_id, 16-byte md5) AT THE
    SCAN — text never joins; the diff is one full-outer hash join on
    doc_id emitting only non-identical rows, so the output is sized by
    the CHANGE VOLUME, not the corpus.  Complements
    ``dataset_fingerprint`` (one commutative hash per source — detects
    THAT something changed) by locating WHICH rows changed."""
    docs = load_table(spark, "documents", sf_dir)
    old = docs.select("doc_id", F.md5("text").alias("h"))
    amended = F.when(
        F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" amended"))
    ).otherwise(F.col("text"))
    new_snap = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .select("doc_id", F.md5(amended).alias("h"))
        .unionByName(
            docs.filter(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.md5(F.concat(F.col("text"), F.lit(" fork"))).alias("h"),
            )
        )
    )
    o = old.select(
        F.col("doc_id").alias("o_id"), F.col("h").alias("o_h")
    )
    n = new_snap.select(
        F.col("doc_id").alias("n_id"), F.col("h").alias("n_h")
    )
    joined = o.join(n, o["o_id"] == n["n_id"], "full_outer")
    change = (
        F.when(F.col("o_id").isNull(), "added")
        .when(F.col("n_id").isNull(), "removed")
        .otherwise("changed")
    )
    return joined.filter(
        F.col("o_id").isNull()
        | F.col("n_id").isNull()
        | (F.col("o_h") != F.col("n_h"))
    ).select(
        F.coalesce(F.col("o_id"), F.col("n_id")).alias("doc_id"),
        change.alias("change"),
    )


from kafkastreamsproject_spark.functions import hashing as _H
from kafkastreamsproject_spark.functions import text as _TX

_SQL_TRI3 = f"list_distinct({_H.sql_hash_list(_TX.sql_shingles(3))})"
_NOV_KEY_BASE = 1_000_000_000  # > any doc_id: (parity, doc_id) lex key


@register(
    "streaming_novelty_ingest",
    oracle=f"""
    WITH tri AS (
      SELECT doc_id, doc_id % 2 AS par, unnest({_SQL_TRI3}) AS h
      FROM documents
      WHERE len(string_split_regex(trim(text), ' +')) >= 3
    ),
    fs AS (
      SELECT h, MIN(par * {_NOV_KEY_BASE} + doc_id) AS fk
      FROM tri GROUP BY h
    )
    SELECT t.doc_id,
           CAST(t.par + 1 AS INT) AS batch,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(CASE WHEN f.fk = t.par * {_NOV_KEY_BASE} + t.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           SUM(CASE WHEN f.fk = t.par * {_NOV_KEY_BASE} + t.doc_id
                    THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM tri t JOIN fs f USING (h)
    GROUP BY t.doc_id, t.par
    """,
    tags=("llmdata", "streaming", "diagnostic"),
    tier="shadow",
)
def streaming_novelty_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch replay of NOVELTY-at-ingest (streaming/novelty.py):
    fold the even-id documents, then the odd-id ones, through the
    persistent first-seen trigram store; emit each doc's per-batch
    novelty stats.  The DuckDB oracle re-derives every count from
    first-carrier attribution under the (batch, doc_id) arrival order
    — proving the incremental store fold equals the full-corpus
    doc_novelty_audit semantics under that ordering: batch-2 docs lose
    novelty to BOTH batch-1 carriers (via the store) and lower-id
    batch-2 carriers (within-batch min), exactly like a second crawl
    snapshot scored against the first.

    Store lives in a throwaway temp dir; both folds eagerly
    localCheckpoint their stats, so the returned DataFrame has no
    lineage into the deleted files (the streaming_neardup_ingest
    harness discipline)."""
    import shutil
    import tempfile

    from kafkastreamsproject_spark.streaming.novelty import (
        novelty_ingest_batch,
    )

    docs = fan_out(
        load_table(spark, "documents", sf_dir).select("doc_id", "text")
    )
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    store = tempfile.mkdtemp(prefix="novelty_ingest_store_")
    try:
        s1 = novelty_ingest_batch(even, store)
        s2 = novelty_ingest_batch(odd, store)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return s1.select(
        "doc_id", F.lit(1).alias("batch"), "n_trigrams", "n_novel", "novelty"
    ).unionByName(
        s2.select(
            "doc_id", F.lit(2).alias("batch"),
            "n_trigrams", "n_novel", "novelty",
        )
    )


_LD_W = 12            # line width — streaming/linededup.LINE_W
_LD_SHIFT = 1_000_000  # twin doc_id shift (matches line_dedup_keep_first)
_LD_KEYB = 2_000_000   # > any twin doc_id: (batch, doc_id) lex key base
_LD_ORDB = 4096        # > any per-doc line count: ordinal key base
_LD_TOKS = "string_split_regex(trim(text), ' +')"


@register(
    "streaming_line_dedup_ingest",
    oracle=f"""
    WITH corpus AS MATERIALIZED (
      SELECT doc_id, 0 AS par, {_LD_TOKS} AS toks
      FROM documents WHERE len({_LD_TOKS}) >= 1
      UNION ALL
      SELECT doc_id + {_LD_SHIFT} AS doc_id, 1 AS par,
             list_cat(
               list_transform(range({_LD_W}),
                 i -> 'uniq' || CAST(doc_id + {_LD_SHIFT} AS VARCHAR)),
               list_slice({_LD_TOKS}, {_LD_W} + 1, len({_LD_TOKS})))
               AS toks
      FROM documents WHERE len({_LD_TOKS}) > {_LD_W}
    ),
    base AS MATERIALIZED (
      SELECT doc_id, par,
             list_transform(range(0, (len(toks) - 1) // {_LD_W} + 1),
               i -> array_to_string(
                 list_slice(toks, i * {_LD_W} + 1,
                            i * {_LD_W} + {_LD_W}), ' ')) AS lines
      FROM corpus
    ),
    ex AS MATERIALIZED (
      SELECT doc_id, par,
             unnest(range(0, len(lines))) AS ord,
             unnest(list_transform(lines, l -> md5(l))) AS lh
      FROM base
    ),
    fs AS (
      SELECT lh,
             MIN((par * {_LD_KEYB} + doc_id) * {_LD_ORDB} + ord) AS fk
      FROM ex GROUP BY lh
    ),
    kept AS (
      SELECT e.doc_id, list_sort(list(e.ord)) AS keep
      FROM ex e JOIN fs f USING (lh)
      WHERE f.fk = (e.par * {_LD_KEYB} + e.doc_id) * {_LD_ORDB} + e.ord
      GROUP BY e.doc_id
    )
    SELECT b.doc_id, CAST(b.par + 1 AS INT) AS batch,
           CAST(len(b.lines) AS INT) AS n_lines,
           CAST(len(COALESCE(k.keep, [])) AS INT) AS n_kept,
           COALESCE(array_to_string(COALESCE(k.keep, []), ','), '')
             AS kept_ords,
           len(COALESCE(k.keep, []))
             / CAST(len(b.lines) AS DOUBLE) AS keep_frac
    FROM base b LEFT JOIN kept k USING (doc_id)
    """,
    tags=("dedup", "streaming", "llmdata"),
    tier="shadow",
)
def streaming_line_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch replay of keep-first LINE dedup AT INGEST
    (streaming/linededup.py): fold the original documents, then their
    planted byte-different twins (unique lead line + the original's
    shifted tail — the line_dedup_keep_first corpus split by arrival),
    through the persistent first-seen line-hash store; emit each doc's
    per-batch kept-line stats.  The DuckDB oracle re-derives every
    verdict from first-keeper attribution under the (batch, doc_id,
    ordinal) arrival order — proving the incremental store fold equals
    the batch operator's keep-first semantics under that ordering:
    batch-2 twins lose every shared line to the store (keeping only
    their unique lead) while batch-1 docs dedup only among themselves.

    Store lives in a throwaway temp dir; both folds eagerly
    localCheckpoint their stats, so the returned DataFrame has no
    lineage into the deleted files (the streaming_neardup_ingest
    harness discipline)."""
    import shutil
    import tempfile

    from kafkastreamsproject_spark.streaming.linededup import (
        LINE_W,
        line_dedup_ingest_batch,
    )

    docs = fan_out(
        load_table(spark, "documents", sf_dir).select("doc_id", "text")
    )
    toks = _TX.tokens(F.col("text"))
    uniq = F.concat(
        F.lit("uniq"), (F.col("doc_id") + _LD_SHIFT).cast("string")
    )
    twins = docs.filter(F.size(toks) > LINE_W).select(
        (F.col("doc_id") + _LD_SHIFT).alias("doc_id"),
        F.array_join(
            F.concat(
                F.array_repeat(uniq, LINE_W),
                F.slice(toks, LINE_W + 1, F.size(toks) - LINE_W),
            ),
            " ",
        ).alias("text"),
    )
    store = tempfile.mkdtemp(prefix="line_dedup_ingest_store_")
    try:
        s1 = line_dedup_ingest_batch(docs, store)
        s2 = line_dedup_ingest_batch(twins, store)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    cols = ["n_lines", "n_kept", "kept_ords", "keep_frac"]
    return s1.select("doc_id", F.lit(1).alias("batch"), *cols).unionByName(
        s2.select("doc_id", F.lit(2).alias("batch"), *cols)
    )


@register(
    "orc_roundtrip_fingerprint",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(
             ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                             || CAST(epoch_ms(ts) AS VARCHAR)), 1, 15))::BIGINT
             AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS content_fp
    FROM events
    GROUP BY event_type
    """,
    tags=("io", "integrity"),
    tier="shadow",
)
def orc_roundtrip_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC interchange losslessness — the TYPED-format companion to
    jsonl_roundtrip_fingerprint: the events table (BIGINT + TIMESTAMP
    + DOUBLE + VARCHAR) is written through Spark's native ORC
    writer and read back, and the order-independent fingerprint over
    (event_id, epoch-millis of ts) per event_type must equal the
    fingerprint DuckDB computes from the original parquet.  The
    timestamp rides the fingerprint as INTEGER epoch millis, so a
    zone shift, precision truncation, or NTZ/zoned confusion in the
    ORC path flips the DECIMAL sum (the fixture's own ts column has
    drifted parquet types across driver rounds — this pins the second
    interchange format against the same hazard).

    Shard layout and row order are deliberately not preserved; the
    commutative fingerprint makes the equality meaningful anyway."""
    import shutil
    import tempfile

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="orc_rt_")
    out_dir = f"{scratch}/events"  # write target must not pre-exist
    try:
        ev.write.orc(out_dir)
        back = spark.read.orc(out_dir)
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.unix_millis(F.col("ts")).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        fp = back.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(h.cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("content_fp"),
        )
        # materialize before the temp dir is removed
        return fp.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _ci_oracle() -> str:
    """Chained-CTE replay of the two-epoch mini-batch k-means fold
    (streaming/centroids.py) — every centroid, count, and sufficient
    statistic re-derived from arrival order alone."""
    from kafkastreamsproject_spark.plans.similarity import (
        _KM_K,
        _SQL_KM_Q,
        _sql_km_dist2,
    )

    def epoch(t: int, batch: str, prev: str | None) -> str:
        cents = f"seeds" if prev is None else f"st{t - 1}"
        return f"""a{t} AS MATERIALIZED (
      SELECT vec_id, qv, cid FROM (
        SELECT b.vec_id, b.qv, c.cid,
               ROW_NUMBER() OVER (PARTITION BY b.vec_id
                 ORDER BY {_sql_km_dist2('b.qv', 'c.cv')}, c.cid) AS rn
        FROM {batch} b CROSS JOIN {cents} c
      ) WHERE rn = 1
    ),
    s{t} AS (
      SELECT cid, pos, CAST(SUM(v) AS BIGINT) AS sv,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT cid, unnest(qv) AS v,
               unnest(range(1, len(qv) + 1)) AS pos
        FROM a{t}
      ) GROUP BY cid, pos
    ),
    sl{t} AS (
      SELECT cid, list(sv ORDER BY pos) AS bs, MAX(cnt) AS na
      FROM s{t} GROUP BY cid
    ),
    ms{t} AS (
      SELECT c.cid,
             c.n + COALESCE(sl.na, 0) AS n,
             CASE WHEN sl.bs IS NULL THEN c.s
                  ELSE list_transform(range(1, len(c.s) + 1),
                                      i -> c.s[i] + sl.bs[i]) END AS s,
             c.cv AS cv_old,
             COALESCE(sl.na, 0) AS n_assigned
      FROM {cents} c LEFT JOIN sl{t} sl USING (cid)
    ),
    st{t} AS MATERIALIZED (
      SELECT cid, n, s,
             CASE WHEN n > 0
                  THEN list_transform(s,
                    x -> CAST(ROUND(x / CAST(n AS DOUBLE)) AS BIGINT))
                  ELSE cv_old END AS cv,
             n_assigned
      FROM ms{t}
    )"""

    return f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id, {_SQL_KM_Q} AS qv FROM embeddings
    ),
    b1 AS (SELECT * FROM q WHERE vec_id % 2 = 0),
    b2 AS (SELECT * FROM q WHERE vec_id % 2 = 1),
    seeds AS MATERIALIZED (
      SELECT vec_id AS cid, CAST(0 AS BIGINT) AS n,
             list_transform(qv, x -> CAST(0 AS BIGINT)) AS s, qv AS cv
      FROM b1 ORDER BY vec_id LIMIT {_KM_K}
    ),
    {epoch(0, 'b1', None)},
    {epoch(1, 'b2', 'st0')}
    SELECT * FROM (
      SELECT 1 AS batch, cid, CAST(n_assigned AS BIGINT) AS n_assigned,
             CAST(n AS BIGINT) AS n_total,
             CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT)
               AS c_dot
      FROM st0
      UNION ALL
      SELECT 2 AS batch, cid, CAST(n_assigned AS BIGINT),
             CAST(n AS BIGINT),
             CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT)
      FROM st1
    )
    """


@register(
    "streaming_centroid_ingest",
    oracle_fn=_ci_oracle,
    tags=("similarity", "streaming", "clustering"),
    tier="shadow",
)
def streaming_centroid_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch replay of INCREMENTAL k-means centroid maintenance
    (streaming/centroids.py — mini-batch k-means, Sculley 2010): the
    embeddings corpus split by arrival parity folds through the
    snapshot store as two micro-batches, and each epoch emits its
    per-centroid summary — rows assigned, cumulative count, and the
    updated centroid's exact self-dot (the integer drift signal).  The
    DuckDB oracle replays the full trajectory — deterministic seed
    election (k lowest first-batch vec_ids), integer argmin assignment
    with (dist2, cid) tie-break, sufficient-statistic merge, and the
    one IEEE-portable round(sum/n) per component — chained CTEs, the
    perceptron-trainer exactness discipline applied to a streaming
    fold.  Proves the incremental fold tracks data drift: batch 2's
    centroids move (c_dot changes) without any full-corpus re-pass.

    Scale shape: see streaming/centroids.py — K-row broadcast store,
    bounded-broadcast assignment, one partial-aggregated (cid, dim)
    shuffle per epoch; the store is kilobytes at any corpus size, the
    snapshot-per-epoch overwrite is the idempotency mechanism."""
    from kafkastreamsproject_spark.streaming.centroids import (
        centroid_ingest_batch,
        quantize_codes,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir))
    q = quantize_codes(emb).select("vec_id", "qv")
    b1 = q.filter(F.col("vec_id") % 2 == 0)
    b2 = q.filter(F.col("vec_id") % 2 == 1)
    store = tempfile.mkdtemp(prefix="centroid_ingest_store_")
    try:
        s1 = centroid_ingest_batch(b1, store, epoch=0)
        s2 = centroid_ingest_batch(b2, store, epoch=1)
        out = (
            s1.select(F.lit(1).alias("batch"), "cid", "n_assigned",
                      "n_total", "c_dot")
            .unionByName(
                s2.select(F.lit(2).alias("batch"), "cid", "n_assigned",
                          "n_total", "c_dot")
            )
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        shutil.rmtree(store, ignore_errors=True)


_BF_BITS = 1 << 14  # deliberately small so false positives are visible
_BF_HASHES = 2


def _bf_oracle() -> str:
    from kafkastreamsproject_spark.operators.bloomjoin import (
        sql_md5_bloom_position,
    )

    p0 = sql_md5_bloom_position("lh", 0, _BF_BITS)
    p1 = sql_md5_bloom_position("lh", 1, _BF_BITS)
    return f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id,
             list_transform(range(0, (len({_LD_TOKS}) - 1) // {_LD_W} + 1),
               i -> array_to_string(
                 list_slice({_LD_TOKS}, i * {_LD_W} + 1,
                            i * {_LD_W} + {_LD_W}), ' ')) AS lines
      FROM documents WHERE len({_LD_TOKS}) >= 1
    ),
    ex AS MATERIALIZED (
      SELECT doc_id, unnest(list_transform(lines, l -> md5(l))) AS lh
      FROM base
    ),
    store AS MATERIALIZED (
      SELECT DISTINCT lh FROM ex WHERE doc_id % 2 = 1
    ),
    batch AS MATERIALIZED (
      SELECT DISTINCT lh FROM ex WHERE doc_id % 2 = 0
    ),
    sketch AS MATERIALIZED (
      SELECT DISTINCT pos FROM (
        SELECT unnest([{p0}, {p1}]) AS pos FROM batch
      )
    ),
    surv AS MATERIALIZED (
      SELECT lh FROM store
      WHERE {p0} IN (SELECT pos FROM sketch)
        AND {p1} IN (SELECT pos FROM sketch)
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM store) AS n_store,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM batch) AS n_batch,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM batch
        WHERE lh IN (SELECT lh FROM store)) AS n_match,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_survivors,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) -
        (SELECT CAST(COUNT(*) AS BIGINT) FROM batch
          WHERE lh IN (SELECT lh FROM store)) AS n_false_pos,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM batch
        WHERE lh NOT IN (SELECT lh FROM store)) AS n_fresh,
      CAST((1000000 * ((SELECT COUNT(*) FROM surv)
                       - (SELECT COUNT(*) FROM batch
                           WHERE lh IN (SELECT lh FROM store))))
           // ((SELECT COUNT(*) FROM store)
               - (SELECT COUNT(*) FROM batch
                   WHERE lh IN (SELECT lh FROM store))) AS BIGINT)
        AS fp_ppm
    """


@register(
    "batch_bloom_pushdown_stats",
    oracle_fn=_bf_oracle,
    tags=("dedup", "streaming", "scale", "diagnostic"),
    tier="shadow",
)
def batch_bloom_pushdown_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operability readout for the batch-bloom store-probe pushdown
    (operators/bloomjoin.py:bloom_pruned_anti_join): on the line-dedup
    relation split by parity (odd docs = the persisted store, even docs
    = the arriving batch), sketch the batch's md5-bloom positions
    (deliberately undersized at 2^14 bits so false positives are
    VISIBLE), prune the store with it, and report exactly what a
    capacity planner needs: store rows surviving the prune
    (true matches + bloom false positives — the rows the exact
    anti-join still has to sort), the false-positive rate over true
    negatives (fp_ppm), and the fresh-key count the full operator
    emits — which the oracle recomputes as a plain NOT IN, proving the
    pruned anti-join is EXACT end-to-end, not just approximately
    filtered.

    Scale shape: the sketch is bounded by min(2·|batch|, n_bits) longs
    regardless of store size and is rebuilt per epoch from the batch —
    no persistence, no staleness; the store never shuffles (two
    broadcast semi probes + the co-located anti-join).  Run at 10×
    data, the same n_bits saturates and fp_ppm climbs — the sizing
    cliff (n_bits ≳ 14·|batch| for ~1%) made measurable."""
    from kafkastreamsproject_spark.operators.bloomjoin import (
        bloom_pruned_anti_join,
        md5_bloom_positions,
    )
    from kafkastreamsproject_spark.streaming.linededup import lines_expr

    docs = fan_out(
        load_table(spark, "documents", sf_dir).select("doc_id", "text")
    )
    toks = _TX.tokens(F.col("text"))
    ex = (
        docs.filter(F.size(toks) >= 1)
        .select("doc_id", F.explode(lines_expr(toks)).alias("line"))
        .select("doc_id", F.md5("line").alias("lh"))
    )
    from kafkastreamsproject_spark.operators.cache import scoped_persist

    store = scoped_persist(
        ex.filter(F.col("doc_id") % 2 == 1).select("lh").distinct()
    )
    batch = scoped_persist(
        ex.filter(F.col("doc_id") % 2 == 0).select("lh").distinct()
    )
    sketch = F.broadcast(
        batch.select(
            F.explode(
                F.array(
                    *md5_bloom_positions(F.col("lh"), _BF_HASHES, _BF_BITS)
                )
            ).alias("pos")
        ).distinct()
    )
    surv = store
    for i in range(_BF_HASHES):
        pos_i = md5_bloom_positions(F.col("lh"), _BF_HASHES, _BF_BITS)[i]
        surv = surv.join(sketch, pos_i == sketch["pos"], "left_semi")
    fresh = bloom_pruned_anti_join(
        batch, "lh", store, "lh", n_hashes=_BF_HASHES, n_bits=_BF_BITS
    )
    n_store = store.agg(F.count(F.lit(1)).alias("n_store"))
    n_batch = batch.agg(F.count(F.lit(1)).alias("n_batch"))
    n_match = (
        batch.join(store, "lh", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    n_surv = surv.agg(F.count(F.lit(1)).alias("n_survivors"))
    n_fresh = fresh.agg(F.count(F.lit(1)).alias("n_fresh"))
    return (
        n_store.crossJoin(n_batch)
        .crossJoin(n_match)
        .crossJoin(n_surv)
        .crossJoin(n_fresh)
        .select(
            "n_store",
            "n_batch",
            "n_match",
            "n_survivors",
            (F.col("n_survivors") - F.col("n_match")).alias("n_false_pos"),
            "n_fresh",
            F.expr(
                "cast((1000000 * (n_survivors - n_match))"
                " div (n_store - n_match) as bigint)"
            ).alias("fp_ppm"),
        )
    )


@register(
    "line_store_forget_replay",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id,
             list_transform(range(0, (len({_LD_TOKS}) - 1) // {_LD_W} + 1),
               i -> array_to_string(
                 list_slice({_LD_TOKS}, i * {_LD_W} + 1,
                            i * {_LD_W} + {_LD_W}), ' ')) AS lines
      FROM documents WHERE len({_LD_TOKS}) >= 1
    ),
    ex AS MATERIALIZED (
      SELECT doc_id,
             unnest(range(0, len(lines))) AS ord,
             unnest(list_transform(lines, l -> md5(l))) AS lh
      FROM base
    ),
    fs AS MATERIALIZED (
      SELECT lh, MIN(doc_id * {_LD_ORDB} + ord) AS fk FROM ex GROUP BY lh
    ),
    forget AS MATERIALIZED (
      SELECT DISTINCT lh FROM ex WHERE doc_id % 4 = 0
    ),
    k1 AS (
      SELECT e.doc_id, list_sort(list(e.ord)) AS keep
      FROM ex e JOIN fs f USING (lh)
      WHERE f.fk = e.doc_id * {_LD_ORDB} + e.ord
      GROUP BY e.doc_id
    ),
    k2 AS (
      SELECT e.doc_id, list_sort(list(e.ord)) AS keep
      FROM ex e JOIN fs f USING (lh)
      WHERE f.fk = e.doc_id * {_LD_ORDB} + e.ord
        AND e.lh IN (SELECT lh FROM forget)
      GROUP BY e.doc_id
    ),
    stacked AS (
      SELECT 1 AS batch, b.doc_id, len(b.lines) AS n_lines, k1.keep
      FROM base b LEFT JOIN k1 USING (doc_id)
      UNION ALL
      SELECT 2, b.doc_id, len(b.lines), k2.keep
      FROM base b LEFT JOIN k2 USING (doc_id)
    )
    SELECT CAST(batch AS INT) AS batch, doc_id,
           CAST(n_lines AS INT) AS n_lines,
           CAST(len(COALESCE(keep, [])) AS INT) AS n_kept,
           COALESCE(array_to_string(COALESCE(keep, []), ','), '')
             AS kept_ords,
           len(COALESCE(keep, [])) / CAST(n_lines AS DOUBLE) AS keep_frac
    FROM stacked
    """,
    tags=("dedup", "streaming", "privacy"),
    tier="shadow",
)
def line_store_forget_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten REPLAY through the line-dedup store: fold
    the corpus (epoch 1), erase every line hash carried by the
    to-be-forgotten documents (doc_id % 4 == 0) via the bucket-local
    deletion (sources/bucketed.py:forget_keys_in_store — only the
    buckets the victim hashes route to are rewritten; file-identity
    of the rest is pytest-asserted), then fold the SAME corpus again
    (epoch 2).  The oracle states the erasure semantics end-to-end:
    epoch 2 re-admits exactly the first-keeper lines whose hashes were
    forgotten — a forgotten hash behaves as if never seen (full
    re-admission), an unforgotten one stays deduplicated.  This is the
    GDPR-erasure contract for derived stores: deletion must also
    restore ADMISSIBILITY, not just drop rows.

    Scale shape: the fold is the unchanged bucketed-store probe; the
    erasure reads and rewrites only the affected buckets' files
    (bounded driver state: ≤ n_buckets ids via one collect_list row),
    cost ∝ affected buckets — at 100 TB a localized delete set
    touches a sliver of the store."""
    from kafkastreamsproject_spark.sources.bucketed import (
        forget_keys_in_store,
        store_table_name,
    )
    from kafkastreamsproject_spark.streaming.linededup import (
        _STORE_SCHEMA,
        N_BUCKETS,
        line_dedup_ingest_batch,
        lines_expr,
    )

    docs = fan_out(
        load_table(spark, "documents", sf_dir).select("doc_id", "text")
    )
    store = tempfile.mkdtemp(prefix="line_forget_store_")
    path = f"{store}/lines"
    try:
        s1 = line_dedup_ingest_batch(docs, store)
        toks = _TX.tokens(F.col("text"))
        victims = (
            docs.filter((F.col("doc_id") % 4 == 0) & (F.size(toks) >= 1))
            .select(F.explode(lines_expr(toks)).alias("line"))
            .select(F.md5("line").alias("lh"))
            .distinct()
        )
        forget_keys_in_store(
            spark,
            victims,
            path,
            store_table_name("line_store", path),
            _STORE_SCHEMA,
            ["lh"],
            N_BUCKETS,
        )
        s2 = line_dedup_ingest_batch(docs, store)
        cols = ["doc_id", "n_lines", "n_kept", "kept_ords", "keep_frac"]
        out = (
            s1.select(F.lit(1).alias("batch"), *cols)
            .unionByName(s2.select(F.lit(2).alias("batch"), *cols))
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        shutil.rmtree(store, ignore_errors=True)


_MERGE_INS_SHIFT = 100_000_000  # insert keys live far above real custkeys


@register(
    "store_merge_upsert_replay",
    oracle=f"""
    WITH upd AS (
      SELECT c_custkey, c_name || '#upd' AS c_name,
             'MERGED' AS c_mktsegment
      FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 7 != 3
    ),
    dead AS (SELECT c_custkey FROM customer WHERE c_custkey % 7 = 3),
    ins AS (
      SELECT c_custkey + {_MERGE_INS_SHIFT} AS c_custkey,
             'new_' || CAST(c_custkey AS VARCHAR) AS c_name,
             'INSERTED' AS c_mktsegment
      FROM customer WHERE c_custkey % 11 = 0
    ),
    kept AS (
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        AND c_custkey NOT IN (SELECT c_custkey FROM dead)
    )
    SELECT * FROM kept
    UNION ALL SELECT * FROM upd
    UNION ALL SELECT * FROM ins
    """,
    tags=("ingest", "storage"),
    tier="shadow",
)
def store_merge_upsert_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse ``MERGE INTO`` replay on the bucketed store
    (sources/bucketed.py:merge_upsert_in_store): fold the customer
    relation into a bucketed store, then apply one deterministic CDC
    batch — updates (custkey % 5 = 0: name suffixed, segment rewritten),
    tombstone deletes (custkey % 7 = 3; tombstone wins the one key
    class that matches both rules, so the batch is one-row-per-key as
    the operator requires), and inserts (custkey % 11 = 0, shifted far
    above the live key range) — and emit the final store content.  The
    oracle states MERGE's end state relationally: anti-join the
    touched keys out of the base, union the update and insert images.

    Scale shape: the store never rewrites wholesale — the change keys
    map to a bounded set of bucket ids (one collect_list row), only
    those buckets' files are read and rewritten, and the untouched
    buckets' file identity is pytest-asserted
    (tests/test_bucketed_merge.py).  At 100 TB a CDC batch against a
    corpus-sized store costs |affected buckets| · bucket size, not a
    full-store pass."""
    from kafkastreamsproject_spark.sources.bucketed import (
        append_bucketed_store,
        merge_upsert_in_store,
        read_bucketed_store,
        store_table_name,
    )

    schema = "c_custkey bigint, c_name string, c_mktsegment string"
    n_buckets = 8
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    store = tempfile.mkdtemp(prefix="merge_store_")
    path = f"{store}/customers"
    table = store_table_name("merge_cust", path)
    try:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        append_bucketed_store(spark, cust, path, table, ["c_custkey"], n_buckets)
        k = F.col("c_custkey")
        upd = cust.filter((k % 5 == 0) & (k % 7 != 3)).select(
            k.alias("c_custkey"),
            F.concat(F.col("c_name"), F.lit("#upd")).alias("c_name"),
            F.lit("MERGED").alias("c_mktsegment"),
            F.lit(False).alias("deleted"),
        )
        dead = cust.filter(k % 7 == 3).select(
            k.alias("c_custkey"),
            F.lit(None).cast("string").alias("c_name"),
            F.lit(None).cast("string").alias("c_mktsegment"),
            F.lit(True).alias("deleted"),
        )
        ins = cust.filter(k % 11 == 0).select(
            (k + _MERGE_INS_SHIFT).alias("c_custkey"),
            F.concat(F.lit("new_"), k.cast("string")).alias("c_name"),
            F.lit("INSERTED").alias("c_mktsegment"),
            F.lit(False).alias("deleted"),
        )
        changes = upd.unionByName(dead).unionByName(ins)
        merge_upsert_in_store(
            spark,
            changes,
            path,
            table,
            schema,
            ["c_custkey"],
            n_buckets,
            tombstone_col="deleted",
        )
        out = read_bucketed_store(
            spark, path, table, schema, ["c_custkey"], n_buckets
        ).localCheckpoint(eager=True)
        return out
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


@register(
    "streaming_cdc_merge_replay",
    oracle="""
    WITH ev AS (
      SELECT o_orderkey % 1000 AS k,
             o_orderkey % 3 AS batch,
             o_orderkey AS seq,
             o_orderstatus AS status,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS total_c,
             (o_orderkey % 13 = 5) AS deleted
      FROM orders
    ),
    win AS (
      SELECT k, status, total_c, deleted,
             row_number() OVER (
               PARTITION BY k ORDER BY batch DESC, seq DESC) AS rn
      FROM ev
    )
    SELECT k, status, total_c FROM win WHERE rn = 1 AND NOT deleted
    """,
    tags=("ingest", "streaming", "storage"),
    tier="shadow",
)
def streaming_cdc_merge_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three CDC micro-batches folded into the bucketed store
    (streaming/cdcmerge.py): orders become change events — key =
    o_orderkey mod 1000 (so keys are hit repeatedly), seq = the order
    key (the log offset), batch = o_orderkey mod 3 applied in order,
    payload = (status, total cents), tombstones where o_orderkey mod
    13 = 5 — and the final store content is emitted.  The oracle
    states the CDC-apply contract in one window: each key's final row
    is the winning event (max seq) of the LAST batch that touched it,
    absent if that event is a tombstone — (batch, seq) lexicographic
    last-writer-wins, including re-insert-after-delete and
    delete-reappearing-later sequences, which the replay exercises for
    real (every batch both inserts, updates, and deletes against keys
    the earlier batches wrote).

    Scale shape: per batch, one key-partitioned window over the BATCH
    (never the store) for compaction, then the bucket-local merge —
    store cost ∝ affected buckets, and the store never re-shuffles.
    ``floor(price·100)`` keeps the payload in exact integer cents on
    both engines."""
    from kafkastreamsproject_spark.streaming.cdcmerge import (
        cdc_merge_ingest_batch,
    )

    schema = "k bigint, status string, total_c bigint"
    n_buckets = 8
    orders = load_table(spark, "orders", sf_dir)
    ev = orders.select(
        (F.col("o_orderkey") % 1000).alias("k"),
        (F.col("o_orderkey") % 3).alias("batch"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).alias("total_c"),
        (F.col("o_orderkey") % 13 == 5).alias("deleted"),
    )
    store = tempfile.mkdtemp(prefix="cdc_store_")
    from kafkastreamsproject_spark.sources.bucketed import store_table_name

    table = store_table_name("cdc_store", f"{store}/rows")
    try:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        for b in range(3):
            cdc_merge_ingest_batch(
                ev.filter(F.col("batch") == b).drop("batch"),
                store,
                schema,
                "k",
                "seq",
                n_buckets,
                tombstone_col="deleted",
            )
        from kafkastreamsproject_spark.sources.bucketed import (
            read_bucketed_store,
        )

        out = read_bucketed_store(
            spark, f"{store}/rows", table, schema, ["k"], n_buckets
        ).localCheckpoint(eager=True)
        return out
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


def _bm25_index_oracle() -> str:
    # the incremental index's final state IS the batch answer: reuse
    # the batch scorer's oracle verbatim (plans/text.py)
    from kafkastreamsproject_spark.plans.text import _bm25_sql

    return _bm25_sql()


@register(
    "streaming_bm25_index",
    oracle_fn=_bm25_index_oracle,
    tags=("text", "retrieval", "streaming"),
    tier="shadow",
)
def streaming_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch replay of INCREMENTAL inverted-index maintenance
    (streaming/bm25index.py): the corpus split by doc_id parity folds
    through the bucketed postings + seen-ledger stores as two
    micro-batches, then the fixed three-term query is answered FROM
    THE STORES — per-term postings probe (pushed ``t IN`` filter),
    1-row df aggregate, N/avgdl from the incrementally-maintained
    stats sidecar (r15: no seen-ledger scan) — and the result
    must score bit-identically to the batch bm25_retrieval rescan of
    the union corpus, which is exactly what the DuckDB oracle
    computes.  tf/dl/df/dl_sum stay integers across any epoch split,
    so the equality is exact, not approximate; the scorer re-creates
    the batch expression with pinned literals and term order (6-dp
    round).

    Scale shape: the fold probes only the doc_id-bucketed seen ledger
    (bucket-key anti-join, zero store-side Exchange) and appends
    postings blindly — ingest never reads the postings store; the
    query touches only the query terms' rows (shuffle ∝ matching
    postings, never ∝ corpus) — the serving decomposition
    bm25_retrieval's full-scan plan cannot give you.  Replay
    idempotency, duplicate-doc drops, compaction, and the probe plan
    are pytest-pinned (tests/test_bm25_index.py)."""
    from kafkastreamsproject_spark.plans.text import _BM25_TERMS
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.bm25index import (
        index_ingest_batch,
        query_index,
    )

    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "text"
    )
    store = tempfile.mkdtemp(prefix="bm25_index_store_")
    tables = [
        store_table_name("bm25_postings", f"{store}/postings"),
        store_table_name("bm25_seen", f"{store}/seen"),
    ]
    try:
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 0), store)
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 1), store)
        out = query_index(spark, store, _BM25_TERMS).localCheckpoint(
            eager=True
        )
        return out
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


#: append-time df-cap settings (r12 verdict #2).  At the test SF the
#: three standard terms have df ≈ 380-394 over 500 docs, so 64 and 256
#: bind hard and 1024 is a no-op — the staircase brackets the knob.
_DFCAP = 256
_DFCAP_CURVE = (64, 256, 1024)
_DFCAP_TOPK = 10


def _dfcap_capped_score_sql(cap: int, tag: str) -> str:
    """CTE block scoring the CAPPED index at ``cap`` (names suffixed
    ``tag``; expects a ``base`` CTE in scope): per query term, the
    kept postings are the first ``cap`` docs containing it in
    (epoch, doc_id) order — epoch = doc_id % 2, the fold split — which
    is EXACTLY the state the append-time gate leaves in the store.
    Stats N/avgdl stay corpus-wide (the seen ledger is uncapped);
    df_i = |kept_i| = min(df_i, cap)."""
    from kafkastreamsproject_spark.plans.text import (
        _BM25_TERMS,
        _bm25_score_sql,
    )

    n = len(_BM25_TERMS)
    kept = ",\n    ".join(
        f"kept{i}{tag} AS (SELECT doc_id, tf{i} FROM ("
        f"SELECT doc_id, tf{i}, ROW_NUMBER() OVER "
        f"(ORDER BY doc_id % 2, doc_id) AS rnk FROM base WHERE tf{i} > 0"
        f") WHERE rnk <= {cap})"
        for i in range(n)
    )
    b_cols = ",\n      ".join(
        f"COALESCE(k{i}.tf{i}, 0) AS tf{i}" for i in range(n)
    )
    joins = "\n      ".join(
        f"LEFT JOIN kept{i}{tag} k{i} ON k{i}.doc_id = base.doc_id"
        for i in range(n)
    )
    df_cols = ",\n      ".join(
        f"(SELECT CAST(COUNT(*) AS DOUBLE) FROM kept{i}{tag}) AS df{i}"
        for i in range(n)
    )
    tf_any = " + ".join(f"b.tf{i}" for i in range(n))
    return f"""{kept},
    b{tag} AS (
      SELECT base.doc_id, base.dl,
      {b_cols}
      FROM base
      {joins}
    ),
    s{tag} AS (
      SELECT CAST((SELECT COUNT(*) FROM base) AS DOUBLE) AS n_docs,
             (SELECT SUM(dl) / COUNT(*) FROM base) AS avgdl,
      {df_cols}
    ),
    c{tag} AS (
      SELECT b.doc_id, ROUND({_bm25_score_sql()}, 6) AS bm25
      FROM b{tag} b, s{tag} s
      WHERE {tf_any} > 0
    )"""


def _dfcap_base_sql() -> str:
    from kafkastreamsproject_spark.plans.text import _BM25_TERMS

    toks = "string_split_regex(trim(text), ' +')"
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter({toks}, t -> t = '{w}')) AS DOUBLE) AS tf{i}"
        for i, w in enumerate(_BM25_TERMS)
    )
    return f"""base AS (
      SELECT doc_id,
             CAST(len({toks}) AS DOUBLE) AS dl,
             {tf_cols}
      FROM documents
    )"""


def _bm25_dfcap_oracle() -> str:
    return f"""
    WITH {_dfcap_base_sql()},
    {_dfcap_capped_score_sql(_DFCAP, "x")}
    SELECT doc_id, bm25 FROM cx
    """


@register(
    "streaming_bm25_dfcap",
    oracle_fn=_bm25_dfcap_oracle,
    tags=("text", "retrieval", "streaming"),
    tier="shadow",
)
def streaming_bm25_dfcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_bm25_index with the APPEND-TIME df cap on (r12
    verdict #2: the term-skew countermeasure the module docstring
    promised).  The corpus folds in two epochs with ``df_cap=256`` —
    a term's posting list stops growing at 256 rows,
    first-cap-writers-win by (epoch, doc_id) — and the standard
    three-term query is answered from the capped stores.  The DuckDB
    oracle recomputes the capped index's scores INDEPENDENTLY (kept =
    first-256 rank over (doc_id % 2, doc_id); df = min(df, 256);
    N/avgdl corpus-wide from the uncapped ledger), so the gate's
    exact semantics — not just "fewer rows" — are cross-engine
    verified.

    Scale shape: the gate bounds every posting list at df_cap rows,
    which bounds BOTH the hot-term bucket (the ``the``-bucket
    straggler at 100 TB) and the gate's own store probe (≤ df_cap ·
    |batch terms| rows through a broadcast semi-join on the bucket
    key).  The recall price of the knob is the bm25_dfcap_curve
    staircase."""
    from kafkastreamsproject_spark.plans.text import _BM25_TERMS
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.bm25index import (
        index_ingest_batch,
        query_index,
    )

    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "text"
    )
    store = tempfile.mkdtemp(prefix="bm25_dfcap_store_")
    tables = [
        store_table_name("bm25_postings", f"{store}/postings"),
        store_table_name("bm25_seen", f"{store}/seen"),
    ]
    try:
        for parity in (0, 1):
            index_ingest_batch(
                docs.filter(F.col("doc_id") % 2 == parity),
                store,
                df_cap=_DFCAP,
            )
        return query_index(spark, store, _BM25_TERMS).localCheckpoint(
            eager=True
        )
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


def _bm25_dfcap_curve_oracle() -> str:
    from kafkastreamsproject_spark.plans.text import (
        _BM25_TERMS,
        _bm25_score_sql,
    )

    n = len(_BM25_TERMS)
    df_cols = ",\n      ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(n)
    )
    tf_any = " + ".join(f"b.tf{i}" for i in range(n))
    capped = ",\n    ".join(
        _dfcap_capped_score_sql(cap, f"c{cap}") for cap in _DFCAP_CURVE
    )
    rows = "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({cap} AS BIGINT) AS df_cap,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cc{cap}) AS n_scored,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM topu
            WHERE doc_id IN (SELECT doc_id FROM (
              SELECT doc_id, ROW_NUMBER() OVER
                (ORDER BY bm25 DESC, doc_id) AS rn FROM cc{cap}
            ) WHERE rn <= {_DFCAP_TOPK})) AS recall_at_{_DFCAP_TOPK},
           (SELECT COALESCE(MAX(ROUND(ABS(c.bm25 - u.bm25), 6)), 0.0)
            FROM cc{cap} c JOIN u ON u.doc_id = c.doc_id)
             AS max_abs_delta"""
        for cap in _DFCAP_CURVE
    )
    return f"""
    WITH {_dfcap_base_sql()},
    su AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             SUM(dl) / COUNT(*) AS avgdl,
      {df_cols}
      FROM base
    ),
    u AS (
      SELECT b.doc_id, ROUND({_bm25_score_sql()}, 6) AS bm25
      FROM base b, su s
      WHERE {tf_any} > 0
    ),
    topu AS (
      SELECT doc_id FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rn
        FROM u
      ) WHERE rn <= {_DFCAP_TOPK}
    ),
    {capped}
    SELECT * FROM (
    {rows}
    ) ORDER BY df_cap
    """


@register(
    "bm25_dfcap_curve",
    oracle_fn=_bm25_dfcap_curve_oracle,
    tags=("text", "retrieval", "streaming", "curve"),
    tier="shadow",
)
def bm25_dfcap_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df-cap knob priced as a recall/score-fidelity staircase
    (the winnowing_recall_curve precedent, applied to the serving
    index): four REAL store builds — uncapped plus df ∈ {64, 256,
    1024} — each folded in two epochs through the append-time gate,
    then per cap: how many docs the capped index still scores
    (n_scored), how many of the uncapped top-10 it keeps in ITS
    top-10 (recall_at_10), and the worst score shift over co-scored
    docs (max_abs_delta, 6-dp).  The DuckDB oracle recomputes all
    three columns per cap from first principles, so the staircase
    itself is cross-engine exact — the knob's price is a verified
    number, not a claim.  Expected shape at the test SF (terms' true
    df ≈ 380-394): 1024 reads identical to uncapped (delta 0),
    256 binds mildly, 64 binds hard — pick the cap where the
    staircase flattens."""
    from kafkastreamsproject_spark.plans.text import _BM25_TERMS
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.bm25index import (
        index_ingest_batch,
        query_index,
    )
    from pyspark.sql import Window as W

    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "text"
    )
    stores, tables = [], []

    def _build(cap):
        store = tempfile.mkdtemp(prefix=f"bm25_curve_{cap}_")
        stores.append(store)
        tables.extend(
            store_table_name(p, f"{store}/{d}")
            for p, d in (("bm25_postings", "postings"), ("bm25_seen", "seen"))
        )
        for parity in (0, 1):
            index_ingest_batch(
                docs.filter(F.col("doc_id") % 2 == parity), store, df_cap=cap
            )
        return query_index(spark, store, _BM25_TERMS).localCheckpoint(
            eager=True
        )

    try:
        u = _build(None)
        capped = None
        for cap in _DFCAP_CURVE:
            leg = _build(cap).withColumn("df_cap", F.lit(cap).cast("long"))
            capped = leg if capped is None else capped.unionByName(leg)

        rn = F.row_number().over(
            W.partitionBy("df_cap").orderBy(F.desc("bm25"), "doc_id")
        )
        # global top-k via sort+limit → TakeOrderedAndProject
        # (per-partition heaps), never an unpartitioned Window
        topu = (
            u.orderBy(F.desc("bm25"), "doc_id")
            .limit(_DFCAP_TOPK)
            .select("doc_id")
        )
        topc = (
            capped.withColumn("rn", rn)
            .filter(F.col("rn") <= _DFCAP_TOPK)
            .select("df_cap", "doc_id")
        )
        n_scored = capped.groupBy("df_cap").agg(
            F.count(F.lit(1)).alias("n_scored")
        )
        recall = (
            topc.join(F.broadcast(topu), "doc_id", "left_semi")
            .groupBy("df_cap")
            .agg(F.count(F.lit(1)).alias(f"recall_at_{_DFCAP_TOPK}"))
        )
        delta = (
            capped.join(
                F.broadcast(u.select("doc_id", F.col("bm25").alias("ubm25"))),
                "doc_id",
            )
            .groupBy("df_cap")
            .agg(
                F.max(
                    F.round(F.abs(F.col("bm25") - F.col("ubm25")), 6)
                ).alias("max_abs_delta")
            )
        )
        out = (
            n_scored.join(recall, "df_cap", "left")
            .join(delta, "df_cap", "left")
            .select(
                "df_cap",
                "n_scored",
                F.coalesce(
                    F.col(f"recall_at_{_DFCAP_TOPK}"), F.lit(0)
                ).cast("long").alias(f"recall_at_{_DFCAP_TOPK}"),
                F.coalesce(F.col("max_abs_delta"), F.lit(0.0)).alias(
                    "max_abs_delta"
                ),
            )
            .orderBy("df_cap")
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        for store in stores:
            shutil.rmtree(store, ignore_errors=True)


_PHRASE = ("table", "hash")  # 46 docs / 48 occurrences at sf0.01


@register(
    "streaming_phrase_index",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS ts
      FROM documents
    ),
    occ AS (
      SELECT doc_id,
             len(list_filter(range(1, len(ts)),
                 i -> ts[i] = '{_PHRASE[0]}' AND ts[i+1] = '{_PHRASE[1]}'))
               AS n_occurrences
      FROM toks
    )
    SELECT doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM occ WHERE n_occurrences > 0
    """,
    tags=("text", "retrieval", "streaming"),
    tier="shadow",
)
def streaming_phrase_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search from the POSITIONAL index leg
    (streaming/bm25index.py): the corpus folds through the store in
    two epochs with ``positional=True`` (per-(term, doc) sorted
    position lists, Lucene-style), then the fixed two-token phrase is
    answered from the store — probe the phrase's terms (pushed ``t
    IN`` scan filter), pivot each doc's position lists onto one row,
    count in-row the positions x with term 1 at x+1.  The DuckDB
    oracle counts the same phrase straight off the text with a
    sliding window, so the store path is verified occurrence-exact —
    including overlapping matches, which both sides count
    individually.

    Scale shape: the query shuffles only the two terms' postings
    (position arrays ride along); the intersection is row-local.  The
    fold inherits the index module's store discipline (doc-granular
    freshness, zero-Exchange seen probe, pure-append posting stores);
    phrase edge cases (overlaps, cross-epoch docs, replay) are
    pytest-pinned in tests/test_bm25_index.py."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.bm25index import (
        index_ingest_batch,
        phrase_query_index,
    )

    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "text"
    )
    store = tempfile.mkdtemp(prefix="phrase_index_store_")
    tables = [
        store_table_name("bm25_postings", f"{store}/postings"),
        store_table_name("bm25_positions", f"{store}/positions"),
        store_table_name("bm25_seen", f"{store}/seen"),
    ]
    try:
        index_ingest_batch(
            docs.filter(F.col("doc_id") % 2 == 0), store, positional=True
        )
        index_ingest_batch(
            docs.filter(F.col("doc_id") % 2 == 1), store, positional=True
        )
        out = phrase_query_index(spark, store, _PHRASE).localCheckpoint(
            eager=True
        )
        return out
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


def _ann_index_oracle() -> str:
    # the incrementally-built index's answer IS the batch IVF-PQ
    # search: reuse its oracle verbatim (plans/similarity.py).  Read
    # the raw registry map — going through shadow_queries() here would
    # recurse (it materializes THIS lazy oracle while resolving all).
    import kafkastreamsproject_spark.plans.similarity  # noqa: F401
    from kafkastreamsproject_spark.plans.registry import _SHADOW

    return _SHADOW["ivf_pq_search"].oracle


@register(
    "streaming_ann_index",
    oracle_fn=_ann_index_oracle,
    tags=("similarity", "ann", "streaming"),
    tier="shadow",
)
def streaming_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch replay of INCREMENTAL IVF-PQ index maintenance
    (streaming/annindex.py): codebooks freeze at store creation (the
    batch family's deterministic first-C/first-K convention, so the
    comparison is exact), the embeddings corpus folds through the
    cell-bucketed codes store + vec_id-bucketed seen ledger by
    arrival parity, and the standard 10 query vectors are answered
    FROM THE STORE — nprobe=2 coarse cells per query, probe equi-join
    on the store's bucket key, integer ADC, top-5 — producing
    IDENTICAL rows to plans/similarity.py:ivf_pq_search's full batch
    re-derivation, which is exactly what the (reused) DuckDB oracle
    asserts.

    Scale shape: ingest probes only the seen ledger (bucket-key
    anti-join, zero store-side Exchange) and appends codes ∝ batch;
    the query reads the inverted file through its bucket key and
    ships (query, vec, long) triples after pruning.  Store behavior
    (replay idempotency, duplicate-vector drops, compaction, frozen
    codebooks) is pytest-pinned in tests/test_ann_index.py."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_query_index,
        create_ann_store,
        default_geometry,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    store = tempfile.mkdtemp(prefix="ann_index_store_")
    tables = [
        store_table_name("ann_codes", f"{store}/codes"),
        store_table_name("ann_seen", f"{store}/seen"),
    ]
    try:
        # EXPLICIT test-SF geometry: this query's point is equality
        # with ivf_pq_search's reused oracle, which is pinned to the
        # batch-family convention (bare creation sizes C to the corpus
        # since r14 — see streaming_ann_recall_curve for the sized
        # store's pricing)
        create_ann_store(spark, store, emb, **default_geometry())
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), store)
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), store)
        return ann_query_index(
            spark, store, emb.filter(F.col("vec_id") < 10), k=5, nprobe=2
        )
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


#: NON-DEFAULT geometry for the parameterization check (r12 verdict
#: #1): every knob differs from the module defaults (C 8→12, K 16→24,
#: M 4→2, buckets 8→4) and the query probes 3 cells instead of 2.
_ANN_GEO = {"c_cells": 12, "k_codes": 24, "m_subspaces": 2, "n_buckets": 4}
_ANN_GEO_NPROBE = 3


def _ivf_pq_store_sql(
    c: int, k: int, m: int, nprobe: int, nq: int, topk: int,
    cand_predicate: str = "",
    rerank_r: int | None = None,
) -> str:
    """The ivf_pq_search oracle PARAMETERIZED — same CTE structure as
    plans/similarity.py's, with the geometry interpolated, so a store
    built at any geometry is checked against an independent DuckDB
    recompute at ITS geometry (not the default one's).
    ``cand_predicate`` (extra SQL ANDed into the candidate CTE's
    WHERE, e.g. a metadata filter joined on vec_id) is the filtered
    -search hook: applied at candidate generation, BEFORE ADC ranking
    — exactly where ann_query_index applies its ``allowed``
    semi-join.  ``rerank_r`` switches the finisher: instead of the
    ADC top-``topk``, take the ADC top-``rerank_r`` shortlist and
    re-rank it by EXACT integer L2 on the quantized vectors — the
    ann_rerank_index semantics, (query_id, vec_id, exact_dist2,
    rnk)."""
    from kafkastreamsproject_spark.plans.similarity import _SQL_KM_Q

    if rerank_r is None:
        finisher = f"""
    SELECT query_id, vec_id, cell, adc_dist2, CAST(rn AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist2, vec_id) AS rn
      FROM adc
    ) WHERE rn <= {topk}
    """
    else:
        finisher = f"""
    , qa AS (SELECT vec_id AS query_id, qv AS qav FROM q
             WHERE vec_id < {nq}),
    shortlist AS (
      SELECT query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist2, vec_id) AS srn
        FROM adc
      ) WHERE srn <= {rerank_r}
    ),
    rex AS (
      SELECT s.query_id, s.vec_id,
             CAST(list_sum(list_transform(range(1, len(qa.qav) + 1),
                 i -> (qa.qav[i] - q2.qv[i]) * (qa.qav[i] - q2.qv[i])))
               AS BIGINT) AS exact_dist2
      FROM shortlist s
      JOIN qa ON qa.query_id = s.query_id
      JOIN q q2 ON q2.vec_id = s.vec_id
    )
    SELECT query_id, vec_id, exact_dist2, CAST(rn AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY exact_dist2, vec_id) AS rn
      FROM rex
    ) WHERE rn <= {topk}
    """

    return f"""
    WITH q AS (
      SELECT vec_id, {_SQL_KM_Q} AS qv FROM embeddings
    ),
    sub AS (
      SELECT vec_id,
             unnest(range(0, {m})) AS s,
             unnest(list_transform(range(0, {m}), s ->
               qv[(s * CAST(ceil(len(qv) / {m}.0) AS BIGINT) + 1):
                  least((s + 1) * CAST(ceil(len(qv) / {m}.0) AS BIGINT),
                        len(qv))])) AS sv
      FROM q
    ),
    cb AS (
      SELECT s, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < {k}
    ),
    d AS (
      SELECT sub.vec_id, sub.s, cb.cid,
             ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
                 ORDER BY CAST(list_sum(list_transform(range(1, len(sub.sv) + 1),
                     i -> (sub.sv[i] - cb.cv[i]) * (sub.sv[i] - cb.cv[i])))
                   AS BIGINT), cb.cid) AS rn
      FROM sub JOIN cb ON sub.s = cb.s
    ),
    codes AS (SELECT vec_id, s, cid FROM d WHERE rn = 1),
    coarse AS (SELECT vec_id AS ccid, qv AS cv2 FROM q WHERE vec_id < {c}),
    ad AS (
      SELECT q.vec_id, c.ccid,
             CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                 i -> (q.qv[i] - c.cv2[i]) * (q.qv[i] - c.cv2[i])))
               AS BIGINT) AS dist2
      FROM q CROSS JOIN coarse c
    ),
    ranked AS (
      SELECT vec_id, ccid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist2, ccid) AS rn
      FROM ad
    ),
    cells AS (SELECT vec_id, ccid AS cell FROM ranked WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, ccid AS cell FROM ranked
      WHERE vec_id < {nq} AND rn <= {nprobe}
    ),
    cand AS (
      SELECT p.query_id, cl.vec_id, cl.cell
      FROM probes p JOIN cells cl ON cl.cell = p.cell
      WHERE cl.vec_id != p.query_id{cand_predicate}
    ),
    qsub AS (SELECT vec_id AS query_id, s, sv AS qsv FROM sub
             WHERE vec_id < {nq}),
    adc_parts AS (
      SELECT ca.query_id, ca.vec_id, ca.cell,
             CAST(list_sum(list_transform(range(1, len(qs.qsv) + 1),
                 i -> (qs.qsv[i] - cb.cv[i]) * (qs.qsv[i] - cb.cv[i])))
               AS BIGINT) AS part
      FROM cand ca
      JOIN codes co ON co.vec_id = ca.vec_id
      JOIN cb ON cb.s = co.s AND cb.cid = co.cid
      JOIN qsub qs ON qs.query_id = ca.query_id AND qs.s = co.s
    ),
    adc AS (
      SELECT query_id, vec_id, cell,
             CAST(SUM(part) AS BIGINT) AS adc_dist2
      FROM adc_parts GROUP BY 1, 2, 3
    ){finisher}"""


def _ann_geo_oracle() -> str:
    """The batch IVF-PQ recompute at _ANN_GEO — the non-default store
    is checked against an independent DuckDB recompute at ITS
    geometry."""
    return _ivf_pq_store_sql(
        c=_ANN_GEO["c_cells"],
        k=_ANN_GEO["k_codes"],
        m=_ANN_GEO["m_subspaces"],
        nprobe=_ANN_GEO_NPROBE,
        nq=10,
        topk=5,
    )


@register(
    "streaming_ann_index_geo",
    oracle_fn=_ann_geo_oracle,
    tags=("similarity", "ann", "streaming"),
    tier="shadow",
)
def streaming_ann_index_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_ann_index at a NON-DEFAULT geometry (r12 verdict #1):
    the store is created with every knob off its default (C=12, K=24,
    M=2, 4 buckets — streaming/annindex.py persists them in the
    ``_ann_meta.json`` sidecar), folded in THREE epochs by arrival
    residue, and queried at nprobe=3 with the caller's geometry
    expectation asserted against the sidecar.  The DuckDB oracle is
    the batch IVF-PQ recompute re-parameterized at the same geometry,
    so parameterization is verified end-to-end — not just that the
    knobs exist, but that a store built under them scores exactly.

    Scale context: the geometry sidecar is what makes the C ≈ √N
    sizing rule deployable (create with ``**sized_geometry(N)``, every
    later fold/query reads the sidecar); the fold smoke
    (scripts/r13_ann_geometry_smoke.py) measures the query-wall
    consequence at 10× growth."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_query_index,
        create_ann_store,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    store = tempfile.mkdtemp(prefix="ann_index_geo_store_")
    tables = [
        store_table_name("ann_codes", f"{store}/codes"),
        store_table_name("ann_seen", f"{store}/seen"),
    ]
    try:
        create_ann_store(spark, store, emb, **_ANN_GEO)
        for residue in (0, 1, 2):
            ann_ingest_batch(
                emb.filter(F.col("vec_id") % 3 == residue), store
            )
        return ann_query_index(
            spark,
            store,
            emb.filter(F.col("vec_id") < 10),
            k=5,
            nprobe=_ANN_GEO_NPROBE,
            geometry=_ANN_GEO,
        )
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


#: rebuild-path victims: vec_id 2 is a default-geometry codebook
#: TRAINING vector (the case in-place erasure cannot fully serve),
#: 25 is an ordinary corpus member.
_REBUILD_VICTIMS = (2, 25)


def _ann_rebuild_oracle() -> str:
    """Batch IVF-PQ over the SURVIVING corpus with codebooks
    RETRAINED on survivors — the deterministic first-C/first-K
    survivors by vec_id, which is what rebuild_ann_store's
    create_ann_store does — so the oracle asserts true full-erasure
    semantics: no victim byte participates anywhere, including the
    codebooks."""
    from kafkastreamsproject_spark.plans.similarity import _SQL_KM_Q

    c, k, m, nprobe, nq, topk = 8, 16, 4, 2, 10, 5
    victims = ", ".join(str(v) for v in _REBUILD_VICTIMS)
    return f"""
    WITH q AS (
      SELECT vec_id, {_SQL_KM_Q} AS qv FROM embeddings
    ),
    q_surv AS (SELECT * FROM q WHERE vec_id NOT IN ({victims})),
    sub AS (
      SELECT vec_id,
             unnest(range(0, {m})) AS s,
             unnest(list_transform(range(0, {m}), s ->
               qv[(s * CAST(ceil(len(qv) / {m}.0) AS BIGINT) + 1):
                  least((s + 1) * CAST(ceil(len(qv) / {m}.0) AS BIGINT),
                        len(qv))])) AS sv
      FROM q
    ),
    cb AS (
      SELECT s, vec_id AS cid, sv AS cv FROM sub
      WHERE vec_id IN (SELECT vec_id FROM q_surv ORDER BY vec_id LIMIT {k})
    ),
    sub_surv AS (
      SELECT sub.* FROM sub
      WHERE sub.vec_id NOT IN ({victims})
    ),
    d AS (
      SELECT sub_surv.vec_id, sub_surv.s, cb.cid,
             ROW_NUMBER() OVER (PARTITION BY sub_surv.vec_id, sub_surv.s
                 ORDER BY CAST(list_sum(list_transform(range(1, len(sub_surv.sv) + 1),
                     i -> (sub_surv.sv[i] - cb.cv[i]) * (sub_surv.sv[i] - cb.cv[i])))
                   AS BIGINT), cb.cid) AS rn
      FROM sub_surv JOIN cb ON sub_surv.s = cb.s
    ),
    codes AS (SELECT vec_id, s, cid FROM d WHERE rn = 1),
    coarse AS (
      SELECT vec_id AS ccid, qv AS cv2 FROM q_surv
      ORDER BY vec_id LIMIT {c}
    ),
    ad_surv AS (
      SELECT q_surv.vec_id, c.ccid,
             CAST(list_sum(list_transform(range(1, len(q_surv.qv) + 1),
                 i -> (q_surv.qv[i] - c.cv2[i]) * (q_surv.qv[i] - c.cv2[i])))
               AS BIGINT) AS dist2
      FROM q_surv CROSS JOIN coarse c
    ),
    cells AS (
      SELECT vec_id, ccid AS cell FROM (
        SELECT vec_id, ccid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist2, ccid) AS rn
        FROM ad_surv
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, ccid AS cell FROM (
        SELECT q.vec_id, c.ccid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                     i -> (q.qv[i] - c.cv2[i]) * (q.qv[i] - c.cv2[i])))
                   AS BIGINT), c.ccid) AS rn
        FROM q CROSS JOIN coarse c
        WHERE q.vec_id < {nq}
      ) WHERE rn <= {nprobe}
    ),
    cand AS (
      SELECT p.query_id, cl.vec_id, cl.cell
      FROM probes p JOIN cells cl ON cl.cell = p.cell
      WHERE cl.vec_id != p.query_id
    ),
    qsub AS (SELECT vec_id AS query_id, s, sv AS qsv FROM sub
             WHERE vec_id < {nq}),
    adc_parts AS (
      SELECT ca.query_id, ca.vec_id, ca.cell,
             CAST(list_sum(list_transform(range(1, len(qs.qsv) + 1),
                 i -> (qs.qsv[i] - cb.cv[i]) * (qs.qsv[i] - cb.cv[i])))
               AS BIGINT) AS part
      FROM cand ca
      JOIN codes co ON co.vec_id = ca.vec_id
      JOIN cb ON cb.s = co.s AND cb.cid = co.cid
      JOIN qsub qs ON qs.query_id = ca.query_id AND qs.s = co.s
    ),
    adc AS (
      SELECT query_id, vec_id, cell,
             CAST(SUM(part) AS BIGINT) AS adc_dist2
      FROM adc_parts GROUP BY 1, 2, 3
    )
    SELECT query_id, vec_id, cell, adc_dist2, CAST(rn AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist2, vec_id) AS rn
      FROM adc
    ) WHERE rn <= {topk}
    """


@register(
    "ann_forget_rebuild",
    oracle_fn=_ann_rebuild_oracle,
    tags=("similarity", "ann", "privacy", "streaming"),
    tier="shadow",
)
def ann_forget_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL vector erasure via codebook retrain + store rebuild
    (streaming/annindex.py:rebuild_ann_store) — the path the in-place
    erasure's codebook-residue guard points at.  Victim vec_id 2 is a
    codebook TRAINING vector of the default geometry: in-place
    :func:`forget_vectors_in_index` would leave its quantized
    embedding verbatim in the codebook snapshot (and raises on it);
    the rebuild retrains the codebooks on the deterministic
    first-C/first-K SURVIVORS, builds a fresh store, and answers the
    standard queries from it.  The DuckDB oracle recomputes the batch
    IVF-PQ with the SAME survivors-only training, so the check
    asserts that no victim byte participates anywhere — centroids,
    codebook, codes, or ledger.

    Scale shape: a rebuild is corpus-sized by design (that is what
    full codebook erasure costs); it runs as a versioned maintenance
    op under a new store directory while the in-place path serves the
    common non-training-member erasures bucket-locally."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_query_index,
        rebuild_ann_store,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    victims = spark.createDataFrame(
        [(v,) for v in _REBUILD_VICTIMS], "vec_id long"
    )
    store = tempfile.mkdtemp(prefix="ann_rebuild_store_")
    tables = [
        store_table_name("ann_codes", f"{store}/codes"),
        store_table_name("ann_seen", f"{store}/seen"),
    ]
    try:
        rebuild_ann_store(
            spark, emb, victims, store,
            c_cells=8, k_codes=16, m_subspaces=4, n_buckets=8,
        )
        return ann_query_index(
            spark, store, emb.filter(F.col("vec_id") < 10), k=5, nprobe=2
        )
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


_FORGET_MOD = 37  # victims: doc_id % 37 == 3 (~2.7% of the corpus)


def _index_forget_oracle() -> str:
    # batch BM25 over the SURVIVING corpus: the batch oracle with the
    # erasure predicate applied at its one corpus read (the base CTE —
    # stats derive from base, so N/avgdl shrink with it)
    from kafkastreamsproject_spark.plans.text import _bm25_sql

    sql = _bm25_sql()
    needle = "FROM documents"
    assert sql.count(needle) == 1, "oracle surgery expects one corpus read"
    return sql.replace(
        needle,
        f"FROM documents WHERE doc_id % {_FORGET_MOD} != 3",
    )


@register(
    "index_forget_replay",
    oracle_fn=_index_forget_oracle,
    tags=("text", "retrieval", "privacy", "streaming"),
    tier="shadow",
)
def index_forget_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten REACHING INTO THE SERVING INDEX
    (streaming/bm25index.py:forget_docs_in_index): fold the corpus in
    two epochs, erase every doc_id % 37 == 3 — their postings leave
    the term-bucketed store via the bucket-local (t, doc_id) row-level
    forget, their ledger rows via the key-level forget (which is what
    shrinks N/avgdl) — then answer the standard three-term query.
    The DuckDB oracle is the batch BM25 over the SURVIVING corpus, so
    the check asserts true erasure semantics: not just that victims
    vanish from results, but that every survivor's score re-prices
    under the post-erasure corpus statistics exactly.

    Scale shape: erasure cost ∝ the victims' terms' buckets (bucket
    ids bound the rewrite, untouched buckets byte-identical —
    pytest-asserted in tests/test_bm25_index.py); the victims' posting
    keys come from one column-pruned 16 B/row store scan."""
    from kafkastreamsproject_spark.plans.text import _BM25_TERMS
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.bm25index import (
        forget_docs_in_index,
        index_ingest_batch,
        query_index,
    )

    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "text"
    )
    store = tempfile.mkdtemp(prefix="bm25_forget_store_")
    tables = [
        store_table_name("bm25_postings", f"{store}/postings"),
        store_table_name("bm25_seen", f"{store}/seen"),
    ]
    try:
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 0), store)
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 1), store)
        victims = docs.filter(
            F.col("doc_id") % _FORGET_MOD == 3
        ).select("doc_id")
        forget_docs_in_index(spark, victims, store)
        return query_index(spark, store, _BM25_TERMS).localCheckpoint(
            eager=True
        )
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


#: filtered-search predicate: corpus vectors carrying this label (the
#: embeddings table's metadata column — the source/lang/label shape)
_FILTER_LABEL = 3
_FILTER_NPROBE = 3


def _ann_filtered_oracle() -> str:
    """The batch IVF-PQ recompute with the label predicate applied AT
    CANDIDATE GENERATION (pre-ADC) — the oracle for filtered search:
    the top-k must rank eligible vectors only, not post-filter an
    unrestricted top-k."""
    from kafkastreamsproject_spark.streaming.annindex import (
        default_geometry,
    )

    g = default_geometry()
    return _ivf_pq_store_sql(
        c=g["c_cells"],
        k=g["k_codes"],
        m=g["m_subspaces"],
        nprobe=_FILTER_NPROBE,
        nq=10,
        topk=5,
        cand_predicate=(
            " AND cl.vec_id IN (SELECT vec_id FROM embeddings"
            f" WHERE label = {_FILTER_LABEL})"
        ),
    )


@register(
    "ann_filtered_topk",
    oracle_fn=_ann_filtered_oracle,
    tags=("similarity", "ann", "streaming"),
    tier="shadow",
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search over the serving store (r13 verdict #5)
    — ANN top-k restricted by a metadata predicate (label=3 here; the
    source/lang shape in production), the query every real vector
    deployment runs more often than the unrestricted one.  The
    predicate applies INSIDE the cell-probe stage of
    streaming/annindex.py:ann_query_index — a broadcast semi-join on
    the candidates AFTER the probe equi-join, BEFORE any ADC work —
    so the per-query top-k ranks eligible vectors only and fills k
    whenever the probed cells hold ≥k eligible candidates.
    Post-filtering the unrestricted top-k instead silently under-fills
    it whenever ineligible vectors held top slots
    (tests/test_ann_index.py pins a case where it returns <k and the
    operator returns exactly k).  The DuckDB oracle recomputes the
    batch IVF-PQ with the SAME pre-ADC predicate, so eligibility
    placement — not just membership — is verified.

    Scale shape: the predicate set broadcasts (a label/source/lang
    predicate resolves to a bounded id set per shard); candidates
    leave before ADC, so the scoring joins shrink WITH the filter's
    selectivity instead of paying full-ADC-then-discard.  A
    store-scale predicate belongs in a vec_id-bucketed store
    semi-joined on its bucket key (sources/bucketed.py)."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_query_index,
        create_ann_store,
        default_geometry,
    )

    full = fan_out(load_table(spark, "embeddings", sf_dir))
    emb = full.select("vec_id", "embedding")
    allowed = full.filter(F.col("label") == _FILTER_LABEL).select("vec_id")
    store = tempfile.mkdtemp(prefix="ann_filtered_store_")
    tables = [
        store_table_name("ann_codes", f"{store}/codes"),
        store_table_name("ann_seen", f"{store}/seen"),
    ]
    try:
        create_ann_store(spark, store, emb, **default_geometry())
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), store)
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), store)
        return ann_query_index(
            spark,
            store,
            emb.filter(F.col("vec_id") < 10),
            k=5,
            nprobe=_FILTER_NPROBE,
            allowed=allowed,
        )
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


#: the nprobe sweep for the store-path recall curve; all ≤ the C ≥ 8
#: floor, so the grid is valid at every corpus size
_RECALL_NPROBES = (1, 2, 4, 8)
#: exact-rerank shortlist depth for the curve's rerank leg
_RECALL_RERANK_R = 20


def _ann_store_recall_oracle() -> str:
    """DuckDB recompute of the SIZED-geometry store search at every
    swept nprobe, scored against the exact integer-L2 top-5 — the
    candidate generation runs once at the largest nprobe with each
    candidate tagged by its cell's probe rank (the ivf_pq_recall_curve
    gadget), and C derives from the corpus count INSIDE the SQL with
    the same round-half-up sqrt the Spark side's sized_geometry
    computes (an integer's sqrt is never exactly .5, so FLOOR(x+0.5)
    and Python round agree)."""
    from kafkastreamsproject_spark.plans.similarity import _SQL_KM_Q

    k, m, nq, topk, rr = 16, 4, 10, 5, _RECALL_RERANK_R
    maxnp = max(_RECALL_NPROBES)
    return f"""
    WITH q AS (
      SELECT vec_id, {_SQL_KM_Q} AS qv FROM embeddings
    ),
    geo AS (
      SELECT GREATEST(8, CAST(FLOOR(SQRT(COUNT(*)) + 0.5) AS INT)) AS c
      FROM q
    ),
    sub AS (
      SELECT vec_id,
             unnest(range(0, {m})) AS s,
             unnest(list_transform(range(0, {m}), s ->
               qv[(s * CAST(ceil(len(qv) / {m}.0) AS BIGINT) + 1):
                  least((s + 1) * CAST(ceil(len(qv) / {m}.0) AS BIGINT),
                        len(qv))])) AS sv
      FROM q
    ),
    cb AS (
      SELECT s, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < {k}
    ),
    d AS (
      SELECT sub.vec_id, sub.s, cb.cid,
             ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
                 ORDER BY CAST(list_sum(list_transform(range(1, len(sub.sv) + 1),
                     i -> (sub.sv[i] - cb.cv[i]) * (sub.sv[i] - cb.cv[i])))
                   AS BIGINT), cb.cid) AS rn
      FROM sub JOIN cb ON sub.s = cb.s
    ),
    codes AS (SELECT vec_id, s, cid FROM d WHERE rn = 1),
    coarse AS (SELECT vec_id AS ccid, qv AS cv2 FROM q
               WHERE vec_id < (SELECT c FROM geo)),
    ad AS (
      SELECT q.vec_id, c.ccid,
             CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                 i -> (q.qv[i] - c.cv2[i]) * (q.qv[i] - c.cv2[i])))
               AS BIGINT) AS dist2
      FROM q CROSS JOIN coarse c
    ),
    ranked AS (
      SELECT vec_id, ccid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist2, ccid) AS rn
      FROM ad
    ),
    cells AS (SELECT vec_id, ccid AS cell FROM ranked WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, ccid AS cell, rn AS probe_rn FROM ranked
      WHERE vec_id < {nq} AND rn <= {maxnp}
    ),
    cand AS (
      SELECT p.query_id, cl.vec_id, p.probe_rn
      FROM probes p JOIN cells cl ON cl.cell = p.cell
      WHERE cl.vec_id != p.query_id
    ),
    qsub AS (SELECT vec_id AS query_id, s, sv AS qsv FROM sub
             WHERE vec_id < {nq}),
    adc_parts AS (
      SELECT ca.query_id, ca.vec_id, ca.probe_rn,
             CAST(list_sum(list_transform(range(1, len(qs.qsv) + 1),
                 i -> (qs.qsv[i] - cb.cv[i]) * (qs.qsv[i] - cb.cv[i])))
               AS BIGINT) AS part
      FROM cand ca
      JOIN codes co ON co.vec_id = ca.vec_id
      JOIN cb ON cb.s = co.s AND cb.cid = co.cid
      JOIN qsub qs ON qs.query_id = ca.query_id AND qs.s = co.s
    ),
    adc AS (
      SELECT query_id, vec_id, probe_rn,
             CAST(SUM(part) AS BIGINT) AS adc_dist2
      FROM adc_parts GROUP BY 1, 2, 3
    ),
    qa AS (SELECT vec_id AS query_id, qv AS qav FROM q
           WHERE vec_id < {nq}),
    truth AS (
      SELECT query_id, vec_id FROM (
        SELECT qa.query_id, q2.vec_id,
               ROW_NUMBER() OVER (PARTITION BY qa.query_id ORDER BY
                 CAST(list_sum(list_transform(range(1, len(qa.qav) + 1),
                     i -> (qa.qav[i] - q2.qv[i]) * (qa.qav[i] - q2.qv[i])))
                   AS BIGINT), q2.vec_id) AS rn
        FROM qa JOIN q q2 ON q2.vec_id != qa.query_id
      ) WHERE rn <= {topk}
    ),
    np AS (SELECT unnest({list(_RECALL_NPROBES)}) AS nprobe),
    grid AS (SELECT np.nprobe, qa.query_id FROM np CROSS JOIN qa),
    legs AS (
      SELECT np.nprobe, a.query_id, a.vec_id, a.adc_dist2
      FROM adc a JOIN np ON a.probe_rn <= np.nprobe
    ),
    stk AS (
      SELECT nprobe, query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY nprobe, query_id
                                     ORDER BY adc_dist2, vec_id) AS rn
        FROM legs
      ) WHERE rn <= {topk}
    ),
    hits AS (
      SELECT t.nprobe, t.query_id, COUNT(*) AS h
      FROM stk t JOIN truth tr ON tr.query_id = t.query_id
                              AND tr.vec_id = t.vec_id
      GROUP BY 1, 2
    ),
    rshort AS (
      SELECT nprobe, query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY nprobe, query_id
                                     ORDER BY adc_dist2, vec_id) AS srn
        FROM legs
      ) WHERE srn <= {rr}
    ),
    rex AS (
      SELECT s.nprobe, s.query_id, s.vec_id,
             CAST(list_sum(list_transform(range(1, len(qa.qav) + 1),
                 i -> (qa.qav[i] - q2.qv[i]) * (qa.qav[i] - q2.qv[i])))
               AS BIGINT) AS exact_dist2
      FROM rshort s
      JOIN qa ON qa.query_id = s.query_id
      JOIN q q2 ON q2.vec_id = s.vec_id
    ),
    rr_topk AS (
      SELECT nprobe, query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY nprobe, query_id
                                     ORDER BY exact_dist2, vec_id) AS rrn
        FROM rex
      ) WHERE rrn <= {topk}
    ),
    rr_hits AS (
      SELECT t.nprobe, t.query_id, COUNT(*) AS rh
      FROM rr_topk t JOIN truth tr ON tr.query_id = t.query_id
                                  AND tr.vec_id = t.vec_id
      GROUP BY 1, 2
    )
    SELECT CAST(g.nprobe AS INT) AS nprobe, g.query_id,
           CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hits,
           ROUND(COALESCE(h.h, 0) / {topk}.0, 6) AS recall_at_5,
           ROUND(COALESCE(rr.rh, 0) / {topk}.0, 6) AS rerank_recall_at_5
    FROM grid g
    LEFT JOIN hits h ON h.nprobe = g.nprobe AND h.query_id = g.query_id
    LEFT JOIN rr_hits rr ON rr.nprobe = g.nprobe
                        AND rr.query_id = g.query_id
    """


@register(
    "ann_store_recall_curve",
    oracle_fn=_ann_store_recall_oracle,
    tags=("similarity", "ann", "streaming", "diagnostic"),
    tier="shadow",
)
def ann_store_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-vs-nprobe pricing for the SERVING STORE path (r13
    verdict #4): the batch family's ivf_pq_recall_curve never touches
    the store, so the sized-geometry index had sublinear walls but no
    committed recall readout.  A store is created BARE — exercising
    the r14 corpus-sized default (C ≈ √N from the training count) —
    folded in two epochs, then ann_query_index answers the standard
    10 queries at every nprobe in the sweep; each leg's top-5 is
    scored against the exact integer-L2 truth (the batch curve's
    truth convention).  The DuckDB oracle recomputes store search AND
    truth AND the recall arithmetic at the same SQL-derived C, so the
    curve itself — not just the search — is cross-engine verified.

    Measured curve at the test corpus (N=500 ⇒ sized C=22; mean over
    the 10 queries at sf0.01): ADC recall@5 nprobe 1→0.38, 2→0.36,
    4→0.32, 8→0.30 — FLAT-TO-DECLINING, the batch curve's documented
    ADC non-monotonicity: at K=16/M=4 over dim-8 vectors, quantization
    error dominates pruning loss, so extra cells mostly admit
    quantization-flattered far candidates that displace true
    neighbors.  The ``rerank_recall_at_5`` leg (the store's ADC top-20
    exact-reranked via :func:`ann_rerank_index`) shows where recall
    actually comes from — 1→0.78, 2→0.70, 4→0.56, 8→0.52, MORE THAN
    DOUBLE the ADC numbers — and why it too declines at fixed R: the
    flattered far candidates poison the fixed-depth shortlist as
    probes grow, the R-vs-nprobe coupling the batch family's
    ivf_pq_rerank_r_curve prices (raise nprobe ⇒ raise R with it).
    Together the two legs justify the defaults: nprobe stays at the
    CHEAP end (2, candidates ≈ 2√N) because probes without rerank buy
    nothing here, and rerank is the lever.  Production re-runs this
    curve at its own geometry/fidelity (K=256, M=dim/4), where pruning
    loss, not quantization, is the moving part.

    Scale shape: four store probes (each ≈ nprobe·√N candidates,
    zero store-side Exchange) + one exact truth pass over the corpus
    with the 10-query set broadcast (the ann_topk_cosine shape) —
    the truth side is the diagnostic's cost, not the operator's."""
    from pyspark.sql import Window as W

    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        _int_dist2,
        ann_ingest_batch,
        ann_query_index,
        ann_rerank_index,
        create_ann_store,
        quantize,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    store = tempfile.mkdtemp(prefix="ann_recall_store_")
    tables = [
        store_table_name("ann_codes", f"{store}/codes"),
        store_table_name("ann_seen", f"{store}/seen"),
    ]
    try:
        create_ann_store(spark, store, emb)  # bare: sized geometry
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), store)
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), store)
        legs, rlegs = None, None
        for np_ in _RECALL_NPROBES:
            leg = ann_query_index(
                spark, store, queries, k=5, nprobe=np_
            ).select(
                F.lit(np_).cast("int").alias("nprobe"),
                "query_id",
                "vec_id",
            )
            legs = leg if legs is None else legs.unionByName(leg)
            rleg = ann_rerank_index(
                spark, store, queries, emb,
                k=5, nprobe=np_, r_shortlist=_RECALL_RERANK_R,
            ).select(
                F.lit(np_).cast("int").alias("nprobe"),
                "query_id",
                "vec_id",
            )
            rlegs = rleg if rlegs is None else rlegs.unionByName(rleg)

        # exact integer-L2 truth over the quantized vectors — the
        # broadcast-queries corpus scan (ann_topk_cosine shape)
        qb = quantize(queries).select(
            F.col("vec_id").alias("query_id"), F.col("qv").alias("qav")
        )
        scored = (
            quantize(emb)
            .join(F.broadcast(qb), F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                "vec_id",
                _int_dist2(F.col("qv"), F.col("qav")).alias("d2"),
            )
        )
        wt = W.partitionBy("query_id").orderBy("d2", "vec_id")
        truth = (
            scored.withColumn("rn", F.row_number().over(wt))
            .filter(F.col("rn") <= 5)
            .select("query_id", "vec_id")
        )

        hits = (
            legs.join(truth, ["query_id", "vec_id"])
            .groupBy("nprobe", "query_id")
            .agg(F.count(F.lit(1)).alias("h"))
        )
        rhits = (
            rlegs.join(truth, ["query_id", "vec_id"])
            .groupBy("nprobe", "query_id")
            .agg(F.count(F.lit(1)).alias("rh"))
        )
        grid = spark.createDataFrame(
            [(n,) for n in _RECALL_NPROBES], "nprobe int"
        ).crossJoin(queries.select(F.col("vec_id").alias("query_id")))
        out = (
            grid.join(hits, ["nprobe", "query_id"], "left")
            .join(rhits, ["nprobe", "query_id"], "left")
            .select(
                "nprobe",
                "query_id",
                F.coalesce(F.col("h"), F.lit(0)).cast("long").alias(
                    "n_hits"
                ),
                F.round(F.coalesce(F.col("h"), F.lit(0)) / 5.0, 6).alias(
                    "recall_at_5"
                ),
                F.round(F.coalesce(F.col("rh"), F.lit(0)) / 5.0, 6).alias(
                    "rerank_recall_at_5"
                ),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


_RERANK_R = 50
_RERANK_NPROBE = 2


def _ann_rerank_oracle() -> str:
    """The parameterized store recompute with the EXACT-RERANK
    finisher: ADC top-R shortlist, re-ranked by exact integer L2 on
    the quantized vectors — byte-for-byte the ann_rerank_index
    contract."""
    from kafkastreamsproject_spark.streaming.annindex import (
        default_geometry,
    )

    g = default_geometry()
    return _ivf_pq_store_sql(
        c=g["c_cells"],
        k=g["k_codes"],
        m=g["m_subspaces"],
        nprobe=_RERANK_NPROBE,
        nq=10,
        topk=5,
        rerank_r=_RERANK_R,
    )


@register(
    "ann_store_rerank_topk",
    oracle_fn=_ann_rerank_oracle,
    tags=("similarity", "ann", "streaming"),
    tier="shadow",
)
def ann_store_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-reranked serving-store search
    (streaming/annindex.py:ann_rerank_index) — the production answer
    to what ann_store_recall_curve measures: ADC recall on this index
    is quantization-bounded, so the delivered top-k comes from the ADC
    top-R shortlist re-ranked by EXACT integer L2 on the original
    (quantized) vectors, fetched back from the upstream corpus (the
    store holds only codes).  The batch family prices this stage
    (ivf_pq_rerank); this query proves the STORE path executes it
    exactly: the DuckDB oracle recomputes shortlist + exact rerank
    end-to-end at the same geometry.

    Scale shape: the |queries|·R shortlist broadcasts into one
    equi-join against the corpus scan — rerank costs one corpus pass
    regardless of store size (an IVF-Flat cell-bucketed raw-vector
    sidecar would cut that to the probed cells; future work noted in
    the operator docstring)."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_rerank_index,
        create_ann_store,
        default_geometry,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    store = tempfile.mkdtemp(prefix="ann_rerank_store_")
    tables = [
        store_table_name("ann_codes", f"{store}/codes"),
        store_table_name("ann_seen", f"{store}/seen"),
    ]
    try:
        create_ann_store(spark, store, emb, **default_geometry())
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), store)
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), store)
        return ann_rerank_index(
            spark,
            store,
            emb.filter(F.col("vec_id") < 10),
            emb,
            k=5,
            nprobe=_RERANK_NPROBE,
            r_shortlist=_RERANK_R,
        ).localCheckpoint(eager=True)
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


@register(
    "ann_rerank_sidecar",
    oracle_fn=_ann_rerank_oracle,
    tags=("similarity", "ann", "streaming"),
    tier="shadow",
)
def ann_rerank_sidecar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_store_rerank_topk answered from the IVF-Flat SIDECAR
    (r14): the store is created with ``store_vectors=True``, so every
    fold also persists the fresh vectors' quantized embeddings
    cell-bucketed next to the codes, and the exact-rerank stage reads
    the shortlist's vectors from the PROBED CELLS (a pushed
    ``cell IN (...)`` parquet filter — the bm25 term-probe
    discipline) instead of re-scanning the upstream corpus.  The
    oracle is ann_store_rerank_topk's VERBATIM — the sidecar holds
    the same quantized vectors, so the two rerank paths must produce
    identical rows, which is exactly what reusing the oracle asserts
    cross-engine.

    Scale shape: this closes the rerank story's last corpus pass —
    candidates ≈ nprobe·√N (sized geometry), ADC on codes, exact
    rerank on ≈ nprobe·√N sidecar vectors; nothing in the query path
    scans the corpus.  The sidecar prices in ~dim·8 B per vector of
    extra store footprint and one more bucketed append per fold
    (same crash-window position as codes: before the seen commit);
    GDPR erasure reaches it (victims' quantized embeddings leave with
    their codes — pytest-pinned)."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_rerank_index,
        create_ann_store,
        default_geometry,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    store = tempfile.mkdtemp(prefix="ann_sidecar_store_")
    tables = [
        store_table_name("ann_codes", f"{store}/codes"),
        store_table_name("ann_seen", f"{store}/seen"),
        store_table_name("ann_vecs", f"{store}/vecs"),
    ]
    try:
        create_ann_store(
            spark, store, emb, **default_geometry(), store_vectors=True
        )
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), store)
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), store)
        return ann_rerank_index(
            spark,
            store,
            emb.filter(F.col("vec_id") < 10),
            k=5,
            nprobe=_RERANK_NPROBE,
            r_shortlist=_RERANK_R,
            vectors_from_store=True,
        ).localCheckpoint(eager=True)
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


#: hybrid serving-stack fusion knobs: per-side candidate cut (the
#: batch hybrid_retrieval_rrf convention), ANN probe width, and the
#: rerank shortlist feeding the semantic side's exact ranking
_HYBRID_RRF_K = 100
_HYBRID_NPROBE = 4
_HYBRID_SHORTLIST = 150


def _hybrid_stores_oracle() -> str:
    """Both serving paths recomputed independently and fused: the
    lexical CTE is the batch BM25 scorer (the store scores
    bit-identically to it — streaming_bm25_index's own oracle), the
    semantic CTE is the parameterized IVF-PQ + exact-rerank recompute
    (ann_rerank_sidecar's), and the fusion arithmetic is the batch
    hybrid_retrieval_rrf convention (RRF k=60 over per-side top-K
    cuts, integer ranks, 6-dp round)."""
    from kafkastreamsproject_spark.plans.text import _bm25_sql
    from kafkastreamsproject_spark.streaming.annindex import (
        default_geometry,
    )

    g = default_geometry()
    sem_sql = _ivf_pq_store_sql(
        c=g["c_cells"],
        k=g["k_codes"],
        m=g["m_subspaces"],
        nprobe=_HYBRID_NPROBE,
        nq=1,
        topk=_HYBRID_RRF_K,
        rerank_r=_HYBRID_SHORTLIST,
    )
    return f"""
    WITH lex AS ({_bm25_sql()}),
    lexcut AS (
      SELECT doc_id, bm25 FROM lex
      ORDER BY bm25 DESC, doc_id LIMIT {_HYBRID_RRF_K}
    ),
    lexr AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
                          AS INT) AS lex_rank
      FROM lexcut
    ),
    sem AS ({sem_sql}),
    semr AS (SELECT vec_id AS doc_id, rnk AS sem_rank FROM sem)
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           l.lex_rank, s.sem_rank,
           ROUND(COALESCE(1.0 / (60.0 + l.lex_rank), 0.0)
                 + COALESCE(1.0 / (60.0 + s.sem_rank), 0.0), 6) AS rrf
    FROM lexr l FULL OUTER JOIN semr s ON s.doc_id = l.doc_id
    """


@register(
    "hybrid_search_from_stores",
    oracle_fn=_hybrid_stores_oracle,
    tags=("text", "similarity", "retrieval", "streaming"),
    tier="shadow",
)
def hybrid_search_from_stores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL SERVING STACK in one query (r14): lexical candidates
    from the incremental BM25 inverted index, semantic candidates from
    the incremental IVF-PQ index with its IVF-Flat sidecar, fused by
    reciprocal-rank fusion — and NOTHING in the query path scans a
    corpus.  This is the serving twin of the batch
    ``hybrid_retrieval_rrf`` (plans/similarity.py): same fusion
    arithmetic (RRF k=60 over per-side top-100 cuts, integer ranks,
    doc-id tie-breaks, 6-dp round), but both ranked lists come from
    PERSISTENT STORES built incrementally across epochs — the lexical
    probe reads its terms' posting-list rows (pushed ``t IN``), the
    semantic side probes nprobe cells, ADC-shortlists 150, and
    exact-reranks from the probed cells' sidecar vectors (pushed
    ``cell IN``).  The DuckDB oracle recomputes both sides
    independently (batch BM25 + parameterized IVF recompute) and the
    fusion, so the cross-engine check covers ranking AND fusion.

    Semantic ranking here is the store's honest product — IVF-pruned,
    exact-int-L2 reranked — not the batch query's exact cosine; the
    two hybrids coexist deliberately: the batch one is the recall
    ceiling, this one is what a deployment actually serves, and
    ann_store_recall_curve prices the gap.

    Scale shape (rows AND bytes, r14 verdict #3/#4): lexical row work
    ∝ query terms' postings (df-cap boundable) and lexical BYTES ∝
    the probed term buckets plus the driver-side stats sidecar (the
    r15 fix — N/avgdl no longer re-aggregate the seen ledger per
    query); semantic row work ≈ nprobe·√N candidates + R sidecar
    reads, and semantic BYTES ∝ the probed cells (the r15 ``cell IN``
    pushdown on the codes scan closed the last O(N)-bytes leg);
    fusion is a 100-vs-100 outer merge."""
    from kafkastreamsproject_spark.operators.topk import top_k
    from kafkastreamsproject_spark.plans.text import _BM25_TERMS
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_rerank_index,
        create_ann_store,
        default_geometry,
    )
    from kafkastreamsproject_spark.streaming.bm25index import (
        index_ingest_batch,
        query_index,
    )

    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "text"
    )
    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    bm_store = tempfile.mkdtemp(prefix="hybrid_bm25_store_")
    ann_store = tempfile.mkdtemp(prefix="hybrid_ann_store_")
    tables = [
        store_table_name("bm25_postings", f"{bm_store}/postings"),
        store_table_name("bm25_seen", f"{bm_store}/seen"),
        store_table_name("ann_codes", f"{ann_store}/codes"),
        store_table_name("ann_seen", f"{ann_store}/seen"),
        store_table_name("ann_vecs", f"{ann_store}/vecs"),
    ]
    try:
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 0), bm_store)
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 1), bm_store)
        create_ann_store(
            spark, ann_store, emb, **default_geometry(), store_vectors=True
        )
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), ann_store)
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), ann_store)

        lexr = top_k(
            query_index(spark, bm_store, _BM25_TERMS),
            [F.col("bm25").desc(), F.col("doc_id")],
            _HYBRID_RRF_K,
            rank_col="lex_rank",
        ).select("doc_id", "lex_rank")
        semr = ann_rerank_index(
            spark,
            ann_store,
            emb.filter(F.col("vec_id") == 0),
            k=_HYBRID_RRF_K,
            nprobe=_HYBRID_NPROBE,
            r_shortlist=_HYBRID_SHORTLIST,
            vectors_from_store=True,
        ).select(
            F.col("vec_id").alias("doc_id"),
            F.col("rnk").alias("sem_rank"),
        )
        fused = lexr.join(semr, "doc_id", "full_outer")
        rrf = F.round(
            F.coalesce(
                F.lit(1.0) / (F.lit(60.0) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(60.0) + F.col("sem_rank")), F.lit(0.0)
            ),
            6,
        )
        return fused.select(
            "doc_id", "lex_rank", "sem_rank", rrf.alias("rrf")
        ).localCheckpoint(eager=True)
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(bm_store, ignore_errors=True)
        shutil.rmtree(ann_store, ignore_errors=True)


# ---------------------------------------------------------------------------
# Tombstone delete tier over the serving store (r14): O(1) logical
# delete → query-time pre-ADC exclusion → physical apply at the
# compaction cadence.  The query proves BOTH halves against one
# oracle: phase 1 queries with the deletes pending (bytes still in
# the store), phase 2 after apply_tombstones made them physical —
# identical rows both times, and both equal to the batch IVF-PQ
# recompute over the corpus minus the victims.
# ---------------------------------------------------------------------------

#: tombstone victims: a deterministic residue class kept CLEAR of the
#: codebook training prefix (default geometry trains on vec_id <
#: max(C, K) = 16), so the physical apply needs no residue
#: acknowledgement — erasing a training member is the rebuild path's
#: job (`ann_forget_rebuild`)
_TOMB_SQL_PRED = "vec_id % 9 = 4 AND vec_id >= 16"
_TOMB_NPROBE = 2


def _ann_tombstone_oracle() -> str:
    """Batch IVF-PQ with the victims excluded at candidate generation
    — `_ivf_pq_store_sql`'s ``cand_predicate`` hook is exactly the
    tombstone anti-join's seam (pre-ADC, post-probe) — duplicated
    across the two phases, because a logical delete and its physical
    apply must be observationally identical."""
    inner = _ivf_pq_store_sql(
        c=8, k=16, m=4, nprobe=_TOMB_NPROBE, nq=10, topk=5,
        cand_predicate=(
            " AND NOT (cl.vec_id % 9 = 4 AND cl.vec_id >= 16)"
        ),
    )
    return f"""
    SELECT CAST(p.phase AS INT) AS phase, b.*
    FROM (SELECT 1 AS phase UNION ALL SELECT 2) p
    CROSS JOIN ({inner}) b
    """


@register(
    "ann_tombstone_delete",
    oracle_fn=_ann_tombstone_oracle,
    tags=("similarity", "ann", "streaming", "gdpr"),
    tier="shadow",
)
def ann_tombstone_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving store's O(1) delete tier, both halves oracle-checked
    (r14): tombstone a victim set (one tiny parquet append, zero store
    rewrite), query — the pending set anti-joins out of the candidates
    BEFORE any ADC work, so victims are unrankable and every top-k
    fills from survivors — then ``apply_tombstones`` (the
    log-cleaning half: the bucket-local forget rewrite + clear the
    set) and query again.  Phase 1 rows must EQUAL phase 2 rows must
    equal the DuckDB batch recompute with the victims excluded at the
    same pre-ADC seam: the delete's visibility is immediate and its
    physical apply is invisible.

    This is the Kafka-log-compaction delete model (reference
    semantics: a null-valued record tombstones its key until log
    cleaning drops both) re-expressed over the parquet store — the
    tier between "query-time filter forever" (broadcast set grows
    unboundedly) and "rewrite per delete" (O(store) per victim batch).
    Scale shape: deletes cost one appended file regardless of store
    size; queries pay one broadcast anti-join on the pending set
    (driver-bounded between applies); apply touches only the victims'
    cells' buckets."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_query_index,
        apply_tombstones,
        create_ann_store,
        default_geometry,
        tombstone_vectors_in_index,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    victims = emb.filter(_TOMB_SQL_PRED).select("vec_id")
    store = tempfile.mkdtemp(prefix="ann_tombstone_store_")
    tables = [
        store_table_name("ann_codes", f"{store}/codes"),
        store_table_name("ann_seen", f"{store}/seen"),
    ]
    q = emb.filter(F.col("vec_id") < 10)
    try:
        create_ann_store(spark, store, emb, **default_geometry())
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), store)
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), store)
        tombstone_vectors_in_index(spark, victims, store)
        pending = ann_query_index(
            spark, store, q, k=5, nprobe=_TOMB_NPROBE
        )
        applied_counts = apply_tombstones(spark, store)
        assert applied_counts["applied"] > 0
        applied = ann_query_index(
            spark, store, q, k=5, nprobe=_TOMB_NPROBE
        )
        return pending.withColumn(
            "phase", F.lit(1).cast("int")
        ).unionByName(applied.withColumn("phase", F.lit(2).cast("int")))
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


_TOMB_BM_MOD = 41  # BM25 tombstone victims: doc_id % 41 == 5 (~2.4%)


def _bm25_tombstone_oracle() -> str:
    """Batch BM25 over the SURVIVING corpus (the index_forget_replay
    oracle surgery), duplicated across the two phases: a pending
    logical delete and its physical apply must be observationally
    identical — including the re-priced survivor scores, since the
    pending set excludes victims from df AND N/avgdl, not just from
    the result rows."""
    from kafkastreamsproject_spark.plans.text import _bm25_sql

    sql = _bm25_sql()
    needle = "FROM documents"
    assert sql.count(needle) == 1, "oracle surgery expects one corpus read"
    inner = sql.replace(
        needle,
        f"FROM documents WHERE doc_id % {_TOMB_BM_MOD} != 5",
    )
    return f"""
    SELECT CAST(p.phase AS INT) AS phase, b.*
    FROM (SELECT 1 AS phase UNION ALL SELECT 2) p
    CROSS JOIN ({inner}) b
    """


@register(
    "bm25_tombstone_delete",
    oracle_fn=_bm25_tombstone_oracle,
    tags=("text", "retrieval", "privacy", "streaming"),
    tier="shadow",
)
def bm25_tombstone_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text index's O(1) delete tier, both halves oracle-checked
    (r14, the ann_tombstone_delete twin): tombstone every
    doc_id % 41 == 5 (one tiny parquet append, zero store rewrite) and
    query — the pending set leaves the term probe AND the corpus
    statistics, so every survivor re-prices under the post-delete
    N/avgdl/df immediately, exactly as if the victims had never been
    indexed — then ``apply_tombstones`` (the forget rewrite + clear)
    and query again.  Phase 1 rows must EQUAL phase 2 rows must equal
    the DuckDB batch BM25 over the surviving corpus.

    The statistics half is what makes the text tier subtler than the
    vector one: an exclusion that only filtered result rows would
    leave N/avgdl/df stale and silently mis-score EVERY surviving doc
    until compaction — the oracle here would catch that as a
    wrong-score mismatch on phase 1.  Scale shape: deletes cost one
    appended file; queries pay one broadcast anti-join at the probe
    plus one at the 16 B/doc ledger aggregate; apply touches only the
    victims' terms' buckets."""
    from kafkastreamsproject_spark.plans.text import _BM25_TERMS
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.bm25index import (
        apply_tombstones,
        index_ingest_batch,
        query_index,
        tombstone_docs_in_index,
    )

    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "text"
    )
    store = tempfile.mkdtemp(prefix="bm25_tombstone_store_")
    tables = [
        store_table_name("bm25_postings", f"{store}/postings"),
        store_table_name("bm25_seen", f"{store}/seen"),
    ]
    try:
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 0), store)
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 1), store)
        victims = docs.filter(
            F.col("doc_id") % _TOMB_BM_MOD == 5
        ).select("doc_id")
        tombstone_docs_in_index(spark, victims, store)
        pending = query_index(spark, store, _BM25_TERMS).localCheckpoint(
            eager=True
        )
        applied_counts = apply_tombstones(spark, store)
        assert applied_counts["applied"] > 0
        applied = query_index(spark, store, _BM25_TERMS).localCheckpoint(
            eager=True
        )
        return pending.withColumn(
            "phase", F.lit(1).cast("int")
        ).unionByName(applied.withColumn("phase", F.lit(2).cast("int")))
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


# ---------------------------------------------------------------------------
# Range (radius) search from the serving store (r14): the second
# standard serving shape next to top-k — every vector within an exact
# distance² bound of each query, among the probed cells (the FAISS
# range_search-on-IVF semantics).
# ---------------------------------------------------------------------------

#: exact-L2² radius for the range query: between the corpus's 1st and
#: 5th distance percentiles at test SF (measured: q01 ≈ 22.8k,
#: q05 ≈ 25.6k over the quantized integer vectors), so each query
#: returns a handful of true near neighbors, not the bulk
_RANGE_RADIUS2 = 24000
_RANGE_NPROBE = 2


def _ann_range_oracle() -> str:
    """Exact recompute of the probed-cells range semantics: coarse
    assignment and nprobe probes as in `_ivf_pq_store_sql`, then the
    TRUE integer L2² between query and every candidate (no PQ
    anywhere — a radius is a promise about the true distance), kept
    iff ≤ the radius."""
    from kafkastreamsproject_spark.plans.similarity import _SQL_KM_Q

    c, nq = 8, 10
    return f"""
    WITH q AS (
      SELECT vec_id, {_SQL_KM_Q} AS qv FROM embeddings
    ),
    coarse AS (SELECT vec_id AS ccid, qv AS cv2 FROM q WHERE vec_id < {c}),
    ad AS (
      SELECT q.vec_id, c.ccid,
             CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                 i -> (q.qv[i] - c.cv2[i]) * (q.qv[i] - c.cv2[i])))
               AS BIGINT) AS dist2
      FROM q CROSS JOIN coarse c
    ),
    ranked AS (
      SELECT vec_id, ccid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist2, ccid) AS rn
      FROM ad
    ),
    cells AS (SELECT vec_id, ccid AS cell FROM ranked WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, ccid AS cell FROM ranked
      WHERE vec_id < {nq} AND rn <= {_RANGE_NPROBE}
    ),
    cand AS (
      SELECT p.query_id, cl.vec_id, cl.cell
      FROM probes p JOIN cells cl ON cl.cell = p.cell
      WHERE cl.vec_id != p.query_id
    ),
    rex AS (
      SELECT ca.query_id, ca.vec_id, ca.cell,
             CAST(list_sum(list_transform(range(1, len(qa.qv) + 1),
                 i -> (qa.qv[i] - qb.qv[i]) * (qa.qv[i] - qb.qv[i])))
               AS BIGINT) AS exact_dist2
      FROM cand ca
      JOIN q qa ON qa.vec_id = ca.query_id
      JOIN q qb ON qb.vec_id = ca.vec_id
    )
    SELECT query_id, vec_id, CAST(cell AS BIGINT) AS cell, exact_dist2
    FROM rex WHERE exact_dist2 <= {_RANGE_RADIUS2}
    """


@register(
    "ann_range_search",
    oracle_fn=_ann_range_oracle,
    tags=("similarity", "ann", "streaming"),
    tier="shadow",
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius query over the serving store (r14): all indexed vectors
    within exact L2² ≤ 24000 of each of 10 queries, among nprobe=2
    probed cells — dedup radii and similarity floors, where top-k
    under-reports dense neighborhoods and pads sparse ones.
    Distances are EXACT via the IVF-Flat sidecar (the probed cells
    push into the vecs scan on the bucket key, so the scan is
    ≈ nprobe·√N vectors per query under sized geometry); PQ/ADC never
    enters — a radius is a promise about the true distance.  The
    DuckDB oracle recomputes the same probed-cells-then-exact
    semantics; recall beyond the probed cells is priced by the
    existing nprobe curve, not hidden (an unprobed cell's neighbor is
    absent from BOTH sides here)."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_range_index,
        create_ann_store,
        default_geometry,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    store = tempfile.mkdtemp(prefix="ann_range_store_")
    tables = [
        store_table_name("ann_codes", f"{store}/codes"),
        store_table_name("ann_seen", f"{store}/seen"),
        store_table_name("ann_vecs", f"{store}/vecs"),
    ]
    try:
        create_ann_store(
            spark, store, emb, **default_geometry(), store_vectors=True
        )
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), store)
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), store)
        return ann_range_index(
            spark,
            store,
            emb.filter(F.col("vec_id") < 10),
            radius2=_RANGE_RADIUS2,
            nprobe=_RANGE_NPROBE,
        )
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


# ---------------------------------------------------------------------------
# Codebook drift detection (r14): the retrain gauge for the frozen
# IVF-PQ codebooks — mean per-vector PQ reconstruction error of a
# cohort, priced against the training-time baseline persisted at
# store creation.
# ---------------------------------------------------------------------------


def _ann_drift_oracle() -> str:
    """Independent recompute of the drift arithmetic: codebooks =
    first-K EVEN vec_ids (the store below trains on the even half),
    per-vector error = Σ over subspaces of the distance² to the
    nearest code, baseline = mean over the even half (the training
    corpus), cohort means and ratios rounded to 6 dp like the
    operator."""
    from kafkastreamsproject_spark.plans.similarity import _SQL_KM_Q

    k, m = 16, 4
    return f"""
    WITH q AS (
      SELECT vec_id, {_SQL_KM_Q} AS qv FROM embeddings
    ),
    sub AS (
      SELECT vec_id,
             unnest(range(0, {m})) AS s,
             unnest(list_transform(range(0, {m}), s ->
               qv[(s * CAST(ceil(len(qv) / {m}.0) AS BIGINT) + 1):
                  least((s + 1) * CAST(ceil(len(qv) / {m}.0) AS BIGINT),
                        len(qv))])) AS sv
      FROM q
    ),
    cb AS (
      SELECT s, vec_id AS cid, sv AS cv FROM sub
      WHERE vec_id IN (SELECT vec_id FROM q WHERE vec_id % 2 = 0
                       ORDER BY vec_id LIMIT {k})
    ),
    err AS (
      SELECT sub.vec_id, sub.s,
             MIN(CAST(list_sum(list_transform(range(1, len(sub.sv) + 1),
                 i -> (sub.sv[i] - cb.cv[i]) * (sub.sv[i] - cb.cv[i])))
               AS BIGINT)) AS e
      FROM sub JOIN cb ON cb.s = sub.s
      GROUP BY 1, 2
    ),
    perv AS (SELECT vec_id, SUM(e) AS err2 FROM err GROUP BY 1),
    base AS (
      SELECT AVG(err2) AS b FROM perv WHERE vec_id % 2 = 0
    )
    SELECT c.cohort,
           c.n_vectors,
           ROUND(c.m, 6) AS mean_err2,
           ROUND(base.b, 6) AS baseline_err2,
           ROUND(c.m / base.b, 6) AS drift_ratio
    FROM (
      SELECT 'train' AS cohort, COUNT(*) AS n_vectors, AVG(err2) AS m
      FROM perv WHERE vec_id % 2 = 0
      UNION ALL
      SELECT 'holdout' AS cohort, COUNT(*) AS n_vectors, AVG(err2) AS m
      FROM perv WHERE vec_id % 2 = 1
    ) c CROSS JOIN base
    """


@register(
    "ann_codebook_drift",
    oracle_fn=_ann_drift_oracle,
    tags=("similarity", "ann", "streaming"),
    tier="shadow",
)
def ann_codebook_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental index's retrain gauge, oracle-checked (r14):
    a store's codebooks are FROZEN at creation, so as the ingested
    distribution drifts, PQ reconstruction error climbs and recall
    decays silently — queries still fill k, the answers are just
    worse.  ``codebook_drift`` prices a cohort's mean per-vector
    reconstruction error against the training-time baseline stamped
    by ``create_ann_store`` (``_ann_baseline.json``); a sustained
    ratio climb is the signal to retrain via ``rebuild_ann_store``,
    and ``ann_ingest_batch(max_drift_ratio=...)`` can enforce the
    bound AT ingest (refusing codes the codebooks can't represent —
    pytest-pinned).

    Here the store trains on the EVEN half of the corpus and both
    cohorts are measured: the train cohort must read exactly 1.0
    (its mean IS the baseline) and the holdout half prices the
    even/odd split's distribution gap.  The DuckDB oracle recomputes
    codebook construction, per-vector errors, baseline, and ratios
    independently.  Cost shape at scale: one batch pass per
    measurement (M·K broadcast distances per vector — the same work
    as encoding), no store reads at all."""
    from kafkastreamsproject_spark.streaming.annindex import (
        codebook_drift,
        create_ann_store,
        default_geometry,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    store = tempfile.mkdtemp(prefix="ann_drift_store_")
    try:
        create_ann_store(spark, store, even, **default_geometry())
        tr = codebook_drift(spark, store, even).withColumn(
            "cohort", F.lit("train")
        )
        ho = codebook_drift(spark, store, odd).withColumn(
            "cohort", F.lit("holdout")
        )
        return tr.unionByName(ho).select(
            "cohort", "n_vectors", "mean_err2", "baseline_err2",
            "drift_ratio",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)


# ---------------------------------------------------------------------------
# Boolean retrieval from the serving index (r14): must / should /
# must_not — eligibility restricts who returns, statistics stay
# corpus-wide, must_not vetoes without scoring.
# ---------------------------------------------------------------------------

_BOOL_MUST = ("vector", "hash")
_BOOL_SHOULD = ("stream",)
_BOOL_MUST_NOT = ("merge",)


def _bm25_boolean_oracle() -> str:
    """Batch recompute of the boolean semantics: tf per scoring term
    and per veto term from one tokenization pass, corpus-wide df/N/
    avgdl (the query_index convention — eligibility never changes
    what the statistics mean), WHERE = every must matched AND no
    must_not matched, score = the pinned BM25 sum over must+should."""
    terms = _BOOL_MUST + tuple(
        w for w in _BOOL_SHOULD if w not in _BOOL_MUST
    )
    toks = "string_split_regex(trim(text), ' +')"
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter({toks}, t -> t = '{w}')) AS DOUBLE) AS tf{i}"
        for i, w in enumerate(terms)
    )
    nf_cols = ",\n             ".join(
        f"CAST(len(list_filter({toks}, t -> t = '{w}')) AS DOUBLE) AS nf{i}"
        for i, w in enumerate(_BOOL_MUST_NOT)
    )
    df_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln((s.n_docs - s.df{i} + 0.5) / (s.df{i} + 0.5) + 1.0)"
        f" * (b.tf{i} * 2.2)"
        f" / (b.tf{i} + 1.2 * (0.25 + 0.75 * b.dl / s.avgdl))"
        for i in range(len(terms))
    )
    must_pred = " AND ".join(
        f"b.tf{i} > 0" for i in range(len(_BOOL_MUST))
    )
    veto_pred = " AND ".join(
        f"b.nf{i} = 0" for i in range(len(_BOOL_MUST_NOT))
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len({toks}) AS DOUBLE) AS dl,
             {tf_cols},
             {nf_cols}
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             SUM(dl) / COUNT(*) AS avgdl,
             {df_cols}
      FROM base
    )
    SELECT b.doc_id, ROUND({score}, 6) AS bm25
    FROM base b, stats s
    WHERE {must_pred} AND {veto_pred}
    """


@register(
    "bm25_boolean_query",
    oracle_fn=_bm25_boolean_oracle,
    tags=("text", "retrieval", "streaming"),
    tier="shadow",
)
def bm25_boolean_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean retrieval from the incrementally-maintained index
    (r14): docs containing BOTH must terms and NOT the veto term,
    scored by the standard BM25 sum over must+should — the
    Lucene-style filtered-search shape production search runs far
    more often than bag-of-terms.  One pushed ``t IN`` probe of the
    postings store feeds eligibility (count-distinct-must filter +
    must_not anti-join over 16 B/row slices) and scoring alike, so
    the boolean structure costs zero extra store scans; df/N/avgdl
    stay corpus-wide (the batch scorer's WHERE-clause convention),
    which the oracle verifies by recomputing scores — a wrong df
    convention would shift every float, not just membership."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.bm25index import (
        boolean_query_index,
        index_ingest_batch,
    )

    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "text"
    )
    store = tempfile.mkdtemp(prefix="bm25_boolean_store_")
    tables = [
        store_table_name("bm25_postings", f"{store}/postings"),
        store_table_name("bm25_seen", f"{store}/seen"),
    ]
    try:
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 0), store)
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 1), store)
        return boolean_query_index(
            spark,
            store,
            must=_BOOL_MUST,
            should=_BOOL_SHOULD,
            must_not=_BOOL_MUST_NOT,
        ).localCheckpoint(eager=True)
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


# ---------------------------------------------------------------------------
# Versioned serving (r14): the atomic reader swap around a rebuild,
# proven cross-engine — phase 1 serves the published v0001 (full
# corpus), phase 2 serves the published rebuild (survivors,
# codebooks retrained); both resolved through the SAME base-path
# pointer the readers use.
# ---------------------------------------------------------------------------


def _ann_versioned_oracle() -> str:
    """Phase 1 = the full-corpus batch IVF-PQ; phase 2 = the
    survivors-retrained recompute (`_ann_rebuild_oracle`) — if the
    pointer swap served the wrong directory in either phase, that
    phase's rows change wholesale."""
    full = _ivf_pq_store_sql(c=8, k=16, m=4, nprobe=2, nq=10, topk=5)
    return f"""
    SELECT 1 AS phase, f.* FROM ({full}) f
    UNION ALL
    SELECT 2 AS phase, r.* FROM ({_ann_rebuild_oracle()}) r
    """


@register(
    "ann_versioned_serving",
    oracle_fn=_ann_versioned_oracle,
    tags=("similarity", "ann", "streaming", "gdpr"),
    tier="shadow",
)
def ann_versioned_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned-rebuild deployment loop end-to-end (r14): build
    the index under ``base/v0001`` and publish it (readers resolve
    the ``_current`` pointer — sources/bucketed.py), serve the
    standard queries (phase 1), then run the GDPR codebook-retrain
    rebuild THROUGH ``rebuild_and_publish_ann_store`` — the new
    version builds out of band, the one-file pointer write is the
    commit point — and serve again (phase 2), resolving the SAME
    base path both times.  Victim 2 is a codebook training vector,
    so phase 2's store differs down to the centroids; victims gone,
    survivors re-scored under retrained codebooks.

    The oracle recomputes both phases independently (full corpus /
    survivors-retrained), so a pointer that resolved to the wrong
    version in either phase shifts that phase's rows wholesale.
    Scale shape: the swap costs one small-file write whether the
    version holds 10³ or 10¹² rows; old versions persist as rollback
    targets until ``retire_store_versions``."""
    from kafkastreamsproject_spark.sources.bucketed import (
        publish_store_version,
        resolve_store_version,
        store_table_name,
    )
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_query_index,
        create_ann_store,
        rebuild_and_publish_ann_store,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    victims = spark.createDataFrame(
        [(v,) for v in _REBUILD_VICTIMS], "vec_id long"
    )
    base = tempfile.mkdtemp(prefix="ann_versioned_base_")
    tables = []
    q = emb.filter(F.col("vec_id") < 10)
    try:
        v1 = f"{base}/v0001"
        tables += [
            store_table_name("ann_codes", f"{v1}/codes"),
            store_table_name("ann_seen", f"{v1}/seen"),
        ]
        create_ann_store(
            spark, v1, emb, c_cells=8, k_codes=16, m_subspaces=4,
            n_buckets=8,
        )
        ann_ingest_batch(emb, v1)
        publish_store_version(spark, base, "v0001")
        phase1 = ann_query_index(
            spark, resolve_store_version(spark, base), q, k=5, nprobe=2
        )
        out = rebuild_and_publish_ann_store(
            spark, emb, victims, base,
            c_cells=8, k_codes=16, m_subspaces=4, n_buckets=8,
        )
        v2 = f"{base}/{out['version']}"
        tables += [
            store_table_name("ann_codes", f"{v2}/codes"),
            store_table_name("ann_seen", f"{v2}/seen"),
        ]
        phase2 = ann_query_index(
            spark, resolve_store_version(spark, base), q, k=5, nprobe=2
        )
        return phase1.withColumn(
            "phase", F.lit(1).cast("int")
        ).unionByName(phase2.withColumn("phase", F.lit(2).cast("int")))
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# Serving-store ops readout (r14): DESCRIBE for the index stores —
# substore row counts and pending logical deletes as a query, with
# every count oracle-checked against a corpus recompute.
# ---------------------------------------------------------------------------


def _store_stats_oracle() -> str:
    """Every row count re-derived from the corpus alone: postings =
    distinct (term, doc) pairs of the tokenization, the seen ledgers
    = corpus cardinalities, codes = M·N, the vecs sidecar = N, and
    each tombstone substore = its victim predicate's cardinality."""
    toks = "string_split_regex(trim(text), ' +')"
    return f"""
    WITH posting_count AS (
      SELECT COUNT(*) AS n FROM (
        SELECT DISTINCT doc_id, unnest({toks}) AS t FROM documents
      )
    ),
    doc_count AS (SELECT COUNT(*) AS n FROM documents),
    doc_victims AS (
      SELECT COUNT(*) AS n FROM documents WHERE doc_id % {_TOMB_BM_MOD} = 5
    ),
    vec_count AS (SELECT COUNT(*) AS n FROM embeddings),
    vec_victims AS (
      SELECT COUNT(*) AS n FROM embeddings
      WHERE vec_id % 9 = 4 AND vec_id >= 16
    )
    SELECT 'bm25' AS store, 'postings' AS substore,
           CAST(n AS BIGINT) AS n_rows FROM posting_count
    UNION ALL
    SELECT 'bm25', 'seen', CAST(n AS BIGINT) FROM doc_count
    UNION ALL
    SELECT 'bm25', 'tombstones', CAST(n AS BIGINT) FROM doc_victims
    UNION ALL
    SELECT 'ann', 'codes', CAST(4 * n AS BIGINT) FROM vec_count
    UNION ALL
    SELECT 'ann', 'seen', CAST(n AS BIGINT) FROM vec_count
    UNION ALL
    SELECT 'ann', 'vecs', CAST(n AS BIGINT) FROM vec_count
    UNION ALL
    SELECT 'ann', 'tombstones', CAST(n AS BIGINT) FROM vec_victims
    """


@register(
    "serving_store_stats",
    oracle_fn=_store_stats_oracle,
    tags=("streaming", "ops"),
    tier="shadow",
)
def serving_store_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ops readout across a small store fleet (r14): build the
    BM25 index and the sidecar-enabled ANN store, tombstone each
    store's standard victim set, and union their
    ``describe_store`` rows — which substores exist, how many rows
    each holds, how many logical deletes are pending — the question
    an on-call engineer (or the compaction scheduler) asks before
    trusting a store.  Every count is re-derived by the oracle from
    the corpus alone, so the readout is verified, not self-reported:
    a substore silently dropping or double-counting rows (the exact
    failure class the idempotency machinery guards) would surface
    here as a count mismatch.  The physical ``data_files`` column
    (the compaction trigger's input) is exercised by pytest instead —
    file counts are layout, not semantics."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        create_ann_store,
        default_geometry,
        tombstone_vectors_in_index,
    )
    from kafkastreamsproject_spark.streaming.bm25index import (
        index_ingest_batch,
        tombstone_docs_in_index,
    )
    from kafkastreamsproject_spark.streaming.storestats import (
        describe_store,
    )

    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "text"
    )
    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    bm_store = tempfile.mkdtemp(prefix="stats_bm25_store_")
    ann_store = tempfile.mkdtemp(prefix="stats_ann_store_")
    tables = [
        store_table_name("bm25_postings", f"{bm_store}/postings"),
        store_table_name("bm25_seen", f"{bm_store}/seen"),
        store_table_name("ann_codes", f"{ann_store}/codes"),
        store_table_name("ann_seen", f"{ann_store}/seen"),
        store_table_name("ann_vecs", f"{ann_store}/vecs"),
    ]
    try:
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 0), bm_store)
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 1), bm_store)
        tombstone_docs_in_index(
            spark,
            docs.filter(F.col("doc_id") % _TOMB_BM_MOD == 5)
            .select("doc_id"),
            bm_store,
        )
        create_ann_store(
            spark, ann_store, emb, **default_geometry(), store_vectors=True
        )
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), ann_store)
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), ann_store)
        tombstone_vectors_in_index(
            spark, emb.filter(_TOMB_SQL_PRED).select("vec_id"), ann_store
        )
        return (
            describe_store(spark, bm_store)
            .unionByName(describe_store(spark, ann_store))
            .select("store", "substore", F.col("rows").alias("n_rows"))
            .localCheckpoint(eager=True)
        )
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(bm_store, ignore_errors=True)
        shutil.rmtree(ann_store, ignore_errors=True)


# ---------------------------------------------------------------------------
# Reindex-upsert (r14): the recrawl/re-embedding shape —
# first-writer-wins drops changed content by design; upsert = forget
# arriving ids, fold as fresh, converging under at-least-once replay.
# ---------------------------------------------------------------------------

_UPSERT_DOC_MOD = 23  # recrawled docs: doc_id % 23 == 7
_UPSERT_DOC_SUFFIX = " vector vector hash"


def _bm25_upsert_oracle() -> str:
    """Batch BM25 over the UPDATED corpus (recrawled docs carry the
    appended text): the index after the upsert must score it exactly
    — tf of the changed docs, df of the touched terms, and avgdl all
    move."""
    from kafkastreamsproject_spark.plans.text import _bm25_sql

    sql = _bm25_sql()
    needle = "FROM documents"
    assert sql.count(needle) == 1, "oracle surgery expects one corpus read"
    return sql.replace(
        needle,
        f"""FROM (
      SELECT doc_id,
             CASE WHEN doc_id % {_UPSERT_DOC_MOD} = 7
                  THEN text || '{_UPSERT_DOC_SUFFIX}'
                  ELSE text END AS text
      FROM documents
    )""",
    )


@register(
    "bm25_reindex_upsert",
    oracle_fn=_bm25_upsert_oracle,
    tags=("text", "retrieval", "streaming", "cdc"),
    tier="shadow",
)
def bm25_reindex_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl-reindex through the serving index (r14): fold the
    corpus in two epochs, then every doc_id % 23 == 7 arrives AGAIN
    with changed text (a query-term-bearing suffix) through
    ``upsert_docs_in_index`` — the first-writer-wins ledger would
    drop the recrawl silently; the upsert forgets the arriving ids'
    old rows and folds the new text as fresh.  The DuckDB oracle is
    the batch BM25 over the UPDATED corpus, so the check asserts the
    full statistics cascade: the changed docs' tf, the touched
    terms' df, and the corpus avgdl all re-price — a stale ledger row
    or an orphaned old posting would shift floats everywhere.

    Scale shape: cost ∝ the arriving docs' terms' buckets (the
    bucket-local forget bound) plus the normal fold; converges under
    at-least-once replay (the forget re-runs as a no-op, the fold
    re-drops as seen)."""
    from kafkastreamsproject_spark.plans.text import _BM25_TERMS
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.bm25index import (
        index_ingest_batch,
        query_index,
        upsert_docs_in_index,
    )

    docs = fan_out(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "text"
    )
    store = tempfile.mkdtemp(prefix="bm25_upsert_store_")
    tables = [
        store_table_name("bm25_postings", f"{store}/postings"),
        store_table_name("bm25_seen", f"{store}/seen"),
    ]
    try:
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 0), store)
        index_ingest_batch(docs.filter(F.col("doc_id") % 2 == 1), store)
        recrawled = docs.filter(
            F.col("doc_id") % _UPSERT_DOC_MOD == 7
        ).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(_UPSERT_DOC_SUFFIX)).alias("text"),
        )
        upsert_docs_in_index(spark, recrawled, store)
        return query_index(spark, store, _BM25_TERMS).localCheckpoint(
            eager=True
        )
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)


#: re-embedded vectors: vec_id % 11 == 5, clear of the codebook
#: training prefix (< 16) — updating a training member's embedding
#: cannot update the codebook snapshot (the residue guard raises; a
#: bulk re-embedding retrains via rebuild_and_publish_ann_store)
_UPSERT_VEC_PRED = "vec_id % 11 = 5 AND vec_id >= 16"


def _ann_upsert_oracle() -> str:
    """Batch IVF-PQ over the re-embedded corpus (the changed vectors
    NEGATED — float-exact on both engines) under the ORIGINAL
    codebooks (training ids sit below the predicate, so first-C/K of
    the updated corpus == the store's frozen snapshot)."""
    inner = _ivf_pq_store_sql(c=8, k=16, m=4, nprobe=2, nq=10, topk=5)
    needle = "FROM embeddings"
    assert inner.count(needle) == 1, "oracle surgery expects one corpus read"
    return inner.replace(
        needle,
        f"""FROM (
      SELECT vec_id,
             CASE WHEN {_UPSERT_VEC_PRED}
                  THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS embedding
      FROM embeddings
    )""",
    )


@register(
    "ann_reindex_upsert",
    oracle_fn=_ann_upsert_oracle,
    tags=("similarity", "ann", "streaming", "cdc"),
    tier="shadow",
)
def ann_reindex_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-embedding reindex through the vector store (r14, the
    bm25_reindex_upsert twin): every vec_id % 11 == 5 (past the
    training prefix) arrives again NEGATED through
    ``upsert_vectors_in_index`` — old codes/ledger rows leave via the
    bucket-local forget, the new embeddings encode under the store's
    FROZEN codebooks.  The oracle recomputes the batch IVF-PQ over
    the re-embedded corpus with the original codebooks (training ids
    sit below the predicate), so cell re-assignment, code updates,
    and candidate membership are all verified — a vector left in its
    old cell would surface as a membership diff, a stale code as a
    distance diff."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_query_index,
        create_ann_store,
        default_geometry,
        upsert_vectors_in_index,
    )

    emb = fan_out(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "embedding"
    )
    updated = emb.select(
        "vec_id",
        F.when(
            F.expr(_UPSERT_VEC_PRED),
            F.transform("embedding", lambda x: -x),
        ).otherwise(F.col("embedding")).alias("embedding"),
    )
    store = tempfile.mkdtemp(prefix="ann_upsert_store_")
    tables = [
        store_table_name("ann_codes", f"{store}/codes"),
        store_table_name("ann_seen", f"{store}/seen"),
    ]
    try:
        create_ann_store(spark, store, emb, **default_geometry())
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), store)
        ann_ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), store)
        upsert_vectors_in_index(
            spark, updated.filter(F.expr(_UPSERT_VEC_PRED)), store
        )
        return ann_query_index(
            spark, store, updated.filter(F.col("vec_id") < 10),
            k=5, nprobe=2,
        )
    finally:
        for table in tables:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store, ignore_errors=True)
