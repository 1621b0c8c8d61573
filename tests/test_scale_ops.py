"""Scale-utility tests: salted join correctness, bucketed join planning."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from kafkastreamsproject_spark.operators.skew import salted_join
from kafkastreamsproject_spark.sources.bucketed import materialize_bucketed
from kafkastreamsproject_spark.sources.testdata import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")

    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q")
    ).first()
    salted = salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=4).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q")
    ).first()
    assert plain.n == salted.n
    assert plain.q == salted.q


def test_salted_left_join_preserves_unmatched(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey").distinct()
    plain = orders.join(li, orders.o_orderkey == li.l_orderkey, "left").filter(
        F.col("l_orderkey").isNull()
    ).count()
    salted = salted_join(orders, li, "o_orderkey", "l_orderkey", 4, "left").filter(
        F.col("l_orderkey").isNull()
    ).count()
    assert plain == salted  # 257 orders without lineitems at sf0.01


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    materialize_bucketed(li, "li_bucketed", "l_orderkey", 8)
    materialize_bucketed(orders, "orders_bucketed", "o_orderkey", 8)
    lb, ob = spark.table("li_bucketed"), spark.table("orders_bucketed")

    # disable broadcast so the join must pick a partitioned strategy
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == load_table(spark, "lineitem", sf_dir).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


# ---------------------------------------------------------------------------
# LSH recall / candidate-cost envelopes (VERDICT r1 item 5)
# ---------------------------------------------------------------------------


def test_minhash_recall_and_candidate_cost(spark, sf_dir):
    """MinHash-LSH banding must recover ≥0.9 of the true J≥0.5 pairs
    (ngram_jaccard_pairs is the exact same-threshold baseline), and its
    banding must be PRECISE — candidate pairs ≤ 2× confirmed pairs —
    or the confirmation join degenerates toward all-pairs at scale."""
    from kafkastreamsproject_spark.plans.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    mh = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(spark, sf_dir).collect()}
    exact = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(spark, sf_dir).collect()}
    recall = len(mh & exact) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.3f} < 0.9"

    # candidate-pair cost: rebuild the banding join without confirmation
    from kafkastreamsproject_spark.functions import hashing as H
    from kafkastreamsproject_spark.plans.dedup import _N_BANDS, _shingled_corpus2

    sigs = _shingled_corpus2(spark, sf_dir).select(
        "doc_id", *H.minhash_signature(F.col("hs"))
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.col(f"mh{2*b}").alias("h1"),
                F.col(f"mh{2*b+1}").alias("h2"),
            )
            for b in range(_N_BANDS)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id", "band.band_id", "band.h1", "band.h2"
    )
    a = bands.select(F.col("doc_id").alias("id_a"), "band_id", "h1", "h2")
    b = bands.select(
        F.col("doc_id").alias("id_b"),
        F.col("band_id").alias("band_id_b"),
        F.col("h1").alias("h1_b"),
        F.col("h2").alias("h2_b"),
    )
    n_cands = (
        a.join(
            b,
            (F.col("band_id") == F.col("band_id_b"))
            & (F.col("h1") == F.col("h1_b"))
            & (F.col("h2") == F.col("h2_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    assert n_cands <= 2 * len(mh), (n_cands, len(mh))


def test_banded_lsh_recall_on_planted_neardups(spark, sf_dir):
    """Banded (AND-OR) cosine LSH achieves ≥0.9 recall on genuine
    near-duplicates (cos ≥ 0.9 — the regime near-dup LSH is designed
    for; at cos 0.3 NO sublinear LSH reaches 0.9 recall, which is why
    ann_lsh_neardup documents itself as bucket-local).  Plants a noisy
    copy of every embedding, runs 4 bands × 6 planes, and asserts the
    planted pair is a candidate in ≥1 band for ≥90% of vectors while
    candidate volume stays ≪ all-pairs."""
    from kafkastreamsproject_spark.functions import vectors as V

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    shift = 10_000_000
    # deterministic jitter vector u (same for every row): component
    # 0.02·(((7j) mod 5) − 2) — small enough that cos(v, v+u) ≥ 0.9
    noisy = emb.select(
        (F.col("vec_id") + shift).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, j: x.cast("double") + 0.02 * (((j * 7) % 5) - 2).cast("double"),
        ).alias("embedding"),
    )
    both = emb.select("vec_id", "embedding").unionByName(noisy).persist()
    n = emb.count()

    # precondition: the planted pairs really are near-dups
    joined = emb.alias("o").join(
        noisy.withColumn("vec_id", F.col("vec_id") - shift).alias("p"), "vec_id"
    )
    min_cos = joined.select(
        F.min(V.cosine(F.col("o.embedding"), F.col("p.embedding"))).alias("m")
    ).first().m
    assert min_cos >= 0.9, min_cos

    n_bands, ppb = 4, 6
    banded = both.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bd).alias("band_id"),
                        V.lsh_band_bucket(F.col("embedding"), bd, ppb).alias("bkt"),
                    )
                    for bd in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band_id", "bb.bkt")

    a = banded.select(F.col("vec_id").alias("id_a"), "band_id", "bkt")
    bb = banded.select(
        F.col("vec_id").alias("id_b"),
        F.col("band_id").alias("band_id_b"),
        F.col("bkt").alias("bkt_b"),
    )
    cands = (
        a.join(
            bb,
            (F.col("band_id") == F.col("band_id_b"))
            & (F.col("bkt") == F.col("bkt_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
        .persist()
    )
    n_cands = cands.count()
    planted_found = cands.filter(F.col("id_b") - F.col("id_a") == shift).count()
    recall = planted_found / n
    all_pairs = (2 * n) * (2 * n - 1) // 2
    both.unpersist()
    cands.unpersist()
    assert recall >= 0.9, f"banded LSH recall {recall:.3f} < 0.9"
    assert n_cands <= 0.25 * all_pairs, (n_cands, all_pairs)


def test_adaptive_lsh_planes_hold_bucket_occupancy(spark, sf_dir, tmp_path):
    """The adaptive plane count (p = log2(n/32), floor 8) is the LSH
    family's scale contract: as the corpus grows, p grows so that mean
    bucket occupancy — and with it Σ bucket², the candidate-pair cost —
    stays ~linear in n instead of quadratic.  Replicates embeddings 40×
    (circularly rotated per replica so replicas hash independently),
    then asserts (a) Spark and the DuckDB oracle SQL agree bucket-by-
    bucket at the ADAPTIVE p (>8 here — the masked-unroll SQL path is
    actually exercised), and (b) adaptive p cuts Σ bucket² vs fixed p=8
    by at least the 2^(p-8) uniform-model factor's half."""
    import duckdb

    from kafkastreamsproject_spark.functions import vectors as V

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    n_rep, dim = 40, 64
    reps = []
    for i in range(n_rep):
        rot = i % dim
        rotated = (
            F.concat(
                F.slice("embedding", rot + 1, dim - rot),
                F.slice("embedding", 1, rot),
            )
            if rot
            else F.col("embedding")
        )
        reps.append(
            emb.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                rotated.alias("embedding"),
            )
        )
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    out = str(tmp_path / "emb40.parquet")
    big.coalesce(4).write.mode("overwrite").parquet(out)

    n = spark.read.parquet(out).count()
    p = V.adaptive_n_planes(n)
    assert p > 8, (n, p)  # the adaptive path must actually engage

    def histogram(n_planes):
        return {
            r.bucket: r.n
            for r in spark.read.parquet(out)
            .groupBy(V.lsh_bucket(F.col("embedding"), n_planes).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    got = histogram(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{out}/*.parquet'")
    want = dict(
        con.execute(
            f"SELECT {V.sql_lsh_bucket_adaptive('embedding', V.sql_adaptive_n_planes())} "
            f"AS bucket, COUNT(*) FROM embeddings GROUP BY 1"
        ).fetchall()
    )
    con.close()
    assert got == want

    fixed = histogram(8)
    cost = lambda h: sum(v * v for v in h.values())  # noqa: E731
    # Under the uniform model Σb² shrinks 2^(p-8)×; real buckets are
    # cluster-skewed and tight clusters (genuine near-dups, cos≈1) sit
    # in one bucket at ANY p — only the non-cluster mass splits.  So
    # demand a meaningful but skew-tolerant cut vs fixed p=8, plus
    # strictly more distinct buckets (the splittable mass did split).
    assert cost(got) <= 0.8 * cost(fixed), (cost(got), cost(fixed), p)
    assert len(got) > len(fixed), (len(got), len(fixed))


def test_connected_components_long_chain_and_cliques(spark):
    """connected_components on a 20-node CHAIN (diameter 19 — min-label
    needs many propagation rounds, forcing the lineage-checkpoint path
    at checkpoint_every=3) plus two disjoint triangles; every node must
    land in the component of its minimum reachable id."""
    from kafkastreamsproject_spark.functions.clustering import connected_components
    from kafkastreamsproject_spark.operators.cache import release_persisted

    chain = [(i, i + 1) for i in range(100, 119)]  # one 20-node chain
    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(7, 8), (8, 9), (9, 7)]
    edges = spark.createDataFrame(chain + tri1 + tri2, ["id_a", "id_b"])

    got = {
        r.node: r.component
        for r in connected_components(edges, checkpoint_every=3).collect()
    }
    release_persisted()
    want = {n: 100 for n in range(100, 120)}
    want.update({1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7})
    assert got == want


def test_connected_components_raises_on_iteration_exhaustion(spark):
    """An exhausted iteration budget means WRONG labels (a long chain
    still carries several per component) — the round-2 advice case.  It
    must raise, not silently return corrupt clusters; and with cache
    handles cleaned up on the error path."""
    import pytest

    from kafkastreamsproject_spark.functions.clustering import connected_components
    from kafkastreamsproject_spark.operators.cache import cache_scope

    chain = [(i, i + 1) for i in range(100, 119)]  # diameter 19 > budget 3
    edges = spark.createDataFrame(chain, ["id_a", "id_b"])
    with cache_scope():
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, max_iterations=3).collect()


def test_cache_scope_releases_only_inner_handles(spark):
    """cache_scope unpersists exactly what was persisted inside the
    block, leaving pre-existing live handles alone — the deterministic
    release path for non-registry callers (round-2 advice)."""
    from kafkastreamsproject_spark.operators.cache import (
        _LIVE,
        cache_scope,
        release_persisted,
        scoped_persist,
    )

    release_persisted()
    outer = scoped_persist(spark.range(10))
    outer.count()
    with cache_scope():
        inner = scoped_persist(spark.range(20))
        inner.count()
        assert inner.is_cached and outer.is_cached
    assert not inner.is_cached, "inner handle must be released on scope exit"
    assert outer.is_cached, "pre-existing handle must survive the scope"
    assert _LIVE == [outer]
    release_persisted()


def test_blocked_self_pairs_equals_naive_join(spark):
    """Triangle-blocked pair generation is row-identical to the naive
    within-bucket self-join for every block count, on deliberately
    skewed buckets (one hot bucket ≫ the rest), including payload
    columns and the canonical id_a < id_b order."""
    import pandas as pd

    from kafkastreamsproject_spark.operators.selfjoin import (
        blocked_self_pairs,
        n_blocks_for,
    )

    # 1 hot bucket (60 rows) + 10 cold buckets (3 rows each); payload
    # is a value column so the swap path is exercised end-to-end.
    rows = [(i, 0, i * 7 % 101) for i in range(60)]
    rows += [(100 + b * 10 + j, b, j) for b in range(1, 11) for j in range(3)]
    df = spark.createDataFrame(rows, "id long, bucket int, val long")

    a = df.select(
        F.col("id").alias("id_a"), "bucket", F.col("val").alias("val_a")
    )
    b = df.select(
        F.col("id").alias("id_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("val").alias("val_b"),
    )
    naive = (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("id_a") < F.col("id_b")))
        .select("bucket", "id_a", "id_b", "val_a", "val_b")
        .toPandas()
        .sort_values(["bucket", "id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(naive) == 60 * 59 // 2 + 10 * 3  # sanity: skew is real

    for n_blocks in (1, 3, 8):
        blocked = (
            blocked_self_pairs(df, "bucket", "id", n_blocks)
            .select(
                "bucket",
                F.col("id_a"),
                F.col("id_b"),
                "val_a",
                "val_b",
            )
            .toPandas()
            .sort_values(["bucket", "id_a", "id_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(naive, blocked, check_dtype=False)

    # block-count sizing: no blocking until a bucket exceeds the target,
    # then ceil-scaled, then capped
    assert n_blocks_for(100) == 1
    assert n_blocks_for(4096) == 1
    assert n_blocks_for(8000) == 2
    assert n_blocks_for(10**9) == 16


def test_blocked_self_pairs_bounds_task_width(spark):
    """The physical join key includes the block pair: with B blocks a
    hot bucket's pairs spread over B(B+1)/2 distinct shuffle keys
    instead of 1 (the whole point — AQE cannot split one key's rows)."""
    from kafkastreamsproject_spark.operators.selfjoin import blocked_self_pairs

    df = spark.createDataFrame(
        [(i, 0, 0) for i in range(200)], "id long, bucket int, val long"
    )
    pairs = blocked_self_pairs(df, "bucket", "id", 4)
    # count distinct physical task keys seen by the join
    keyed = (
        df.withColumn(
            "__blk", F.pmod(F.xxhash64("id"), F.lit(4)).cast("int")
        )
        .groupBy("__blk")
        .count()
    )
    sizes = {r["__blk"]: r["count"] for r in keyed.collect()}
    assert len(sizes) == 4  # hash spreads ids over all blocks
    # every pair appears exactly once
    assert pairs.count() == 200 * 199 // 2
    assert pairs.filter(F.col("id_a") >= F.col("id_b")).count() == 0


def test_cdc_selection_is_alignment_robust_where_grid_is_not(spark):
    """The chunk-dedup family's alignment contract, pinned on planted
    docs: a 30-token passage at offset 0 in doc1 and offset 5 in doc2
    (5 is not congruent to 0 mod the stride of 10) shares ZERO windows
    under the fixed strided grid, but the content-defined mod-p
    selection (cdc_chunk_dedup_stats' device) still finds shared
    windows — selection follows content, not position."""
    from kafkastreamsproject_spark.functions import text as TX

    passage = [f"p{i}" for i in range(30)]
    doc1 = " ".join(passage + [f"x{i}" for i in range(10)])
    doc2 = " ".join([f"y{i}" for i in range(5)] + passage + [f"z{i}" for i in range(5)])
    df = spark.createDataFrame([(1, doc1), (2, doc2)], "doc_id long, text string")
    toks = TX.tokens(F.col("text"))

    def hashes(step):
        return F.transform(
            F.sequence(F.lit(1), F.size(toks) - 19, F.lit(step)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, 20))),
        )

    strided = df.select("doc_id", F.explode(hashes(10)).alias("h"))
    a = {r.h for r in strided.filter("doc_id = 1").collect()}
    b = {r.h for r in strided.filter("doc_id = 2").collect()}
    assert not (a & b), "grid should be blind to the misaligned passage"

    cdc = df.select("doc_id", F.explode(hashes(1)).alias("h")).filter(
        F.conv(F.substring("h", 1, 8), 16, 10).cast("long") % 4 == 0
    )
    ea = {r.h for r in cdc.filter("doc_id = 1").collect()}
    eb = {r.h for r in cdc.filter("doc_id = 2").collect()}
    assert ea & eb, "content-defined selection must catch it at any alignment"


def test_kmeans_lloyd_semantics(spark, sf_dir):
    """Lloyd-step invariants beyond the oracle compare: every vector is
    labeled once, init vectors self-assign at distance 0 in iteration 1,
    cluster ids stay within the K init ids, and the update step did not
    worsen total within-cluster cost on the fixture (true Lloyd
    monotonicity up to the documented centroid re-quantization, which
    perturbs each dimension by at most half a code unit)."""
    from kafkastreamsproject_spark.plans.similarity import _KM_K, kmeans_int8_lloyd

    out = kmeans_int8_lloyd(spark, sf_dir).collect()
    n_vecs = len({r.vec_id for r in out})
    assert len(out) == n_vecs
    for r in out:
        if r.vec_id < _KM_K:
            assert r.cid1 == r.vec_id and r.dist2_1 == 0
        assert 0 <= r.cid1 < _KM_K and 0 <= r.cid2 < _KM_K
    assert sum(r.dist2_2 for r in out) <= sum(r.dist2_1 for r in out)


def test_bucketed_prefix_max_equals_global_window(spark):
    """The two-level prefix scan must equal the single-partition window
    formulation exactly — including null (no predecessor) and bucket
    boundaries — for several bucket widths."""
    from pyspark.sql import Window as W

    from kafkastreamsproject_spark.operators.prefixscan import (
        bucketed_prefix_max,
    )

    rows = [(float(k * 37 % 101), float((k * 17) % 23)) for k in range(101)]
    df = spark.createDataFrame(rows, ["k", "v"])

    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
    want = {
        r["k"]: r["want"]
        for r in df.select("k", F.max("v").over(w).alias("want")).collect()
    }
    for width in (1.0, 7.0, 1000.0):
        got = bucketed_prefix_max(df, "k", "v", width).collect()
        assert len(got) == len(want)
        for r in got:
            assert r["prev_max"] == want[r["k"]], (width, r["k"])


def test_bucketed_rank_equals_global_row_number(spark):
    """bucketed_rank must reproduce ROW_NUMBER() OVER (ORDER BY v
    [DESC], tiebreak) exactly — ties, duplicate values, both
    directions, and bucket counts that under- and over-partition."""
    from pyspark.sql import Window as W

    from kafkastreamsproject_spark.operators.prefixscan import bucketed_rank

    rows = [(float((k * 37) % 11), k) for k in range(97)]  # heavy ties
    df = spark.createDataFrame(rows, ["v", "id"])
    for ascending in (True, False):
        order = (
            [F.col("v").asc(), F.col("id").asc()]
            if ascending
            else [F.col("v").desc(), F.col("id").asc()]
        )
        want = {
            r["id"]: r["rk"]
            for r in df.select(
                "id", F.row_number().over(W.orderBy(*order)).alias("rk")
            ).collect()
        }
        for nb in (1, 5, 64, 1000):
            got = bucketed_rank(
                df, "v", "id", ascending=ascending, n_buckets=nb
            ).collect()
            assert len(got) == len(want)
            for r in got:
                assert r["rk"] == want[r["id"]], (ascending, nb, r["id"])


def test_ntile_from_rank_equals_sql_ntile(spark):
    """ntile_from_rank(rk, n, t) must equal NTILE(t) for every row
    count (including n < t) and several tile counts."""
    from pyspark.sql import Window as W

    from kafkastreamsproject_spark.operators.prefixscan import ntile_from_rank

    for n in (1, 2, 3, 4, 5, 10, 11, 97):
        df = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["id"])
        for t in (2, 4, 7):
            w = W.orderBy("id")
            got = df.select(
                "id",
                F.ntile(t).over(w).alias("want"),
                ntile_from_rank(
                    F.row_number().over(w), F.lit(n), t
                ).cast("int").alias("got"),
            ).collect()
            for r in got:
                assert r["got"] == r["want"], (n, t, r["id"])


def test_bucketed_running_sum_equals_global_window(spark):
    """The day-partitioned sweep with carry-in must equal the
    single-partition running sum exactly, including negative deltas
    and multi-row order keys."""
    from pyspark.sql import Window as W

    from kafkastreamsproject_spark.operators.prefixscan import (
        bucketed_running_sum,
    )

    rows = [
        (k % 7, float(k * 13 % 29), 1 if k % 3 else -1, k)
        for k in range(120)
    ]
    df = spark.createDataFrame(rows, ["day", "t", "delta", "id"])

    w = W.orderBy("day", "t", "delta", "id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    want = {
        r["id"]: r["want"]
        for r in df.select("id", F.sum("delta").over(w).alias("want")).collect()
    }
    got = bucketed_running_sum(
        df, "day", [F.col("t"), F.col("delta"), F.col("id")], "delta",
        out_col="run",
    ).collect()
    assert len(got) == len(want)
    for r in got:
        assert r["run"] == want[r["id"]], r["id"]


def test_top_k_matches_window_idiom_and_plans_take_ordered(spark):
    """top_k must equal the row_number-window top-k on values AND rank,
    while planning as TakeOrderedAndProject (no global sort task)."""
    from pyspark.sql import Window as W

    from kafkastreamsproject_spark.operators.topk import top_k

    rows = [(float((k * 37) % 13), k) for k in range(200)]
    df = spark.createDataFrame(rows, ["v", "id"]).repartition(8)
    order = [F.col("v").desc(), F.col("id").asc()]

    w = W.orderBy(*order)
    want = sorted(
        (r["id"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 25)
        .collect()
    )
    out = top_k(df, order, 25, rank_col="rk")
    got = sorted((r["id"], r["rk"]) for r in out.collect())
    assert got == want

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.orderBy(*order).limit(25).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_cms_estimate_never_underestimates(spark, sf_dir):
    """Count-min's one-sided error guarantee: for EVERY token the
    sketch estimate is >= the exact count (and equals it when no
    collision landed in all d counters)."""
    from kafkastreamsproject_spark.plans.registry import shadow_queries

    df = shadow_queries()["cms_token_freq"].spark(spark, sf_dir)
    bad = df.filter(F.col("overestimate") < 0).count()
    assert bad == 0
    # the sketch is deliberately narrow (w=64) — at least one token
    # must actually collide or the fixture isn't exercising the
    # estimator at all
    assert df.filter(F.col("overestimate") > 0).count() > 0


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Multi-probe candidates are a strict superset of the single-probe
    bucket, so per query BOTH n_candidates and n_hits must be >= the
    single-probe run (the measured trade-off ann_multiprobe_recall's
    docstring states)."""
    from kafkastreamsproject_spark.plans.registry import shadow_queries

    S = shadow_queries()
    single = {
        r["query_id"]: (r["n_candidates"], r["n_hits"])
        for r in S["ann_lsh_recall"].spark(spark, sf_dir).collect()
    }
    multi = {
        r["query_id"]: (r["n_candidates"], r["n_hits"])
        for r in S["ann_multiprobe_recall"].spark(spark, sf_dir).collect()
    }
    assert set(single) == set(multi)
    for qid, (nc1, nh1) in single.items():
        nc2, nh2 = multi[qid]
        assert nc2 >= nc1, qid
        assert nh2 >= nh1, qid


def test_expectations_count_planted_violations(spark):
    """Each check kind counts exactly its planted offenders, and the
    whole row-local battery compiles into ONE aggregate pass."""
    from kafkastreamsproject_spark.operators import expectations as X

    rows = [
        (1, 10.0, "A"),
        (1, 20.0, "B"),      # duplicate id → unique violation
        (None, 30.0, "A"),   # null id → not_null violation
        (3, -5.0, "A"),      # below range
        (4, 50.0, "Z"),      # unaccepted value
        (9, 60.0, "B"),      # id 9 absent from dim → fk violation
    ]
    df = spark.createDataFrame(rows, "id int, price double, status string")
    dim = spark.createDataFrame([(1,), (3,), (4,)], "k int")
    got = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in X.run_expectations(
            df,
            [
                X.not_null("id"),
                X.unique("id"),
                X.in_range("price", 0, 100),
                X.accepted("status", ("A", "B")),
                X.fk("id", dim, "k"),
            ],
        ).collect()
    }
    assert got["not_null_id"] == (1, False)
    assert got["unique_id"] == (1, False)        # 5 non-null ids, 4 distinct
    assert got["range_price"] == (1, False)
    assert got["accepted_status"] == (1, False)
    assert got["fk_id"] == (1, False)            # id 9 orphaned

    clean = spark.createDataFrame([(1, 1.0, "A")], "id int, price double, status string")
    all_pass = X.run_expectations(
        clean, [X.not_null("id"), X.in_range("price", 0, 2)]
    ).collect()
    assert all(r["passed"] for r in all_pass)


def test_expectations_quote_in_column_name_cannot_inject(spark):
    """Check names interpolate into a stack() SQL expression; a column
    name carrying a quote (legal in Spark via backticks) must come out
    as data, not as a broken/injected fragment (ADVICE r7)."""
    from pyspark.sql import functions as F

    from kafkastreamsproject_spark.operators import expectations as X

    df = spark.createDataFrame([(1,), (None,)], "id int").select(
        F.col("id").alias("o'brien")
    )
    got = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in X.run_expectations(df, [X.not_null("o'brien")]).collect()
    }
    assert got["not_null_o'brien"] == (1, False)


def test_skyline_operator_exact_and_blockcount_invariant(spark):
    """The two-phase distributed skyline equals the brute-force
    reference and is invariant to the block count (partitioning must
    not change the answer)."""
    import random

    from kafkastreamsproject_spark.operators.skyline import (
        brute_force_skyline,
        skyline,
    )

    rng = random.Random(7)
    rows = [
        (
            float(rng.randint(0, 30)),
            float(rng.randint(0, 30)),
            float(rng.randint(0, 5)),
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "p double, q double, d double")
    want = brute_force_skyline(rows, ["min", "max", "max"])
    for n_blocks in (1, 4, 32):
        got = {
            (r["p"], r["q"], r["d"])
            for r in skyline(
                df, {"p": "min", "q": "max", "d": "max"}, n_blocks=n_blocks
            ).collect()
        }
        assert got == want, n_blocks


def test_residual_rerank_reaches_ceiling_plain_does_not(spark):
    """The composed production ANN stack (IVF -> residual-PQ ADC ->
    exact rerank) vs the plain-PQ variant on the same R grid: both
    share the coarse quantizer, so the candidate ceiling is identical
    by construction; the residual encoding must (a) dominate at the
    tight shortlists (R=25, 50) where ADC ordering is binding, (b) be
    at least as close to the candidate ceiling at R_max and nearly
    close the gap, and (c) not lose on the whole-curve mean.
    Mid-curve single-hit crossings (R=100) are allowed — the operating
    answer is the tight-R and ceiling behavior, not every interior
    point.  Pinned to sf0.01: the ~60-vector sf0.001 fixture is too
    small for a stable tail readout (one hit flips 0.04 of recall)."""
    from kafkastreamsproject_spark.plans.registry import shadow_queries

    sq = shadow_queries()
    curves = {}
    for name in ("ivf_pq_rerank_r_curve", "ivf_pq_residual_rerank_r_curve"):
        pdf = sq[name].spark(spark, "/root/testdata/sf0.01").toPandas()
        curves[name] = {
            int(r): (
                float(g["rerank_recall_at_5"].mean()),
                float(g["cand_recall_at_5"].mean()),
            )
            for r, g in pdf.groupby("shortlist_r")
        }
    plain = curves["ivf_pq_rerank_r_curve"]
    res = curves["ivf_pq_residual_rerank_r_curve"]
    assert set(plain) == set(res)
    rs = sorted(plain)
    # identical coarse quantizer => identical candidate ceiling
    for r in rs:
        assert abs(plain[r][1] - res[r][1]) < 1e-9
    ceiling = res[rs[-1]][1]
    # (a) tight-R dominance
    for r in rs[:2]:
        assert res[r][0] >= plain[r][0], (r, res[r], plain[r])
    # (b) at R_max the residual stack is at least as close to the
    # candidate ceiling as plain, and nearly closes the gap (exactly
    # closes it at sf0.01; within 0.05 at the tiny test fixture)
    assert res[rs[-1]][0] >= plain[rs[-1]][0]
    assert ceiling - res[rs[-1]][0] <= 0.05
    # (c) whole-curve mean dominance
    assert sum(res[r][0] for r in rs) >= sum(plain[r][0] for r in rs)


def test_bucketed_warehouse_join_query_single_exchange(spark, sf_dir):
    """The REGISTERED bucketed-join query (plans/relational.py:
    bucketed_warehouse_join) must keep the technique's plan guarantee:
    the lineitem⋈orders SortMergeJoin reads co-located buckets, so the
    whole query's only Exchange is the final tiny aggregation — zero
    shuffles attributable to the fact-table join.  (The query
    localCheckpoints its result and drops the warehouse tables, so the
    plan is captured on an equivalent in-scope rebuild.)"""
    import re

    from kafkastreamsproject_spark.sources.bucketed import store_table_name

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority"
    )
    li_name = store_table_name("whtest_li", sf_dir)
    ord_name = store_table_name("whtest_orders", sf_dir)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        materialize_bucketed(li, li_name, "l_orderkey", 8)
        materialize_bucketed(orders, ord_name, "o_orderkey", 8)
        lb, ob = spark.table(li_name), spark.table(ord_name)
        out = (
            lb.join(ob, lb.l_orderkey == ob.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"))
        )
        plan = _plan(out)
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchange == 1, plan  # only the final aggregation
        assert out.count() == 5
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {li_name}")
        spark.sql(f"DROP TABLE IF EXISTS {ord_name}")


def test_aqe_splits_planted_skew_join(spark, sf_dir):
    """AQE's runtime skew-join split — the zero-code answer to hot
    keys that complements the explicit salted_join: plant a hot key
    carrying 60% of lineitem, lower the skew thresholds to fixture
    scale, and the FINAL adaptive plan must run
    SortMergeJoin(skew=true) over an 'AQEShuffleRead skewed' — the
    hot partition split across mapper ranges at runtime, no manual
    salting.  (Detection needs >1 map task per side: a single-mapper
    shuffle partition has no ranges to split — fan_out provides the
    mappers, same reason it exists for the signature pipeline.)
    Row count is pinned to the unskewed-plan join to prove the split
    changes the schedule, not the result."""
    from kafkastreamsproject_spark.sources.testdata import fan_out

    li = fan_out(load_table(spark, "lineitem", sf_dir)).select(
        F.when(F.col("l_orderkey") % 5 < 3, F.lit(42))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_quantity",
    )
    orders = fan_out(load_table(spark, "orders", sf_dir)).select(
        F.col("o_orderkey").alias("k2"), "o_totalprice"
    )
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8192",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8192",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = li.join(orders, li.k == orders.k2)
        n = len(j.collect())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
        # 60% of lineitem hits key 42; orders has each key once, so the
        # join count equals |lineitem|
        assert n == load_table(spark, "lineitem", sf_dir).count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cosine_prenormed_bit_identical_to_inline(spark, sf_dir):
    """The r15 norm-CSE contract: cosine_prenormed(a, b, norm(a),
    norm(b)) is the SAME expression tree as cosine(a, b) — dot/(na·nb)
    over the same doubles — so the scores must be bit-identical (not
    approximately equal) on every pair.  Pins the equivalence the
    rewritten pair-scoring queries (ann_topk_cosine, ann_lsh_neardup,
    neardup_cosine_pairs, the recall twins' exact arms) rely on."""
    from kafkastreamsproject_spark.functions import vectors as V

    emb = load_table(spark, "embeddings", sf_dir).limit(40)
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("e_a"),
        V.norm(F.col("embedding")).alias("n_a"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("e_b"),
        V.norm(F.col("embedding")).alias("n_b"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    both = pairs.select(
        "id_a",
        "id_b",
        V.cosine(F.col("e_a"), F.col("e_b")).alias("inline"),
        V.cosine_prenormed(
            F.col("e_a"), F.col("e_b"), F.col("n_a"), F.col("n_b")
        ).alias("prenormed"),
    ).collect()
    assert both, "no pairs scored"
    import math

    for r in both:
        # NaN-aware equality (r15 ADVICE): a zero-norm embedding makes
        # BOTH expressions NaN — the two sides still agree, but
        # float == would fail; NULLs must match as NULLs too
        same = (
            r.inline == r.prenormed
            or (r.inline is None and r.prenormed is None)
            or (
                r.inline is not None
                and r.prenormed is not None
                and math.isnan(r.inline)
                and math.isnan(r.prenormed)
            )
        )
        assert same, (r.id_a, r.id_b, r.inline, r.prenormed)
