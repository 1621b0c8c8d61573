"""End-to-end curation funnel (pipelines/curation.py): each stage drops
exactly the planted offenders, the survivors pack within budget, and no
near-dup pair survives."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafkastreamsproject_spark.pipelines.curation import curate_corpus

# ≥5 tokens each (shingle width).  Vocabulary chosen so quality and
# lang-ID behave predictably: 'the'/'a' are stopword/en markers.
_GOOD_EN = "the quick brown fox jumps over a lazy dog near the river bank today"
_GOOD_EN2 = "another perfectly reasonable document with the varied tokens a reader expects here"
_NEAR_DUP = "the quick brown fox jumps over a lazy dog near the river bank tomorrow"
_EXACT_DUP = _GOOD_EN
_LOW_QUALITY = "spam spam spam spam spam spam spam spam spam spam spam spam"
_FRENCH = "le merge le merge la table le merge la vitesse le merge encore la"
_HELD_OUT = "completely unique holdout evaluation sentence nothing else repeats this exact phrasing anywhere"
_CONTAMINATED = _HELD_OUT + " extra"


def test_curation_funnel_drops_each_offender_class(spark):
    rows = [
        (1, _GOOD_EN),
        (2, _GOOD_EN2),
        (3, _EXACT_DUP),     # exact dup of 1 → stage 1
        (4, _NEAR_DUP),      # near dup of 1 → stage 2
        (5, _LOW_QUALITY),   # degenerate TTR → stage 3
        (6, _FRENCH),        # lang filter → stage 4
        (7, _CONTAMINATED),  # overlaps holdout → stage 5
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    holdout = spark.createDataFrame([(100, _HELD_OUT)], "doc_id long, text string")

    packed, stats = curate_corpus(
        docs,
        quality_min=0.5,
        langs=("en",),
        holdout=holdout,
        containment_max=0.5,
        pack_budget=64,
    )
    survivors = sorted(r.doc_id for r in packed.select("doc_id").collect())
    assert survivors == [1, 2], (survivors, stats)

    assert stats.input == 7
    assert stats.after_exact_dedup == 6        # dropped 3
    assert stats.after_neardup_dedup == 5      # dropped 4
    assert stats.after_quality == 4            # dropped 5
    assert stats.after_lang == 3               # dropped 6
    assert stats.after_decontamination == 2    # dropped 7
    assert stats.packs >= 1

    # packing invariant: within budget unless flagged overflow
    bad = packed.filter((F.col("pack_tokens") > 64) & (~F.col("overflow"))).count()
    assert bad == 0


def test_curation_on_real_corpus_is_neardup_free(spark, sf_dir):
    """Run the funnel over the documents table doubled with planted
    exact copies; verify the output carries no exact dups and no
    confirmed near-dup pair (the pipeline's core guarantee)."""
    from kafkastreamsproject_spark.streaming.neardup import (
        _confirmed_pairs,
        doc_signatures,
    )
    from kafkastreamsproject_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    packed, stats = curate_corpus(doubled, quality_min=0.0, pack_budget=4096)

    assert stats.after_exact_dedup == stats.input // 2  # every copy dropped
    survivors = packed.select("doc_id")
    kept_docs = doubled.join(survivors, "doc_id", "left_semi")
    sigs = doc_signatures(kept_docs).persist()
    leftover_pairs = _confirmed_pairs(sigs, sigs, within_batch=True).count()
    sigs.unpersist()
    assert leftover_pairs == 0, "near-dup pair survived curation"
    # every doc appears exactly once in the packing assignment
    assert packed.count() == packed.select("doc_id").distinct().count()


def test_curation_edge_cases(spark):
    """Degenerate corpora must flow through, not crash: empty input,
    docs below the shingle width (no signatures → kept, near-dup stage
    is a no-op for them), and an all-identical corpus collapsing to one
    survivor."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    packed, stats = curate_corpus(empty, quality_min=0.0)
    assert stats.input == 0 and packed.count() == 0

    tiny = spark.createDataFrame(
        [(1, "too short"), (2, "also brief")], "doc_id long, text string"
    )
    packed, stats = curate_corpus(tiny, quality_min=0.0)
    assert sorted(r.doc_id for r in packed.select("doc_id").collect()) == [1, 2]

    same = spark.createDataFrame(
        [(i, _GOOD_EN) for i in range(5)], "doc_id long, text string"
    )
    packed, stats = curate_corpus(same, quality_min=0.0)
    assert stats.after_exact_dedup == 1
    assert [r.doc_id for r in packed.select("doc_id").collect()] == [0]


def test_write_training_shards_roundtrip(spark, sf_dir, tmp_path):
    """Shard writer: one directory per shard, every packed doc present
    exactly once with its body, pack-contiguous row order."""
    from kafkastreamsproject_spark.pipelines.curation import write_training_shards
    from kafkastreamsproject_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    packed, _ = curate_corpus(docs, quality_min=0.0, pack_budget=1024)
    out = str(tmp_path / "shards")
    write_training_shards(packed, docs, out)

    back = spark.read.parquet(out)
    assert back.count() == packed.count()
    assert back.select("doc_id").distinct().count() == packed.count()
    assert "text" in back.columns and "pack_tokens" in back.columns
    shard_dirs = [p.name for p in (tmp_path / "shards").iterdir()
                  if p.name.startswith("shard_id=")]
    assert len(shard_dirs) == packed.select("shard_id").distinct().count()


def _mix_keep(doc_id: int, rate_m: int) -> bool:
    """Python replica of the portable md5 hash-Bernoulli the mixture
    stage (and plans/llmdata.py's mixture_sample) computes."""
    import hashlib

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 1000 < rate_m


def test_curation_mixture_stage_planted_offenders(spark):
    """Mixture stage: rate-0 source fully dropped, rate-1000 source
    fully kept, mid-rate source keeps exactly the docs the portable
    hash predicts, an UNLISTED source is dropped, and the selection is
    invariant under repartitioning (reproducible mixture)."""
    srcs = ["keep_all", "drop_all", "half", "unlisted"]
    rows = [
        (i, " ".join(f"u{i}w{j}" for j in range(8)), srcs[i % 4])
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rates = {"keep_all": 1000, "drop_all": 0, "half": 500}

    packed, stats = curate_corpus(
        docs, quality_min=0.0, mixture_rates_m=rates, pack_budget=64
    )
    want = sorted(
        i
        for i, _, src in rows
        if src == "keep_all" or (src == "half" and _mix_keep(i, 500))
    )
    survivors = sorted(r.doc_id for r in packed.select("doc_id").collect())
    assert survivors == want, (survivors, want)
    assert stats.after_decontamination == 40  # mixture ran AFTER cleaning
    assert stats.after_mixture == len(want)
    # the mid-rate source actually discriminates (fixture sanity)
    halves = [i for i, _, src in rows if src == "half"]
    assert 0 < sum(_mix_keep(i, 500) for i in halves) < len(halves)

    packed2, _ = curate_corpus(
        docs.repartition(7), quality_min=0.0, mixture_rates_m=rates, pack_budget=64
    )
    assert sorted(r.doc_id for r in packed2.select("doc_id").collect()) == want


_FRESH_EN = "meanwhile the committee reviewed a thorough proposal covering the harbor expansion budget"


def test_curate_shard_incremental_loop(spark, tmp_path):
    """Three-shard incremental curation: survivors of each shard are
    admitted to the store and reject later twins; docs dropped by a
    FILTER are never admitted, so their later twins pass the store
    probe and are judged on their own merits (no shadowing by rejected
    canonicals); commit=False leaves the store untouched."""
    from kafkastreamsproject_spark.pipelines.curation import curate_shard

    store = str(tmp_path / "inc_curation_store")

    s1 = spark.createDataFrame(
        [(1, _GOOD_EN), (2, _GOOD_EN2), (5, _LOW_QUALITY)],
        "doc_id long, text string",
    )
    packed1, st1 = curate_shard(s1, store, quality_min=0.5)
    assert sorted(r.doc_id for r in packed1.select("doc_id").collect()) == [1, 2]
    assert st1.shard_input == 3 and st1.after_store_dedup == 3  # empty store
    assert st1.admitted == 2  # the low-quality doc was NOT admitted

    # shard 2: 11 near-dups admitted doc 1 (probe rejects); 12 is an
    # exact copy of the quality-REJECTED doc 5 (probe passes — 5 is not
    # in the store — then quality drops it again); 13 is fresh.
    s2 = spark.createDataFrame(
        [(11, _NEAR_DUP), (12, _LOW_QUALITY), (13, _FRESH_EN)],
        "doc_id long, text string",
    )
    packed2, st2 = curate_shard(s2, store, quality_min=0.5)
    assert [r.doc_id for r in packed2.select("doc_id").collect()] == [13]
    assert st2.shard_input == 3
    assert st2.after_store_dedup == 2  # only 11 fell to the store probe
    assert st2.corpus.after_quality == 1  # 12 fell to quality, not dedup
    assert st2.admitted == 1

    # shard 3: a twin of shard 2's survivor is now store-rejected;
    # commit=False must not grow the store
    s3 = spark.createDataFrame([(21, _FRESH_EN)], "doc_id long, text string")
    packed3, st3 = curate_shard(s3, store, quality_min=0.5, commit=False)
    assert packed3.count() == 0 and st3.after_store_dedup == 0
    stored = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{store}/signatures").select("doc_id").collect()
    )
    assert stored == [1, 2, 13]


def test_curation_top_p_quality_gate(spark):
    """quality_top_p keeps exactly ceil(p * n_source) docs per source,
    choosing the highest-quality ones."""
    import pyspark.sql.functions as F

    from kafkastreamsproject_spark.pipelines.curation import curate_corpus

    # two sources x 10 docs, quality strictly ordered by repetition
    # (more distinct tokens = higher TTR = higher quality score).
    # Every doc draws from its OWN vocabulary (no cross-doc overlap, so
    # dedup stages are no-ops) with uniform token lengths per source
    # (so the per-source ranking depends on TTR alone).
    rows = []
    for src_i, src in enumerate(("web", "books")):
        for d in range(10):
            # doc d repeats a (12 - d)-word vocabulary over 24 tokens:
            # larger d -> fewer distinct tokens -> lower quality
            words = [f"{src}{d:02d}x{i % (12 - d):02d}" for i in range(24)]
            rows.append((src_i * 100 + d, " ".join(words), src))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    packed, stats = curate_corpus(
        docs, quality_min=0.0, quality_top_p=0.3, pack_budget=4096
    )
    assert stats.after_quality == 20
    # ceil(0.3 * 10) = 3 per source
    assert stats.after_quality_top_p == 6
    kept = {r.doc_id for r in packed.select("doc_id").collect()}
    # the 3 most-diverse docs per source are d = 0, 1, 2
    assert kept == {0, 1, 2, 100, 101, 102}


def test_curation_top_p_rejects_bad_fraction(spark):
    import pytest as _pytest

    from kafkastreamsproject_spark.pipelines.curation import curate_corpus

    docs = spark.createDataFrame(
        [(1, "a b c", "web")], "doc_id long, text string, source string"
    )
    with _pytest.raises(ValueError):
        curate_corpus(docs, quality_top_p=1.5)


def test_surprisal_gate_drops_garbled_doc(spark):
    """Stage 4b: a document of corpus-unique gibberish tokens has mean
    dyadic surprisal near bits(N) (every token is a hapax) and is
    dropped by the cap; normal docs built from common tokens stay."""
    # eight docs over a SHARED 16-word vocabulary, each walking it with
    # a distinct stride (coprime to 16) so unigram counts are high and
    # common while no two docs share any 5-gram — distinct under both
    # exact and MinHash dedup, low-surprisal under the unigram LM
    vocab = (
        "the fast key order sort table scan merge join stream "
        "batch spark window hash part dup"
    ).split()
    strides = [1, 3, 5, 7, 9, 11, 13, 15]
    rows = [
        (i + 1, " ".join(vocab[(i * 3 + j * s) % 16] for j in range(48)))
        for i, s in enumerate(strides)
    ]
    garbled = (9, "qzx wvv jkk bbq zzt xxo ppw qqa lrm nnv ooc ddk")
    docs = spark.createDataFrame(rows + [garbled], "doc_id long, text string")

    # without the gate the garbled doc survives (quality floor off)
    _, stats0 = curate_corpus(docs, quality_min=0.0, pack_budget=512)
    assert stats0.after_surprisal == stats0.after_lang == 9

    packed, stats = curate_corpus(
        docs, quality_min=0.0, surprisal_max=6.0, pack_budget=512
    )
    survivors = sorted(r.doc_id for r in packed.select("doc_id").collect())
    assert 9 not in survivors, (survivors, stats)
    assert stats.after_lang == 9
    assert stats.after_surprisal == 8
    assert len(survivors) == 8


def test_repetition_gate_drops_looping_doc(spark):
    """Stage 3c: a generation-loop document (one phrase repeated) has a
    duplicate-trigram fraction near 1 and is dropped by the cap; varied
    documents with dup fraction ~0 survive.  The gate must also leave
    sub-trigram (< 3 token) docs alone."""
    from kafkastreamsproject_spark.pipelines.curation import curate_corpus

    import hashlib

    vocab = (
        "the fast key order sort table scan merge join stream "
        "batch spark window hash part dup"
    ).split()

    def tok(i: int, j: int) -> str:
        # hash-walk: aperiodic, so dup-trigram fraction ≈ 0 (a
        # modular stride walk would repeat with period 16 and sit at
        # ~0.65 — itself a nice repetition-signal demo, but not the
        # "varied doc" this fixture needs)
        h = hashlib.md5(f"{i}-{j}".encode()).hexdigest()
        return vocab[int(h[:4], 16) % 16]

    varied = [
        (i + 1, " ".join(tok(i, j) for j in range(48))) for i in range(8)
    ]
    looping = (9, " ".join(["spam ham eggs"] * 20))  # dup-3gram frac ≈ 1
    tiny = (10, "ab cd")  # < 3 tokens: gate must not touch it
    docs = spark.createDataFrame(
        varied + [looping, tiny], "doc_id long, text string"
    )

    _, stats0 = curate_corpus(docs, quality_min=0.0, pack_budget=512)
    assert stats0.after_repetition == stats0.after_quality == 10

    packed, stats = curate_corpus(
        docs, quality_min=0.0, repetition_max=0.5, pack_budget=512
    )
    survivors = sorted(r.doc_id for r in packed.select("doc_id").collect())
    assert 9 not in survivors, (survivors, stats)
    assert 10 in survivors
    assert stats.after_quality == 10
    assert stats.after_repetition == 9

    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate_corpus(docs, repetition_max=1.0)


def test_curation_dsir_resample_upsamples_target_domain(spark):
    """Stage 5b: with a target-domain corpus supplied, the DSIR
    importance resample keeps target-like pool docs at a strictly
    higher rate than off-domain docs (weight-proportional
    hash-Bernoulli), is deterministic across runs, and leaves every
    earlier funnel count untouched."""
    import hashlib

    sci = (
        "neutron star gamma burst photon quark plasma fusion orbit "
        "nebula spectra quasar flux lens dark halo"
    ).split()
    cook = (
        "butter flour yeast dough oven whisk simmer braise glaze "
        "saute crumb zest brine roux sear stock"
    ).split()

    def walk(vocab, salt, i, n=40):
        def tok(j):
            h = hashlib.md5(f"{salt}-{i}-{j}".encode()).hexdigest()
            return vocab[int(h[:4], 16) % 16]

        return " ".join(tok(j) for j in range(n))

    pool = [(i + 1, walk(sci, "pool-sci", i)) for i in range(20)] + [
        (100 + i, walk(cook, "pool-cook", i)) for i in range(20)
    ]
    docs = spark.createDataFrame(pool, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, walk(sci, "target", i)) for i in range(12)],
        "doc_id long, text string",
    )

    packed, stats = curate_corpus(
        docs, quality_min=0.0, dsir_target=target, dsir_base_m=800,
        pack_budget=512,
    )
    # earlier stages untouched: nothing planted for them to drop
    assert stats.input == stats.after_decontamination == 40
    survivors = sorted(r.doc_id for r in packed.select("doc_id").collect())
    kept_sci = sum(1 for d in survivors if d <= 20)
    kept_cook = sum(1 for d in survivors if d > 100)
    assert stats.after_dsir == len(survivors) == kept_sci + kept_cook
    # target-like docs up-sampled relative to off-domain docs
    assert kept_sci > kept_cook, (kept_sci, kept_cook)
    # measured log-ratios on this fixture: sci in [-0.18, 0.41] ->
    # keep rates 700-1000 permille; cook in [-1.1, -0.67] -> 370-500
    assert kept_sci >= 13, (kept_sci, kept_cook)
    assert kept_cook <= 12, (kept_sci, kept_cook)

    # deterministic: the hash-Bernoulli coin is a pure function of
    # doc_id, so a second run selects the identical survivor set
    packed2, stats2 = curate_corpus(
        docs, quality_min=0.0, dsir_target=target, dsir_base_m=800,
        pack_budget=512,
    )
    assert sorted(
        r.doc_id for r in packed2.select("doc_id").collect()
    ) == survivors
    assert stats2 == stats

    # without a target, the stage is a no-op pass-through
    _, stats0 = curate_corpus(docs, quality_min=0.0, pack_budget=512)
    assert stats0.after_dsir == stats0.after_decontamination == 40

    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate_corpus(docs, dsir_target=target, dsir_base_m=0)


def test_cli_curate_with_dsir_target(spark, tmp_path):
    """The `curate` CLI end-to-end with the DSIR stage: parquet in,
    training shards out, stage counts printed — the switch path for a
    user running the funnel from the command line."""
    import hashlib

    from kafkastreamsproject_spark.app import main

    vocab_a = "alpha beta gamma delta epsilon zeta eta theta".split()
    vocab_b = "uno dos tres cuatro cinco seis siete ocho".split()

    def walk(vocab, salt, i, n=24):
        def tok(j):
            h = hashlib.md5(f"{salt}-{i}-{j}".encode()).hexdigest()
            return vocab[int(h[:4], 16) % 8]

        return " ".join(tok(j) for j in range(n))

    docs = spark.createDataFrame(
        [(i + 1, walk(vocab_a, "p", i)) for i in range(10)]
        + [(100 + i, walk(vocab_b, "q", i)) for i in range(10)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(1000 + i, walk(vocab_a, "t", i)) for i in range(8)],
        "doc_id long, text string",
    )
    docs_pq = str(tmp_path / "docs.parquet")
    target_pq = str(tmp_path / "target.parquet")
    out_dir = str(tmp_path / "shards")
    docs.write.parquet(docs_pq)
    target.write.parquet(target_pq)

    assert main([
        "curate",
        "--input", docs_pq,
        "--output", out_dir,
        "--quality-min", "0.0",
        "--dsir-target", target_pq,
        "--dsir-base-m", "800",
        "--pack-budget", "256",
    ]) == 0

    shards = spark.read.parquet(out_dir)
    kept = sorted(r.doc_id for r in shards.select("doc_id").collect())
    assert kept, "funnel should keep something"
    kept_a = sum(1 for d in kept if d <= 10)
    kept_b = sum(1 for d in kept if d > 100)
    assert kept_a > kept_b, (kept_a, kept_b)  # DSIR up-samples domain A
    # shard layout contract: text joined back, pack assignment present
    assert {"doc_id", "text", "pack_id", "shard_id"} <= set(shards.columns)


def test_curation_classifier_gate_drops_planted_spam(spark):
    """Stage 3d: a perceptron trained on a labeled seed set (spam
    phrase injected into the positive class) drops the corpus docs
    carrying the same plant, keeps the clean docs, and generalizes —
    the corpus filler is disjoint from the seed filler, so only the
    learned spam-bucket weights can separate them."""
    import hashlib

    from kafkastreamsproject_spark.pipelines.curation import curate_corpus

    vocab = (
        "the fast key order sort table scan merge join stream "
        "batch spark window hash part dup"
    ).split()
    spam = " click here" * 8

    def walk(salt, i, n=48):
        def tok(j):
            h = hashlib.md5(f"{salt}-{i}-{j}".encode()).hexdigest()
            return vocab[int(h[:4], 16) % 16]

        return " ".join(tok(j) for j in range(n))

    clean = [(i + 1, walk("corpus-clean", i)) for i in range(8)]
    spammy = [(100 + i, walk("corpus-spam", i) + spam) for i in range(8)]
    docs = spark.createDataFrame(clean + spammy, "doc_id long, text string")
    seed = spark.createDataFrame(
        [(walk("seed", i), -1) for i in range(8)]
        + [(walk("seed-pos", i) + spam, 1) for i in range(8)],
        "text string, y int",
    )

    # without the gate everything survives (quality floor disabled)
    _, stats0 = curate_corpus(docs, quality_min=0.0, pack_budget=512)
    assert stats0.after_classifier == stats0.after_repetition == 16

    packed, stats = curate_corpus(
        docs, quality_min=0.0, classifier_seed=seed, pack_budget=512
    )
    survivors = sorted(r.doc_id for r in packed.select("doc_id").collect())
    assert stats.after_repetition == 16
    assert survivors == [i + 1 for i in range(8)], (survivors, stats)
    assert stats.after_classifier == 8

    # deterministic: integer trainer + literal-folded application
    packed2, stats2 = curate_corpus(
        docs, quality_min=0.0, classifier_seed=seed, pack_budget=512
    )
    assert sorted(
        r.doc_id for r in packed2.select("doc_id").collect()
    ) == survivors
    assert stats2 == stats


def test_curation_source_blocklist_stage(spark):
    """Stage 2b: the UT1-style source blocklist consumed by the funnel.
    'auto' derives the blocked set with the source_quality_blocklist
    integer rule (5·fails > 3·docs of the source fail the Gopher
    battery) and drops the source WHOLESALE — including its one page
    that individually passes every rule, the reason the stage exists;
    an explicit list blocks exactly the named sources.  Zero extra
    corpus shuffle: application is a broadcast anti-join."""
    from kafkastreamsproject_spark.pipelines.curation import curate_corpus

    good = [
        (i + 1, f"the quick brown fox number {i} jumps over a lazy dog "
                "near the river bank today", "good.example")
        for i in range(4)
    ]
    # 4/5 of junk.example fails Gopher (2 words, no stopwords); the
    # fifth page passes every per-doc rule but dies with its domain
    bad = [(100 + i, f"xx{i} yy{i}", "junk.example") for i in range(4)]
    squeaker = [
        (199, "the entirely reasonable page with a calm tone that reads "
              "well near the end", "junk.example")
    ]
    docs = spark.createDataFrame(
        good + bad + squeaker, "doc_id long, text string, source string"
    )

    # without the stage, the squeaker survives the per-doc gates
    packed0, stats0 = curate_corpus(docs, quality_min=0.4, pack_budget=512)
    ids0 = sorted(r.doc_id for r in packed0.select("doc_id").collect())
    assert 199 in ids0
    assert stats0.after_blocklist == stats0.after_neardup_dedup

    packed, stats = curate_corpus(
        docs, quality_min=0.4, source_blocklist="auto", pack_budget=512
    )
    ids = sorted(r.doc_id for r in packed.select("doc_id").collect())
    assert ids == [1, 2, 3, 4], (ids, stats)
    assert stats.after_neardup_dedup == 9
    assert stats.after_blocklist == 4          # junk.example gone wholesale

    # explicit mode blocks exactly the named sources
    packed2, stats2 = curate_corpus(
        docs,
        quality_min=0.4,
        source_blocklist=("good.example",),
        pack_budget=512,
    )
    ids2 = sorted(r.doc_id for r in packed2.select("doc_id").collect())
    assert 199 in ids2 and not any(i in ids2 for i in (1, 2, 3, 4))

    import pytest

    with pytest.raises(ValueError):
        curate_corpus(docs, source_blocklist="derive", pack_budget=512)


@pytest.mark.slowsuite  # r16: slowest-tail; deselected by default (pyproject addopts), run via -m slowsuite
def test_curation_classifier_auto_tau_matches_hand_tuned(spark):
    """classifier_tau='auto' derives the operating point from the
    seed's own 33-threshold PR sweep (max-F1 cell, ties to smallest
    |k|).  On the cleanly separable planted-spam seed the max-F1 cell
    is the natural τ=0, so the auto gate must reproduce the
    hand-tuned (default) gate's survivors exactly — and record the
    chosen τ in the stats."""
    import hashlib

    from kafkastreamsproject_spark.pipelines.curation import curate_corpus

    vocab = (
        "the fast key order sort table scan merge join stream "
        "batch spark window hash part dup"
    ).split()
    spam = " click here" * 8

    def walk(salt, i, n=48):
        def tok(j):
            h = hashlib.md5(f"{salt}-{i}-{j}".encode()).hexdigest()
            return vocab[int(h[:4], 16) % 16]

        return " ".join(tok(j) for j in range(n))

    clean = [(i + 1, walk("corpus-clean", i)) for i in range(8)]
    spammy = [(100 + i, walk("corpus-spam", i) + spam) for i in range(8)]
    docs = spark.createDataFrame(clean + spammy, "doc_id long, text string")
    seed = spark.createDataFrame(
        [(walk("seed", i), -1) for i in range(8)]
        + [(walk("seed-pos", i) + spam, 1) for i in range(8)],
        "text string, y int",
    )

    packed_hand, stats_hand = curate_corpus(
        docs, quality_min=0.0, classifier_seed=seed, pack_budget=512
    )
    packed_auto, stats_auto = curate_corpus(
        docs,
        quality_min=0.0,
        classifier_seed=seed,
        classifier_tau="auto",
        pack_budget=512,
    )
    hand = sorted(r.doc_id for r in packed_hand.select("doc_id").collect())
    auto = sorted(r.doc_id for r in packed_auto.select("doc_id").collect())
    assert hand == auto == [i + 1 for i in range(8)]
    assert stats_hand.classifier_tau == 0.0      # default gate records τ=0
    assert stats_auto.classifier_tau is not None
    # separable seed: max F1 = 1.0 spans a k range; smallest |k| wins,
    # so auto lands on the natural operating point
    assert stats_auto.classifier_tau == 0.0
    assert stats_auto.after_classifier == 8

    import pytest

    with pytest.raises(ValueError):
        curate_corpus(
            docs,
            quality_min=0.0,
            classifier_seed=seed,
            classifier_tau="max-f1",
            pack_budget=512,
        )


def test_stage_walls_hook_covers_every_stage(spark):
    """curate_corpus(stage_walls=...) fills one wall per funnel stage
    (the r12 attribution hook that caught the cache-reuse defect)."""
    from kafkastreamsproject_spark.pipelines.curation import curate_corpus

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog number {i} today", "s0")
         for i in range(30)],
        "doc_id long, text string, source string",
    )
    walls: dict[str, float] = {}
    packed, stats = curate_corpus(docs, quality_min=0.0, stage_walls=walls)
    assert set(walls) == {
        "input", "exact_dedup", "neardup_dedup", "blocklist", "quality",
        "quality_top_p", "repetition", "classifier", "lang", "surprisal",
        "decontamination", "dsir", "mixture", "packing",
    }
    assert all(w >= 0.0 for w in walls.values())
    # disabled optional stages attribute ~zero wall (no count forced)
    assert walls["classifier"] < 0.5


def test_release_local_checkpoint_frees_blocks(spark):
    """operators/cache.py:release_local_checkpoint really frees the
    checkpoint's RDD blocks (plain unpersist() is a no-op there): the
    released handle can no longer be evaluated, and releasing a
    non-checkpointed DataFrame is a safe no-op."""
    import pytest

    from kafkastreamsproject_spark.operators.cache import (
        release_local_checkpoint,
    )

    df = spark.range(10_000).selectExpr("id", "id * 2 AS x")
    ck = df.localCheckpoint(eager=True)
    assert ck.count() == 10_000
    release_local_checkpoint(ck)
    with pytest.raises(Exception):
        ck.count()  # blocks gone — release was real, not cosmetic

    plain = spark.range(10).selectExpr("id")
    release_local_checkpoint(plain)  # no checkpoint behind it: no-op
    assert plain.count() == 10
