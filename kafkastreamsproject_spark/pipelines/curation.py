"""End-to-end corpus curation: the composed training-data pipeline.

Every stage is one of the engine's individually-verified operators;
this module is the COMPOSITION a real corpus run executes, in the
canonical order (cheap row-local filters before pairwise stages,
pairwise dedup before packing so packs never waste budget on dropped
docs):

1. exact dedup         keep-first over md5(text)          (plans/dedup.py semantics)
2. near-dup dedup      MinHash-LSH pairs → connected      (functions/hashing.py,
                       components → keep cluster min       functions/clustering.py)
2b. source blocklist    optional UT1-style domain drop:     (plans/text.py's
                        explicit blocked-source list, or     source_quality_blocklist
                        "auto" — derive it from the Gopher   rule, consumed as the
                        failure rate (block iff fails >      broadcast anti-join its
                        3/5 of a source's docs) and drop     docstring states)
                        those sources wholesale, catching
                        pages that individually squeak by
3. quality filter      composite heuristic ≥ threshold    (functions/text.py)
3b. top-p quality gate  optional per-source keep-best-p     (plans/llmdata.py's
                        fraction by rounded score            quality_filter_top_p
                                                             device)
3c. repetition gate     optional duplicate-trigram-         (plans/text.py's
                        fraction cap: the Gopher              doc_repetition_stats
                        boilerplate/loop filter,              signal, row-local)
                        zero-shuffle
3d. classifier gate     optional TRAINED quality filter:    (functions/perceptron.py;
                        a perceptron over hashed-bigram       the fastText-style
                        features fits a caller-supplied       filter verified by
                        labeled seed set, then drops docs     plans/llmdata.py's
                        it predicts positive (spam);          quality_classifier_*
                        application is a zero-shuffle scan    oracle pair)
4. language filter     keep an allow-list of n-gram       (functions/text.py)
                       lang-ID predictions
4b. surprisal gate      optional perplexity-proxy cap:      (plans/llmdata.py's
                        drop docs whose mean dyadic          doc_surprisal_quality
                        surprisal vs the survivor corpus     device — exact
                        exceeds a threshold (garbled /       integer bits(N)−bits(c))
                        OCR-noise text scores high)
5. decontamination     drop docs whose shingle containment (train→eval direction:
                       vs a held-out set exceeds a cap      the same rate
                       — the contamination-drop step        plans/llmdata.py's
                                                            contamination_ngram_overlap
                                                            scores, as a filter)
5b. DSIR resample       optional importance resample toward (plans/llmdata.py's
                        a target domain: keep-rate ∝         dsir_importance_weights
                        2^(mean dyadic log-ratio), via the   signal, as a keep
                        deterministic hash-Bernoulli coin    policy)
6. mixture sampling    per-source configured keep-rates    (same deterministic
                       (hash-Bernoulli, reproducible)       device as plans/
                                                            llmdata.py's
                                                            mixture_sample)
7. sequence packing    token-budget FFD shards            (operators/packing.py)

Scale shape: stages 1–2 shuffle hashes/ids only (never text bodies),
3–5 are scans with row-local predicates plus one hash semi-join, 6 is
a broadcast-join + zero-shuffle filter, and 7 shuffles ~16 B/doc
metadata.  Nothing collects to the driver; the output is a DataFrame a
writer partitions straight to parquet.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from kafkastreamsproject_spark.functions import text as TX
from kafkastreamsproject_spark.functions.clustering import connected_components
from kafkastreamsproject_spark.operators.cache import (
    cache_scope,
    release_local_checkpoint,
    scoped_persist,
)
from kafkastreamsproject_spark.operators.packing import pack_documents
from kafkastreamsproject_spark.streaming.neardup import (
    _confirmed_pairs,
    doc_shingle_sets,
    doc_signatures,
)


def _gopher_pass(text):
    """The Gopher rule-battery conjunction, shared verbatim with
    plans/text.py's gopher_quality_rules / source_quality_blocklist
    (constants imported from there so the funnel's "auto" blocklist
    and the oracle-checked derivation query can never drift)."""
    from kafkastreamsproject_spark.plans.text import (
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_WORDS,
        _GOPHER_STOPWORDS,
    )

    toks = TX.tokens(text)
    n_words = F.size(toks).cast("long")
    n_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("long")
    n_sym = F.size(
        F.filter(toks, lambda w: w.rlike(r"^[#$%&*+=^_~]+$"))
    ).cast("long")
    stops = F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS])
    n_stop = F.size(
        F.filter(toks, lambda w: F.array_contains(stops, w))
    ).cast("long")
    return (
        (n_words >= _GOPHER_MIN_WORDS)
        & (n_words <= _GOPHER_MAX_WORDS)
        & (n_chars >= 3 * n_words)
        & (n_chars <= 10 * n_words)
        & (10 * n_sym <= n_words)
        & (10 * n_alpha >= 8 * n_words)
        & (n_stop >= 2)
    )


@dataclass(frozen=True)
class CurationStats:
    """Per-stage survivor counts — the funnel a curation run reports."""

    input: int
    after_exact_dedup: int
    after_neardup_dedup: int
    after_blocklist: int
    after_quality: int
    after_quality_top_p: int
    after_repetition: int
    after_classifier: int
    after_lang: int
    after_surprisal: int
    after_decontamination: int
    after_dsir: int
    after_mixture: int
    packs: int
    #: the classifier gate's operating point: the threshold actually
    #: applied (0.0 = the default w.x > 0 gate; auto-derived when
    #: classifier_tau="auto"); None when the gate is off
    classifier_tau: float | None = None


def curate_corpus(
    docs: DataFrame,
    *,
    quality_min: float = 0.5,
    quality_top_p: float | None = None,
    source_blocklist: "str | tuple[str, ...] | list[str] | None" = None,
    repetition_max: float | None = None,
    classifier_seed: DataFrame | None = None,
    classifier_steps: int = 12,
    classifier_tau: "float | str | None" = None,
    langs: tuple[str, ...] | None = None,
    surprisal_max: float | None = None,
    holdout: DataFrame | None = None,
    containment_max: float = 0.5,
    dsir_target: DataFrame | None = None,
    dsir_base_m: int = 500,
    mixture_rates_m: dict[str, int] | None = None,
    pack_budget: int = 2048,
    stage_walls: dict[str, float] | None = None,
    _decon_full_sigs: bool = False,
) -> tuple[DataFrame, CurationStats]:
    """Run the full curation funnel over ``docs`` (doc_id, text, ...).

    Returns ``(packed, stats)``: one row per surviving document with its
    pack assignment (doc_id, n_tokens, shard_id, pack_id, pack_tokens,
    overflow), and the per-stage funnel counts.

    ``source_blocklist`` enables stage 2b (requires a ``source``
    column): either an explicit sequence of blocked source names, or
    the string ``"auto"`` to DERIVE the list with the
    source_quality_blocklist rule — a source is blocked iff its
    Gopher-battery failures exceed 3/5 of its docs (pure-integer
    5·fails > 3·docs test over the post-dedup survivors).  Application
    is a broadcast anti-join of the |sources|-row list; the corpus
    itself never shuffles for this stage (derivation collapses the
    scan map-side to (source, two longs) rows).

    ``classifier_seed`` (text, y ∈ {−1 keep, +1 drop}) enables stage
    3d: a full-batch perceptron (``classifier_steps`` steps) is trained
    on the seed's hashed-bigram features and every survivor the model
    predicts positive is dropped — the learned quality filter.
    ``classifier_tau`` moves its operating point: a float drops at
    w·x > τ instead of w·x > 0; the string ``"auto"`` derives τ from
    the seed's own precision/recall sweep (the 33-threshold
    quality_classifier_pr_curve grid, max-F1 cell, driver-side over 33
    bounded rows) — the chosen value is recorded in
    ``CurationStats.classifier_tau`` either way.

    ``holdout`` (doc_id, text) enables stage 5: any doc whose distinct
    shingle-hash containment against the holdout's hash universe exceeds
    ``containment_max`` is dropped as contaminated (the train→eval
    contamination rate of plans/llmdata.py's contamination_ngram_overlap,
    applied as a drop policy).

    ``mixture_rates_m`` enables stage 6 (requires a ``source`` column):
    per-source PER-MILLE keep rates — the configured data mixture.  The
    keep decision is the portable md5 hash-Bernoulli of
    plans/llmdata.py's ``mixture_sample`` — a pure function of
    (doc_id, source), so the sampled corpus is identical across runs,
    engines, and repartitionings.  Sources absent from the dict are
    DROPPED (an explicit mixture enumerates its sources).

    The stage counts force one action per stage — acceptable for a
    batch curation run (each stage's output feeds the next anyway); for
    a pure single-pass plan, call with ``stats=False`` semantics by
    composing the stages yourself.
    """
    # optional per-stage wall attribution (VERDICT r11 #3): each
    # stage already ends in a count that materializes it, so timing the
    # interval between consecutive counts attributes that stage's
    # materialization cost.  Caveat (documented, inherent to lazy
    # eval): work a stage defers past its own persist/checkpoint
    # boundary lands in the NEXT stage's interval.
    _t_prev = time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal _t_prev
        if stage_walls is not None:
            now = time.perf_counter()
            stage_walls[stage] = round(now - _t_prev, 3)
            _t_prev = now

    n_input = docs.count()
    _mark("input")

    # 1. exact dedup, keep-first (deterministic survivor)
    w = W.partitionBy(TX.exact_fingerprint(F.col("text"))).orderBy("doc_id")
    exact = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # intermediate localCheckpoint handles: their blocks bypass the
    # cache_scope/scoped_persist machinery (release_local_checkpoint
    # doc), so they are tracked here and freed once `packed` — the only
    # DataFrame that survives this function — has materialized its OWN
    # checkpoint blocks (r11 ADVICE: repeated curate_corpus calls on a
    # long-lived session otherwise grow block-manager memory)
    _stage_ckpts: list[DataFrame] = []
    with cache_scope():
        # eager localCheckpoint, NOT persist — the same unfinalized-
        # cached-AQE-plan pathology the r12 scale smoke caught on the
        # anti-join below, this time on the window output: with
        # scoped_persist(exact) the near-dup stage's consumers (the
        # signature build and the anti-join) re-execute work above the
        # cache instead of reading it, measured at the 100× corpus as
        # 96.7 s for the near-dup stage vs 36.9 s over pinned rows
        # (survivor counts byte-identical).  Tracked for release once
        # `packed` materializes.
        exact = exact.localCheckpoint(eager=True)
        _stage_ckpts.append(exact)
        n_exact = exact.count()
        _mark("exact_dedup")

        # 2. near-dup dedup: confirmed pairs → components → keep minimum
        sigs = scoped_persist(doc_signatures(exact))
        pairs = _confirmed_pairs(sigs, sigs, within_batch=True).select(
            F.col("matched_doc_id").alias("id_a"),
            F.col("new_doc_id").alias("id_b"),
        )
        clusters = connected_components(pairs)
        losers = clusters.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        neardup = exact.join(losers, "doc_id", "left_anti")
        # eager localCheckpoint, NOT persist: the r12 scale smoke's
        # stage-wall attribution caught the persisted anti-join's cache
        # not being reused at 50k docs (its cached AQE plan stays
        # unfinalized above the CC-derived build side), so EVERY
        # downstream stage count re-executed the join from its cached
        # children — measured ~5 s per action vs ~0.4 s over pinned
        # rows.  Tracked for release once `packed` materializes.
        neardup = neardup.localCheckpoint(eager=True)
        _stage_ckpts.append(neardup)
        n_neardup = neardup.count()
        _mark("neardup_dedup")

        # 2b. optional source blocklist AHEAD of the per-doc gates —
        # the UT1/blocklist move (plans/text.py:source_quality_blocklist
        # derives it; this stage consumes it): a domain whose pages
        # mostly fail the battery is dropped wholesale, catching pages
        # that individually squeak by.  Application is the broadcast
        # anti-join the device's docstring states; "auto" derivation is
        # the identical pure-integer 5·fails > 3·docs verdict over the
        # post-dedup survivors (the scan collapses map-side to
        # (source, two longs); corpus text never shuffles).
        if source_blocklist is not None:
            if isinstance(source_blocklist, str):
                if source_blocklist != "auto":
                    raise ValueError(
                        "source_blocklist must be a sequence of sources "
                        f"or 'auto', got {source_blocklist!r}"
                    )
                from kafkastreamsproject_spark.plans.text import (
                    _BLOCKLIST_FAIL_DEN,
                    _BLOCKLIST_FAIL_NUM,
                )

                fail = F.when(_gopher_pass(F.col("text")), 0).otherwise(1)
                per_source = neardup.select("source", fail.alias("f")).groupBy(
                    "source"
                ).agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("f").alias("n_fail"),
                )
                blocked = per_source.filter(
                    F.lit(_BLOCKLIST_FAIL_DEN) * F.col("n_fail")
                    > F.lit(_BLOCKLIST_FAIL_NUM) * F.col("n_docs")
                ).select("source")
            else:
                spark = neardup.sparkSession
                blocked = spark.createDataFrame(
                    [(s,) for s in source_blocklist], "source string"
                )
            neardup = neardup.join(
                F.broadcast(blocked), "source", "left_anti"
            )
            # same checkpoint-not-persist reasoning as the near-dup
            # boundary above: this output feeds every later gate's count
            neardup = neardup.localCheckpoint(eager=True)
            _stage_ckpts.append(neardup)
        n_blocklist = (
            neardup.count() if source_blocklist is not None else n_neardup
        )
        _mark("blocklist")

        # 3–4. row-local filters (one scan each over the cached survivors)
        quality = neardup.filter(TX.quality_score(F.col("text")) >= quality_min)
        n_quality = quality.count()
        _mark("quality")

        # 3b. optional RELATIVE quality gate: keep the best top_p
        # fraction of each source by rounded quality score (the
        # plans/llmdata.py:quality_filter_top_p device) — used when an
        # absolute threshold would gut some sources and pass others
        # whole.  Requires a `source` column.
        if quality_top_p is not None:
            if not 0.0 < quality_top_p <= 1.0:
                raise ValueError(
                    f"quality_top_p must be in (0, 1], got {quality_top_p}"
                )
            score = F.round(TX.quality_score(F.col("text")), 6)
            wq = W.partitionBy("source").orderBy(score.desc(), F.col("doc_id"))
            wc = W.partitionBy("source")
            quality = (
                quality.withColumn("_rq", F.row_number().over(wq))
                .withColumn("_ns", F.count(F.lit(1)).over(wc))
                .filter(
                    F.col("_rq")
                    <= F.ceil(F.lit(quality_top_p) * F.col("_ns")).cast("long")
                )
                .drop("_rq", "_ns")
            )
        n_top_p = quality.count() if quality_top_p is not None else n_quality
        _mark("quality_top_p")

        # 3c. optional repetition gate: drop docs whose duplicate-
        # trigram fraction exceeds the cap — the Gopher/MassiveText
        # repetition filter (the boilerplate/generation-loop signal
        # plans/text.py:doc_repetition_stats measures).  Entirely
        # row-local: the trigram array, its distinct, and the ratio
        # never leave the row, so the gate is one scan with zero
        # shuffle.
        if repetition_max is not None:
            if not 0.0 <= repetition_max < 1.0:
                raise ValueError(
                    f"repetition_max must be in [0, 1), got {repetition_max}"
                )
            toks = TX.tokens(F.col("text"))
            # double let-binding (TX.let1): the token array evaluates
            # once (not once per trigram) and the trigram array once
            # (not once per reference in the ratio) — interpreted HOF
            # eval has no subexpression elimination
            tris = TX.let1(
                toks,
                lambda ts: F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(ts) - 2, F.lit(1))
                    ),
                    lambda i: F.concat_ws(" ", F.slice(ts, i, 3)),
                ),
            )
            dup_frac = TX.let1(
                tris,
                lambda tr: (F.size(tr) - F.size(F.array_distinct(tr)))
                / F.size(tr).cast("double"),
            )
            quality = quality.filter(
                (F.size(toks) < 3) | (dup_frac <= repetition_max)
            )
        n_repetition = (
            quality.count() if repetition_max is not None else n_top_p
        )
        _mark("repetition")

        # 3d. optional TRAINED quality gate: fit a full-batch
        # perceptron over hashed-bigram features on the caller's
        # labeled seed set (``classifier_seed``: text, y ∈ {−1 keep,
        # +1 drop}), then drop every survivor the model predicts
        # positive.  This is the fastText-style learned filter of the
        # GPT-3 / CCNet pipelines, complementing the fixed heuristics:
        # stage 3 encodes what LOW QUALITY looks like a priori, this
        # stage learns whatever the seed labels mark (spam templates,
        # boilerplate families, machine-generated slop).  Training
        # scans only the seed (steps × one distributed aggregate,
        # 33 longs back per step — the sanctioned iterative shape);
        # application folds the weights into the scan as codegen
        # literals, so the gate itself is zero-shuffle at any corpus
        # size.  Verified device: plans/llmdata.py's
        # quality_classifier_train / _confusion oracle pair replays
        # the identical trajectory in DuckDB.
        tau_applied: float | None = None
        if classifier_seed is not None:
            from kafkastreamsproject_spark.functions import perceptron as P

            # eager localCheckpoint (not persist): the trainer scans
            # this ~12+ times and the PR sweep twice more; pinned rows
            # with a shallow plan measured 14% faster than the cache at
            # sf0.1 (weights identical), and the seed is bounded by
            # construction.  Tracked for release with the other stage
            # checkpoints.  Training cost is seed-sized and FIXED —
            # 10-12 s of small jobs regardless of corpus, amortizing to
            # noise at scale; the corpus-sized part (scoring) stays a
            # zero-shuffle literal-folded scan.
            seed = classifier_seed.select(
                F.col("y").cast("long").alias("y"),
                P.hashed_bigram_features(F.col("text")).alias("x"),
            ).localCheckpoint(eager=True)
            _stage_ckpts.append(seed)
            w = P.train_perceptron(
                seed, P.DEFAULT_BUCKETS + 1, classifier_steps
            )
            if classifier_tau == "auto":
                # Derive the operating point from the seed's own PR
                # sweep — the quality_classifier_pr_curve grid (33
                # thresholds τ = k·max|s|/16, pure-integer 16·s > k·m
                # test), max-F1 cell, ties to the smallest |k| (least
                # aggressive shift from the natural τ=0).  All
                # driver-side work is 33 bounded rows; the corpus gate
                # below stays a zero-shuffle literal-folded scan.
                taus = 16
                scored = seed.select(
                    "y", P.dot_weights(F.col("x"), w).alias("s")
                )
                m = scored.agg(
                    F.max(F.abs(F.col("s"))).alias("m")
                ).first().m or 0
                spark = seed.sparkSession
                ks = spark.range(-taus, taus + 1).select(
                    F.col("id").cast("int").alias("k")
                )
                pred = (F.lit(taus) * F.col("s")) > (F.col("k") * F.lit(m))
                cells = (
                    scored.crossJoin(F.broadcast(ks))
                    .groupBy("k")
                    .agg(
                        F.sum(
                            F.when(pred & (F.col("y") == 1), 1).otherwise(0)
                        ).alias("tp"),
                        F.sum(
                            F.when(pred & (F.col("y") == -1), 1).otherwise(0)
                        ).alias("fp"),
                        F.sum(
                            F.when(~pred & (F.col("y") == 1), 1).otherwise(0)
                        ).alias("fn"),
                    )
                    # 33 bounded rows to the driver via one collect_list
                    # row (the perceptron-trainer device)
                    .groupBy()
                    .agg(F.collect_list(F.struct("k", "tp", "fp", "fn")))
                    .first()[0]
                )
                byk = {c.k: c for c in cells}

                def _rank(k: int):  # max F1, ties to smallest |k|, then k
                    c = byk[k]
                    denom = 2 * c.tp + c.fp + c.fn
                    f1 = (2 * c.tp / denom) if denom else 0.0
                    return (-f1, abs(k), k)

                best_k = min(byk, key=_rank)
                tau_applied = best_k * m / float(taus)
                pred_drop = (
                    F.lit(taus)
                    * P.dot_weights_inline(
                        P.hashed_bigram_features(F.col("text")), w
                    )
                ) > F.lit(best_k * m)
            else:
                if classifier_tau is not None and not isinstance(
                    classifier_tau, (int, float)
                ):
                    raise ValueError(
                        "classifier_tau must be a number, 'auto', or "
                        f"None, got {classifier_tau!r}"
                    )
                tau_applied = float(classifier_tau or 0.0)
                pred_drop = (
                    P.dot_weights_inline(
                        P.hashed_bigram_features(F.col("text")), w
                    )
                    > F.lit(tau_applied)
                )
            quality = quality.filter(~pred_drop)
            # the literal-folded scoring expression (33 weight
            # literals x the hashed-bigram feature tree) is by far the
            # largest expression in the funnel: truncate here so the
            # four later stages don't re-analyze it per reference
            # (same lineage discipline as the stage-5 boundary below)
            quality = quality.localCheckpoint(eager=True)
            _stage_ckpts.append(quality)
        n_classifier = (
            quality.count() if classifier_seed is not None else n_repetition
        )
        _mark("classifier")

        if langs is not None:
            quality = quality.filter(TX.lang_id(F.col("text")).isin(*langs))
        n_lang = quality.count()
        _mark("lang")

        # 4b. optional surprisal gate: drop docs whose mean dyadic
        # surprisal against the SURVIVOR corpus' unigram table exceeds
        # the cap — the exact-integer perplexity proxy
        # (plans/llmdata.py:doc_surprisal_quality).  Garbled / OCR-noise
        # text is all rare tokens and scores high; the freq table is
        # |vocab| rows and N is a sanctioned 1-row broadcast.
        if surprisal_max is not None:
            bits = lambda c: F.length(F.bin(c)).cast("long")  # noqa: E731
            tok = quality.select(
                "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
            )
            freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
            total = freq.agg(F.sum("c").alias("n_total"))
            sur = (
                tok.join(freq, "tok")
                .crossJoin(F.broadcast(total))
                .select(
                    "doc_id",
                    (bits(F.col("n_total")) - bits(F.col("c"))).alias("s"),
                )
            )
            high = (
                sur.groupBy("doc_id")
                .agg((F.sum("s") / F.count(F.lit(1))).alias("ms"))
                .filter(F.col("ms") > surprisal_max)
                .select("doc_id")
            )
            quality = quality.join(high, "doc_id", "left_anti")
        # NOTE (r12 verdict #4, attribution measured in r13): a
        # lineage-recompute hypothesis — that the decontamination
        # checkpoint re-executing this surprisal subplan was what grew
        # its stage wall — was TESTED and REFUTED by a same-JVM 100×
        # A/B (an extra eager checkpoint here moved decontamination
        # 34.3 → 36.1 s: shuffle reuse already makes the re-execution
        # cheap, so the added write only costs).  The stage's real
        # cost was the unused 8-perm MinHash — see the stage-5 comment.
        n_surprisal = quality.count() if surprisal_max is not None else n_lang
        _mark("surprisal")

        # 5. decontamination vs the holdout's shingle-hash universe.
        # Shingle SETS only (doc_shingle_sets): the containment check
        # never reads a MinHash signature, so the old doc_signatures
        # call's 8-perm MinHash leg was waste — measured at ~6% of the
        # stage wall (r13 same-JVM 100× A/B, 31.5 → 29.7 s) and
        # removed.  The REMAINING wall is intrinsic: shingle
        # construction+hashing over every survivor's full text (the
        # same per-token work the neardup stage pays once on the whole
        # corpus) plus the survivor checkpoint the DSIR stage's triple
        # reference requires; r12's 26.2 → 30.8 "growth" sits inside
        # this stage's same-code variance (three identical-code legs
        # read 34.3 / 36.1 / 31.5 s — smokes/r13.json
        # funnel_decon_attribution).  `_decon_full_sigs=True`
        # reproduces the old path for the A/B — not a production knob.
        if holdout is not None:
            _sigs = doc_signatures if _decon_full_sigs else doc_shingle_sets
            hold_hashes = (
                _sigs(holdout)
                .select(F.explode("hset").alias("h"))
                .distinct()
            )
            doc_hashes = _sigs(quality).select(
                "doc_id", F.size("hset").alias("n_sh"), F.explode("hset").alias("h")
            )
            contained = (
                doc_hashes.join(hold_hashes, "h", "left_semi")
                .groupBy("doc_id", "n_sh")
                .agg(F.count(F.lit(1)).alias("n_hit"))
                .filter(F.col("n_hit") / F.col("n_sh") > containment_max)
                .select("doc_id")
            )
            quality = quality.join(contained, "doc_id", "left_anti")
        # truncate lineage at the stage-5 boundary, not just persist:
        # by here the plan carries every earlier gate's expression tree
        # (the literal-folded classifier alone is hundreds of nodes),
        # and the DSIR stage below references `clean` THREE times —
        # re-analyzing the composed tree per reference OOMed the
        # driver at sf0.1 with all stages on (r11).  The count on the
        # next line materializes anyway, so the eager localCheckpoint
        # costs nothing extra; on a multi-executor cluster prefer
        # reliable checkpointing if executor loss must be survivable.
        clean = quality.localCheckpoint(eager=True)
        _stage_ckpts.append(clean)
        n_clean = clean.count()
        _mark("decontamination")

        # 5b. optional DSIR importance resample toward a target domain
        # (Xie et al. 2023; the plans/llmdata.py:dsir_importance_weights
        # signal wired in as a keep/drop policy, VERDICT r8 #3): score
        # each survivor by how much likelier its hashed-bigram features
        # are under ``dsir_target`` than under the survivor pool, then
        # keep with probability proportional to the importance weight —
        # the same deterministic md5 hash-Bernoulli device as stage 6,
        # salted "dsir:" so the two stages' coin flips are independent.
        # Keep rate (per mille) = dsir_base_m * 2^mean_logratio, capped
        # at 1000: a doc whose features look like the target (ratio > 0)
        # keeps at up to 2^ratio times the base rate; an off-domain doc
        # (ratio < 0) is thinned.  Scale shape: the feature explode is
        # row-local, both frequency tables are bounded at _DSIR_B rows
        # (broadcast), the score rollup shuffles (doc_id, int) pairs
        # only, and the keep decision is a row-local filter — text
        # bodies never shuffle.
        if dsir_target is not None:
            if not 0 < dsir_base_m <= 1000:
                raise ValueError(
                    f"dsir_base_m must be in (0, 1000], got {dsir_base_m}"
                )
            _B = 1024  # hashed-feature buckets (the DSIR paper's device)
            toks = TX.tokens(F.col("text"))
            fhash = lambda s: (  # noqa: E731
                F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % _B
            )
            # zip_with over two slices, NOT element_at(toks, i) inside a
            # transform lambda: higher-order functions evaluate
            # interpreted (no codegen subexpression elimination), so an
            # indexed lambda re-runs split(text) per element — O(L²)
            # per doc; the slice pair evaluates it O(1) times per row
            fcol = F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: fhash(F.concat_ws(" ", a, b)),
            )

            def _feats(df: DataFrame) -> DataFrame:
                return df.filter(F.size(toks) >= 2).select(
                    "doc_id", F.explode(fcol).alias("f")
                )

            ct = _feats(dsir_target).groupBy("f").agg(
                F.count(F.lit(1)).alias("c_t")
            )
            cr = _feats(clean).groupBy("f").agg(
                F.count(F.lit(1)).alias("c_r")
            )
            tot = ct.agg(
                F.coalesce(F.sum("c_t"), F.lit(0)).alias("nt")
            ).crossJoin(
                cr.agg(F.coalesce(F.sum("c_r"), F.lit(0)).alias("nr"))
            )
            bits = lambda c: F.length(F.bin(c)).cast("long")  # noqa: E731
            term = (
                bits(F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                - bits(F.col("nt") + _B)
            ) - (bits(F.col("c_r") + 1) - bits(F.col("nr") + _B))
            scores = (
                _feats(clean)
                .join(F.broadcast(cr), "f")
                .join(F.broadcast(ct), "f", "left")
                .crossJoin(F.broadcast(tot))
                .select("doc_id", term.alias("t"))
                .groupBy("doc_id")
                .agg(
                    (
                        F.sum("t") / F.count(F.lit(1)).cast("double")
                    ).alias("_ms")
                )
            )
            h_dsir = F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("long")
            # featureless docs (< 2 tokens) score 0 -> base keep rate
            rate_m = F.least(
                F.lit(1000.0),
                F.lit(float(dsir_base_m))
                * F.pow(
                    F.lit(2.0),
                    F.greatest(
                        F.lit(-8.0),
                        F.least(F.lit(8.0), F.coalesce(F.col("_ms"), F.lit(0.0))),
                    ),
                ),
            )
            clean = (
                clean.join(scores, "doc_id", "left")
                .filter((h_dsir % 1000).cast("double") < rate_m)
                .drop("_ms")
            )
            clean = scoped_persist(clean)
        n_dsir = clean.count() if dsir_target is not None else n_clean
        _mark("dsir")

        # 6. configured mixture: per-source deterministic keep-rates
        if mixture_rates_m is not None:
            spark = clean.sparkSession
            weights = spark.createDataFrame(
                list(mixture_rates_m.items()), "source string, rate_m int"
            )
            h = F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            clean = (
                clean.join(F.broadcast(weights), "source")
                .filter(h % 1000 < F.col("rate_m"))
                .drop("rate_m")
            )
        n_mixture = clean.count() if mixture_rates_m is not None else n_clean
        _mark("mixture")

        # 7. token counts → budgeted packs (metadata-only shuffle)
        with_tokens = clean.select(
            "doc_id", TX.n_bpe_tokens(F.col("text")).alias("n_tokens")
        )
        packed = pack_documents(with_tokens, pack_budget)
        # materialize before the scope closes: packed reads `clean`
        packed = packed.localCheckpoint(eager=True)
        n_packs = packed.select("shard_id", "pack_id").distinct().count()
        _mark("packing")
        # packed's own blocks now hold everything the caller needs —
        # free the intermediate stage checkpoints (packed's checkpoint
        # blocks stay live; the caller owns that handle and can free it
        # with operators/cache.py:release_local_checkpoint when done)
        for _h in _stage_ckpts:
            release_local_checkpoint(_h)
        _stage_ckpts.clear()

    return packed, CurationStats(
        input=n_input,
        after_exact_dedup=n_exact,
        after_neardup_dedup=n_neardup,
        after_blocklist=n_blocklist,
        after_quality=n_quality,
        after_quality_top_p=n_top_p,
        after_repetition=n_repetition,
        after_classifier=n_classifier,
        after_lang=n_lang,
        after_surprisal=n_surprisal,
        after_decontamination=n_clean,
        after_dsir=n_dsir,
        after_mixture=n_mixture,
        packs=n_packs,
        classifier_tau=tau_applied,
    )


def write_training_shards(
    packed: DataFrame, docs: DataFrame, path: str
) -> None:
    """Materialize the curated corpus as training shards.

    Joins the pack assignment back to the document bodies and writes
    parquet partitioned by ``shard_id``, rows sorted by (pack_id,
    doc_id) within each shard so a sequential reader sees every pack's
    documents contiguously — the layout a packed-sequence data loader
    streams without shuffling.  One output directory per shard; shard
    count was sized by ``pack_documents`` (one FFD task each), so files
    are uniform.  This is the ONLY stage that moves text bodies, and it
    moves them exactly once."""
    (
        packed.join(docs.select("doc_id", "text"), "doc_id")
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "pack_id", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


@dataclass(frozen=True)
class ShardCurationStats:
    """Funnel counts for one incremental shard run."""

    shard_input: int
    after_store_dedup: int
    corpus: CurationStats
    admitted: int


def curate_shard(
    shard: DataFrame,
    store_path: str,
    *,
    banded_table: str | None = None,
    commit: bool = True,
    **curate_kwargs,
) -> tuple[DataFrame, ShardCurationStats]:
    """The INCREMENTAL curation loop: curate one new shard against a
    persisted corpus snapshot — the shape a production pipeline runs
    per crawl drop, where :func:`curate_corpus` is the one-shot batch
    form.

    Stages: (0) near-dup probe of the shard against the signature
    store (``dedup_shard_against_store`` — canonical-first within the
    shard, read-only vs the store; ``banded_table`` selects the
    bucketed at-scale probe); (1–7) the full :func:`curate_corpus`
    funnel over the store-fresh survivors (its internal dedup stages
    are then no-op re-checks — correctness first; a tuned deployment
    skips the second signature pass); (8) with ``commit=True``, the
    FINAL survivors' signatures are admitted to the store (idempotent
    anti-join append, same guard as ``ingest_batch``), so the next
    shard dedups against them.  Only curated canonical docs ever enter
    the store — a quality-rejected doc's future twins are judged on
    their own merits, not shadowed by a rejected canonical.

    Caveat (documented, matches the store's contract): docs under the
    shingle width carry no signature, so exact twins of SHORT store
    docs are only caught within one shard's exact-dedup stage."""
    from pyspark.sql import functions as FF

    from kafkastreamsproject_spark.streaming.neardup import (
        dedup_shard_against_store,
    )

    n_input = shard.count()
    verdicts = dedup_shard_against_store(
        shard, store_path, banded_table=banded_table
    )
    fresh = shard.join(
        verdicts.filter(FF.col("accepted")).select("doc_id"), "doc_id", "left_semi"
    )
    packed, corpus_stats = curate_corpus(fresh, **curate_kwargs)

    n_admitted = 0
    if commit:
        from kafkastreamsproject_spark.operators.fs import hadoop_has_files
        from kafkastreamsproject_spark.streaming.neardup import (
            _SIG_SCHEMA,
            doc_signatures,
        )

        spark = shard.sparkSession
        sig_path = f"{store_path}/signatures"
        survivors = shard.join(packed.select("doc_id"), "doc_id", "left_semi")
        sigs = doc_signatures(survivors)
        if hadoop_has_files(spark, sig_path):
            existing = spark.read.schema(_SIG_SCHEMA).parquet(sig_path)
            sigs = sigs.join(existing.select("doc_id"), "doc_id", "left_anti")
        admitted = sigs.localCheckpoint(eager=True)
        n_admitted = admitted.count()
        admitted.write.mode("append").parquet(sig_path)

    return packed, ShardCurationStats(
        shard_input=n_input,
        after_store_dedup=corpus_stats.input,
        corpus=corpus_stats,
        admitted=n_admitted,
    )
