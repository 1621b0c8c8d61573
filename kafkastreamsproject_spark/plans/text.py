"""Text-analysis queries over ``documents`` (SURVEY.md §2.7 / M4 extension:
token counting, quality scoring, language-ID, fingerprinting).

All expressions are JVM-side (functions/text.py) — no Python UDFs in any
hot path.  The DuckDB twins use list lambdas over the same tokenization
(split on ``' +'``) so both engines see identical token streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.functions import text as TX
from kafkastreamsproject_spark.plans.registry import register
from kafkastreamsproject_spark.sources.testdata import fan_out, load_table

# DuckDB-side tokenization shared by the oracle strings.
_SQL_TOKENS = "string_split_regex(trim(text), ' +')"
_SQL_STOP = "('" + "', '".join(TX.STOPWORDS) + "')"


@register(
    "doc_token_stats",
    oracle=f"""
    SELECT
      doc_id,
      CAST(len({_SQL_TOKENS}) AS INT) AS n_tokens,
      CAST(len(list_distinct({_SQL_TOKENS})) AS INT) AS n_distinct_tokens,
      ROUND(length(replace(trim(text), ' ', ''))
            / CAST(len({_SQL_TOKENS}) AS DOUBLE), 6) AS avg_token_len,
      CAST(len(list_filter({_SQL_TOKENS}, t -> t IN {_SQL_STOP})) AS INT)
        AS n_stopwords,
      {TX.sql_n_bpe_tokens()} AS n_bpe_tokens
    FROM documents
    """,
    tags=("text",),
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: counts, distinct counts, mean token
    length, stopword count, and a BPE-ish-piece count (the cheap LLM
    token-budget proxy — GPT-2-style lookahead-free pre-tokenizer regex,
    functions/text.py:BPE_ISH_PATTERN) — one split + one regex pass per
    row, fully codegen'd."""
    docs = load_table(spark, "documents", sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.n_tokens(t).alias("n_tokens"),
        TX.n_distinct_tokens(t).alias("n_distinct_tokens"),
        F.round(TX.avg_token_len(t), 6).alias("avg_token_len"),
        TX.stopword_count(t).alias("n_stopwords"),
        TX.n_bpe_tokens(t).alias("n_bpe_tokens"),
    )


@register(
    "quality_score",
    oracle=f"""
    WITH feats AS (
      SELECT
        doc_id, lang,
        len(list_distinct({_SQL_TOKENS}))
          / CAST(len({_SQL_TOKENS}) AS DOUBLE) AS ttr,
        len(list_filter({_SQL_TOKENS}, t -> t IN {_SQL_STOP}))
          / CAST(len({_SQL_TOKENS}) AS DOUBLE) AS sw,
        length(replace(trim(text), ' ', ''))
          / CAST(len({_SQL_TOKENS}) AS DOUBLE) AS alen
      FROM documents
    )
    SELECT doc_id, lang,
      ROUND(ttr * 0.6 + (1.0 - sw) * 0.3
            + (CASE WHEN alen >= 3.0 AND alen <= 8.0 THEN 1.0 ELSE 0.5 END) * 0.1,
            6) AS quality
    FROM feats
    """,
    tags=("text",),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (lexical diversity, stopword ratio,
    token-length sanity) — the filter stage of a data-quality pipeline."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        "lang",
        F.round(TX.quality_score(F.col("text")), 6).alias("quality"),
    )


def _sql_marker_count(lang: str) -> str:
    markers = "('" + "', '".join(TX.LANG_MARKERS[lang]) + "')"
    return f"len(list_filter({_SQL_TOKENS}, t -> t IN {markers}))"


def _sql_lang_id() -> str:
    counts = {lang: _sql_marker_count(lang) for lang in TX.LANG_MARKERS}
    best = "GREATEST(" + ", ".join(counts.values()) + ")"
    whens = "\n        ".join(
        f"WHEN {counts[lang]} = {best} THEN '{lang}'" for lang in TX.LANG_MARKERS
    )
    return f"CASE {whens} ELSE 'unknown' END"


@register(
    "lang_id_predict",
    oracle=f"""
    SELECT
      doc_id,
      lang AS label,
      {_sql_lang_id()} AS predicted
    FROM documents
    """,
    tags=("text",),
)
def lang_id_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID with deterministic argmax tie-break —
    the n-gram-heuristic operator shape (accuracy is a model question;
    the engine contract is the deterministic scoring plan)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.col("lang").alias("label"),
        TX.lang_id(F.col("text")).alias("predicted"),
    )


@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT
      doc_id,
      md5(text) AS exact_fp,
      md5(array_to_string(list_sort(list_distinct({_SQL_TOKENS})), ' '))
        AS tokenset_fp
    FROM documents
    """,
    tags=("text", "dedup"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact md5 + order-insensitive token-set
    md5.  The first 8 hex chars of either give a uniform shard key for
    distributed dedup at 100 TB."""
    docs = load_table(spark, "documents", sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.exact_fingerprint(t).alias("exact_fp"),
        TX.tokenset_fingerprint(t).alias("tokenset_fp"),
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, unnest({_SQL_TOKENS.replace("trim(text)", "trim(text)")}) AS term
      FROM documents
    ),
    tfc AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tf GROUP BY doc_id, term
    ),
    dfc AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfc GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tfc.doc_id, tfc.term, tfc.tf,
             ROUND(tfc.tf * ln(CAST(n.n_docs AS DOUBLE) / dfc.df), 6) AS tfidf
      FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, CAST(rn AS INT) AS rnk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    tags=("text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, fully relational: term frequencies (explode + groupBy),
    document frequencies (second groupBy), idf = ln(N/df) via a 1-row
    broadcast of the corpus count, top-3 terms per doc by rounded score
    with a term tie-break.  At 100 TB each stage is a partial+final hash
    aggregate.

    df via a window over tf, not a second aggregate of it (r16): tf fed
    BOTH the broadcast-df build and the scored left side, and Catalyst
    re-ran the whole tokenize→explode→groupBy(doc, term) pipeline per
    consumer — the r16 before-plan scans documents twice with duplicate
    Generate+HashAggregate+Exchange subtrees (plans/r16/
    tfidf_top_terms_before.txt nodes 1-5 vs 6-10).  ``count() OVER
    (PARTITION BY term)`` computes the same df (tf holds exactly one
    row per (doc, term)) in one pass over one tf pipeline — documents
    is scanned ONCE, and the full-corpus second tokenize disappears;
    the term-keyed window exchange replaces the dfreq aggregate's
    exchange one-for-one.  (A scoped_persist of tf was A/B-measured
    WORSE — noop 1.49× — the cache round-trip costs more than the
    pipeline it saves at any SF where tf fits; rejected.)"""
    docs = load_table(spark, "documents", sf_dir)
    terms = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window as _W

    dfc = F.count(F.lit(1)).over(_W.partitionBy("term"))
    scored = (
        tf.withColumn("df", dfc)
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "tfidf", "rnk")
    )


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH p AS (
      SELECT lang AS label, {_sql_lang_id()} AS predicted FROM documents
    )
    SELECT label, predicted,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY label)
                                 AS DOUBLE), 6) AS label_share
    FROM p GROUP BY label, predicted
    """,
    tags=("text", "diagnostic"),
    tier="shadow",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFUSION MATRIX: per (labeled lang, predicted lang)
    cell, the document count and its share of the label's row — the
    evaluation a pipeline runs before trusting the lang filter's
    allow-list (diagonal shares are per-language recall; off-diagonal
    mass shows which languages the marker heuristic confuses).  Builds
    on lang_id_predict's verified scorer.

    Scale shape: prediction is a row-local expression over the scan;
    the rollup shuffles only (label, predicted) pairs — the matrix is
    |langs|² cells regardless of corpus size, and the share window
    runs over those cells, not rows."""
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    p = docs.select(
        F.col("lang").alias("label"), TX.lang_id(F.col("text")).alias("predicted")
    )
    counts = p.groupBy("label", "predicted").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = W.partitionBy("label")
    return counts.select(
        "label",
        "predicted",
        "n_docs",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(w).cast("double"), 6
        ).alias("label_share"),
    )


@register(
    "text_normalize",
    oracle=f"""
    SELECT doc_id,
           md5(text) AS raw_fp,
           regexp_replace(trim(lower(text)), ' +', ' ', 'g') AS norm_text,
           md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS norm_fp,
           (md5(text) != md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')))
             AS changed
    FROM documents
    """,
    tags=("text",),
    tier="shadow",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — the transform every dedup hash
    should run BEHIND (lowercase, trim, collapse whitespace runs), with
    before/after fingerprints so downstream exact-dedup audits can
    quantify how much duplication normalization exposes (raw_fp
    distinct-count vs norm_fp distinct-count).  Row-local, zero
    shuffle, whole-stage codegen; the same expression is reusable as a
    pre-hash stage in the funnel.  Kept ASCII-only by design — the
    fixture charset pin (tests/test_fixture_drift.py) guards the
    simple lower(); a unicode corpus swaps in ICU casefolding behind
    the same fingerprint contract."""
    docs = load_table(spark, "documents", sf_dir)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    return docs.select(
        "doc_id",
        F.md5("text").alias("raw_fp"),
        norm.alias("norm_text"),
        F.md5(norm).alias("norm_fp"),
        (F.md5("text") != F.md5(norm)).alias("changed"),
    )


_BM25_TERMS = ("vector", "hash", "stream")
_BM25_K1 = "1.2"
# scoring expression shared verbatim by both engines (order-pinned):
#   idf_t = ln((N - df_t + 0.5) / (df_t + 0.5) + 1.0)            [BM25+1 idf]
#   s_t   = idf_t * (tf_t * 2.2) / (tf_t + 1.2*(0.25 + 0.75*dl/avgdl))
# with k1 = 1.2, b = 0.75 folded into the literals 2.2 / 0.25 / 0.75.


def _bm25_sql() -> str:
    toks = "string_split_regex(trim(text), ' +')"
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter({toks}, t -> t = '{w}')) AS DOUBLE) AS tf{i}"
        for i, w in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    score = " + ".join(
        f"ln((s.n_docs - s.df{i} + 0.5) / (s.df{i} + 0.5) + 1.0)"
        f" * (b.tf{i} * 2.2)"
        f" / (b.tf{i} + 1.2 * (0.25 + 0.75 * b.dl / s.avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    tf_any = " + ".join(f"b.tf{i}" for i in range(len(_BM25_TERMS)))
    return f"""
    WITH {_bm25_ctes()}
    SELECT b.doc_id, ROUND({score}, 6) AS bm25
    FROM base b, stats s
    WHERE {tf_any} > 0
    """


def _bm25_ctes() -> str:
    """Shared base/stats CTE prefix for the BM25-family oracles."""
    toks = "string_split_regex(trim(text), ' +')"
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter({toks}, t -> t = '{w}')) AS DOUBLE) AS tf{i}"
        for i, w in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    return f"""base AS (
      SELECT doc_id,
             CAST(len({toks}) AS DOUBLE) AS dl,
             {tf_cols}
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             SUM(dl) / COUNT(*) AS avgdl,
             {df_cols}
      FROM base
    )"""


def _bm25_score_sql() -> str:
    """The pinned-order per-term score sum (b × s rows)."""
    return " + ".join(
        f"ln((s.n_docs - s.df{i} + 0.5) / (s.df{i} + 0.5) + 1.0)"
        f" * (b.tf{i} * 2.2)"
        f" / (b.tf{i} + 1.2 * (0.25 + 0.75 * b.dl / s.avgdl))"
        for i in range(len(_BM25_TERMS))
    )


@register(
    "bm25_retrieval",
    oracle_fn=_bm25_sql,
    tags=("text", "retrieval"),
    tier="shadow",
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (k1=1.2, b=0.75) for a fixed three-term
    query — the ranking function behind corpus search and the lexical
    half of hybrid (BM25 + embedding) retrieval.

    One codegen'd scan computes per-document term frequencies and
    length; the corpus statistics (N, avgdl, per-term document
    frequencies) reduce to ONE row, broadcast back — the sanctioned
    1-row BroadcastNestedLoopJoin, never a shuffle of documents.  At
    100 TB the same plan holds: stats are a second map-reduce over the
    tf columns (bytes per executor), and scoring stays row-local.  The
    per-term score sum is written in a pinned left-to-right order with
    identical literals on both engines, so the 6-dp round is
    cross-engine deterministic.  Returns every matching document's
    score; top-k is a deterministic ORDER BY bm25 DESC, doc_id away.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = TX.tokens(F.col("text"))
    base_cols = [
        F.col("doc_id"),
        F.size(toks).cast("double").alias("dl"),
    ]
    def _eq(word: str):
        # one-arg lambda: a two-arg lambda would be read by F.filter as
        # the (element, index) form and bind `word` to the index column
        return lambda t: t == word

    for i, w in enumerate(_BM25_TERMS):
        base_cols.append(
            F.size(F.filter(toks, _eq(w))).cast("double").alias(f"tf{i}")
        )
    base = docs.select(*base_cols)
    stat_cols = [
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    ]
    for i in range(len(_BM25_TERMS)):
        stat_cols.append(
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df{i}")
        )
    stats = base.agg(*stat_cols)
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        s_i = (
            idf
            * (F.col(f"tf{i}") * F.lit(2.2))
            / (
                F.col(f"tf{i}")
                + F.lit(1.2)
                * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
            )
        )
        score = s_i if score is None else score + s_i
    tf_any = None
    for i in range(len(_BM25_TERMS)):
        tf_any = (
            F.col(f"tf{i}")
            if tf_any is None
            else tf_any + F.col(f"tf{i}")
        )
    return (
        base.join(F.broadcast(stats))
        .filter(tf_any > 0)
        .select("doc_id", F.round(score, 6).alias("bm25"))
    )


@register(
    "token_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
    FROM toks, tot
    GROUP BY token, tot.n
    HAVING COUNT(*) > 0.03 * tot.n
    """,
    tags=("text", "sketch"),
    tier="shadow",
)
def token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters (tokens above 3% frequency) via the
    Misra-Gries candidate-prune + exact-confirm operator
    (operators/heavyhitters.py).

    The sketch phase is one Arrow-batched pass per partition emitting
    at most ceil(1/phi)=34 candidates each — at 100 TB the shuffle
    carries O(partitions/phi) values instead of one pair per distinct
    token, and the confirm join counts exactly, so the result equals
    the plain groupBy-HAVING oracle bit-for-bit.  The only Python in
    the plan is the per-partition summarizer (mapInPandas); the
    explode, confirm join, count, and threshold all stay JVM-side.
    """
    from kafkastreamsproject_spark.operators.heavyhitters import (
        heavy_hitters_exact,
    )

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    return heavy_hitters_exact(toks, "token", phi=0.03)


@register(
    "lang_source_chisq",
    oracle="""
    WITH obs AS (
      SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS o
      FROM documents GROUP BY lang, source
    ),
    margins AS (
      SELECT o.lang, o.source, o.o,
             SUM(o.o) OVER (PARTITION BY o.lang) AS row_tot,
             SUM(o.o) OVER (PARTITION BY o.source) AS col_tot,
             SUM(o.o) OVER () AS n
      FROM obs o
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM((o - row_tot * col_tot / n)
                     * (o - row_tot * col_tot / n)
                     / (row_tot * col_tot / n)), 6) AS chi_square
    FROM margins
    """,
    tags=("text", "stats"),
    tier="shadow",
)
def lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for the lang × source
    contingency table — the drift/bias test a corpus monitor runs
    ("did the language mix shift between crawls?").

    The observed table is |langs|×|sources| cells of exact integer
    counts; margins come from window sums over that tiny table (no
    second scan of documents), and the statistic's expression —
    (o − rc/n)²/(rc/n) — is written identically on both engines over
    identical doubles derived from exact counts.  Only the cell
    aggregation touches the corpus: one shuffle of (lang, source)
    pairs."""
    docs = load_table(spark, "documents", sf_dir)
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    from pyspark.sql import Window as W

    row_tot = F.sum("o").over(W.partitionBy("lang"))
    col_tot = F.sum("o").over(W.partitionBy("source"))
    n = F.sum("o").over(W.partitionBy())
    e = row_tot * col_tot / n
    cells = obs.select("lang", "source", "o", e.alias("e"))
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum(
                (F.col("o") - F.col("e"))
                * (F.col("o") - F.col("e"))
                / F.col("e")
            ),
            6,
        ).alias("chi_square"),
    )


_PMI_MIN_COUNT = 20


@register(
    "pmi_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKENS}) AS w FROM documents
    ),
    uni AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY w),
    nu AS (SELECT SUM(c) AS n FROM uni),
    bi AS (
      SELECT unnest(list_transform(
               range(1, len({_SQL_TOKENS})),
               i -> {{'a': {_SQL_TOKENS}[i], 'b': {_SQL_TOKENS}[i + 1]}}))
               AS p
      FROM documents
    ),
    bic AS (
      SELECT p.a AS a, p.b AS b, CAST(COUNT(*) AS DOUBLE) AS c_ab
      FROM bi GROUP BY p.a, p.b
    ),
    nb AS (SELECT SUM(c_ab) AS n FROM bic)
    SELECT bc.a, bc.b, CAST(bc.c_ab AS BIGINT) AS pair_count,
           ROUND(ln((bc.c_ab / nb.n)
                    / ((ua.c / nu.n) * (ub.c / nu.n))), 6) AS pmi
    FROM bic bc
    JOIN uni ua ON ua.w = bc.a
    JOIN uni ub ON ub.w = bc.b, nu, nb
    WHERE bc.c_ab >= {_PMI_MIN_COUNT}
    """,
    tags=("text", "stats"),
    tier="shadow",
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent token pairs — the
    collocation detector ("New York"-finder) behind phrase-aware
    tokenization and stop-phrase mining.  PMI = ln(p(ab) / (p(a)p(b)))
    from exact corpus counts, reported for pairs seen >= 20 times.

    Bigrams are generated WITH multiplicity (unlike the dedup
    shingles) by a row-local transform; the unigram and bigram count
    tables are vocabulary-bounded, so the two PMI lookup joins
    broadcast and the corpus shuffles only (token) / (pair) count
    pairs.  The PMI expression is division/ln over identical doubles
    derived from exact counts, written in the same order on both
    engines."""
    docs = load_table(spark, "documents", sf_dir)
    toks = TX.tokens(F.col("text"))
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    nu = uni.agg(F.sum("c").alias("n_uni"))
    # zip_with over slices, not element_at(toks, i) in a transform
    # lambda: interpreted HOF eval re-runs split(text) per element —
    # O(L²)/doc; the slice pair evaluates it O(1) times per row
    bigrams = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    bic = bigrams.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("double").alias("c_ab")
    )
    nb = bic.agg(F.sum("c_ab").alias("n_bi"))
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    return (
        bic.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .join(F.broadcast(nu))
        .join(F.broadcast(nb))
        .select(
            "a",
            "b",
            F.col("c_ab").cast("bigint").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("n_bi"))
                    / (
                        (F.col("c_a") / F.col("n_uni"))
                        * (F.col("c_b") / F.col("n_uni"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


_CMS_D = 4  # sketch rows (independent hash functions)
_CMS_W = 64  # counters per row — deliberately small so collisions occur
             # at fixture scale and the overestimate column is non-trivial


@register(
    "cms_token_freq",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    inst AS (
      SELECT token, unnest(range(0, {_CMS_D})) AS r FROM toks
    ),
    cnts AS (
      SELECT r,
             ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token), 1, 8))
               ::BIGINT % {_CMS_W} AS bucket,
             COUNT(*) AS cnt
      FROM inst GROUP BY 1, 2
    ),
    freq AS (SELECT token, COUNT(*) AS exact_freq FROM toks GROUP BY token),
    probes AS (
      SELECT token, exact_freq, unnest(range(0, {_CMS_D})) AS r FROM freq
    )
    SELECT p.token,
           CAST(MAX(p.exact_freq) AS BIGINT) AS exact_freq,
           CAST(MIN(c.cnt) AS BIGINT) AS cms_est,
           CAST(MIN(c.cnt) - MAX(p.exact_freq) AS BIGINT) AS overestimate
    FROM probes p
    JOIN cnts c
      ON c.r = p.r
     AND c.bucket = ('0x' || substr(md5(CAST(p.r AS VARCHAR) || ':' || p.token),
                                    1, 8))::BIGINT % {_CMS_W}
    GROUP BY p.token
    """,
    tags=("text", "sketch"),
    tier="shadow",
)
def cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation with exact verification:
    every token instance increments one counter per sketch row (d=4
    rows × w=64 counters, md5-derived row-salted hashes shared
    bit-for-bit by both engines), and a token's estimate is the MIN of
    its d counters — Cormode-Muthukrishnan's one-sided estimator, so
    ``overestimate`` is provably ≥ 0 for every token (property-pinned
    in tests/test_operator_properties.py).

    Same invisible-sketch contract as token_heavy_hitters and the bloom
    join: the sketch is the production device, the exact side is the
    verification harness that keeps the query oracle-checkable.  Scale
    shape: counter building is ONE shuffle whose cardinality is d·w =
    256 groups regardless of corpus size (map-side partial agg
    collapses each task to ≤256 rows — this is why CMS beats exact
    counting at 100 TB: the shuffle is constant-width); the finished
    sketch broadcasts to the probe side.  The probe set here is the
    full vocabulary (bounded in the fixtures); in production it's the
    heavy-hitter candidates."""
    from kafkastreamsproject_spark.sources.testdata import fan_out

    docs = fan_out(load_table(spark, "documents", sf_dir))
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
    rows = F.array(*[F.lit(r) for r in range(_CMS_D)])

    def bucket(r, token):
        from kafkastreamsproject_spark.functions.hashing import token_hash32

        return token_hash32(
            F.concat(r.cast("string"), F.lit(":"), token)
        ) % _CMS_W

    cnts = (
        toks.select("token", F.explode(rows).alias("r"))
        .select("r", bucket(F.col("r"), F.col("token")).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    freq = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("exact_freq")
    )
    probes = freq.select(
        "token", "exact_freq", F.explode(rows).alias("r")
    ).select(
        "token",
        "exact_freq",
        "r",
        bucket(F.col("r"), F.col("token")).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cnts), ["r", "bucket"])
        .groupBy("token")
        .agg(
            F.max("exact_freq").alias("exact_freq"),
            F.min("cnt").alias("cms_est"),
            (F.min("cnt") - F.max("exact_freq")).alias("overestimate"),
        )
    )


@register(
    "bigram_lm_predict",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents
    ),
    pairs AS (
      SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts)),
                      i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) AS b
        FROM tok
      )
    ),
    cnt AS (SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
    best AS (
      SELECT w1, w2 AS pred FROM (
        SELECT w1, w2,
               ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY c DESC, w2) AS rn
        FROM cnt
      ) WHERE rn = 1
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(CASE WHEN p.w2 = b.pred THEN 1 ELSE 0 END) AS BIGINT)
             AS n_predicted,
           ROUND(SUM(CASE WHEN p.w2 = b.pred THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
    FROM pairs p JOIN best b USING (w1)
    GROUP BY p.doc_id
    """,
    tags=("text", "lm"),
    tier="shadow",
)
def bigram_lm_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM predictability: train the argmax bigram continuation
    table on the corpus (count every adjacent token pair; per left
    token keep the most frequent successor, lexicographic tie-break)
    and score each document by the fraction of its transitions the
    model predicts.  High-accuracy docs are templated/boilerplate
    (every transition is the corpus mode); low-accuracy docs are
    novel or garbled — the n-gram-LM quality signal with exact integer
    counts instead of smoothed log-probs, so the oracle compare is
    bit-exact.

    Scale shape: the bigram explode is one token-array pass per doc
    (positions via sequence + get, no self-join); pair counting is one
    shuffle on (w1, w2) with map-side partial agg; the continuation
    table is |vocab| rows — broadcast to the scoring probe exactly like
    the unigram freq table in doc_surprisal_quality; final rollup
    shuffles (doc_id, flag) pairs."""
    from kafkastreamsproject_spark.sources.testdata import fan_out

    # widen the single-row-group scan: the tokenize+explode is the
    # CPU-heavy stage and must not serialize on one core locally
    docs = fan_out(load_table(spark, "documents", sf_dir))
    ts = TX.tokens(F.col("text"))
    # let-bound (TX.let1): interpreted HOF eval would otherwise re-run
    # the tokenizing split per bigram — O(L²)/doc
    bigrams = TX.let1(
        ts,
        lambda t: F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    )
    from kafkastreamsproject_spark.operators.cache import scoped_persist

    # both the count aggregation and the scoring probe consume the
    # exploded pair stream — persist it or the tokenize+explode runs 2×
    pairs = scoped_persist(
        docs.filter(F.size(ts) >= 2)
        .select("doc_id", F.explode(bigrams).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    cnt = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window as W

    wb = W.partitionBy("w1").orderBy(F.col("c").desc(), F.col("w2"))
    best = (
        cnt.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("w1", F.col("w2").alias("pred"))
    )
    hit = (F.col("w2") == F.col("pred")).cast("long")
    return (
        pairs.join(F.broadcast(best), "w1")
        .select("doc_id", hit.alias("hit"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum("hit").alias("n_predicted"),
            F.round(
                F.sum("hit") / F.count(F.lit(1)).cast("double"), 6
            ).alias("accuracy"),
        )
    )


def _sql_bpe_pairs(words_cte: str, pairs_cte: str) -> str:
    """One BPE pair-count CTE pair: weighted adjacent-symbol-pair counts
    over a words relation, plus its argmax best-pair row.  MATERIALIZED
    so DuckDB evaluates each step once — inlined CTEs would expand the
    n-step chain into 2^n re-reads of the corpus (each w_k references
    w_{k-1} twice: via its own replace and via its pair counts)."""
    return f"""
    {pairs_cte} AS MATERIALIZED (
      SELECT pair, SUM(f) AS cnt FROM (
        SELECT unnest(list_transform(range(1, length(w)),
                      i -> substr(w, i, 2))) AS pair, f
        FROM {words_cte} WHERE length(w) >= 2
      ) GROUP BY pair
    ),
    b_{pairs_cte} AS MATERIALIZED (
      SELECT pair, cnt FROM (
        SELECT pair, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rn
        FROM {pairs_cte}
      ) WHERE rn = 1
    )"""


_BPE_STEPS = 12  # > the old digit-placeholder cap of 10, by design


def _bpe_oracle_sql(n_steps: int = _BPE_STEPS) -> str:
    """Generated n-step BPE oracle: the same CTE chain for any depth —
    pair counts + argmax per step, the merge applied with the SAME
    U+0100-based placeholder characters the Spark trainer uses, and
    per-step expansion CTEs (e_k references e_1..e_{k-1} by name, so
    the SQL stays O(n²) text instead of exponentially inlined)."""
    from kafkastreamsproject_spark.functions.bpe import placeholder

    ctes = [
        f"""w0 AS MATERIALIZED (
      SELECT tok AS w, COUNT(*) AS f FROM (
        SELECT unnest({_SQL_TOKENS}) AS tok FROM documents
      ) WHERE regexp_matches(tok, '^[a-z]+$')
      GROUP BY tok
    )"""
    ]
    for k in range(1, n_steps + 1):
        ctes.append(_sql_bpe_pairs(f"w{k - 1}", f"p{k}").strip())
        if k < n_steps:
            ctes.append(
                f"w{k} AS MATERIALIZED (SELECT replace(w, "
                f"(SELECT pair FROM b_p{k}), "
                f"'{placeholder(k - 1)}') AS w, f FROM w{k - 1})"
            )
    for k in range(1, n_steps + 1):
        e = "pair"
        for j in range(k - 1):
            e = f"replace({e}, '{placeholder(j)}', (SELECT x FROM e{j + 1}))"
        ctes.append(f"e{k} AS (SELECT {e} AS x, cnt FROM b_p{k})")
    selects = [
        f"SELECT CAST({k} AS INT) AS step, x AS merge_pair, "
        f"CAST(cnt AS BIGINT) AS cnt FROM e{k}"
        for k in range(1, n_steps + 1)
    ]
    return "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL ".join(
        selects
    )


@register(
    "bpe_merge_steps",
    oracle_fn=_bpe_oracle_sql,
    tags=("text", "tokenizer"),
    tier="shadow",
)
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, first 12 merge steps (Sennrich et al.):
    count corpus-frequency-weighted adjacent symbol pairs, merge the
    most frequent pair into a new symbol, recount, repeat — the inner
    loop every subword vocabulary is built with (vocab_top_pieces only
    COUNTS pieces; this learns merges).

    Merged symbols are single placeholder characters from U+0100
    upward (768 available — the r7 verdict's digit-placeholder cap of
    10 is gone; functions/bpe.py:MAX_STEPS), all outside the corpus
    alphabet (the vocab is defensively filtered to ^[a-z]+$ so a
    fixture drift cannot collide with them), so a symbol sequence
    stays an ordinary string and pair extraction stays substr(w, i, 2)
    — no array-of-struct state.  Pair semantics: overlapping
    occurrences each count ('aaa' contributes two 'aa'); the merge
    application is simultaneous left-to-right non-overlapping replace
    — identical in both engines, and pinned against an independent
    Python reference trainer in tests/test_text_functions.py
    (including past 10 steps and a 120-step run).  Emitted merges are
    expanded back to base characters.  Deterministic tie-break (count
    DESC, pair ASC — UTF-8 binary order equals codepoint order in both
    engines, so the non-ASCII placeholders sort identically).

    Scale shape: the working state is the WORD-frequency table (|vocab|
    rows), not the corpus — the one corpus-sized pass is the initial
    word count; each iteration is then a pair explode (≤|word|
    pairs/word) + one |alphabet+merges|²-bounded aggregation and a
    TakeOrdered(1) argmax whose single row joins the driver-side rule
    table (the sanctioned bounded collect; production BPE trainers
    keep exactly this split).  Lineage is localCheckpoint-truncated
    every few steps so plan depth stays constant however many merges
    run."""
    from kafkastreamsproject_spark.functions.bpe import learn_bpe

    docs = load_table(spark, "documents", sf_dir)
    w0 = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return learn_bpe(w0, n_steps=_BPE_STEPS)


def _sql_ngram_leg(k: int, label: str) -> str:
    grams = (
        f"list_transform(range(1, len({_SQL_TOKENS}) - {k} + 2), "
        f"i -> md5(array_to_string(({_SQL_TOKENS})[i:i+{k - 1}], ' ')))"
    )
    return f"""
    {label}_cnt AS (
      SELECT doc_id, g, COUNT(*) AS c FROM (
        SELECT doc_id, unnest({grams}) AS g
        FROM documents WHERE len({_SQL_TOKENS}) >= 3
      ) GROUP BY doc_id, g
    ),
    {label}_doc AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_{label}s,
             ROUND((SUM(c) - COUNT(*)) / CAST(SUM(c) AS DOUBLE), 6)
               AS dup_{label}_frac,
             ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6)
               AS top_{label}_share
      FROM {label}_cnt GROUP BY doc_id
    )"""


@register(
    "doc_repetition_stats",
    oracle=f"""
    WITH {_sql_ngram_leg(2, "bigram").strip()},
    {_sql_ngram_leg(3, "trigram").strip()}
    SELECT b.doc_id, b.n_bigrams, b.dup_bigram_frac, b.top_bigram_share,
           t.n_trigrams, t.dup_trigram_frac, t.top_trigram_share
    FROM bigram_doc b JOIN trigram_doc t ON t.doc_id = b.doc_id
    """,
    tags=("text", "quality"),
    tier="shadow",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals — the Gopher/MassiveText
    quality-filter family (Rae et al. 2021, "Scaling Language Models:
    ... Gopher", §A1.1: duplicate n-gram fractions and top-n-gram
    share): a document whose 2/3-grams are mostly repeats of
    themselves is boilerplate or a generation loop and gets filtered
    before training.  Per document and per n ∈ {{2, 3}}: total n-grams,
    the DUPLICATE fraction 1 − distinct/total, and the share of the
    single most frequent n-gram.

    Spark-first shape: n-grams are higher-order array math on the
    un-exploded row, hashed to 16-byte md5 before the explode so the
    only shuffled payload is (doc_id, hash) — text never shuffles; a
    (doc_id, gram)-grouped count then one per-doc aggregate.  Both
    ratios divide organic integer counts once, rounded at 6 dp —
    cross-engine safe.  Scale: work ∝ corpus token count, state ∝
    per-doc distinct n-grams, exactly the chunk-dedup cost envelope."""
    docs = load_table(spark, "documents", sf_dir)
    toks = TX.tokens(F.col("text"))
    base = docs.filter(F.size(toks) >= 3).select("doc_id", toks.alias("t"))

    def leg(k: int, label: str) -> DataFrame:
        grams = F.transform(
            F.sequence(F.lit(1), F.size("t") - (k - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i, k))),
        )
        cnt = (
            base.select("doc_id", F.explode(grams).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        tot = F.sum("c")
        return cnt.groupBy("doc_id").agg(
            tot.alias(f"n_{label}s"),
            F.round(
                (tot - F.count(F.lit(1))) / tot.cast("double"), 6
            ).alias(f"dup_{label}_frac"),
            F.round(F.max("c") / tot.cast("double"), 6).alias(
                f"top_{label}_share"
            ),
        )

    return leg(2, "bigram").join(leg(3, "trigram"), "doc_id")


def _bpe_encode_chain(n_steps: int = _BPE_STEPS) -> str:
    """Shared CTE prefix for the encode-family oracles: the n-step
    learning chain, a second MATERIALIZED chain applying ALL n merges
    to the distinct-word table (original word kept as join key), and
    the (doc_id, lang, source, tok) word stream."""
    from kafkastreamsproject_spark.functions.bpe import placeholder

    ctes = [
        f"""w0 AS MATERIALIZED (
      SELECT tok AS w, COUNT(*) AS f FROM (
        SELECT unnest({_SQL_TOKENS}) AS tok FROM documents
      ) WHERE regexp_matches(tok, '^[a-z]+$')
      GROUP BY tok
    )"""
    ]
    for k in range(1, n_steps + 1):
        ctes.append(_sql_bpe_pairs(f"w{k - 1}", f"p{k}").strip())
        if k < n_steps:
            ctes.append(
                f"w{k} AS MATERIALIZED (SELECT replace(w, "
                f"(SELECT pair FROM b_p{k}), "
                f"'{placeholder(k - 1)}') AS w, f FROM w{k - 1})"
            )
    ctes.append("v0 AS (SELECT w AS orig, w AS cur FROM w0)")
    for k in range(1, n_steps + 1):
        ctes.append(
            f"v{k} AS MATERIALIZED (SELECT orig, replace(cur, "
            f"(SELECT pair FROM b_p{k}), '{placeholder(k - 1)}') AS cur "
            f"FROM v{k - 1})"
        )
    ctes.append(
        f"venc AS (SELECT orig, length(cur) AS n_sym FROM v{n_steps})"
    )
    ctes.append(
        f"""docw AS (
      SELECT doc_id, lang, source, tok FROM (
        SELECT doc_id, lang, source, unnest({_SQL_TOKENS}) AS tok
        FROM documents
      ) WHERE regexp_matches(tok, '^[a-z]+$')
    )"""
    )
    return "WITH " + ",\n    ".join(ctes)


def _bpe_encode_oracle_sql(n_steps: int = _BPE_STEPS) -> str:
    """Generated encode oracle over the shared chain."""
    return (
        _bpe_encode_chain(n_steps)
        + """
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(d.tok)) AS BIGINT) AS n_chars,
           CAST(SUM(v.n_sym) AS BIGINT) AS n_subwords,
           ROUND(SUM(length(d.tok)) / CAST(SUM(v.n_sym) AS DOUBLE), 6)
             AS compression
    FROM docw d JOIN venc v ON d.tok = v.orig
    GROUP BY d.doc_id"""
    )


def _bpe_fertility_oracle_sql(n_steps: int = _BPE_STEPS) -> str:
    """Generated fertility oracle over the shared chain, rolled up per
    (lang, source) instead of per document."""
    return (
        _bpe_encode_chain(n_steps)
        + """
    SELECT d.lang, d.source,
           CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(v.n_sym) AS BIGINT) AS n_subwords,
           SUM(v.n_sym) / CAST(COUNT(*) AS DOUBLE) AS fertility,
           SUM(length(d.tok)) / CAST(SUM(v.n_sym) AS DOUBLE)
             AS compression
    FROM docw d JOIN venc v ON d.tok = v.orig
    GROUP BY 1, 2"""
    )


@register(
    "bpe_encode_tokens",
    oracle_fn=_bpe_encode_oracle_sql,
    tags=("text", "tokenizer"),
    tier="shadow",
)
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode the corpus with the 12 learned
    BPE merges and report each document's subword-token count and
    chars-per-token compression — the number a packing/cost planner
    actually needs (n_bpe_tokens estimates by regex; this COUNTS under
    the learned vocabulary, the bpe_merge_steps trainer's output put
    to work).  Encoding applies the merge rules in learned priority
    order — the standard BPE encode loop — and because every symbol is
    one character, a word's token count is just the encoded string's
    length.

    Scale shape: the ENCODER runs once over the |vocab|-row distinct-
    word table (n sequential replaces, JVM codegen), which then
    broadcast-joins the (doc_id, word) token stream — the corpus is
    never re-scanned per merge step and text bodies never shuffle.
    Chars/subwords are organic integer sums; the one ratio divides
    them once at 6 dp."""
    from kafkastreamsproject_spark.functions.bpe import (
        apply_merges,
        learn_bpe_rules,
    )

    docs = load_table(spark, "documents", sf_dir)
    stream = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("w")
    ).filter(F.col("w").rlike("^[a-z]+$"))
    w0 = stream.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    rules = learn_bpe_rules(w0, n_steps=_BPE_STEPS)
    vocab = w0.select(
        "w", F.length(apply_merges(F.col("w"), rules)).alias("n_sym")
    )
    return (
        stream.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum("n_sym").alias("n_subwords"),
            F.round(
                F.sum(F.length("w")) / F.sum("n_sym").cast("double"), 6
            ).alias("compression"),
        )
    )


@register(
    "bpe_fertility_by_lang",
    oracle_fn=_bpe_fertility_oracle_sql,
    tags=("text", "tokenizer", "diagnostic"),
    tier="shadow",
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY readout per (lang, source): subword tokens
    per word under the learned 12-merge BPE vocabulary — the number a
    tokenizer team watches per language (a vocabulary trained on one
    language's distribution over-segments the others, inflating their
    token bills and effective sequence lengths; fertility differences
    are the standard evidence for reallocating vocab budget).
    Companion to bpe_encode_tokens (per-document counts): same learned
    rules, same encode loop, rolled up along the corpus' language and
    source axes, with compression (chars per subword) alongside.

    Exactness: counts are organic integer sums; fertility and
    compression are single int/int divisions (no round), bit-identical
    across engines.

    Scale shape: identical to bpe_encode_tokens — the encoder runs
    once over the |vocab|-row distinct-word table, broadcast-joins the
    word stream, and the rollup here shuffles |langs|x|sources|
    partial aggregates instead of doc_ids.  Text never shuffles."""
    from kafkastreamsproject_spark.functions.bpe import (
        apply_merges,
        learn_bpe_rules,
    )

    docs = load_table(spark, "documents", sf_dir)
    stream = docs.select(
        "doc_id", "lang", "source",
        F.explode(TX.tokens(F.col("text"))).alias("w"),
    ).filter(F.col("w").rlike("^[a-z]+$"))
    w0 = stream.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    rules = learn_bpe_rules(w0, n_steps=_BPE_STEPS)
    vocab = w0.select(
        "w", F.length(apply_merges(F.col("w"), rules)).alias("n_sym")
    )
    return (
        stream.join(F.broadcast(vocab), "w")
        .groupBy("lang", "source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_subwords"),
            (
                F.sum("n_sym") / F.count(F.lit(1)).cast("double")
            ).alias("fertility"),
            (
                F.sum(F.length("w")) / F.sum("n_sym").cast("double")
            ).alias("compression"),
        )
    )


_LANG_MIX_SEGS = 4  # per-doc segments for mixed-language detection


def _sql_seg_lang_id(seg: int) -> str:
    """DuckDB twin of the per-segment language vote: argmax marker
    count over segment ``seg`` of the near-equal token
    windows, 'unknown' when the segment carries no markers at all."""
    S = _LANG_MIX_SEGS
    seg_expr = (
        f"list_slice(toks, (({seg} * n) // {S}) + 1,"
        f" (({seg} + 1) * n) // {S})"
    )
    counts = {
        lang: (
            f"len(list_filter({seg_expr}, t -> t IN ('"
            + "', '".join(TX.LANG_MARKERS[lang])
            + "')))"
        )
        for lang in TX.LANG_MARKERS
    }
    best = "GREATEST(" + ", ".join(counts.values()) + ")"
    whens = " ".join(
        f"WHEN {counts[lang]} = {best} THEN '{lang}'"
        for lang in TX.LANG_MARKERS
    )
    return f"CASE WHEN {best} = 0 THEN 'unknown' {whens} ELSE 'unknown' END"


@register(
    "doc_lang_mix",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang AS label, {_SQL_TOKENS} AS toks,
             len({_SQL_TOKENS}) AS n
      FROM documents
    ),
    votes AS (
      SELECT doc_id, label,
        {", ".join(f"{_sql_seg_lang_id(s)} AS p{s}" for s in range(_LANG_MIX_SEGS))}
      FROM t
    )
    SELECT doc_id, label,
      {" || ',' || ".join(f"p{s}" for s in range(_LANG_MIX_SEGS))}
        AS seg_preds,
      CAST(len(list_distinct(list_filter(
        [{", ".join(f"p{s}" for s in range(_LANG_MIX_SEGS))}],
        p -> p != 'unknown'))) AS INT) AS n_seg_langs,
      CAST(len(list_distinct(list_filter(
        [{", ".join(f"p{s}" for s in range(_LANG_MIX_SEGS))}],
        p -> p != 'unknown'))) >= 2 AS BOOLEAN) AS is_mixed
    FROM votes
    """,
    tags=("text", "diagnostic"),
    tier="shadow",
)
def doc_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language DOCUMENT detection — the per-segment refinement
    of lang_id_predict's whole-doc vote: each document splits into 4
    near-equal token windows, each window votes via the marker-token
    argmax ('unknown' when it carries no markers), and a doc whose
    windows disagree on two or more real languages is flagged mixed.
    Code-switching and concatenation artifacts (boilerplate in one
    language stitched to content in another) are invisible to a
    whole-doc argmax — the dominant language simply outvotes the
    minority span — and per-segment voting is the standard cheap
    detector a curation pipeline runs before deciding whether to
    split, drop, or route such docs.

    Scale shape: entirely row-local — segment bounds are integer
    floor divisions (Spark `div`, DuckDB `//` — the engine-exact
    pair), marker counts are in-row array filters over token slices,
    and no column but the verdict leaves the row.  Zero shuffle at
    any corpus size."""
    docs = load_table(spark, "documents", sf_dir)
    toks = TX.tokens(F.col("text"))
    base = docs.select(
        "doc_id", F.col("lang").alias("label"), toks.alias("toks")
    ).withColumn("n", F.size("toks"))
    S = _LANG_MIX_SEGS

    def seg_pred(s: int):
        lo = F.expr(f"({s} * n) div {S}")
        hi = F.expr(f"(({s} + 1) * n) div {S}")
        seg = F.slice(F.col("toks"), lo + 1, hi - lo)
        counts = {
            lang: F.size(
                F.filter(seg, lambda t: t.isin(*TX.LANG_MARKERS[lang]))
            )
            for lang in TX.LANG_MARKERS
        }
        best = F.greatest(*counts.values())
        expr = F.lit("unknown")
        for lang in reversed(list(TX.LANG_MARKERS)):
            expr = F.when(counts[lang] == best, F.lit(lang)).otherwise(expr)
        return F.when(best == 0, F.lit("unknown")).otherwise(expr)

    preds = base.select(
        "doc_id",
        "label",
        *[seg_pred(s).alias(f"p{s}") for s in range(S)],
    )
    arr = F.array(*[F.col(f"p{s}") for s in range(S)])
    real = F.array_distinct(F.filter(arr, lambda p: p != F.lit("unknown")))
    return preds.select(
        "doc_id",
        "label",
        F.concat_ws(",", arr).alias("seg_preds"),
        F.size(real).alias("n_seg_langs"),
        (F.size(real) >= 2).alias("is_mixed"),
    )


_BPE_CURVE_DEPTHS = (0, 4, 8, _BPE_STEPS)  # vocab budgets swept


def _bpe_fertility_curve_oracle_sql() -> str:
    """Corpus fertility at every swept merge depth, read off the encode
    chain's already-materialized intermediates v0/v4/v8/v12."""
    st = " UNION ALL ".join(
        f"SELECT {d} AS depth, orig, length(cur) AS n_sym FROM v{d}"
        for d in _BPE_CURVE_DEPTHS
    )
    return (
        _bpe_encode_chain(_BPE_STEPS)
        + f""",
    st AS ({st})
    SELECT CAST(s.depth AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(d.tok)) AS BIGINT) AS n_chars,
           CAST(SUM(s.n_sym) AS BIGINT) AS n_subwords,
           SUM(s.n_sym) / CAST(COUNT(*) AS DOUBLE) AS fertility,
           SUM(length(d.tok)) / CAST(SUM(s.n_sym) AS DOUBLE) AS compression
    FROM docw d JOIN st s ON d.tok = s.orig
    GROUP BY s.depth"""
    )


@register(
    "bpe_fertility_curve",
    oracle_fn=_bpe_fertility_curve_oracle_sql,
    tags=("text", "tokenizer", "diagnostic"),
    tier="shadow",
)
def bpe_fertility_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility vs VOCABULARY SIZE — the tokenizer-budget curve: the
    corpus encoded under the first 0, 4, 8, and 12 learned merges
    (greedy BPE training makes every prefix of a 12-step run exactly
    the k-step tokenizer, so one training yields the whole sweep) with
    subwords-per-word and chars-per-subword at each depth.  Depth 0 is
    the character tokenizer (fertility = chars/word, compression 1.0);
    the curve's flattening is the diminishing-returns readout a vocab
    budget is priced against — the sweep companion to
    bpe_fertility_by_lang's single-depth per-language table.

    Exactness: counts are organic integer sums; the two ratios are
    single int/int divisions (no round), bit-identical across engines —
    the oracle reads its depths off the encode chain's materialized
    v{{k}} intermediates, so the sweep re-verifies the chain itself.

    Scale shape: the encoder (all four depths) runs over the
    |vocab|-row distinct-word table only, broadcast-joins the word
    stream once, and the corpus collapses to ONE aggregate row (six
    integer sums) that a stack fans back out to the four depth rows —
    adding a depth costs one more |vocab|-row column, never a corpus
    re-scan."""
    from kafkastreamsproject_spark.functions.bpe import (
        apply_merges,
        learn_bpe_rules,
    )

    docs = load_table(spark, "documents", sf_dir)
    stream = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("w")
    ).filter(F.col("w").rlike("^[a-z]+$"))
    w0 = stream.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    rules = learn_bpe_rules(w0, n_steps=_BPE_STEPS)
    vocab = w0.select(
        "w",
        *[
            F.length(apply_merges(F.col("w"), rules[:d])).alias(f"n{d}")
            for d in _BPE_CURVE_DEPTHS
        ],
    )
    totals = (
        stream.join(F.broadcast(vocab), "w")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            *[F.sum(f"n{d}").alias(f"s{d}") for d in _BPE_CURVE_DEPTHS],
        )
    )
    stack_args = ", ".join(f"{d}, s{d}" for d in _BPE_CURVE_DEPTHS)
    st = totals.select(
        "n_words",
        "n_chars",
        F.expr(
            f"stack({len(_BPE_CURVE_DEPTHS)}, {stack_args})"
            " AS (depth, n_subwords)"
        ),
    )
    return st.select(
        "depth",
        "n_words",
        "n_chars",
        "n_subwords",
        (F.col("n_subwords") / F.col("n_words").cast("double")).alias(
            "fertility"
        ),
        (F.col("n_chars") / F.col("n_subwords").cast("double")).alias(
            "compression"
        ),
    )


@register(
    "zipf_slope_fit",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok),
    rk AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r FROM freq
    ),
    p AS (
      SELECT CAST(length(format('{{:b}}', r)) AS BIGINT) AS x,
             CAST(length(format('{{:b}}', c)) AS BIGINT) AS y,
             c
      FROM rk
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM p
    )
    SELECT n_types, n_tokens,
           n_types * sxy - sx * sy AS slope_num,
           n_types * sxx - sx * sx AS slope_den,
           CASE WHEN n_types * sxx - sx * sx = 0 THEN NULL
                ELSE (n_types * sxy - sx * sy)
                     / CAST(n_types * sxx - sx * sx AS DOUBLE)
           END AS zipf_slope
    FROM s
    """,
    tags=("text", "diagnostic", "llmdata"),
    tier="shadow",
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope of the corpus vocabulary — the
    log-log regression behind the classic corpus-health check (natural
    text sits near slope −1; templated/machine-generated corpora skew
    flatter or steeper), fitted in EXACT arithmetic: log2 is coarsened
    to the dyadic bits(x) = floor(log2 x)+1 device (doc_surprisal_quality
    precedent — monotone, integer, engine-identical), and the OLS
    slope over (bits(rank), bits(freq)) is assembled from integer
    sufficient statistics (n·Σxy − Σx·Σy over n·Σx² − (Σx)²) with the
    exact numerator/denominator pair emitted beside the one final
    int/int division.

    Scale shape: the frequency table is one token-hash aggregate; the
    GLOBAL frequency rank comes from the bucketed two-level scan
    (operators/prefixscan.py:bucketed_rank — parallel per-bucket ranks
    + a |buckets|-row prefix pass), never a single-task sort; the fit
    collapses map-side to one 6-integer row."""
    from kafkastreamsproject_spark.operators.prefixscan import bucketed_rank

    docs = fan_out(load_table(spark, "documents", sf_dir))
    freq = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = bucketed_rank(
        freq, "c", "tok", ascending=False, out_col="r"
    )
    bits = lambda col: F.length(F.bin(col)).cast("long")
    p = ranked.select(
        bits(F.col("r")).alias("x"), bits(F.col("c")).alias("y"), "c"
    )
    s = p.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n_tokens"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n_types") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_types") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "n_types",
        "n_tokens",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(den != 0, num / den.cast("double")).alias("zipf_slope"),
    )


_BLOCKLIST_FAIL_NUM, _BLOCKLIST_FAIL_DEN = 3, 5  # block iff fail > 3/5


@register(
    "source_quality_blocklist",
    oracle_fn=lambda: f"""
    WITH t AS (
      SELECT source, {_SQL_TOKENS} AS toks FROM documents
    ),
    g AS (
      SELECT source,
        CASE WHEN (len(toks) BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
          AND (list_sum(list_transform(toks, w -> length(w))) >= 3 * len(toks))
          AND (list_sum(list_transform(toks, w -> length(w))) <= 10 * len(toks))
          AND 10 * len(list_filter(toks,
                w -> regexp_matches(w, '^[#$%&*+=^_~]+$'))) <= len(toks)
          AND 10 * len(list_filter(toks,
                w -> regexp_matches(w, '[a-z]'))) >= 8 * len(toks)
          AND len(list_filter(toks,
                w -> list_contains([{_SQL_GOPHER_STOPS}], w))) >= 2
        THEN 0 ELSE 1 END AS fail
      FROM t
    ),
    s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(fail) AS BIGINT) AS n_gopher_fail
      FROM g GROUP BY source
    )
    SELECT source, n_docs, n_gopher_fail,
      n_gopher_fail / CAST(n_docs AS DOUBLE) AS gopher_fail_rate,
      {_BLOCKLIST_FAIL_DEN} * n_gopher_fail
        > {_BLOCKLIST_FAIL_NUM} * n_docs AS blocked,
      CASE WHEN {_BLOCKLIST_FAIL_DEN} * n_gopher_fail
                  > {_BLOCKLIST_FAIL_NUM} * n_docs
           THEN 0 ELSE n_docs END AS n_docs_kept
    FROM s
    """,
    tags=("text", "quality", "llmdata"),
    tier="shadow",
)
def source_quality_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a SOURCE blocklist from per-document quality verdicts —
    the UT1/blocklist move of web-scale pipelines (don't judge each
    page in isolation; a domain whose pages mostly fail the filters is
    dropped wholesale, catching the pages that individually squeak
    by): per source, the Gopher-battery failure count, and a blocked
    verdict when failures exceed {_BLOCKLIST_FAIL_NUM}/{_BLOCKLIST_FAIL_DEN}
    of the source's docs, plus the kept-doc count the decision implies.
    Application is a broadcast anti-join of the |sources|-row blocklist
    against any scan.

    Exactness: the verdict is the pure-integer cross-product test
    5·fails > 3·docs (same
    discipline as the per-doc rules); the emitted rate is one int/int
    division for inspectability.

    Scale shape: the per-doc verdict is the gopher_quality_rules
    zero-shuffle scan collapsed map-side to |sources| partial rows;
    the only shuffled relation is (source, two longs)."""
    docs = fan_out(load_table(spark, "documents", sf_dir))
    toks = TX.tokens(F.col("text"))
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
    gopher_pass = (
        (n_words >= _GOPHER_MIN_WORDS)
        & (n_words <= _GOPHER_MAX_WORDS)
        & (n_chars >= 3 * n_words)
        & (n_chars <= 10 * n_words)
        & (10 * n_sym <= n_words)
        & (10 * n_alpha >= 8 * n_words)
        & (n_stop >= 2)
    )
    s = (
        docs.select(
            "source",
            F.when(gopher_pass, F.lit(0)).otherwise(F.lit(1)).alias("fail"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("fail").alias("n_gopher_fail"),
        )
    )
    blocked = (
        F.lit(_BLOCKLIST_FAIL_DEN) * F.col("n_gopher_fail")
        > F.lit(_BLOCKLIST_FAIL_NUM) * F.col("n_docs")
    )
    return s.select(
        "source",
        "n_docs",
        "n_gopher_fail",
        (F.col("n_gopher_fail") / F.col("n_docs").cast("double")).alias(
            "gopher_fail_rate"
        ),
        blocked.alias("blocked"),
        F.when(blocked, F.lit(0).cast("long"))
        .otherwise(F.col("n_docs"))
        .alias("n_docs_kept"),
    )


_GOPHER_MIN_WORDS = 5       # fixture-scaled (paper: 50)
_GOPHER_MAX_WORDS = 1000    # fixture-scaled (paper: 100k)
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_SQL_GOPHER_STOPS = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)


@register(
    "gopher_quality_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(toks, w -> length(w)))
               AS BIGINT) AS n_chars,
             CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
               AS BIGINT) AS n_alpha_words,
             CAST(len(list_filter(toks,
                 w -> regexp_matches(w, '^[#$%&*+=^_~]+$')))
               AS BIGINT) AS n_symbol_words,
             CAST(len(list_filter(toks,
                 w -> list_contains([{_SQL_GOPHER_STOPS}], w)))
               AS BIGINT) AS n_stop_hits
      FROM t
    )
    SELECT doc_id, n_words,
           n_chars / CAST(n_words AS DOUBLE) AS mean_word_len,
           n_symbol_words / CAST(n_words AS DOUBLE) AS symbol_ratio,
           n_alpha_words / CAST(n_words AS DOUBLE) AS alpha_word_ratio,
           n_stop_hits,
           n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
             AS pass_word_count,
           n_chars * 1 >= 3 * n_words AND n_chars <= 10 * n_words
             AS pass_mean_word_len,
           10 * n_symbol_words <= n_words AS pass_symbol_ratio,
           10 * n_alpha_words >= 8 * n_words AS pass_alpha_ratio,
           n_stop_hits >= 2 AS pass_stopwords,
           (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
             AND (n_chars >= 3 * n_words AND n_chars <= 10 * n_words)
             AND (10 * n_symbol_words <= n_words)
             AND (10 * n_alpha_words >= 8 * n_words)
             AND (n_stop_hits >= 2) AS gopher_pass
    FROM m
    """,
    tags=("text", "quality", "llmdata"),
    tier="shadow",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveText RULE BATTERY (Rae et al. 2021, app. A)
    as one scan — the published heuristic filter set pre-training
    pipelines start from, complementing this repo's single-signal
    gates (quality_score, doc_repetition_stats, doc_surprisal_quality)
    with the full multi-rule verdict: word-count bounds, mean word
    length in [3, 10], symbol-word ratio ≤ 0.1, ≥ 80% alphabetic
    words, and ≥ 2 stopword hits (the paper's "stop word" existence
    rule), each emitted as its own boolean so a tuning pass can see
    WHICH rule kills a document, plus the conjunction ``gopher_pass``.
    Thresholds are fixture-scaled where the paper's assume web-page
    lengths (50..100k words → 5..1000).

    Exactness: every RULE is a pure-integer cross-product comparison
    (10·symbols ≤ words, not symbols/words ≤ 0.1 — no FP in any
    verdict); the emitted ratios are single int/int divisions for
    inspectability only.

    Scale shape: one scan, all rules row-local higher-order functions
    over the token array — zero shuffle, zero UDF."""
    docs = fan_out(load_table(spark, "documents", sf_dir))
    toks = TX.tokens(F.col("text"))
    n_words = F.size(toks).cast("long")
    n_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_alpha = F.size(
        F.filter(toks, lambda w: w.rlike("[a-z]"))
    ).cast("long")
    n_sym = F.size(
        F.filter(toks, lambda w: w.rlike(r"^[#$%&*+=^_~]+$"))
    ).cast("long")
    stops = F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS])
    n_stop = F.size(
        F.filter(toks, lambda w: F.array_contains(stops, w))
    ).cast("long")
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        n_alpha.alias("n_alpha_words"),
        n_sym.alias("n_symbol_words"),
        n_stop.alias("n_stop_hits"),
    )
    w, c = F.col("n_words"), F.col("n_chars")
    p_wc = (w >= _GOPHER_MIN_WORDS) & (w <= _GOPHER_MAX_WORDS)
    p_mwl = (c >= 3 * w) & (c <= 10 * w)
    p_sym = 10 * F.col("n_symbol_words") <= w
    p_alpha = 10 * F.col("n_alpha_words") >= 8 * w
    p_stop = F.col("n_stop_hits") >= 2
    return m.select(
        "doc_id",
        "n_words",
        (c / w.cast("double")).alias("mean_word_len"),
        (F.col("n_symbol_words") / w.cast("double")).alias("symbol_ratio"),
        (F.col("n_alpha_words") / w.cast("double")).alias("alpha_word_ratio"),
        "n_stop_hits",
        p_wc.alias("pass_word_count"),
        p_mwl.alias("pass_mean_word_len"),
        p_sym.alias("pass_symbol_ratio"),
        p_alpha.alias("pass_alpha_ratio"),
        p_stop.alias("pass_stopwords"),
        (p_wc & p_mwl & p_sym & p_alpha & p_stop).alias("gopher_pass"),
    )


_RERANK_R_LEX = 20  # BM25 recall-stage shortlist handed to the re-rank


def _bm25_rerank_sql() -> str:
    from kafkastreamsproject_spark.functions import vectors as V

    return f"""
    WITH {_bm25_ctes()},
    scored AS (
      SELECT b.doc_id, ROUND({_bm25_score_sql()}, 6) AS bm25
      FROM base b, stats s
      WHERE {" + ".join(f"b.tf{i}" for i in range(len(_BM25_TERMS)))} > 0
    ),
    shortlist AS (
      SELECT doc_id, bm25 FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS srn
        FROM scored
      ) WHERE srn <= {_RERANK_R_LEX}
    ),
    rex AS (
      SELECT s.doc_id, s.bm25,
             ROUND({V.sql_cosine('q.embedding', 'e.embedding')}, 6) AS cos
      FROM shortlist s
      JOIN embeddings e ON e.vec_id = s.doc_id
      JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q ON TRUE
    )
    SELECT doc_id, bm25, cos, CAST(rrn AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rrn
      FROM rex
    ) WHERE rrn <= 5
    """


@register(
    "bm25_semantic_rerank",
    oracle_fn=_bm25_rerank_sql,
    tags=("text", "retrieval", "similarity"),
    tier="shadow",
)
def bm25_semantic_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage RETRIEVAL SERVING stack — cheap lexical recall then
    expensive semantic re-rank, the production search topology
    (BM25 candidates → embedding re-scorer), and the retrieval
    counterpart of ivf_pq_rerank's quantize-then-rerank: stage 1 runs
    bm25_retrieval's scorer and keeps the top-20 shortlist via
    operators/topk.py (TakeOrderedAndProject — no global sort); stage
    2 reads embeddings ONLY for shortlist members (hash join on the
    id, never an embedding scan per query), scores exact cosine
    against the query embedding, and emits the final top-5 with both
    scores so the lexical→semantic rank movement is inspectable
    row-by-row.  Complements hybrid_retrieval_rrf: RRF fuses two FULL
    rankings; the rerank stack never computes the full semantic
    ranking at all — that asymmetry is the cost model that makes
    semantic scoring affordable at corpus scale.

    Determinism: both scores round at 6 dp with pinned evaluation
    order (the bm25_retrieval / hybrid conventions); ranks break ties
    by doc_id.

    Scale shape: stage 1 is bm25_retrieval's plan verbatim (1-row
    stats broadcast, row-local scoring, TakeOrdered top-20); stage 2
    touches 20 embedding rows and the k-bounded rank window of
    operators/topk.py.  The embedding payload never moves for
    non-candidates."""
    from kafkastreamsproject_spark.functions import vectors as V
    from kafkastreamsproject_spark.operators.topk import top_k

    lex = bm25_retrieval(spark, sf_dir)
    shortlist = top_k(
        lex, [F.col("bm25").desc(), F.col("doc_id")], _RERANK_R_LEX
    )
    emb = load_table(spark, "embeddings", sf_dir)
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    rex = (
        shortlist.join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
            "doc_id",
        )
        .join(F.broadcast(qv))
        .select(
            "doc_id",
            "bm25",
            F.round(
                V.cosine(F.col("q_emb"), F.col("embedding")), 6
            ).alias("cos"),
        )
    )
    return top_k(
        rex, [F.col("cos").desc(), F.col("doc_id")], 5, rank_col="rnk"
    )


_BLX_W = 12     # tokens per synthetic line (streaming/linededup.LINE_W)
_BLX_TOP = 20   # corpus head tokens standing in for the stopword list
_BLX_MIN = 6    # minimum line length for content


@register(
    "boilerplate_line_extract",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    stop AS MATERIALIZED (
      SELECT tok FROM (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rn
        FROM tok GROUP BY tok
      ) WHERE rn <= {_BLX_TOP}
    ),
    base AS MATERIALIZED (
      SELECT doc_id,
             list_transform(range(0, (len({_SQL_TOKENS}) - 1) // {_BLX_W} + 1),
               i -> array_to_string(
                 list_slice({_SQL_TOKENS}, i * {_BLX_W} + 1,
                            i * {_BLX_W} + {_BLX_W}), ' ')) AS lines
      FROM documents WHERE len({_SQL_TOKENS}) >= 1
    ),
    lt AS MATERIALIZED (
      SELECT b.doc_id, ord, line,
             string_split_regex(trim(line), ' +') AS ltoks
      FROM (
        SELECT doc_id, unnest(range(0, len(lines))) AS ord,
               unnest(lines) AS line
        FROM base
      ) b
    ),
    ltok AS MATERIALIZED (
      SELECT doc_id, ord, line, len(ltoks) AS n_toks,
             unnest(ltoks) AS t
      FROM lt
    ),
    dens AS MATERIALIZED (
      SELECT doc_id, ord, line, MAX(n_toks) AS n_toks,
             SUM(CASE WHEN t IN (SELECT tok FROM stop)
                 THEN 1 ELSE 0 END) AS n_stop
      FROM ltok GROUP BY doc_id, ord, line
    ),
    verdict AS MATERIALIZED (
      SELECT doc_id, ord, line, n_toks, n_stop,
             (n_toks >= {_BLX_MIN} AND 4 * n_stop >= n_toks) AS is_content
      FROM dens
    )
    SELECT v.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN is_content THEN 1 ELSE 0 END) AS BIGINT)
             AS n_content,
           SUM(CASE WHEN is_content THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE) AS content_frac,
           md5(COALESCE(array_to_string(
             list(CASE WHEN is_content THEN line END ORDER BY ord), ' '),
             '')) AS content_fp
    FROM verdict v
    GROUP BY v.doc_id
    """,
    tags=("text", "llmdata", "quality"),
    tier="shadow",
)
def boilerplate_line_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText-style BOILERPLATE line classification (Pomikálek 2011)
    — the content-extraction stage every HTML-crawl pipeline runs
    before quality scoring, re-expressed over the fixture's synthetic
    12-token lines: a line is CONTENT iff it is long enough (≥6
    tokens) and its stopword density clears the jusText threshold
    (pure-integer test 4·n_stop ≥ n_toks, i.e. ≥25%), with the
    stopword list derived from the corpus itself — its 20 most
    frequent tokens (the standing proxy when no language list is
    configured; jusText ships per-language lists the same size).  Per
    doc: line counts, content fraction, and the md5 fingerprint of
    the EXTRACTED text (kept lines in order) — the artifact a
    downstream dedup/quality stage would actually consume.

    Scale shape: the stopword head is a 20-row broadcast; line
    verdicts are one explode + broadcast-join + (doc, ord) rollup —
    text leaves the row only as the per-line token stream, and the
    extracted fingerprint re-aggregates line strings per doc (bounded
    by the doc itself).  The corpus head-token scan is shared with
    token_heavy_hitters' topology."""
    from kafkastreamsproject_spark.operators.cache import scoped_persist
    from kafkastreamsproject_spark.operators.topk import top_k
    from kafkastreamsproject_spark.streaming.linededup import lines_expr

    docs = fan_out(
        load_table(spark, "documents", sf_dir).select("doc_id", "text")
    )
    toks = TX.tokens(F.col("text"))
    tok = docs.select("doc_id", F.explode(toks).alias("tok"))
    stop = top_k(
        tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c")),
        [F.col("c").desc(), F.col("tok")],
        _BLX_TOP,
        rank_col="rn",
    ).select("tok")
    lt = (
        docs.filter(F.size(toks) >= 1)
        .select("doc_id", F.posexplode(lines_expr(toks, _BLX_W)).alias("ord", "line"))
        .select(
            "doc_id",
            "ord",
            "line",
            F.explode(TX.tokens(F.col("line"))).alias("ltok"),
        )
    )
    dens = (
        lt.join(
            F.broadcast(stop.withColumnRenamed("tok", "ltok").withColumn(
                "is_stop", F.lit(1)
            )),
            "ltok",
            "left",
        )
        .groupBy("doc_id", "ord", "line")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(F.coalesce("is_stop", F.lit(0))).alias("n_stop"),
        )
    )
    is_content = (F.col("n_toks") >= _BLX_MIN) & (
        F.lit(4) * F.col("n_stop") >= F.col("n_toks")
    )
    verdict = dens.select(
        "doc_id", "ord", "line", is_content.alias("is_content")
    )
    return (
        verdict.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("is_content"), 1).otherwise(0)).alias(
                "n_content"
            ),
            (
                F.sum(F.when(F.col("is_content"), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double")
            ).alias("content_frac"),
            F.md5(
                F.coalesce(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.when(
                                        F.col("is_content"),
                                        F.struct("ord", "line"),
                                    )
                                )
                            ),
                            lambda s: s["line"],
                        ),
                        " ",
                    ),
                    F.lit(""),
                )
            ).alias("content_fp"),
        )
    )
