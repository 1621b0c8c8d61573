"""PII detection / scrubbing over ``documents`` (M4 extension: the
curation step every training-data pipeline runs before packing — strip
emails, phone numbers, and host addresses from raw text).

The synthetic corpus contains no PII (zero digits or ``@`` anywhere —
verified at registration time by tests/test_pii.py), so the queries run
over ``pii_corpus`` = documents with deterministic doc_id-derived PII
planted into a known subset of rows: every third doc gains an email
(every sixth a second one), every fourth a phone number, every fifth an
IPv4 host — so the expected counts are pure modular arithmetic and the
DuckDB oracle rebuilds the identical corpus from the same expression.

Scale stance: detection and scrubbing are single-pass row-local regex
work — JVM-side ``regexp_extract_all`` / ``regexp_replace`` inside
whole-stage codegen, no shuffle at all for the per-doc queries and a
16-byte-key aggregation for the per-source rate.  At 100 TB this is the
cheapest operator family in the engine: it reads the corpus once and
never moves a body between executors (the scrub query emits md5
fingerprints, not rewritten bodies).

Regex notes: patterns are restricted to syntax with identical semantics
in Java's regex engine (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, and ASCII word boundaries; no backreferences or
lookaround.  Replacement order is fixed (email → phone → IP) on both
sides so overlapping-match behavior can never diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafkastreamsproject_spark.plans.registry import register
from kafkastreamsproject_spark.sources.testdata import load_table

#: Shared regexes (Java ≡ RE2 for this syntax subset).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

#: Fixed scrub order — email first (its local part contains digits that
#: must never be half-eaten by the IP pattern), then phone, then IP.
_SCRUBS = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
)

# The planted corpus, as one expression per engine.  concat_ws skips
# NULL operands in both Spark and DuckDB, so each CASE/when plants its
# fragment only on its modular subset.
_SQL_PII_CORPUS = """
      SELECT doc_id, source, concat_ws(' ', text,
        CASE WHEN doc_id % 3 = 0
             THEN 'contact user' || CAST(doc_id AS VARCHAR) || '@example.com' END,
        CASE WHEN doc_id % 6 = 0
             THEN 'cc admin' || CAST(doc_id AS VARCHAR) || '@mail.net' END,
        CASE WHEN doc_id % 4 = 0
             THEN 'call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END,
        CASE WHEN doc_id % 5 = 0
             THEN 'host 10.' || CAST(doc_id % 250 AS VARCHAR)
                  || '.0.' || CAST(doc_id % 100 AS VARCHAR) END
      ) AS text
      FROM documents
"""


def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "text"
    )
    did = F.col("doc_id")
    sid = did.cast("string")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit("contact user"), sid, F.lit("@example.com")),
    )
    email2 = F.when(
        did % 6 == 0, F.concat(F.lit("cc admin"), sid, F.lit("@mail.net"))
    )
    phone = F.when(
        did % 4 == 0,
        F.concat(
            F.lit("call 555-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
        ),
    )
    ip = F.when(
        did % 5 == 0,
        F.concat(
            F.lit("host 10."),
            (did % 250).cast("string"),
            F.lit(".0."),
            (did % 100).cast("string"),
        ),
    )
    return docs.select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.col("text"), email, email2, phone, ip).alias(
            "text"
        ),
    )


def _n_matches(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast(
        "long"
    )


def scrub_text(text: Column) -> Column:
    """Redact all PII classes in fixed order — the reusable scrub
    expression (also consumed by the curation pipeline)."""
    out = text
    for pattern, token in _SCRUBS:
        out = F.regexp_replace(out, pattern, token)
    return out


def _sql_scrubbed(col: str) -> str:
    out = col
    for pattern, token in _SCRUBS:
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out


@register(
    "pii_detect_stats",
    oracle=f"""
    WITH pii_corpus AS ({_SQL_PII_CORPUS})
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
             AS n_phone,
           CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT)
             AS n_ipv4,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}'))
                + len(regexp_extract_all(text, '{PHONE_RE}'))
                + len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT)
             AS n_pii
    FROM pii_corpus
    """,
    tags=("text", "pii"),
    tier="shadow",
)
def pii_detect_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII census: how many emails / phone numbers / IPv4
    hosts each document contains — the detection half of the scrub
    step, kept separate so a pipeline can audit PII density before
    deciding to redact.  Row-local regex inside codegen; zero shuffle."""
    t = F.col("text")
    n_email = _n_matches(t, EMAIL_RE)
    n_phone = _n_matches(t, PHONE_RE)
    n_ipv4 = _n_matches(t, IPV4_RE)
    return _pii_corpus(spark, sf_dir).select(
        "doc_id",
        n_email.alias("n_email"),
        n_phone.alias("n_phone"),
        n_ipv4.alias("n_ipv4"),
        (n_email + n_phone + n_ipv4).alias("n_pii"),
    )


@register(
    "pii_scrub",
    oracle=f"""
    WITH pii_corpus AS ({_SQL_PII_CORPUS})
    SELECT doc_id,
           md5({_sql_scrubbed("text")}) AS scrubbed_fp,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}'))
                + len(regexp_extract_all(text, '{PHONE_RE}'))
                + len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT)
             AS n_redactions,
           CAST({_sql_scrubbed("text")} <> text AS INT) AS changed
    FROM pii_corpus
    """,
    tags=("text", "pii"),
    tier="shadow",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction: every PII match replaced by its class token, verified
    by fingerprint (md5 of the scrubbed body — bodies themselves never
    leave the scan stage, in the query OR in the 100 TB posture where
    the scrubbed corpus is written straight back to parquet)."""
    t = F.col("text")
    scrubbed = scrub_text(t)
    n = _n_matches(t, EMAIL_RE) + _n_matches(t, PHONE_RE) + _n_matches(
        t, IPV4_RE
    )
    return _pii_corpus(spark, sf_dir).select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_fp"),
        n.alias("n_redactions"),
        (scrubbed != t).cast("int").alias("changed"),
    )


@register(
    "pii_rate_by_source",
    oracle=f"""
    WITH pii_corpus AS ({_SQL_PII_CORPUS}),
    per_doc AS (
      SELECT source,
             CASE WHEN len(regexp_extract_all(text, '{EMAIL_RE}'))
                     + len(regexp_extract_all(text, '{PHONE_RE}'))
                     + len(regexp_extract_all(text, '{IPV4_RE}')) > 0
                  THEN 1 ELSE 0 END AS has_pii
      FROM pii_corpus
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(has_pii) AS BIGINT) AS n_pii_docs,
           ROUND(SUM(has_pii) / CAST(COUNT(*) AS DOUBLE), 6) AS pii_rate
    FROM per_doc
    GROUP BY source
    """,
    tags=("text", "pii"),
    tier="shadow",
)
def pii_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII audit: fraction of documents per source that
    contain any PII — the number a curation run reports per upstream
    feed.  The aggregation shuffles one small (source, flag) pair per
    doc; partial aggregation collapses it map-side."""
    t = F.col("text")
    has_pii = (
        (
            _n_matches(t, EMAIL_RE)
            + _n_matches(t, PHONE_RE)
            + _n_matches(t, IPV4_RE)
        )
        > 0
    ).cast("int")
    per_doc = _pii_corpus(spark, sf_dir).select(
        "source", has_pii.alias("has_pii")
    )
    n_pii = F.sum("has_pii")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_pii.cast("long").alias("n_pii_docs"),
        F.round(n_pii / F.count(F.lit(1)).cast("double"), 6).alias(
            "pii_rate"
        ),
    )


_K_ANON = 5


@register(
    "k_anonymity_audit",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           CAST(c_nationkey AS INT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           COUNT(*) >= {_K_ANON} AS is_k_anonymous
    FROM customer
    GROUP BY 1, 2
    """,
    tags=("pii", "privacy"),
    tier="shadow",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (market segment, nation): every equivalence class' size and whether
    it meets k=5 — the re-identification-risk check a privacy review
    runs before releasing or training on user-derived tables (a class
    below k means those rows are re-identifiable by the quasi-identifier
    combination alone; the remediation is generalization or
    suppression of exactly the flagged classes).  Companion to the PII
    detect/scrub queries: those find DIRECT identifiers in text, this
    measures INDIRECT identifiability of the structured table.

    One partial+final hash aggregation over the pruned two-column scan;
    the audit output is |segments|×|nations| rows — tiny at any corpus
    scale, and the flag is pure integer comparison (no FP)."""
    cust = load_table(spark, "customer", sf_dir)
    return (
        cust.groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").cast("int").alias("nationkey"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .select(
            "segment",
            "nationkey",
            "group_size",
            (F.col("group_size") >= _K_ANON).alias("is_k_anonymous"),
        )
    )


_L_DIV = 3
_BAL_BAND = 1000  # sensitive attribute: account-balance band width


@register(
    "l_diversity_audit",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           CAST(c_nationkey AS INT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / {_BAL_BAND})
                                    AS BIGINT)) AS BIGINT)
             AS n_sensitive_values,
           COUNT(DISTINCT CAST(FLOOR(c_acctbal / {_BAL_BAND}) AS BIGINT))
             >= {_L_DIV} AS is_l_diverse
    FROM customer
    GROUP BY 1, 2
    """,
    tags=("pii", "privacy"),
    tier="shadow",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the
    k-anonymity companion that catches the HOMOGENEITY attack
    k-anonymity misses: a quasi-identifier class can be large yet leak
    the sensitive attribute if every member shares one value.  Per
    (market segment, nation) equivalence class: size, the number of
    DISTINCT sensitive values (account balance banded to $1000 — the
    banding is itself the generalization a release would apply), and
    whether the class meets distinct-l-diversity with l=3.

    One partial+final aggregate with a COUNT(DISTINCT band) —
    Spark plans the two-phase distinct-aggregate expansion; everything
    is integer arithmetic (band = FLOOR of an exact decimal / 1000),
    so the flag is FP-free on both engines.  Output stays
    |segments|×|nations| rows at any scale."""
    cust = load_table(spark, "customer", sf_dir)
    band = F.floor(F.col("c_acctbal") / _BAL_BAND).cast("long")
    return (
        cust.groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").cast("int").alias("nationkey"),
        )
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(band).alias("n_sensitive_values"),
        )
        .select(
            "segment",
            "nationkey",
            "group_size",
            "n_sensitive_values",
            (F.col("n_sensitive_values") >= _L_DIV).alias("is_l_diverse"),
        )
    )


_T_CLOSE_INV = 5  # t = 1/5 = 0.2 — the closeness threshold, as 1/t


@register(
    "t_closeness_audit",
    oracle=f"""
    WITH banded AS (
      SELECT c_mktsegment AS segment,
             CAST(c_nationkey AS INT) AS nationkey,
             CAST(FLOOR(c_acctbal / {_BAL_BAND}) AS BIGINT) AS band
      FROM customer
    ),
    corpus AS (
      SELECT band, CAST(COUNT(*) AS BIGINT) AS cc FROM banded GROUP BY band
    ),
    gtot AS (
      SELECT CAST(SUM(cc) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS m_bands
      FROM corpus
    ),
    cls AS (
      SELECT segment, nationkey, CAST(COUNT(*) AS BIGINT) AS n_class
      FROM banded GROUP BY 1, 2
    ),
    cell AS (
      SELECT segment, nationkey, band, CAST(COUNT(*) AS BIGINT) AS c
      FROM banded GROUP BY 1, 2, 3
    ),
    grid AS (
      SELECT cls.segment, cls.nationkey, cls.n_class,
             corpus.band, corpus.cc, COALESCE(cell.c, 0) AS c
      FROM cls CROSS JOIN corpus
      LEFT JOIN cell ON cell.segment = cls.segment
                    AND cell.nationkey = cls.nationkey
                    AND cell.band = corpus.band
    ),
    cum AS (
      SELECT segment, nationkey, n_class,
             SUM(c * g.n_total - cc * n_class)
               OVER (PARTITION BY segment, nationkey
                     ORDER BY band
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cd,
             g.n_total, g.m_bands
      FROM grid CROSS JOIN gtot g
    )
    SELECT segment, nationkey, n_class AS group_size,
           CAST(SUM(ABS(cd)) AS BIGINT) AS emd_numer,
           CAST(n_class * n_total * GREATEST(m_bands - 1, 1) AS BIGINT)
             AS emd_denom,
           SUM(ABS(cd)) / CAST(n_class * n_total * GREATEST(m_bands - 1, 1)
                               AS DOUBLE) AS emd,
           {_T_CLOSE_INV} * SUM(ABS(cd))
             <= n_class * n_total * GREATEST(m_bands - 1, 1) AS is_t_close
    FROM cum
    GROUP BY segment, nationkey, n_class, n_total, m_bands
    """,
    tags=("pii", "privacy"),
    tier="shadow",
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) —
    completing the release-audit trio (k_anonymity_audit,
    l_diversity_audit): l-diversity still leaks when a class' sensitive
    values are diverse but SKEWED relative to the corpus (the skewness
    attack), so t-closeness bounds the Earth Mover's Distance between
    each quasi-identifier class' sensitive-attribute distribution and
    the corpus-wide one.  Sensitive attribute: account balance banded
    to $1000 (ordered domain), for which EMD has the closed form
    (1/(m-1)) * Σ_i |Σ_{{j<=i}} (p_j - q_j)| over the m ordered bands.

    Cross-engine exactness (the linear_interpolate_gaps discipline):
    every intermediate is INTEGER — the per-band difference is carried
    as c*N - C*n (numerator over the common denominator n*N), the
    cumulative sum and its |.| stay integral, and the audit emits the
    exact integer numerator/denominator pair plus ONE final int/int
    double division for ``emd`` (no round(), bit-identical on both
    engines).  The t <= 0.2 flag is the pure-integer comparison
    5*numer <= denom — no FP in the verdict at all.

    Scale shape: one two-column scan feeds both the per-class and the
    per-cell aggregates; the corpus band histogram is ~12 rows
    (broadcast with its 1-row total), the class×band grid is
    |classes|×|bands| rows of longs, and the cumulative window is
    PARTITIONED by class over ≤|bands| rows — dimension-bounded, never
    a corpus-length window.  Output stays |segments|×|nations| rows at
    any scale."""
    cust = load_table(spark, "customer", sf_dir)
    banded = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.floor(F.col("c_acctbal") / _BAL_BAND).cast("long").alias("band"),
    )
    corpus = banded.groupBy("band").agg(F.count(F.lit(1)).alias("cc"))
    glob = corpus.agg(
        F.sum("cc").alias("n_total"), F.count(F.lit(1)).alias("m_bands")
    )
    cls = banded.groupBy("segment", "nationkey").agg(
        F.count(F.lit(1)).alias("n_class")
    )
    cell = banded.groupBy("segment", "nationkey", "band").agg(
        F.count(F.lit(1)).alias("c")
    )
    grid = (
        cls.crossJoin(F.broadcast(corpus))
        .join(cell, ["segment", "nationkey", "band"], "left")
        .select(
            "segment", "nationkey", "n_class", "band", "cc",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
        .crossJoin(F.broadcast(glob))
    )
    wcum = (
        W.partitionBy("segment", "nationkey")
        .orderBy("band")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = grid.withColumn(
        "cd",
        F.sum(
            F.col("c") * F.col("n_total") - F.col("cc") * F.col("n_class")
        ).over(wcum),
    )
    denom = (
        F.col("n_class")
        * F.col("n_total")
        * F.greatest(F.col("m_bands") - 1, F.lit(1))
    )
    return (
        cum.groupBy("segment", "nationkey", "n_class", "n_total", "m_bands")
        .agg(F.sum(F.abs(F.col("cd"))).alias("emd_numer"))
        .select(
            "segment",
            "nationkey",
            F.col("n_class").alias("group_size"),
            "emd_numer",
            denom.cast("long").alias("emd_denom"),
            (F.col("emd_numer") / denom.cast("double")).alias("emd"),
            (F.lit(_T_CLOSE_INV) * F.col("emd_numer") <= denom).alias(
                "is_t_close"
            ),
        )
    )
