"""PII detection / redaction over web-corpus text — pure column algebra.

A training-data curation pipeline scrubs personally identifiable
information before anything else ships (the C4/Dolma-style public
recipe): emails, phone numbers, IP addresses → typed placeholder
tokens. Everything here is JVM-side ``regexp_count`` /
``regexp_replace`` column expressions — no Python in the hot path, the
scan stays inside whole-stage codegen, and the job is embarrassingly
parallel (zero shuffles for redaction; one uniform-key shuffle for the
per-source rollup).

The patterns deliberately live in the mutually-supported subset of
Java ``util.regex`` (Spark) and RE2 (DuckDB): character classes,
``\\d``, ``\\b``, non-capturing groups — no lookaround, no
backreferences — so the DuckDB oracle can run the IDENTICAL pattern
strings. Documented conservatism (same trade-offs as the public
recipes): version strings like ``1.2.3.4`` count as IPv4; phone
matching requires separators (a bare 11-digit run is not claimed).

The reference compiler has no PII surface (it never ingests raw web
text); this belongs to the beyond-reference curation suite.
"""
from pyspark.sql import DataFrame, functions as F

#: RFC-5322-lite address: local part @ dotted domain with an alpha TLD.
EMAIL_RE = r'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'

#: dotted quad; \b stops mid-number matches ("1.2.3.45" inside
#: "1.2.3.456" is not claimed). Octet range is NOT validated (RE2 has
#: no conditionals worth the complexity; 999.1.1.1 redacts too).
IPV4_RE = r'\b(?:\d{1,3}\.){3}\d{1,3}\b'

#: separator-delimited phone shapes: optional +country, then either a
#: parenthesized area code or a word-bounded 3-digit group, then
#: 3+4 digits — covers "+1 (415) 555-0123", "415-555-0123",
#: "415.555.0123". Requires separators by design (see module doc).
PHONE_RE = (r'(?:\+\d{1,3}[ .-])?'
            r'(?:\(\d{3}\)[ .-]?|\b\d{3}[ .-])'
            r'\d{3}[ .-]\d{4}\b')

#: redaction order matters: emails first (their local parts can contain
#: digit runs), then IPs (dotted digits), then phones.
PII_PATTERNS = (
    ('email', EMAIL_RE, '<EMAIL>'),
    ('ipv4', IPV4_RE, '<IP>'),
    ('phone', PHONE_RE, '<PHONE>'),
)


def pii_features(docs: DataFrame, id_col='doc_id',
                 text_col='text') -> DataFrame:
    """Per-document PII counts on the ORIGINAL text:
    (id, n_email, n_ipv4, n_phone, n_pii). NULL text counts as zero
    everywhere (a missing page has no PII, and downstream filters must
    not NULL-promote it past a threshold)."""
    counts = [
        F.coalesce(F.regexp_count(F.col(text_col), F.lit(pat)),
                   F.lit(0)).alias('n_' + name)
        for name, pat, _repl in PII_PATTERNS
    ]
    out = docs.select(F.col(id_col), *counts)
    total = None
    for name, _pat, _repl in PII_PATTERNS:
        c = F.col('n_' + name)
        total = c if total is None else total + c
    return out.withColumn('n_pii', total)


def redact_pii(docs: DataFrame, text_col='text',
               out_col=None) -> DataFrame:
    """Replace every PII span with its typed placeholder token, applying
    the patterns in :data:`PII_PATTERNS` order. All other columns pass
    through; NULL text stays NULL. Map-side only — no shuffle, no
    Python."""
    expr = F.col(text_col)
    for _name, pat, repl in PII_PATTERNS:
        expr = F.regexp_replace(expr, pat, repl)
    return docs.withColumn(out_col or text_col, expr)


def filter_pii_free(docs: DataFrame, max_pii=0, id_col='doc_id',
                    text_col='text') -> DataFrame:
    """Keep documents with at most ``max_pii`` detected spans (default:
    none). The counts are computed map-side on the same rows — no join,
    no shuffle."""
    counts = None
    for _name, pat, _repl in PII_PATTERNS:
        c = F.coalesce(F.regexp_count(F.col(text_col), F.lit(pat)),
                       F.lit(0))
        counts = c if counts is None else counts + c
    return docs.where(counts <= F.lit(max_pii))


def pii_source_summary(docs: DataFrame, id_col='doc_id',
                       text_col='text',
                       source_col='source') -> DataFrame:
    """Per-source PII rollup: documents scanned, documents with any PII,
    and span totals per type — the monitoring view a scrub stage
    publishes alongside its output. One shuffle on the (uniform,
    low-cardinality) source key; partial aggregation is map-side."""
    feats = [
        F.coalesce(F.regexp_count(F.col(text_col), F.lit(pat)),
                   F.lit(0)).alias('n_' + name)
        for name, pat, _repl in PII_PATTERNS
    ]
    per_doc = docs.select(F.col(source_col).alias('source'), *feats)
    any_pii = None
    aggs = [F.count(F.lit(1)).alias('n_docs')]
    for name, _pat, _repl in PII_PATTERNS:
        c = F.col('n_' + name)
        any_pii = c if any_pii is None else any_pii + c
        aggs.append(F.sum(c).cast('bigint').alias(name + '_spans'))
    aggs.insert(1, F.sum((any_pii > 0).cast('int')).cast('bigint')
                .alias('docs_with_pii'))
    return per_doc.groupBy('source').agg(*aggs)
