"""PII detection/redaction (textops/pii.py): variant coverage, false-
positive guards, exact redaction output, null safety, and the
Spark↔DuckDB pattern-dialect agreement the oracle relies on."""
import duckdb
import pytest
from pyspark.sql import functions as F

from pybel_spark.textops import pii

CASES = [
    # (text, n_email, n_ipv4, n_phone)
    ('mail me at alice@example.com today', 1, 0, 0),
    ('bob.smith+tag@sub.domain.co.uk and carol@x.org', 2, 0, 0),
    ('server at 192.168.1.100 port 80', 0, 1, 0),
    ('call 415-555-0123 now', 0, 0, 1),
    ('call +1 (415) 555-0123 or 415.555.9999', 0, 0, 2),
    # counts run on the ORIGINAL text: the dotted quad inside the email's
    # domain counts as an IP too (redaction order still wins: the email
    # pattern consumes it first, see test_redaction_exact)
    ('overlap: admin@10.0.0.1.example.com then 10.0.0.1', 1, 2, 0),
    # false-positive guards
    ('released 2026-08-17, version 1.2.3, pi=3.14', 0, 0, 0),
    ('ISBN 978-3-16-148410-0 is a book', 0, 0, 0),
    ('long run 123456789012345 is not a phone', 0, 0, 0),
    ('', 0, 0, 0),
    (None, 0, 0, 0),
]


@pytest.fixture(scope='module')
def docs(spark):
    rows = [(i, t) for i, (t, *_c) in enumerate(CASES)]
    return spark.createDataFrame(rows, 'doc_id long, text string')


def test_pii_counts(spark, docs):
    got = {r['doc_id']: (r['n_email'], r['n_ipv4'], r['n_phone'],
                         r['n_pii'])
           for r in pii.pii_features(docs).collect()}
    for i, (_t, e, ip, ph) in enumerate(CASES):
        assert got[i] == (e, ip, ph, e + ip + ph), (i, CASES[i])


def test_redaction_exact(spark):
    rows = [(0, 'ask alice@example.com or call +1 (415) 555-0123 '
                'from 10.0.0.1 ok')]
    out = pii.redact_pii(
        spark.createDataFrame(rows, 'doc_id long, text string'))
    assert out.collect()[0]['text'] == \
        'ask <EMAIL> or call <PHONE> from <IP> ok'


def test_redaction_null_and_clean_passthrough(spark):
    rows = [(0, None), (1, 'no pii here at all')]
    got = {r['doc_id']: r['text'] for r in pii.redact_pii(
        spark.createDataFrame(rows, 'doc_id long, text string')).collect()}
    assert got[0] is None
    assert got[1] == 'no pii here at all'


def test_filter_pii_free(spark, docs):
    kept = {r['doc_id']
            for r in pii.filter_pii_free(docs).select('doc_id').collect()}
    want = {i for i, (_t, e, ip, ph) in enumerate(CASES)
            if e + ip + ph == 0}
    assert kept == want


def test_source_summary(spark):
    rows = [(0, 'a@b.co x 1.2.3.4', 's1'), (1, 'clean', 's1'),
            (2, 'c@d.ee', 's2')]
    df = spark.createDataFrame(
        rows, 'doc_id long, text string, source string')
    got = {r['source']: r for r in pii.pii_source_summary(df).collect()}
    assert got['s1']['n_docs'] == 2
    assert got['s1']['docs_with_pii'] == 1
    assert got['s1']['email_spans'] == 1
    assert got['s1']['ipv4_spans'] == 1
    assert got['s2']['docs_with_pii'] == 1


def test_patterns_agree_with_duckdb_dialect(spark, docs):
    """The oracle runs the IDENTICAL pattern strings under RE2 — pin the
    dialect agreement on every case, counts AND redacted text."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, t) for i, (t, *_c) in enumerate(CASES)])
    sel = ['doc_id']
    redact = 'text'
    for name, pat, repl in pii.PII_PATTERNS:
        sel.append("coalesce(length(regexp_extract_all(text, '{p}')), 0)"
                   " AS n_{n}".format(p=pat, n=name))
        redact = "regexp_replace({r}, '{p}', '{t}', 'g')".format(
            r=redact, p=pat, t=repl)
    sel.append(redact + ' AS redacted')
    duck = {r[0]: r[1:] for r in con.execute(
        'SELECT ' + ', '.join(sel) + ' FROM t').fetchall()}
    feats = pii.pii_features(docs)
    red = pii.redact_pii(docs, out_col='redacted')
    joined = feats.join(red.select('doc_id', 'redacted'), 'doc_id')
    for r in joined.collect():
        assert duck[r['doc_id']] == (
            r['n_email'], r['n_ipv4'], r['n_phone'], r['redacted']), \
            r['doc_id']
