"""C4-style page cleaning (textops/quality.py c4_clean): line retention
rules, page-level drops, null safety, and the DuckDB dialect agreement
the oracle relies on."""
import duckdb
import pytest

from pybel_spark.textops import quality

PAGE_OK = ('this is a good first sentence.\n'
           'short.\n'
           'Please enable JavaScript to continue.\n'
           'no terminal punctuation on this one\n'
           'a second good sentence stays!\n'
           'and a third good one remains?\n'
           'quoted line also counts here."')


@pytest.fixture(scope='module')
def docs(spark):
    rows = [
        (0, PAGE_OK),
        (1, 'only one good sentence lives here.'),          # < min_sentences
        (2, PAGE_OK + '\nsome Lorem IPSUM filler.'),        # page drop
        (3, PAGE_OK + '\nvar x = { a: 1 };'),               # brace drop
        (4, None),                                          # null → dropped
    ]
    return spark.createDataFrame(rows, 'doc_id long, text string')


def test_line_rules_and_page_rules(spark, docs):
    out = {r['doc_id']: r for r in
           quality.c4_clean(docs, min_sentences=3).collect()}
    assert set(out) == {0}
    assert out[0]['text'] == ('this is a good first sentence.\n'
                              'a second good sentence stays!\n'
                              'and a third good one remains?\n'
                              'quoted line also counts here."')
    # all four lines contribute a [.!?] (the quoted line via its '."')
    assert out[0]['n_sentences'] == 4


def test_min_sentences_and_passthrough_columns(spark):
    rows = [(0, PAGE_OK, 'keepme')]
    df = spark.createDataFrame(rows,
                               'doc_id long, text string, extra string')
    kept = quality.c4_clean(df, min_sentences=3).collect()
    assert kept[0]['extra'] == 'keepme'
    assert quality.c4_clean(df, min_sentences=5).count() == 0


def test_duckdb_dialect_agreement(spark, docs):
    """The oracle runs the identical pattern strings under RE2 — pin the
    cleaned text and sentence counts across engines on every case."""
    rows = [(r['doc_id'], r['text']) for r in docs.collect()]
    con = duckdb.connect()
    con.execute('CREATE TABLE t(doc_id BIGINT, text VARCHAR)')
    con.executemany('INSERT INTO t VALUES (?, ?)', rows)
    # DuckDB's array_to_string([]) is NULL where Spark's array_join([])
    # is '' — the oracle mirror always wraps with coalesce(..., '').
    sql = (
        "SELECT doc_id, coalesce(array_to_string(list_filter("
        " regexp_split_to_array(coalesce(text, ''), chr(10)),"
        " x -> regexp_matches(x, '{term}')"
        "  AND len(regexp_split_to_array(trim(x), '\\s+')) >= 3"
        "  AND NOT regexp_matches(lower(x), '{js}')), chr(10)), '')"
        " FROM t ORDER BY doc_id"
    ).format(term=quality.C4_TERMINAL_RE, js=quality.C4_JAVASCRIPT_RE)
    duck = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    got = {r['doc_id']: r['c']
           for r in docs.select(
               'doc_id',
               quality.c4_clean_col().alias('c')).collect()}
    assert got == duck
