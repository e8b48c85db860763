"""WARC ingestion tests: round-trip, gzip member layouts, hostile input,
and end-to-end compile from archives."""
import gzip
import os
import shutil
import tempfile

import pytest

from pybel_spark import io_warc
from pybel_spark.corpus import CorpusSpec, generate_documents

N_DOCS = 30


@pytest.fixture(scope='module')
def doc_rows(spark):
    """Corpus rows as crawled pages: rows the corpus ships text-only get
    html via the corpus's own wrap_html (extract_text inverts it
    byte-exactly), rows without any content are dropped (no archive
    representation)."""
    from pybel_spark.corpus import extract_text, wrap_html

    rows = [r.asDict() for r in
            generate_documents(spark, N_DOCS, partitions=2).collect()]
    kept = []
    for r in rows:
        if r['html'] is None:
            if r['text'] is None:
                continue
            r['html'] = wrap_html(r['text'])
        if r['text'] is None:
            r['text'] = extract_text(bytes(r['html']))
        kept.append(r)
    assert len(kept) >= N_DOCS - 5
    return kept


@pytest.fixture(scope='module')
def warc_dir(doc_rows):
    """Three archive layouts: plain, whole-file gzip, per-record gzip
    members (the Common Crawl layout)."""
    base = tempfile.mkdtemp(prefix='pybel_spark_warc_')
    third = len(doc_rows) // 3
    chunks = [doc_rows[0:third], doc_rows[third:2 * third],
              doc_rows[2 * third:]]
    with open(os.path.join(base, 'a.warc'), 'wb') as f:
        f.write(io_warc.to_warc_bytes(chunks[0]))
    with open(os.path.join(base, 'b.warc.gz'), 'wb') as f:
        f.write(gzip.compress(io_warc.to_warc_bytes(chunks[1])))
    with open(os.path.join(base, 'c.warc.gz'), 'wb') as f:
        for row in chunks[2]:  # one gzip member per record
            f.write(gzip.compress(io_warc.to_warc_bytes([row])))
    yield base
    shutil.rmtree(base, ignore_errors=True)


def test_roundtrip_all_layouts(spark, doc_rows, warc_dir):
    docs = io_warc.from_warc(spark, warc_dir + '/*').collect()
    assert len(docs) == len(doc_rows)
    want_html = {r['url']: bytes(r['html']) for r in doc_rows}
    got_html = {r['url']: bytes(r['html']) for r in docs}
    assert got_html == want_html
    ts = {r['url']: r['warc_ts'] for r in docs}
    for r in doc_rows:
        assert ts[r['url']].replace(tzinfo=None) == \
            r['warc_ts'].replace(tzinfo=None)


def test_extract_preserves_byte_identity(spark, doc_rows, warc_dir):
    """extract=True must reproduce the corpus text exactly (the per-url
    byte-identity contract of the pipeline)."""
    docs = io_warc.from_warc(spark, warc_dir + '/*', extract=True).collect()
    want = {r['url']: r['text'] for r in doc_rows}
    assert {r['url']: r['text'] for r in docs} == want


def test_compile_from_warc(spark, doc_rows, warc_dir):
    """Archives feed the pipeline directly: triples from WARC == golden."""
    from pybel_spark.pipeline import extract_triples

    spec = CorpusSpec()
    want = set()
    for r in doc_rows:
        i = int(r['url'].rsplit('/', 1)[1])
        for idx in spec.unit_indices(i):
            want.update(tuple(t) for t in spec.units[idx]['golden']['triples'])
    docs = io_warc.from_warc(spark, warc_dir + '/*')
    got = {tuple(r) for r in extract_triples(docs).collect()}
    assert got == want


def test_hostile_records_skipped():
    """Non-response records, garbage padding, bad lengths, truncation —
    all skipped, never raised."""
    good = io_warc.to_warc_bytes(
        [{'url': 'https://ok.example/x', 'html': b'<p>ok</p>'}])
    request_rec = (b'WARC/1.0\r\nWARC-Type: request\r\n'
                   b'WARC-Target-URI: https://req.example/\r\n'
                   b'Content-Length: 4\r\n\r\nGET \r\n\r\n')
    bad_length = (b'WARC/1.0\r\nWARC-Type: response\r\n'
                  b'WARC-Target-URI: https://bad.example/\r\n'
                  b'Content-Length: oops\r\n\r\n')
    garbage = b'\x00\x01random junk between records\r\n'
    truncated = (b'WARC/1.0\r\nWARC-Type: response\r\n'
                 b'WARC-Target-URI: https://cut.example/\r\n'
                 b'Content-Length: 999999\r\n\r\nshort')
    data = request_rec + garbage + bad_length + good + truncated
    rows = io_warc.warc_records_to_rows(data)
    assert [r['url'] for r in rows] == ['https://ok.example/x']
    assert rows[0]['html'] == b'<p>ok</p>'


def test_missing_http_header_payload():
    """A payload without an HTTP envelope is taken verbatim as the body."""
    rec = (b'WARC/1.0\r\nWARC-Type: response\r\n'
           b'WARC-Target-URI: https://raw.example/\r\n'
           b'WARC-Date: 2021-06-05T12:00:00Z\r\n'
           b'Content-Length: 10\r\n\r\n<p>raw</p>\r\n\r\n')
    rows = io_warc.warc_records_to_rows(rec)
    assert rows[0]['html'] == b'<p>raw</p>'
    assert rows[0]['warc_ts'].year == 2021


def test_warc_parser_never_raises_on_arbitrary_bytes():
    """Hypothesis fuzz: record iteration and row extraction are total
    functions over bytes — damage yields fewer rows, never exceptions."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=2048))
    def check(data):
        rows = io_warc.warc_records_to_rows(data)
        assert isinstance(rows, list)

    check()


def test_warc_parser_survives_corrupted_good_records():
    """Truncating/flipping bytes of a valid archive at every offset
    stride must never raise."""
    good = io_warc.to_warc_bytes(
        [{'url': 'https://a.example/1', 'html': b'<p>one</p>'},
         {'url': 'https://a.example/2', 'html': b'<p>two</p>'}])
    for cut in range(0, len(good), 7):
        io_warc.warc_records_to_rows(good[:cut])
    for flip in range(0, len(good), 11):
        mutated = bytearray(good)
        mutated[flip] ^= 0xFF
        io_warc.warc_records_to_rows(bytes(mutated))
