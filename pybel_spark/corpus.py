"""Deterministic synthetic Common-Crawl-style corpus.

Every document is a pure function of its integer index, so the corpus is
reproducible at any scale with no stored data, and — critically for the
correctness gate — the *expected* triples of the whole corpus are expressible
in plain SQL as an arithmetic join against the frozen per-unit golden outputs
(fixtures/pool.json, generated from the reference compiler).

Document i:
  - embeds 1 + (i % 3) statement units; unit j of doc i is pool unit
    (i * 7 + j) % n_units
  - every 5th doc carries only `html` (text NULL) to exercise the
    byte-identical extraction path
  - every 29th doc is lang='de' (passes through the pipeline unharmed)
"""
import html as _html
import json
import os
from datetime import datetime, timedelta, timezone

_HERE = os.path.dirname(os.path.abspath(__file__))
_POOL_PATH = os.path.join(os.path.dirname(_HERE), 'fixtures', 'pool.json')
_RESOURCES_PATH = os.path.join(os.path.dirname(_HERE), 'fixtures', 'resources.json')

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

UNITS_PER_DOC_MOD = 3          # doc i has 1 + (i % 3) units
UNIT_STRIDE = 11               # coprime with the pool size → full unit coverage
HTML_ONLY_MOD = 5              # every 5th doc ships html, text NULL
LANG_DE_MOD = 29               # every 29th doc is German prose

_WORDS = (
    'alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu '
    'protein signal pathway cell receptor kinase binding factor growth'
).split()
_WORDS_DE = 'zelle signal weg rezeptor bindung faktor wachstum eiweiss'.split()


def load_pool():
    with open(_POOL_PATH) as f:
        return json.load(f)


def load_corpus_catalog():
    """DictCatalog over the frozen resources fixture."""
    from .resources import DictCatalog
    with open(_RESOURCES_PATH) as f:
        raw = json.load(f)
    return DictCatalog(
        namespaces=raw['namespaces'],
        annotations={url: set(values) for url, values in raw['annotations'].items()},
    )


class CorpusSpec:
    """Holds the pool and derives documents deterministically by index.

    The pool text is CONSTANT across documents, so every derived string —
    a unit's joined lines, the header block, their HTML-escaped ``<p>``
    renderings, and the 8-word prose sentences (period len(words) in i) —
    is precomputed once per spec instead of re-joined/re-escaped per
    document; ``doc_text``/``doc_row`` then only concatenate cached
    blocks. Output bytes are identical (pinned by the compiler parity
    tests and the md5-keyed oracles); generation is ~2× faster, which is
    pure corpus_gen wall."""

    def __init__(self, pool=None):
        pool = pool or load_pool()
        self.header = pool['header']
        self.units = pool['units']
        self.n_units = len(self.units)
        # plain-text blocks ('\n'.join of lines) and their HTML bodies
        self._header_block = '\n'.join(self.header)
        self._unit_blocks = ['\n'.join(u['lines']) for u in self.units]
        self._header_html = _html_body(self.header)
        self._unit_html = [_html_body(u['lines']) for u in self.units]
        # prose(i, lang) depends only on i % len(words) and the language
        self._prose_en = [self._make_prose(i, 'en')
                          for i in range(len(_WORDS))]
        self._prose_de = [self._make_prose(i, 'de')
                          for i in range(len(_WORDS_DE))]

    def unit_indices(self, i):
        n = 1 + (i % UNITS_PER_DOC_MOD)
        return [(i * UNIT_STRIDE + j) % self.n_units for j in range(n)]

    def doc_lang(self, i):
        return 'de' if i % LANG_DE_MOD == 0 and i > 0 else 'en'

    def _make_prose(self, i, lang):
        words = _WORDS_DE if lang == 'de' else _WORDS
        return ' '.join(words[(i + k) % len(words)] for k in range(8)) + '.'

    def prose(self, i, lang):
        cache = self._prose_de if lang == 'de' else self._prose_en
        return cache[i % len(cache)]

    def doc_text(self, i):
        """The extracted text of document i (the byte-identical contract)."""
        lang = self.doc_lang(i)
        parts = [self.prose(i, lang), self._header_block]
        parts.extend(self._unit_blocks[idx] for idx in self.unit_indices(i))
        parts.append(self.prose(i + 1, lang))
        return '\n\n'.join(parts)

    def doc_html(self, i):
        """wrap_html(doc_text(i)) from the cached per-block renderings —
        byte-identical to escaping the whole text line-by-line."""
        lang = self.doc_lang(i)
        sep = '\n<p></p>\n'
        parts = [_html_body([self.prose(i, lang)]), self._header_html]
        parts.extend(self._unit_html[idx] for idx in self.unit_indices(i))
        parts.append(_html_body([self.prose(i + 1, lang)]))
        body = sep.join(parts)
        title = 'Page {}'.format(i)
        page = (
            '<html><head><meta charset="utf-8"><title>{}</title></head>\n'
            '<body>\n{}\n</body></html>'
        ).format(_html.escape(title, quote=False), body)
        return page.encode('utf-8')

    def doc_row(self, i):
        """Full documents-table row for index i."""
        lang = self.doc_lang(i)
        url = 'https://corpus.test/page/{}'.format(i)
        ts = EPOCH + timedelta(seconds=i)
        if i % HTML_ONLY_MOD == 0:
            return (url, ts, self.doc_html(i), None, lang)
        return (url, ts, None, self.doc_text(i), lang)

    def expected_unit_indices_by_url(self, urls):
        """{url: [unit ids]} for parity checks."""
        out = {}
        for url in urls:
            i = int(url.rsplit('/', 1)[1])
            out[url] = self.unit_indices(i)
        return out


def _html_body(lines):
    """``<p>`` rendering of a block of text lines (wrap_html's per-line
    escaping, cacheable per pool block)."""
    return '\n'.join(
        '<p>{}</p>'.format(_html.escape(line, quote=False))
        for line in lines)


def wrap_html(text, title='page'):
    """Deterministic HTML wrapping; extract_text() inverts it byte-exactly."""
    body = '\n'.join(
        '<p>{}</p>'.format(_html.escape(line, quote=False))
        for line in text.split('\n')
    )
    page = (
        '<html><head><meta charset="utf-8"><title>{}</title></head>\n'
        '<body>\n{}\n</body></html>'
    ).format(_html.escape(title, quote=False), body)
    return page.encode('utf-8')


def extract_text(html_bytes):
    """Byte-identical inverse of wrap_html: one text line per <p> element.

    Invalid UTF-8 decodes with replacement characters instead of raising —
    at web scale a single mojibake page must not fail a task (and its four
    retries). The byte-identity invariant applies to well-formed pages.
    """
    page = html_bytes.decode('utf-8', errors='replace')
    lines = []
    pos = 0
    while True:
        start = page.find('<p>', pos)
        if start < 0:
            break
        end = page.find('</p>', start)
        if end < 0:
            break
        lines.append(_html.unescape(page[start + 3:end]))
        pos = end + 4
    return '\n'.join(lines)


def generate_documents(spark, n_docs, partitions=None):
    """Build the synthetic documents DataFrame: one row per index in
    [0, n_docs), computed in parallel with a vectorized batch function."""
    import pandas as pd

    from .schemas import DOCUMENTS_SCHEMA

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    spec_pool = load_pool()

    def build(batches):
        spec = CorpusSpec(spec_pool)
        for pdf in batches:
            yield _doc_columns(spec, [int(i) for i in pdf['id']])

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(build, schema=DOCUMENTS_SCHEMA)
    )


def _doc_columns(spec, ids):
    """Column-wise batch construction (same values as ``doc_row`` per id):
    building columns directly skips the per-row tuple → object-dtype
    transpose, and the timestamp column is one vectorized timedelta add
    instead of n datetime objects."""
    import pandas as pd

    return pd.DataFrame({
        'url': ['https://corpus.test/page/{}'.format(i) for i in ids],
        'warc_ts': pd.to_datetime(EPOCH) + pd.to_timedelta(ids, unit='s'),
        'html': [spec.doc_html(i) if i % HTML_ONLY_MOD == 0 else None
                 for i in ids],
        'text': [None if i % HTML_ONLY_MOD == 0 else spec.doc_text(i)
                 for i in ids],
        'lang': [spec.doc_lang(i) for i in ids],
    })


def documents_from_driver_table(spark, sf_dir, partitions=None):
    """Derive the synthetic corpus deterministically from the driver's
    documents.parquet (doc_id, ...) so corpus size scales with sf.

    The mapping doc_id → BEL content is the same pure function of the integer
    id, which keeps the DuckDB oracle reconstruction purely arithmetic.
    """
    import pandas as pd

    from .schemas import DOCUMENTS_SCHEMA

    spec_pool = load_pool()
    ids = spark.read.parquet('{}/documents.parquet'.format(sf_dir)).select('doc_id')
    if partitions:
        ids = ids.repartition(partitions)

    def build(batches):
        spec = CorpusSpec(spec_pool)
        for pdf in batches:
            yield _doc_columns(spec, [int(i) for i in pdf['doc_id']])

    return ids.mapInPandas(build, schema=DOCUMENTS_SCHEMA)
