"""BEL-script entry points: local path, URL, and distributed URL-table.

Reference: ``io/lines.py:23-34`` (from_bel_script) and ``io/lines.py:37-50``
(from_bel_script_url — requests download → parse_lines). Here both are thin
wrappers that stage the fetched text as a one-row documents DataFrame and
run the SAME vectorized parse pipeline every other source uses — one code
path, one set of semantics.

The Spark-first generalization is :func:`from_bel_script_urls`: a
DataFrame of URLs fetched INSIDE ``mapInPandas`` (per-executor, per-batch)
via an injectable fetcher, so a million-script crawl is just another
documents table. The default fetcher is stdlib ``urllib`` — no external
HTTP dependency; tests exercise it with ``file://`` URLs.
"""
import datetime

from pyspark.sql import DataFrame

from .pipeline import GraphResult, build_graph
from .schemas import DOCUMENTS_SCHEMA


def _default_fetch(url: str) -> bytes:
    import urllib.request

    with urllib.request.urlopen(url) as resp:  # noqa: S310 (caller's URL)
        return resp.read()


def _stage_document(spark, url: str, text: str) -> DataFrame:
    row = (url, datetime.datetime.now(datetime.timezone.utc)
           .replace(tzinfo=None), None, text, None)
    return spark.createDataFrame([row], DOCUMENTS_SCHEMA)


def from_bel_script(spark, path: str, catalog=None,
                    compiler_options=None) -> GraphResult:
    """Compile one local BEL script through the pipeline
    (reference io/lines.py:23-34)."""
    with open(path, encoding='utf-8', errors='replace') as f:
        text = f.read()
    docs = _stage_document(spark, 'file://' + path, text)
    return build_graph(docs, catalog=catalog,
                       compiler_options=compiler_options)


def from_bel_script_url(spark, url: str, catalog=None, compiler_options=None,
                        fetch=None) -> GraphResult:
    """Compile one BEL script fetched from a URL (reference io/lines.py:
    37-50). ``fetch(url) -> bytes`` is injectable; the default is stdlib
    urllib (supports http/https/file)."""
    payload = (fetch or _default_fetch)(url)
    docs = _stage_document(
        spark, url, payload.decode('utf-8', errors='replace'))
    return build_graph(docs, catalog=catalog,
                       compiler_options=compiler_options)


def from_bel_script_urls(urls: DataFrame, catalog=None,
                         compiler_options=None, fetch=None,
                         url_col: str = 'url') -> GraphResult:
    """Distributed variant: a DataFrame of script URLs, fetched inside the
    executors (one Arrow batch at a time) and compiled by the same parse
    stage. Fetch failures yield an empty document (the page contributes
    nothing) rather than failing the task — the hostile-web-input policy.
    """
    import pandas as pd

    fetcher = fetch or _default_fetch

    def download(batches):
        for pdf in batches:
            texts = []
            for url in pdf[url_col]:
                try:
                    texts.append(fetcher(url).decode('utf-8',
                                                     errors='replace'))
                except Exception:
                    texts.append(None)
            yield pd.DataFrame({
                'url': pdf[url_col],
                'warc_ts': pd.NaT,
                'html': None,
                'text': texts,
                'lang': None,
            })

    docs = urls.select(url_col).mapInPandas(download,
                                            schema=DOCUMENTS_SCHEMA)
    return build_graph(docs, catalog=catalog,
                       compiler_options=compiler_options)
