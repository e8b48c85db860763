"""WARC (ISO 28500) ingestion: Common-Crawl-style archive files → the
engine's canonical documents table (url, warc_ts, html, text, lang).

Spark shape: ``spark.read.format('binaryFile')`` lists the archive files
(driver only sees file STATUS, not bytes), then ONE ``mapInPandas`` stage
parses records executor-side — each WARC file is a single task because
gzip members are not splittable, which is exactly how Common Crawl
segments are processed everywhere (the unit of parallelism is the
archive file, and a crawl has ~64k of them per snapshot). Malformed
records and non-response record types are skipped, never task failures.

Format notes (public spec): a WARC file is a sequence of records —
``WARC/1.0\\r\\n``, header lines, blank line, ``Content-Length`` payload
bytes, blank line. Response-record payloads are raw HTTP responses; the
html body starts after the HTTP header block. Common Crawl stores each
record as its own gzip member, so the reader handles plain files,
single-member gzip, and concatenated multi-member gzip.
"""
import io

from pyspark.sql import DataFrame

#: output schema matches the engine's canonical documents table
WARC_DOCS_SCHEMA = ('url string, warc_ts timestamp, html binary, '
                    'text string, lang string')


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the Common Crawl layout);
    passthrough for plain data."""
    import zlib

    if not data.startswith(b'\x1f\x8b'):
        return data
    out = []
    offset = 0
    while offset < len(data) and data[offset:offset + 2] == b'\x1f\x8b':
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data[offset:]))
        remaining = d.unused_data
        if not remaining:
            break
        offset = len(data) - len(remaining)
    return b''.join(out)


def iter_warc_records(data: bytes):
    """Yield (headers: dict[lower_name, value], payload: bytes) per WARC
    record; tolerant of trailing garbage / truncated final records."""
    data = _gunzip_members(data)
    stream = io.BytesIO(data)
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.startswith(b'WARC/'):
            continue  # skip inter-record padding / damage until next magic
        headers = {}
        while True:
            raw = stream.readline()
            if raw in (b'\r\n', b'\n', b''):
                break
            if b':' not in raw:
                continue
            name, _, value = raw.partition(b':')
            try:
                headers[name.strip().lower().decode('ascii')] = \
                    value.strip().decode('utf8', 'replace')
            except UnicodeDecodeError:
                continue
        try:
            length = int(headers.get('content-length', ''))
        except ValueError:
            continue  # unrecoverable record; resync on next magic
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated file: drop the partial record
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    """HTTP response payload → body bytes (header block stripped)."""
    if payload.startswith(b'HTTP/'):
        sep = payload.find(b'\r\n\r\n')
        if sep == -1:
            sep = payload.find(b'\n\n')
            return payload[sep + 2:] if sep != -1 else b''
        return payload[sep + 4:]
    return payload


def _parse_warc_date(value):
    """WARC-Date (ISO-8601 'YYYY-MM-DDThh:mm:ssZ') → datetime or None."""
    from datetime import datetime, timezone

    try:
        return datetime.strptime(
            value, '%Y-%m-%dT%H:%M:%SZ').replace(tzinfo=timezone.utc)
    except (TypeError, ValueError):
        return None


def warc_records_to_rows(data: bytes):
    """One WARC file's bytes → list of documents-table row dicts
    (response records only)."""
    rows = []
    for headers, payload in iter_warc_records(data):
        if headers.get('warc-type') != 'response':
            continue
        url = headers.get('warc-target-uri')
        if not url:
            continue
        rows.append({
            'url': url,
            'warc_ts': _parse_warc_date(headers.get('warc-date')),
            'html': _http_body(payload),
            'text': None,
            'lang': None,
        })
    return rows


def from_warc(spark, path, extract: bool = False) -> DataFrame:
    """Read WARC archive(s) into the canonical documents table.

    ``path`` accepts the same globs as ``binaryFile`` (a crawl segment
    directory, ``*.warc.gz``, …). With ``extract=True`` the per-url text
    is materialized through the SAME ``corpus.extract_text`` used by the
    pipeline (byte-identity contract), so the result feeds
    ``build_graph`` / ``extract_triples`` directly.
    """
    import pandas as pd

    files = spark.read.format('binaryFile').load(path) \
        .select('path', 'content')

    def parse(batches):
        from .corpus import extract_text

        for pdf in batches:
            rows = []
            for content in pdf['content']:
                try:
                    rows.extend(warc_records_to_rows(bytes(content)))
                except Exception:
                    continue  # a damaged archive never kills the task
            if extract:
                for row in rows:
                    row['text'] = extract_text(row['html'])
            yield pd.DataFrame(
                rows, columns=['url', 'warc_ts', 'html', 'text', 'lang'])

    return files.mapInPandas(parse, schema=WARC_DOCS_SCHEMA)


def to_warc_bytes(rows, warc_version: str = '1.0') -> bytes:
    """Documents-table rows → WARC response-record bytes (the test/export
    inverse of :func:`from_warc`; one plain-gzip-free file)."""
    out = io.BytesIO()
    for row in rows:
        html = row.get('html') or b''
        if isinstance(html, str):
            html = html.encode('utf8')
        http = (b'HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n'
                b'Content-Length: ' + str(len(html)).encode('ascii')
                + b'\r\n\r\n' + html)
        ts = row.get('warc_ts')
        date = ts.strftime('%Y-%m-%dT%H:%M:%SZ') if ts is not None \
            else '2020-01-01T00:00:00Z'
        header = (
            'WARC/{}\r\n'
            'WARC-Type: response\r\n'
            'WARC-Target-URI: {}\r\n'
            'WARC-Date: {}\r\n'
            'Content-Type: application/http; msgtype=response\r\n'
            'Content-Length: {}\r\n\r\n'
        ).format(warc_version, row['url'], date, len(http))
        out.write(header.encode('utf8'))
        out.write(http)
        out.write(b'\r\n\r\n')
    return out.getvalue()
