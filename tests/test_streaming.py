"""Structured Streaming: incremental parse with exactly-once append sink."""
import os
import shutil
import tempfile

import pytest

from pybel_spark.corpus import CorpusSpec, generate_documents
from pybel_spark.streaming import read_stream_output, start_edge_stream


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix='pybel_spark_stream_')
    paths = {k: os.path.join(base, k) for k in ('input', 'out')}
    os.makedirs(paths['input'])
    yield paths
    shutil.rmtree(base, ignore_errors=True)


def expected_triples(n_docs):
    spec = CorpusSpec()
    out = set()
    for i in range(n_docs):
        for idx in spec.unit_indices(i):
            out.update(tuple(t) for t in spec.units[idx]['golden']['triples'])
    return out


def test_stateful_citation_stats(spark, dirs):
    """applyInPandasWithState accumulates per-citation counts across
    micro-batches and survives a query restart (checkpointed state)."""
    import os
    from pybel_spark.streaming import start_citation_stats_stream

    generate_documents(spark, 40, partitions=2) \
        .write.mode('append').parquet(dirs['input'])
    q = start_citation_stats_stream(spark, dirs['input'], dirs['out'])
    q.awaitTermination(120)

    stats_path = os.path.join(dirs['out'], 'citation_stats')
    first = spark.read.parquet(stats_path)
    latest1 = {(r['citation_db'], r['citation_id']): r['n_edges']
               for r in first.groupBy('citation_db', 'citation_id')
               .agg({'n_edges': 'max'})
               .withColumnRenamed('max(n_edges)', 'n_edges').collect()}
    assert latest1

    # second batch: same units appear in more documents → counts grow for
    # at least one citation after the restart picks up the new files
    import pyspark.sql.functions as F
    docs2 = generate_documents(spark, 80, partitions=2) \
        .where(F.split(F.col('url'), '/').getItem(4).cast('int') >= 40)
    docs2.write.mode('append').parquet(dirs['input'])
    q2 = start_citation_stats_stream(spark, dirs['input'], dirs['out'])
    q2.awaitTermination(120)

    second = spark.read.parquet(stats_path)
    latest2 = {(r['citation_db'], r['citation_id']): r['n_edges']
               for r in second.groupBy('citation_db', 'citation_id')
               .agg({'n_edges': 'max'})
               .withColumnRenamed('max(n_edges)', 'n_edges').collect()}
    assert any(latest2[k] > latest1.get(k, 0) for k in latest2)
    assert all(latest2.get(k, 0) >= v for k, v in latest1.items())


def test_streaming_incremental_parse(spark, dirs):
    # batch 1: docs 0..59 land
    generate_documents(spark, 60, partitions=2) \
        .write.mode('append').parquet(dirs['input'])
    q = start_edge_stream(spark, dirs['input'], dirs['out'])
    q.awaitTermination(120)

    out = read_stream_output(spark, dirs['out'])
    got1 = {tuple(r) for r in out['triples'].collect()}
    assert got1 == expected_triples(60)

    # batch 2: more documents arrive; a new availableNow run picks up ONLY
    # the new files (checkpoint) and appends
    import pyspark.sql.functions as F
    docs2 = generate_documents(spark, 90, partitions=2) \
        .where(F.split(F.col('url'), '/').getItem(4).cast('int') >= 60)
    docs2.write.mode('append').parquet(dirs['input'])

    q2 = start_edge_stream(spark, dirs['input'], dirs['out'])
    q2.awaitTermination(120)

    out = read_stream_output(spark, dirs['out'])
    got2 = {tuple(r) for r in out['triples'].collect()}
    assert got2 == expected_triples(90)

    # re-running with no new input appends nothing (exactly-once)
    n_edges_before = spark.read.parquet(
        os.path.join(dirs['out'], 'edges_log')).count()
    q3 = start_edge_stream(spark, dirs['input'], dirs['out'])
    q3.awaitTermination(120)
    n_edges_after = spark.read.parquet(
        os.path.join(dirs['out'], 'edges_log')).count()
    assert n_edges_before == n_edges_after


def test_watermarked_window_stream(spark, tmp_path):
    """Event-time windows close when the watermark passes; a document
    arriving later than the watermark allows is dropped."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from pybel_spark.schemas import DOCUMENTS_SCHEMA
    from pybel_spark.streaming import start_crawl_window_stream

    in_dir = str(tmp_path / 'in')
    out_dir = str(tmp_path / 'out')
    os.makedirs(in_dir)

    def doc(i, hour, lang='en'):
        return Row(url='https://x.test/{}'.format(i),
                   warc_ts=dt.datetime(2026, 1, 1, hour, 30),
                   html=None, text='word ' * 5, lang=lang)

    def write_wave(name, rows):
        spark.createDataFrame(rows, DOCUMENTS_SCHEMA) \
            .coalesce(1).write.mode('overwrite') \
            .parquet(os.path.join(in_dir, name))

    # Watermark timeline (wm applied in batch k comes from batch k-1's max
    # event time): A (hours 0-3) -> B (frontier hour 6) -> C runs with
    # wm=4:30, emitting + EVICTING the hour 0-3 windows -> D's late hour-1
    # page hits evicted state and a 4:30 watermark: guaranteed drop.
    # The file source orders batches by modification time — force distinct
    # mtimes so the waves become ordered micro-batches.
    import time

    write_wave('a', [doc(i, hour=i % 4) for i in range(8)])
    time.sleep(1.2)
    write_wave('b', [doc(100, hour=6)])
    time.sleep(1.2)
    write_wave('c', [doc(101, hour=7)])
    time.sleep(1.2)
    write_wave('d', [doc(200, hour=1)])

    # one file-batch per trigger so the watermark advances between waves
    q = start_crawl_window_stream(
        spark, in_dir + '/*', out_dir, window='1 hour', watermark='2 hours',
        max_files_per_trigger=1)
    q.awaitTermination(120)

    got = spark.read.parquet(os.path.join(out_dir, 'crawl_windows')).collect()
    rows = {}
    for r in got:
        rows.setdefault(r['window_start'].hour, []).append(r['n_docs'])
    # hours 0-3 windows closed once the frontier hit hour 6; each emitted
    # exactly once with wave A's two docs
    for h in (0, 1, 2, 3):
        assert rows[h] == [2], rows
    # the late hour-1 page (wave D, behind the evicted state + watermark)
    # was dropped: no re-emission of the hour-1 window
    assert len(rows[1]) == 1
    # the hour-7 window never closed (no later frontier) -> not emitted
    assert 7 not in rows


def test_kmv_sketch_bounded_and_accurate():
    """VERDICT r2: the per-citation distinct-evidence state must be bounded.
    10^4 distinct values through incremental kmv_merge: state stays at k
    hashes, the estimate lands within the sketch's error envelope, and the
    below-cap path stays exact."""
    import hashlib

    from pybel_spark.streaming import kmv_merge

    k = 256
    hashes, overflowed = [], False
    n_distinct = 0
    # feed in 100 micro-batches of 100 distinct evidences each
    for batch in range(100):
        new = {hashlib.md5('ev-{}-{}'.format(batch, i).encode()).hexdigest()
               for i in range(100)}
        hashes, overflowed, n_distinct = kmv_merge(
            new, hashes, overflowed, k)
        assert len(hashes) <= k
    assert overflowed
    assert abs(n_distinct - 10_000) / 10_000 < 0.25  # ~4σ at k=256

    # below the cap: exact, never overflowed
    small = {hashlib.md5('s{}'.format(i).encode()).hexdigest()
             for i in range(50)}
    hashes2, overflowed2, n2 = kmv_merge(small, None, False, k)
    assert not overflowed2 and n2 == 50 and len(hashes2) == 50


def test_hot_citation_stream_bounded_state(spark, dirs):
    """End-to-end: a hot citation with hundreds of distinct evidences
    streams through applyInPandasWithState with a tiny sketch_k — the
    emitted count switches to the (flagged) estimate while a cold citation
    stays exact."""
    from pybel_spark.corpus import CorpusSpec, wrap_html
    from pybel_spark.schemas import DOCUMENTS_SCHEMA
    from pybel_spark.streaming import start_citation_stats_stream

    spec = CorpusSpec()
    header = '\n'.join(spec.header)
    n_hot = 240
    lines = [header, 'SET Citation = {"PubMed", "j", "999"}']
    for i in range(n_hot):
        lines.append('SET Evidence = "hot evidence {}"'.format(i))
        lines.append('p(HGNC:AKT1) increases p(HGNC:EGFR)')
    lines.append('SET Citation = {"PubMed", "j", "111"}')
    for i in range(3):
        lines.append('SET Evidence = "cold evidence {}"'.format(i))
        lines.append('p(HGNC:AKT1) decreases p(HGNC:EGFR)')
    text = '\n'.join(lines) + '\n'
    rows = [('https://hot.test/0', None, wrap_html(text), None, 'en')]
    spark.createDataFrame(rows, DOCUMENTS_SCHEMA) \
        .write.mode('append').parquet(dirs['input'])

    q = start_citation_stats_stream(spark, dirs['input'], dirs['out'],
                                    sketch_k=16)
    q.awaitTermination(120)

    stats = spark.read.parquet(os.path.join(dirs['out'], 'citation_stats'))
    latest = {r['citation_id']: r for r in stats.collect()}
    hot, cold = latest['999'], latest['111']
    assert hot['n_edges'] == n_hot
    assert not hot['evidences_exact']
    # k=16 → ~26% relative error; allow 3σ
    assert abs(hot['n_distinct_evidences'] - n_hot) / n_hot < 0.8
    assert cold['evidences_exact']
    assert cold['n_distinct_evidences'] == 3


def test_streaming_exact_dedup(spark, dirs):
    """Streaming dedup keeps the first occurrence of each text content and
    drops in-watermark repeats, across micro-batches and restarts."""
    import datetime as dt
    import time as _time

    from pyspark.sql import Row

    from pybel_spark.schemas import DOCUMENTS_SCHEMA
    from pybel_spark.streaming import start_dedup_stream

    def doc(i, text, minute):
        return Row(url='https://d.test/{}'.format(i),
                   warc_ts=dt.datetime(2026, 1, 1, 12, minute),
                   html=None, text=text, lang='en')

    wave1 = [doc(0, 'alpha body', 0), doc(1, 'beta body', 1),
             doc(2, 'alpha body', 2)]           # in-batch dup
    spark.createDataFrame(wave1, DOCUMENTS_SCHEMA) \
        .coalesce(1).write.mode('append').parquet(dirs['input'])
    q = start_dedup_stream(spark, dirs['input'], dirs['out'])
    q.awaitTermination(120)

    out_path = os.path.join(dirs['out'], 'unique_docs')
    texts1 = sorted(r['text'] for r in spark.read.parquet(out_path).collect())
    assert texts1 == ['alpha body', 'beta body']

    _time.sleep(1.2)  # distinct file mtime → ordered second micro-batch
    wave2 = [doc(3, 'alpha body', 5),           # cross-batch dup (dropped)
             doc(4, 'gamma body', 6)]           # new
    spark.createDataFrame(wave2, DOCUMENTS_SCHEMA) \
        .coalesce(1).write.mode('append').parquet(dirs['input'])
    q2 = start_dedup_stream(spark, dirs['input'], dirs['out'])
    q2.awaitTermination(120)

    texts2 = sorted(r['text'] for r in spark.read.parquet(out_path).collect())
    assert texts2 == ['alpha body', 'beta body', 'gamma body']


def test_citation_stats_idle_timeout_configured(spark, dirs):
    """The idle-eviction policy (ProcessingTimeTimeout) must run cleanly:
    counts for active keys are unchanged under the timeout-enabled path."""
    from pybel_spark.streaming import start_citation_stats_stream

    generate_documents(spark, 20, partitions=2) \
        .write.mode('append').parquet(dirs['input'])
    q = start_citation_stats_stream(spark, dirs['input'], dirs['out'],
                                    idle_timeout_ms=60_000)
    q.awaitTermination(120)
    stats = spark.read.parquet(os.path.join(dirs['out'], 'citation_stats'))
    assert stats.count() > 0
    assert stats.where('n_edges <= 0').count() == 0


def test_neardup_candidate_stream_matches_batch(spark, dirs):
    """Streaming LSH candidate generation must reproduce the batch
    self-join's pair set (no bucket overflow at this size), and keep
    emitting cross-batch pairs incrementally after a restart."""
    import pyspark.sql.functions as F

    from pybel_spark.streaming import start_neardup_candidate_stream
    from pybel_spark.textops import dedup

    docs = generate_documents(spark, 50, partitions=2).persist()
    docs.write.mode('append').parquet(dirs['input'])
    q = start_neardup_candidate_stream(spark, dirs['input'], dirs['out'],
                                       max_state_ids=64)
    q.awaitTermination(180)

    out_path = os.path.join(dirs['out'], 'neardup_candidates')
    got = {tuple(sorted((r['doc_a'], r['doc_b'])))
           for r in spark.read.parquet(out_path).collect()}
    batch = dedup.minhash_lsh_candidates(
        docs.select(F.col('url').alias('doc_id'), 'text'))
    want = {tuple(sorted((r['doc_a'], r['doc_b'])))
            for r in batch.collect()}
    assert got == want
    assert want  # the corpus genuinely contains near-dups

    # restart with more documents: state is checkpointed, so pairs
    # BETWEEN the old and new batches must appear
    docs2 = generate_documents(spark, 70, partitions=2) \
        .where(F.split(F.col('url'), '/').getItem(4).cast('int') >= 50)
    docs2.write.mode('append').parquet(dirs['input'])
    q2 = start_neardup_candidate_stream(spark, dirs['input'], dirs['out'],
                                        max_state_ids=64)
    q2.awaitTermination(180)

    got2 = {tuple(sorted((r['doc_a'], r['doc_b'])))
            for r in spark.read.parquet(out_path).collect()}
    all_docs = docs.unionByName(docs2)
    want2 = {tuple(sorted((r['doc_a'], r['doc_b'])))
             for r in dedup.minhash_lsh_candidates(
                 all_docs.select(F.col('url').alias('doc_id'), 'text'))
             .collect()}
    docs.unpersist()
    assert got2 == want2
    assert len(want2) > len(want)


def test_neardup_index_stream_matches_batch_recompute(spark, dirs,
                                                      tmp_path):
    """The unified index-backed stream (r5): candidates accumulated
    across two stream runs against the SHARED persisted band index must
    equal the batch self-join recompute over everything streamed — and
    the index afterwards serves the batch dedup_against_index path
    directly (one index, both consumers)."""
    import pyspark.sql.functions as F

    from pybel_spark.streaming import start_neardup_index_stream
    from pybel_spark.textops import dedup

    index_path = str(tmp_path / 'band_index')
    docs = generate_documents(spark, 50, partitions=2).persist()
    docs.write.mode('append').parquet(dirs['input'])
    q = start_neardup_index_stream(spark, dirs['input'], index_path,
                                   dirs['out'])
    q.awaitTermination(180)

    out_path = os.path.join(dirs['out'], 'neardup_candidates')
    got = {tuple(sorted((r['doc_a'], r['doc_b'])))
           for r in spark.read.parquet(out_path).collect()}
    want = {tuple(sorted((r['doc_a'], r['doc_b'])))
            for r in dedup.minhash_lsh_candidates(
                docs.select(F.col('url').alias('doc_id'), 'text'))
            .collect()}
    assert got == want
    assert want

    # restart with a second wave: cross-batch pairs come from the INDEX
    docs2 = generate_documents(spark, 70, partitions=2) \
        .where(F.split(F.col('url'), '/').getItem(4).cast('int') >= 50)
    docs2.write.mode('append').parquet(dirs['input'])
    q2 = start_neardup_index_stream(spark, dirs['input'], index_path,
                                    dirs['out'])
    q2.awaitTermination(180)

    all_docs = docs.unionByName(docs2)
    got2 = {tuple(sorted((r['doc_a'], r['doc_b'])))
            for r in spark.read.parquet(out_path).collect()}
    want2 = {tuple(sorted((r['doc_a'], r['doc_b'])))
             for r in dedup.minhash_lsh_candidates(
                 all_docs.select(F.col('url').alias('doc_id'), 'text'))
             .collect()}
    assert got2 == want2
    assert len(want2) > len(want)

    # the SAME index now serves the batch probe path
    probe = docs.limit(3).select(F.col('url').alias('doc_id'), 'text')
    batch_pairs = dedup.dedup_against_index(probe, index_path)
    assert batch_pairs.count() > 0
    docs.unpersist()


def test_decontaminate_stream_matches_batch(spark, dirs):
    """Streaming decontamination must keep exactly the documents the
    batch operator keeps (the broadcast-index join is stateless, so
    stream and batch are the same code path)."""
    import pyspark.sql.functions as F

    from pybel_spark.streaming import start_decontaminate_stream
    from pybel_spark.textops.decontaminate import decontaminate

    docs = generate_documents(spark, 40, partitions=2).persist()
    docs.write.mode('append').parquet(dirs['input'])
    # benchmark = ONE corpus doc's text (docs share pool units, so a
    # handful of docs overlap its 8-grams; most don't)
    bench = (docs.where(F.split(F.col('url'), '/').getItem(4)
                        .cast('int') == 0)
             .select(F.col('url').alias('bench_id'), 'text').persist())
    q = start_decontaminate_stream(spark, dirs['input'], dirs['out'],
                                   bench)
    q.awaitTermination(120)

    clean_path = os.path.join(dirs['out'], 'clean_docs')
    got = {r['url'] for r in spark.read.parquet(clean_path).collect()}
    want = {r['url'] for r in decontaminate(
        docs.withColumn('text', F.coalesce('text', F.lit(''))),
        bench, id_col='url').collect()}
    assert got == want
    assert 0 < len(want) < docs.count()  # some dropped, some kept

    # replay drill: wipe the checkpoint AND the applied markers, rerun
    # the whole input — per-batch ingest_batch=<id> overwrite partitions
    # must REPLACE the prior output, leaving zero duplicate documents
    shutil.rmtree(os.path.join(dirs['out'], 'decontaminate_checkpoint'))
    shutil.rmtree(os.path.join(dirs['out'], 'decontaminate_applied'))
    q2 = start_decontaminate_stream(spark, dirs['input'], dirs['out'],
                                    bench)
    q2.awaitTermination(120)
    replayed = spark.read.parquet(clean_path)
    assert {r['url'] for r in replayed.collect()} == want
    assert replayed.count() == len(want)  # overwrite, not append
    docs.unpersist()
    bench.unpersist()


def test_domain_quality_stream_matches_batch(spark, tmp_path):
    """The windowed per-domain quality monitor must agree with the batch
    computation of the same aggregation (emitted windows only — the
    frontier wave exists to push the watermark past wave A's windows)."""
    import datetime as dt
    import time

    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from pybel_spark.schemas import DOCUMENTS_SCHEMA
    from pybel_spark.streaming import start_domain_quality_stream
    from pybel_spark.textops.quality import quality_score_col
    from pybel_spark.textops.tokenize import whitespace_tokens
    from pybel_spark.textops.urls import registered_domain

    in_dir = str(tmp_path / 'in')
    out_dir = str(tmp_path / 'out')
    os.makedirs(in_dir)

    def doc(i, hour, domain, text):
        return Row(url='https://sub.{}/p/{}'.format(domain, i),
                   warc_ts=dt.datetime(2026, 1, 1, hour, 30),
                   html=None, text=text, lang='en')

    good = ('the engine processes the data with care and it is in good '
            'shape for the corpus work today and beyond all doubt')
    junk = 'zz zz zz zz'
    wave_a = [doc(i, hour=i % 2, domain='alpha.example', text=good)
              for i in range(6)]
    wave_a += [doc(100 + i, hour=0, domain='beta.example', text=junk)
               for i in range(4)]

    spark.createDataFrame(wave_a, DOCUMENTS_SCHEMA).coalesce(1) \
        .write.mode('overwrite').parquet(os.path.join(in_dir, 'a'))
    time.sleep(1.2)
    # frontier wave: pushes the watermark far past wave A's windows
    spark.createDataFrame(
        [doc(999, hour=12, domain='gamma.example', text=good)],
        DOCUMENTS_SCHEMA).coalesce(1) \
        .write.mode('overwrite').parquet(os.path.join(in_dir, 'b'))
    time.sleep(1.2)
    spark.createDataFrame(
        [doc(998, hour=13, domain='gamma.example', text=good)],
        DOCUMENTS_SCHEMA).coalesce(1) \
        .write.mode('overwrite').parquet(os.path.join(in_dir, 'c'))

    q = start_domain_quality_stream(spark, in_dir + '/*', out_dir,
                                    window='1 hour', watermark='2 hours',
                                    max_files_per_trigger=1)
    q.awaitTermination(120)

    got = spark.read.parquet(os.path.join(out_dir, 'domain_quality'))
    got_rows = {tuple(r) for r in got.select(
        'window_start', 'domain', 'n_docs', 'n_tokens', 'mean_quality',
        'n_low_quality').collect()}

    batch = spark.createDataFrame(wave_a, DOCUMENTS_SCHEMA)
    want = (
        batch.withColumn('text', F.coalesce('text', F.lit('')))
        .withColumn('quality_score', quality_score_col('text'))
        .withColumn('domain', registered_domain(F.col('url')))
        .withColumn('n_tokens', F.size(whitespace_tokens('text')))
        .groupBy(F.window('warc_ts', '1 hour'), 'domain')
        .agg(F.count(F.lit(1)).alias('n_docs'),
             F.sum('n_tokens').alias('n_tokens'),
             F.round(F.avg('quality_score'), 6).alias('mean_quality'),
             F.sum((F.col('quality_score') < 0.75).cast('long'))
             .alias('n_low_quality'))
        .select(F.col('window.start').alias('window_start'), 'domain',
                'n_docs', 'n_tokens', 'mean_quality', 'n_low_quality')
    )
    want_rows = {tuple(r) for r in want.collect()}
    assert want_rows <= got_rows  # wave A's windows all emitted, exact
    # the junk domain is flagged: every beta doc is below threshold
    beta = [r for r in got_rows if r[1] == 'beta.example']
    assert beta and all(r[2] == r[5] for r in beta)


def test_kg_index_stream_matches_batch_recompute(spark, dirs, tmp_path):
    """Streaming incremental KG construction over the shared parse index:
    triples accumulated across two stream runs must equal the batch
    dedup-parse recompute over everything streamed; per-batch lineage
    metrics are exactly-once (they ARE the replay markers); and the
    same index then serves the BATCH updater directly."""
    import pyspark.sql.functions as F

    from pybel_spark import parse_index as PI
    from pybel_spark.pipeline import extract_triples_deduped
    from pybel_spark.streaming import (read_kg_index_metrics,
                                       start_kg_index_stream)

    index_path = str(tmp_path / 'kg_index')
    docs = generate_documents(spark, 40, partitions=2).persist()
    docs.write.mode('append').parquet(dirs['input'])
    q = start_kg_index_stream(spark, dirs['input'], index_path)
    q.awaitTermination(180)

    got = {tuple(r) for r in
           PI.triples_from_index(spark, index_path).collect()}
    want = {tuple(r) for r in extract_triples_deduped(docs).collect()}
    assert got == want and want

    metrics = read_kg_index_metrics(spark, index_path)
    assert metrics and all(m['batch_keys'] >= m['novel_keys']
                           for m in metrics)
    assert metrics[0]['novel_keys'] == metrics[0]['batch_keys'] > 0

    # restart with a second wave: only never-seen statements are parsed
    docs2 = generate_documents(spark, 60, partitions=2) \
        .where(F.split(F.col('url'), '/').getItem(4).cast('int') >= 40)
    docs2.write.mode('append').parquet(dirs['input'])
    q2 = start_kg_index_stream(spark, dirs['input'], index_path)
    q2.awaitTermination(180)

    all_docs = docs.unionByName(docs2)
    got2 = {tuple(r) for r in
            PI.triples_from_index(spark, index_path).collect()}
    want2 = {tuple(r) for r in extract_triples_deduped(all_docs).collect()}
    assert got2 == want2

    metrics2 = read_kg_index_metrics(spark, index_path)
    assert len(metrics2) > len(metrics)  # new batches left lineage rows
    # replay run with nothing new: no extra markers, no state change
    q3 = start_kg_index_stream(spark, dirs['input'], index_path)
    q3.awaitTermination(180)
    assert read_kg_index_metrics(spark, index_path) == metrics2

    # the SAME index serves the batch updater: full replay is a no-op
    m = PI.parse_index_update(all_docs, index_path)
    assert m['novel_keys'] == 0
    docs.unpersist()


def test_session_stream_equals_batch(spark, tmp_path):
    """Streamed session windows equal the batch gap-sessionization on
    tie-free event times (availableNow, append after watermark close)."""
    import shutil

    from pybel_spark.events import session_stats
    from pybel_spark.streaming import start_session_stream

    in_dir = str(tmp_path / 'ev_in')
    out_dir = str(tmp_path / 'ev_out')
    os.makedirs(in_dir)
    # real events slice: no exact-gap ties (microsecond jitter)
    ev = spark.read.parquet('/root/testdata/sf0.001/events.parquet')
    ev.coalesce(1).write.parquet(os.path.join(in_dir, 'w1'))

    q = start_session_stream(spark, in_dir + '/*', out_dir,
                             gap='30 minutes', watermark='1 minute',
                             max_files_per_trigger=1)
    q.awaitTermination(120)

    got = {(r['user_id'], r['start_ts'], r['end_ts'],
            r['n_events'], round(r['value_sum'], 6))
           for r in spark.read.parquet(
               os.path.join(out_dir, 'sessions')).collect()}
    exp = {(r['user_id'], r['start_ts'], r['end_ts'],
            r['n_events'], r['value_sum_r'])
           for r in session_stats(ev, gap_minutes=30).collect()}
    # the stream may hold back sessions not yet closed by the watermark:
    # everything emitted must be exactly a batch session, and the bulk of
    # the batch sessions must have been emitted
    assert got <= exp
    assert len(got) >= 0.9 * len(exp)
    shutil.rmtree(out_dir, ignore_errors=True)


def test_session_window_tie_semantics(spark, tmp_path):
    """An event EXACTLY gap after the previous one merges in BOTH the
    batch op (splits only on gap > threshold) and session_window —
    the two sessionizations agree even on boundary ties."""
    import datetime as dt

    from pybel_spark.events import sessionize
    from pybel_spark.streaming import start_session_stream

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    # user 99's sentinel 3h later pushes the watermark past both of user
    # 7's session ends so append mode flushes them
    rows = [(0, t0, 7, 'click', 1.0, None),
            (1, t0 + dt.timedelta(minutes=30), 7, 'click', 2.0, None),
            (2, t0 + dt.timedelta(hours=3), 99, 'click', 0.0, None)]
    df = spark.createDataFrame(
        rows, 'event_id bigint, ts timestamp, user_id bigint,'
              ' event_type string, value double, props string')
    # batch: exactly-30-min gap does NOT split
    b = sessionize(df, gap_minutes=30)
    assert {r['session_idx'] for r in b.collect()} == {0}

    in_dir = str(tmp_path / 'tie_in')
    out_dir = str(tmp_path / 'tie_out')
    os.makedirs(in_dir)
    df.coalesce(1).write.parquet(os.path.join(in_dir, 'w'))
    q = start_session_stream(spark, in_dir + '/*', out_dir,
                             gap='30 minutes', watermark='0 seconds')
    q.awaitTermination(120)
    got = [r for r in spark.read.parquet(
        os.path.join(out_dir, 'sessions')).collect() if r['user_id'] == 7]
    # session_window merges the boundary tie exactly like the batch op
    assert sorted(r['n_events'] for r in got) == [2]


def test_frontier_stream_matches_batch_bloom(spark, dirs, tmp_path):
    """Two stream waves against the SHARED persisted Bloom seen-set:
    wave-2 flags must equal the batch bloom_probe over wave-1's urls
    (zero false negatives for re-crawled urls, deterministic FPs for
    novel ones), and the OR-idempotent filter must equal a batch
    rebuild over everything streamed."""
    import pyspark.sql.functions as F

    from pybel_spark.streaming import start_frontier_stream
    from pybel_spark.textops import bloom

    bloom_path = str(tmp_path / 'seen_bloom')
    m_bits, k = 1 << 16, 3

    docs1 = generate_documents(spark, 40, partitions=2).persist()
    docs1.write.mode('append').parquet(dirs['input'])
    q = start_frontier_stream(spark, dirs['input'], bloom_path,
                              dirs['out'], m_bits=m_bits, k=k)
    q.awaitTermination(180)

    flags_path = os.path.join(dirs['out'], 'frontier_flags')
    first = {r['url']: r['maybe_seen']
             for r in spark.read.parquet(flags_path).collect()}
    # bootstrap wave: nothing was seen before
    assert set(first) == {r['url'] for r in docs1.select('url').collect()}

    # wave 2: 20 re-crawled urls + 30 novel ones
    docs2 = generate_documents(spark, 70, partitions=2) \
        .where(F.split(F.col('url'), '/').getItem(4).cast('int') >= 20) \
        .persist()
    docs2.write.mode('append').parquet(dirs['input'])
    q2 = start_frontier_stream(spark, dirs['input'], bloom_path,
                               dirs['out'], m_bits=m_bits, k=k)
    q2.awaitTermination(180)

    all_flags = spark.read.parquet(flags_path)
    last_batch = all_flags.agg(F.max('ingest_batch')).collect()[0][0]
    flags2 = {r['url']: r['maybe_seen']
              for r in all_flags.where(
                  F.col('ingest_batch') == last_batch).collect()}
    # expected: batch probe of wave-2 urls against a filter built from
    # wave-1 urls only
    words1 = bloom.bloom_pack(bloom.bloom_bits(
        docs1.select('url'), col='url', m_bits=m_bits, k=k), m_bits)
    want = {r['url']: r['maybe_seen']
            for r in bloom.bloom_probe(
                words1, docs2.select('url').distinct(), col='url',
                m_bits=m_bits, k=k).collect()}
    for url, expect in want.items():
        assert flags2[url] == expect
    seen1 = {r['url'] for r in docs1.select('url').collect()}
    assert all(want[u] for u in want if u in seen1)  # no false negatives
    assert any(not want[u] for u in want)            # novel urls surface

    # the streamed filter (OR of both waves' appends) equals a batch
    # rebuild over everything streamed — replay/merge idempotence
    streamed = {(r['word_idx'], r['word'])
                for r in spark.read.parquet(bloom_path + '/words')
                .groupBy('word_idx')
                .agg(F.expr('bit_or(word)').alias('word')).collect()}
    rebuilt = {(r['word_idx'], r['word'])
               for r in bloom.bloom_pack(bloom.bloom_bits(
                   docs1.select('url').unionByName(docs2.select('url')),
                   col='url', m_bits=m_bits, k=k), m_bits).collect()}
    assert streamed == rebuilt


def test_frontier_batch_replay_is_idempotent(spark, tmp_path):
    """The exact crash window from this round's code review: a batch
    whose words fold COMMITTED but whose streaming checkpoint did not.
    Replaying the same batch_id must reproduce the original flags
    (probing a filter that excludes the batch's own partition), never
    flag the batch's novel urls as already crawled."""
    import pyspark.sql.functions as F

    from pybel_spark.streaming import _frontier_process_batch

    bloom_path = str(tmp_path / 'bloom')
    out_dir = str(tmp_path / 'out')
    m_bits, k = 1 << 16, 3
    urls0 = spark.createDataFrame(
        [('https://a/{}'.format(i),) for i in range(40)], 'url string')
    urls1 = spark.createDataFrame(
        [('https://a/{}'.format(i),) for i in range(20, 60)],
        'url string')

    _frontier_process_batch(spark, urls0, 0, bloom_path, out_dir,
                            m_bits=m_bits, k=k)
    _frontier_process_batch(spark, urls1, 1, bloom_path, out_dir,
                            m_bits=m_bits, k=k)
    flags_path = out_dir + '/frontier_flags'
    first = sorted(map(tuple, spark.read.parquet(flags_path)
                       .where(F.col('ingest_batch') == 1)
                       .select('url', 'maybe_seen').collect()))
    # 20 re-crawled urls flagged, 20 novel ones not (modulo FPs, which
    # can only add flags deterministically)
    n_seen = sum(1 for _, m in first if m)
    assert n_seen >= 20
    assert any(not m for _, m in first)

    # REPLAY batch 1 after its fold committed — the pre-fix behavior
    # probed its own bits and flipped every url to maybe_seen=true
    _frontier_process_batch(spark, urls1, 1, bloom_path, out_dir,
                            m_bits=m_bits, k=k)
    replayed = sorted(map(tuple, spark.read.parquet(flags_path)
                          .where(F.col('ingest_batch') == 1)
                          .select('url', 'maybe_seen').collect()))
    assert replayed == first
    # and the filter state is unchanged too: the replayed partition
    # overwrote itself, so the OR-collapse equals a clean batch rebuild
    words = spark.read.parquet(bloom_path + '/words')
    rebuilt = {(r['word_idx'], r['word'])
               for r in words.groupBy('word_idx')
               .agg(F.expr('bit_or(word)').alias('word')).collect()}
    from pybel_spark.textops import bloom
    want = {(r['word_idx'], r['word'])
            for r in bloom.bloom_pack(bloom.bloom_bits(
                urls0.unionByName(urls1), col='url', m_bits=m_bits, k=k),
                m_bits).collect()}
    assert rebuilt == want
