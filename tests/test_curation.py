"""Stage-checkpointed curation runs (pybel_spark/curation.py)."""
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from pybel_spark.curation import (
    default_curation_stages, run_curation_checkpointed,
)


@pytest.fixture()
def docs(spark):
    rows = []
    for i in range(120):
        # 8 domains, one oversized; some exact dups; quality-passing text
        domain = 'big.example.com' if i % 3 == 0 \
            else 'site{}.example.com'.format(i % 8)
        text = ('the quick brown fox jumps over the lazy dog and then '
                'the dog chases the fox around the garden number {}'
                .format(i if i % 10 else 'DUP'))
        rows.append((i, 'https://{}/p/{}'.format(domain, i),
                     'src{}'.format(i % 3), text))
    return spark.createDataFrame(
        rows, 'doc_id long, url string, source string, text string') \
        .persist()


def _direct(docs, stages):
    cur = docs
    for _name, fn in stages:
        cur = fn(cur)
    return cur


class TestCurationCheckpointed:
    def test_single_shot_matches_direct_composition(self, spark, docs):
        out_dir = tempfile.mkdtemp(prefix='pybel_spark_cur_')
        try:
            stages = default_curation_stages(domain_cap=20,
                                             default_fraction=0.8)
            r = run_curation_checkpointed(spark, docs, out_dir, stages)
            assert [s['name'] for s in r['stages']] == [
                'domain_cap', 'exact_dedup', 'near_dedup',
                'quality_gate', 'mixture_sample']
            assert r['skipped'] == 0
            got = {x['doc_id'] for x in
                   spark.read.parquet(r['output']).collect()}
            want = {x['doc_id'] for x in
                    _direct(docs, stages).collect()}
            assert got == want and 0 < len(want) < 120
            # monotone attrition, all stages produced rows
            counts = [s['rows_out'] for s in r['stages']]
            assert counts == sorted(counts, reverse=True)
            assert counts[-1] > 0
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_crash_resume_skips_committed_stages(self, spark, docs):
        """A stage that dies mid-run: the rerun must NOT recompute the
        committed predecessors, and the final output must equal the
        single-shot result."""
        out_dir = tempfile.mkdtemp(prefix='pybel_spark_cur_')
        try:
            stages = default_curation_stages(domain_cap=20,
                                             default_fraction=0.8)
            boom = dict(fail=True)

            def exploding(cur):
                if boom['fail']:
                    raise RuntimeError('simulated executor loss')
                return stages[2][1](cur)

            broken = stages[:2] + [('near_dedup', exploding)] + stages[3:]
            with pytest.raises(RuntimeError, match='simulated'):
                run_curation_checkpointed(spark, docs, out_dir, broken)

            boom['fail'] = False
            r = run_curation_checkpointed(spark, docs, out_dir, broken)
            assert r['skipped'] == 2  # domain_cap + exact_dedup reused
            assert [s['name'] for s in r['stages'][:2]] == [
                'domain_cap', 'exact_dedup']
            assert all(s['skipped'] for s in r['stages'][:2])
            got = {x['doc_id'] for x in
                   spark.read.parquet(r['output']).collect()}
            want = {x['doc_id'] for x in _direct(docs, stages).collect()}
            assert got == want
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_rerun_of_complete_pipeline_skips_everything(self, spark,
                                                         docs):
        out_dir = tempfile.mkdtemp(prefix='pybel_spark_cur_')
        try:
            stages = default_curation_stages(domain_cap=20,
                                             default_fraction=0.8)
            first = run_curation_checkpointed(spark, docs, out_dir, stages)
            again = run_curation_checkpointed(spark, docs, out_dir, stages)
            assert again['skipped'] == len(stages)
            assert again['rows_out'] == first['rows_out']
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_mixed_pipelines_rejected(self, spark, docs):
        out_dir = tempfile.mkdtemp(prefix='pybel_spark_cur_')
        try:
            stages = default_curation_stages(domain_cap=20,
                                             default_fraction=0.8)
            run_curation_checkpointed(spark, docs, out_dir, stages[:2])
            other = [('something_else', lambda d: d)]
            with pytest.raises(ValueError, match='refusing to mix'):
                run_curation_checkpointed(spark, docs, out_dir, other)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_second_live_writer_fails_fast(self, spark, docs):
        from pybel_spark.pipeline import (
            ConcurrentWriteError, _OutputFS, _WriterLease,
        )

        out_dir = tempfile.mkdtemp(prefix='pybel_spark_cur_')
        try:
            holder = _WriterLease(_OutputFS(spark, out_dir)).acquire()
            stages = default_curation_stages(domain_cap=20)
            with pytest.raises(ConcurrentWriteError, match='live writer'):
                run_curation_checkpointed(spark, docs, out_dir, stages)
            holder.check()
            holder.release()
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)


def test_pii_scrub_stage(spark, docs):
    """Opt-in PII redaction runs between dedup and the quality gate and
    the final sample's text carries placeholders, not raw PII."""
    pii_docs = docs.withColumn(
        'text', F.concat(
            'text', F.lit(' contact owner'),
            F.col('doc_id').cast('string'), F.lit('@leak.example.net')))
    out_dir = tempfile.mkdtemp(prefix='pybel_spark_cur_pii_')
    try:
        stages = default_curation_stages(domain_cap=20,
                                         default_fraction=1.0,
                                         pii_scrub=True)
        assert [n for n, _f in stages] == [
            'domain_cap', 'exact_dedup', 'near_dedup', 'pii_scrub',
            'quality_gate', 'mixture_sample']
        r = run_curation_checkpointed(spark, pii_docs, out_dir, stages)
        rows = spark.read.parquet(r['output']).collect()
        assert rows
        assert all('@' not in x['text'] for x in rows)
        assert all('<EMAIL>' in x['text'] for x in rows)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_c4_clean_stage(spark, docs):
    """Opt-in C4 cleaning runs before the dedup stages: boilerplate
    lines are gone from every downstream text, and two documents that
    differ only in removed boilerplate become exact duplicates."""
    page_docs = docs.withColumn(
        'text', F.concat_ws(
            '\n', 'text',
            F.lit('Please enable JavaScript to continue browsing.'),
            F.lit('the first retained sentence of the page is here.'),
            F.lit('and a second retained sentence follows it nicely!'),
            F.lit('finally a third retained sentence closes the page?')))
    out_dir = tempfile.mkdtemp(prefix='pybel_spark_cur_c4_')
    try:
        stages = default_curation_stages(domain_cap=20,
                                         default_fraction=1.0, c4=True)
        assert [n for n, _f in stages] == [
            'domain_cap', 'c4_clean', 'exact_dedup', 'near_dedup',
            'quality_gate', 'mixture_sample']
        r = run_curation_checkpointed(spark, page_docs, out_dir, stages)
        # every doc's cleaned text is the identical 3 retained sentences
        # (the unpunctuated fixture line and the javascript line are
        # line-dropped), so exact dedup keeps exactly one survivor
        names = [s['name'] for s in r['stages']]
        rows_after = {s['name']: s['rows_out'] for s in r['stages']}
        assert names[1] == 'c4_clean'
        assert rows_after['exact_dedup'] == 1
        final = spark.read.parquet(r['output']).collect()
        for x in final:
            assert 'JavaScript' not in x['text']
            assert 'quick brown fox' not in x['text']
            assert x['n_sentences'] == 3
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_adaptive_quality_gate_per_source_thresholds(spark):
    from pybel_spark.textops.quality import adaptive_quality_gate
    # src A: clean English sentences (high scores); src B: junk (low)
    rows = []
    for i in range(8):
        rows.append((i, 'A',
                     'the quick brown fox jumps over the lazy dog and '
                     'runs far away with great speed today ' + str(i)))
    for i in range(8, 16):
        rows.append((i, 'B', 'x' * 50))
    docs = spark.createDataFrame(rows,
                                 'doc_id bigint, source string, text string')
    out = adaptive_quality_gate(docs, quantile=0.25)
    got = out.collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r['source'], []).append(r)
    # BOTH sources keep rows — the low-quality source is not wiped out
    assert by_src.get('A') and by_src.get('B')
    # thresholds differ per source (A's p25 is higher than B's)
    thr = {r['source']: r['threshold_r'] for r in got}
    assert thr['A'] > thr['B']
    # every kept row meets its own source's threshold
    assert all(r['score_r'] >= r['threshold_r'] for r in got)
