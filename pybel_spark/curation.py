"""Stage-checkpointed curation runs: the resumable 100-TB curation job.

The curation operators (cap → dedup → near-dedup → decontaminate →
quality gate → mixture sample) are individually cheap to re-run at test
scale, but a 100-TB run that dies in stage 4 of 6 must NOT redo stages
1-3 — unlike the KG pipeline's per-bucket lineage (``pipeline.
run_checkpointed``), the dedup stages are corpus-global, so the natural
checkpoint granularity is the STAGE: each stage's full output is
committed as a parquet table + an atomic manifest entry, and a rerun
resumes from the first uncommitted stage.

Reuses the manifest/lease machinery of ``pipeline.py`` verbatim: one
writer per out_dir (advisory lease with fencing before every manifest
swap, rename-broken stale locks), atomic MANIFEST.json swaps, and a
partial (crashed mid-write) stage directory is simply overwritten by the
rerun because publication happens only via the manifest.
"""
import time

from pyspark.sql import DataFrame, functions as F

from .pipeline import _OutputFS, _read_manifest, _swap_manifest, _WriterLease


def run_curation_checkpointed(spark, documents: DataFrame, out_dir: str,
                              stages, lease_seconds: float = 600.0) -> dict:
    """Run ``stages`` (ordered list of ``(name, fn)``; each
    ``fn: DataFrame -> DataFrame``) over ``documents``, committing every
    stage's output under ``out_dir/stage-<i>-<name>`` with an atomic
    manifest entry recording rows_out and wall seconds.

    Resume semantics: a stage whose manifest entry exists is NOT re-run —
    its committed parquet output feeds the next stage. The first
    uncommitted stage recomputes from its predecessor's committed table
    (never from raw inputs), so a crash loses at most one stage's work.
    Changing the stage LIST of an existing out_dir (names/order) is
    rejected — silently mixing two pipelines' artifacts is worse than
    failing.

    Returns {'stages': [...per-stage summaries...], 'skipped': n,
    'rows_out': final count, 'output': final stage path}.
    """
    fs = _OutputFS(spark, out_dir)
    lease = _WriterLease(fs, lease_seconds).acquire()
    try:
        return _run_stages_locked(spark, documents, fs, lease, stages)
    finally:
        lease.release()


def _stage_dir(i, name):
    return 'stage-{}-{}'.format(i, name)


def _run_stages_locked(spark, documents, fs, lease, stages):
    manifest = _read_manifest(fs)
    done = manifest.setdefault('curation_stages', [])
    expected = [name for name, _fn in stages]
    recorded = [d['name'] for d in done]
    if recorded != expected[:len(recorded)]:
        raise ValueError(
            'out_dir has a committed stage list {} that is not a prefix '
            'of the requested pipeline {} — refusing to mix pipelines'
            .format(recorded, expected))

    current = documents
    summaries = []
    skipped = 0
    for i, (name, fn) in enumerate(stages):
        path = fs._full(_stage_dir(i, name))
        if i < len(done):
            # committed stage: feed its table onward, never recompute
            current = spark.read.parquet(path)
            summaries.append(dict(done[i], skipped=True))
            skipped += 1
            continue
        t0 = time.time()
        out = fn(current)
        # a crashed previous attempt may have left a partial dir —
        # mode('overwrite') replaces it; nothing is published until the
        # manifest swap below
        out.write.mode('overwrite').parquet(path)
        committed = spark.read.parquet(path)
        rows = committed.count()
        entry = {
            'name': name, 'rows_out': rows,
            'wall_sec': round(time.time() - t0, 3),
        }
        lease.renew()  # fencing: refuse to publish on a lost lease
        done.append(entry)
        _swap_manifest(fs, manifest)
        summaries.append(dict(entry, skipped=False))
        current = committed
    return {
        'stages': summaries,
        'skipped': skipped,
        'rows_out': summaries[-1]['rows_out'] if summaries else 0,
        'output': fs._full(_stage_dir(len(stages) - 1, stages[-1][0]))
        if stages else None,
    }


def default_curation_stages(domain_cap=1000, benchmark: DataFrame = None,
                            fractions=None, default_fraction=1.0,
                            sample_seed=1, quality_threshold=0.75,
                            minhash_threshold=0.5, pii_scrub=False,
                            c4=False, c4_min_sentences=3):
    """The standard chain as ``(name, fn)`` stages over a documents table
    with (doc_id, url, source, text): per-domain cap → optional C4-style
    page cleaning (``c4=True``; placed BEFORE the dedup stages, as in
    Raffel et al. 2020, so dedup keys see the cleaned text rather than
    boilerplate that cleaning would have removed anyway) → exact dedup →
    MinHash near-dedup (drop the higher-id member of each verified
    pair) → optional benchmark decontamination → optional PII redaction
    (``pii_scrub=True``; placed AFTER the dedup stages so placeholder
    tokens can't merge near-miss documents, BEFORE the quality gate so
    scoring sees what ships) → quality/language gate → stratified
    mixture sample. With the optional stages off the chain mirrors the
    oracle-checked ``corpus_curation_e2e`` composition stage for
    stage."""
    from .textops import dedup, mixture, pii, quality, urls
    from .textops.decontaminate import decontaminate

    def cap(docs):
        return urls.cap_per_domain(docs, domain_cap)

    def exact(docs):
        keep = (docs.groupBy(F.md5('text').alias('_md5'))
                .agg(F.min('doc_id').alias('doc_id'))
                .select('doc_id'))
        return docs.join(keep, on='doc_id')

    def near(docs):
        drop = (dedup.minhash_dedup_pairs(docs,
                                          threshold=minhash_threshold)
                .select(F.col('doc_b').alias('doc_id')).distinct())
        return docs.join(drop, on='doc_id', how='left_anti')

    def decon(docs):
        return decontaminate(docs, benchmark)

    def gate(docs):
        scored = (docs.join(quality.quality_score(docs), on='doc_id')
                  .join(quality.detect_language(docs), on='doc_id'))
        return (scored.where(
            (F.col('quality_score') >= quality_threshold)
            & (F.col('detected_lang') != 'unknown'))
            .drop('quality_score', 'detected_lang'))

    def sample(docs):
        return mixture.stratified_sample(
            docs, fractions or {}, default_fraction=default_fraction,
            seed=sample_seed)

    def scrub(docs):
        return pii.redact_pii(docs)

    def clean(docs):
        return quality.c4_clean(docs, min_sentences=c4_min_sentences)

    stages = [('domain_cap', cap)]
    if c4:
        stages.append(('c4_clean', clean))
    stages.extend([('exact_dedup', exact), ('near_dedup', near)])
    if benchmark is not None:
        stages.append(('decontaminate', decon))
    if pii_scrub:
        stages.append(('pii_scrub', scrub))
    stages.extend([('quality_gate', gate), ('mixture_sample', sample)])
    return stages
