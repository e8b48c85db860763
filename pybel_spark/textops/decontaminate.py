"""Benchmark decontamination: find training documents that leak eval data.

The GPT-3-style protocol (Brown et al. 2020, appendix C): a training
document is contaminated if it shares at least one word n-gram (n≈8-13)
with any document in a held-out benchmark suite. At 100-TB corpus scale
the two sides are wildly asymmetric — benchmarks are thousands of rows,
the corpus is trillions — so the implementation indexes the benchmark's
n-grams and BROADCASTS them; the corpus side streams through a map-side
hash join and is never shuffled. Shuffle volume is proportional to true
collision count (the contaminated minority), not corpus size.

Shingling reuses :func:`pybel_spark.textops.dedup.doc_shingles` — the same
windowing formulation every other near-dup operator (and its DuckDB
oracle) tracks.
"""
from pyspark.sql import DataFrame, functions as F

from .dedup import doc_shingles


def benchmark_contamination(docs: DataFrame, benchmark: DataFrame,
                            n: int = 8,
                            id_col: str = 'doc_id', text_col: str = 'text',
                            bench_id_col: str = 'bench_id',
                            bench_text_col: str = 'text') -> DataFrame:
    """(doc_id, bench_id, n_shared_ngrams) for every corpus document that
    shares ≥1 word n-gram with a benchmark document.

    ``n_shared_ngrams`` counts DISTINCT shared n-grams per (doc, bench)
    pair — the overlap-strength signal used to rank how badly a document
    leaks a benchmark. The benchmark n-gram index is broadcast, so the
    plan is scan(corpus) → shingle → broadcast-hash-join → partial agg →
    one small shuffle on the (collision-only) pair keys.
    """
    corpus_ngrams = doc_shingles(docs, id_col=id_col, text_col=text_col, n=n)
    bench_ngrams = (
        doc_shingles(benchmark, id_col=bench_id_col, text_col=bench_text_col,
                     n=n)
        .withColumnRenamed('doc_id', 'bench_id')
    )
    return (
        corpus_ngrams
        .join(F.broadcast(bench_ngrams), on='shingle')
        .groupBy('doc_id', 'bench_id')
        .agg(F.count(F.lit(1)).alias('n_shared_ngrams'))
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  id_col: str = 'doc_id', text_col: str = 'text',
                  bench_id_col: str = 'bench_id',
                  bench_text_col: str = 'text') -> DataFrame:
    """Corpus minus every document contaminated by the benchmark suite
    (anti-join on the contamination hits — the clean-side rows keep their
    partitioning; nothing about the big side is shuffled)."""
    hits = benchmark_contamination(
        docs, benchmark, n=n, id_col=id_col, text_col=text_col,
        bench_id_col=bench_id_col, bench_text_col=bench_text_col)
    return docs.join(
        hits.select(F.col('doc_id').alias(id_col)).distinct(),
        on=id_col, how='left_anti')
