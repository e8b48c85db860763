"""Structured Streaming over an append-only documents table.

The reference is strictly batch (SURVEY.md §2.9); this is the Spark-native
add-on the north rule anticipates: new web-page files/snapshots land in the
input directory, the SAME vectorized parse stage processes them incrementally,
and outputs append with exactly-once file-sink semantics via the stream
checkpoint. Parsing itself is stateless per document (state lives in the
sink + checkpoint); on top of it sit a watermarked event-time windowed
aggregation (start_crawl_window_stream — late-data policy for crawl
timestamps) and a custom stateful operator (start_citation_stats_stream —
applyInPandasWithState running rollup).

Downstream dedup (distinct triples / nodes) is a batch view over the streamed
edge log: read_stream_output() applies the same content-hash dropDuplicates
used by the batch path.
"""
import os

from pyspark.sql import DataFrame, functions as F

from .corpus import load_corpus_catalog
from .pipeline import make_parse_func
from .schemas import DOCUMENTS_SCHEMA, PARSED_SCHEMA


def read_document_stream(spark, input_dir: str,
                         max_files_per_trigger: int = 16) -> DataFrame:
    """Incrementally read parquet documents dropped into ``input_dir``."""
    return (
        spark.readStream
        .schema(DOCUMENTS_SCHEMA)
        .option('maxFilesPerTrigger', str(max_files_per_trigger))
        .parquet(input_dir)
    )


def parse_document_stream(documents: DataFrame, catalog=None,
                          compiler_options=None) -> DataFrame:
    """The streaming parse: identical mapInPandas stage as the batch path."""
    if catalog is None:
        catalog = load_corpus_catalog()
    parse = make_parse_func(catalog, compiler_options,
                            spark=documents.sparkSession)
    return documents.mapInPandas(parse, schema=PARSED_SCHEMA)


def start_edge_stream(spark, input_dir: str, out_dir: str, catalog=None,
                      compiler_options=None, trigger_available_now=True):
    """Stream documents → exploded edge rows appended to a parquet log.

    Exactly-once via the file sink + checkpoint; restarting after a kill
    resumes from the last committed batch (complements the batch pipeline's
    bucket lineage).
    """
    parsed = parse_document_stream(
        read_document_stream(spark, input_dir), catalog, compiler_options)
    edges = (
        parsed.select(F.col('url'), F.explode('edges').alias('e'))
        .select('url', 'e.*')
    )
    writer = (
        edges.writeStream
        .format('parquet')
        .option('path', os.path.join(out_dir, 'edges_log'))
        .option('checkpointLocation', os.path.join(out_dir, 'checkpoint'))
        .outputMode('append')
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_citation_stats_stream(spark, input_dir: str, out_dir: str,
                                catalog=None, compiler_options=None,
                                trigger_available_now=True):
    """Custom STATEFUL streaming operator: running per-citation statistics.

    ``applyInPandasWithState`` keeps a (n_edges, n_evidences) accumulator per
    (citation_db, citation_id) across micro-batches — the pattern for any
    custom stateful rollup the built-in windowed aggregations can't express.
    State is checkpointed with the query; a restart resumes the counts.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    parsed = parse_document_stream(
        read_document_stream(spark, input_dir), catalog, compiler_options)
    edges = (
        parsed.select(F.explode('edges').alias('e'))
        .select('e.citation_db', 'e.citation_id', 'e.evidence')
        .where(F.col('citation_db').isNotNull())
    )

    output_schema = ('citation_db string, citation_id string, '
                     'n_edges long, n_distinct_evidences long')
    state_schema = 'n_edges long, evidence_hashes array<string>'

    def update(key, pdfs, state):
        n_new = 0
        hashes = set()
        for pdf in pdfs:
            n_new += len(pdf)
            hashes.update(pdf['evidence'].dropna().unique().tolist())
        if state.exists:
            n_edges, old_hashes = state.get
            hashes.update(old_hashes or [])
            n_edges += n_new
        else:
            n_edges = n_new
        hashes = sorted(hashes)
        state.update((n_edges, hashes))
        yield pd.DataFrame([{
            'citation_db': key[0],
            'citation_id': key[1],
            'n_edges': n_edges,
            'n_distinct_evidences': len(hashes),
        }])

    # operator mode 'append' (emitting the running snapshot each batch) —
    # the file sink only supports Append; downstream reads take max() per key
    stats = edges.groupBy('citation_db', 'citation_id').applyInPandasWithState(
        update, output_schema, state_schema, 'append',
        GroupStateTimeout.NoTimeout)

    writer = (
        stats.writeStream
        .format('parquet')
        .option('path', os.path.join(out_dir, 'citation_stats'))
        .option('checkpointLocation', os.path.join(out_dir, 'stats_checkpoint'))
        .outputMode('append')
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_crawl_window_stream(spark, input_dir: str, out_dir: str,
                              window='1 hour', watermark='2 hours',
                              max_files_per_trigger=16,
                              trigger_available_now=True):
    """Watermarked event-time windowed aggregation over the crawl stream:
    documents-per-(window, lang) keyed by ``warc_ts`` (the crawl event
    time). The watermark bounds state and defines late-data policy: a window
    is emitted exactly once (append mode) when the watermark passes its
    end and its state is evicted; a page arriving behind the watermark
    is guaranteed-dropped once its window's state is gone (Spark may
    still absorb late-but-within-state rows - the documented
    conservative bound). This is the built-in windowed path; custom
    state that windows can't express lives in start_citation_stats_stream.
    """
    docs = read_document_stream(spark, input_dir, max_files_per_trigger)
    counts = (
        docs.withWatermark('warc_ts', watermark)
        .groupBy(F.window('warc_ts', window), 'lang')
        .agg(F.count(F.lit(1)).alias('n_docs'),
             F.sum(F.length('text')).alias('n_chars'))
        .select(F.col('window.start').alias('window_start'),
                F.col('window.end').alias('window_end'),
                'lang', 'n_docs', 'n_chars')
    )
    writer = (
        counts.writeStream
        .format('parquet')
        .option('path', os.path.join(out_dir, 'crawl_windows'))
        .option('checkpointLocation',
                os.path.join(out_dir, 'windows_checkpoint'))
        .outputMode('append')
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_output(spark, out_dir: str) -> dict:
    """Batch views over the streamed edge log with content-hash dedup."""
    edges = spark.read.parquet(os.path.join(out_dir, 'edges_log')) \
        .dropDuplicates(['edge_id'])
    triples = (
        edges.select(
            F.col('triple_subject').alias('subject'),
            F.col('triple_predicate').alias('predicate'),
            F.col('triple_object').alias('object'))
        .where(F.col('subject').isNotNull())
        .distinct()
    )
    return {'edges': edges, 'triples': triples}
