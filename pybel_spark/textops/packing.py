"""Training-sequence packing: turn a curated document table into the
fixed-length token sequences an LLM trainer consumes.

Two standard recipes, both Spark-first:

- :func:`concat_chunk_spans` — the GPT-style pack: concatenate all
  documents in one deterministic global order, then cut the token
  stream into ``seq_len`` chunks. Documents straddle chunk boundaries;
  every document maps to the contiguous span of sequences it overlaps.
  This is PURE COLUMN MATH over one distributed prefix-sum: a per-shard
  window cumsum plus an n_shards-row broadcast of shard prefix totals —
  no global single-partition window, so the cumsum scales to any corpus
  (the classic two-phase parallel prefix sum). n_shards bounds the only
  non-map stage: each shard's window sort is per-shard, and the shard
  assignment is a deterministic id hash-mod, so the global order
  (shard, doc_id) is reproducible in any engine.

- :func:`greedy_pack` — whole-document packing (no splits): documents
  are packed first-fit into bins of capacity ``seq_len`` in doc_id
  order WITHIN each shard. Bin packing is inherently sequential, so the
  sequential part runs per shard inside one applyInPandas stage and
  bins are globally namespaced by shard — deterministic, parallel, and
  within (1 + 1/n_docs_per_shard) of the sequential pack's bin count.
  Oversized documents are truncated to ``seq_len``.

Token counts come from any (doc_id, n_tokens) source — whitespace
counts, the learned-BPE table, or a tokenizer's output — so packing
composes with the rest of the curation chain by column contract.
"""
from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_SEQ_LEN = 2048
DEFAULT_SHARDS = 256


def shard_of(id_col, n_shards: int):
    """Engine-portable shard: first 8 md5 hex chars as an integer mod
    n_shards (same convention as dsir.gram_bucket / sampling_hash —
    reproducible as ('0x' || substr(md5(x),1,8))::BIGINT % n in SQL)."""
    return (F.conv(F.substring(F.md5(F.col(id_col).cast('string')), 1, 8),
                   16, 10).cast('long') % n_shards).cast('int')


def token_offsets(docs: DataFrame, id_col='doc_id', count_col='n_tokens',
                  n_shards: int = DEFAULT_SHARDS) -> DataFrame:
    """(doc_id, shard, n_tokens, start_tok): exclusive global token
    offset of each document under the deterministic order
    (shard, doc_id), shard = shard_of(doc_id, n_shards) — the first 8 md5
    hex chars of doc_id as an integer mod n_shards, matching the DuckDB
    oracle's ('0x' || substr(md5(x),1,8))::BIGINT % n (NOT xxhash64 —
    docstring corrected per r5 ADVICE).

    Distributed prefix sum: per-shard window cumsum (each shard sorts
    only its own rows) + an n_shards-row shard-total table joined back
    broadcast. Nothing global ever sits in one partition.
    """
    sharded = docs.select(
        F.col(id_col),
        F.col(count_col).cast('long').alias('n_tokens'),
        shard_of(id_col, n_shards).alias('shard'))
    w = Window.partitionBy('shard').orderBy(id_col)
    local = sharded.withColumn(
        'local_start',
        F.coalesce(F.sum('n_tokens').over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast('long')))
    totals = (sharded.groupBy('shard')
              .agg(F.sum('n_tokens').alias('shard_total')))
    wp = Window.orderBy('shard').rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals.select(
        'shard',
        F.coalesce(F.sum('shard_total').over(wp), F.lit(0).cast('long'))
        .alias('shard_prefix'))  # n_shards rows: the one tiny global sort
    return (local.join(F.broadcast(prefixes), on='shard')
            .select(id_col, 'shard', 'n_tokens',
                    (F.col('shard_prefix') + F.col('local_start'))
                    .alias('start_tok')))


def concat_chunk_spans(docs: DataFrame, seq_len: int = DEFAULT_SEQ_LEN,
                       id_col='doc_id', count_col='n_tokens',
                       n_shards: int = DEFAULT_SHARDS) -> DataFrame:
    """One row per (document, training sequence) overlap:
    (doc_id, seq_id, doc_off, seq_off, n_toks) — the document's tokens
    [doc_off, doc_off+n_toks) land in sequence seq_id at position
    seq_off. Empty documents emit no rows.

    After :func:`token_offsets`, everything is per-row column algebra:
    first_seq = start_tok // seq_len, last_seq = (end_tok-1) // seq_len,
    one explode over the (usually length-1) sequence range.
    """
    offs = token_offsets(docs, id_col, count_col, n_shards)
    end_tok = F.col('start_tok') + F.col('n_tokens')
    first_seq = (F.col('start_tok') / seq_len).cast('long')
    last_seq = ((end_tok - 1) / seq_len).cast('long')
    spans = (offs.where(F.col('n_tokens') > 0)
             .withColumn('seq_id', F.explode(
                 F.sequence(first_seq, last_seq))))
    seq_start = F.col('seq_id') * seq_len
    clip_start = F.greatest(F.col('start_tok'), seq_start)
    clip_end = F.least(end_tok, seq_start + seq_len)
    return spans.select(
        id_col, 'seq_id',
        (clip_start - F.col('start_tok')).alias('doc_off'),
        (clip_start - seq_start).alias('seq_off'),
        (clip_end - clip_start).alias('n_toks'))


def packing_stats(docs: DataFrame, seq_len: int = DEFAULT_SEQ_LEN,
                  id_col='doc_id', count_col='n_tokens',
                  n_shards: int = DEFAULT_SHARDS) -> DataFrame:
    """Per-sequence fill report for the concat-chunk pack: (seq_id,
    n_docs, n_toks). Every sequence except the last is exactly full —
    the invariant a trainer relies on; one groupBy over the span rows."""
    spans = concat_chunk_spans(docs, seq_len, id_col, count_col, n_shards)
    return (spans.groupBy('seq_id')
            .agg(F.count(F.lit(1)).alias('n_docs'),
                 F.sum('n_toks').alias('n_toks')))


def greedy_pack(docs: DataFrame, seq_len: int = DEFAULT_SEQ_LEN,
                id_col='doc_id', count_col='n_tokens',
                n_shards: int = DEFAULT_SHARDS) -> DataFrame:
    """Whole-document first-fit packing: (doc_id, bin_id, bin_off,
    n_toks) with Σ n_toks ≤ seq_len per bin and no document split
    (documents longer than seq_len are truncated to seq_len).

    The sequential first-fit scan runs per shard inside ONE
    applyInPandas stage (each group = one shard's docs in doc_id
    order); bins are namespaced bin_id = shard * 2^40 + local_bin, so
    shards never contend. Shard-local packing wastes at most one
    partially-filled bin per shard vs the fully-sequential pack.
    """
    import pandas as pd

    sharded = docs.select(
        F.col(id_col),
        F.least(F.col(count_col).cast('long'), F.lit(int(seq_len)))
        .alias('n_toks'),
        shard_of(id_col, n_shards).alias('shard'))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        shard = int(pdf['shard'].iloc[0])
        base = shard << 40
        bin_id, fill = base, 0
        out_bin, out_off = [], []
        for n in pdf['n_toks']:
            n = int(n)
            if fill + n > seq_len:
                bin_id += 1
                fill = 0
            out_bin.append(bin_id)
            out_off.append(fill)
            fill += n
        return pd.DataFrame({
            id_col: pdf[id_col], 'bin_id': out_bin,
            'bin_off': out_off, 'n_toks': pdf['n_toks']})

    id_type = docs.schema[id_col].dataType.simpleString()
    return sharded.groupBy('shard').applyInPandas(
        pack, schema='{} {}, bin_id long, bin_off long, n_toks long'
        .format(id_col, id_type))
