"""Distributed Bloom-filter seen-sets for crawl-frontier dedup.

At 10^12-document scale the "have we crawled this url before?" probe
cannot be an anti-join against the full history every batch: the history
is corpus-sized, the candidate batch is not. The standard crawler answer
is a Bloom filter over the seen keys — a few bits per key, zero false
negatives, tunable false-positive rate — probed map-side. The reference
has no crawl frontier at all (single-file BEL scripts: docs/source/io.rst);
this module is the web-scale ingestion primitive its pipeline needs once
sources are discovered by crawling rather than listed by hand.

Design: the filter is RELATIONAL, not a driver-side bitset.

- :func:`bloom_bits` — the distinct set-bit positions as a DataFrame
  (``pos``). Building is one map-side explode + distinct; the result is
  O(m) rows max, independent of corpus size.
- :func:`bloom_pack` — 63-bit packed words ``(word_idx, word)`` for
  compact persistence (the sign bit stays clear so the packing is
  portable to engines that error on BIGINT overflow).
- :func:`bloom_probe` — per-candidate ``maybe_seen``: explode the k
  probe positions, join the (tiny, auto-broadcast) word table, AND the
  hits. No shuffle of the candidate batch beyond the final per-key
  bool_and, and the seen HISTORY is never touched at probe time.

Determinism/oracle contract: position i of value v is
``('0x' || md5('{seed}:{i}:' || v)[:8])::BIGINT % m_bits`` — the repo-wide
md5 hash contract (textops.mixture.sampling_hash), so a DuckDB oracle
reproduces every bit exactly; there is no approximation anywhere, the
"approximate" part of a Bloom filter is only that distinct keys may
collide (false positives), which is itself deterministic given (m, k,
seed).

Sizing: k=3 and m ≈ 14.4 bits/key give ~1.7% FP (k ln2 optimal at ~10
bits/key → 1.2%); at 10^10 seen urls that is an 18 GB filter — stored as
~2.3e8 packed words it joins partition-wise (the probe join key word_idx
is uniform by construction), or broadcast when m/63 rows fit the limit.
"""
from pyspark.sql import DataFrame, functions as F

WORD_BITS = 63  # sign bit left clear: packed words survive BIGINT engines


def _position(value, i: int, m_bits: int, seed: int):
    """Probe position i of ``value`` — md5-prefix mod m, the repo hash
    contract."""
    key = F.concat(F.lit('{}:{}:'.format(seed, i)), value)
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast('long'),
        F.lit(m_bits))


def bloom_bits(df: DataFrame, col: str = 'url', m_bits: int = 1 << 20,
               k: int = 3, seed: int = 0) -> DataFrame:
    """Set-bit positions ``(pos)`` of the Bloom filter over ``df[col]`` —
    one map-side k-way explode, one distinct; at most ``m_bits`` rows out
    however large the input."""
    value = F.col(col).cast('string')
    return (df.select(F.explode(F.array(
        *[_position(value, i, m_bits, seed) for i in range(k)]))
        .alias('pos'))
        .distinct())


def bloom_pack(bits: DataFrame, m_bits: int = 1 << 20) -> DataFrame:
    """Pack set-bit positions into 63-bit words ``(word_idx, word)`` —
    the persistence/serving form, ~63x fewer rows than the bit table."""
    return (bits
            .select((F.col('pos') / WORD_BITS).cast('long')
                    .alias('word_idx'),
                    F.expr('shiftleft(1L, cast(pos % {} as int))'
                           .format(WORD_BITS)).alias('bit'))
            .groupBy('word_idx')
            .agg(F.expr('bit_or(bit)').alias('word')))


def bloom_probe(words: DataFrame, candidates: DataFrame, col: str = 'url',
                m_bits: int = 1 << 20, k: int = 3,
                seed: int = 0) -> DataFrame:
    """``candidates`` + a ``maybe_seen`` flag: true iff ALL k probe bits
    of ``col`` are set in the packed filter ``words``. Zero false
    negatives; false positives at the (m, k, n) textbook rate. The k
    probes explode map-side; the word join broadcasts when the filter is
    small and stays a uniform-key shuffle join when it is not."""
    value = F.col(col).cast('string')
    probes = candidates.select(
        F.col(col),
        F.explode(F.array(*[_position(value, i, m_bits, seed)
                            for i in range(k)])).alias('pos'))
    probes = probes.select(
        col,
        (F.col('pos') / WORD_BITS).cast('long').alias('word_idx'),
        F.expr('shiftleft(1L, cast(pos % {} as int))'.format(WORD_BITS))
        .alias('mask'))
    hit = (F.col('word').isNotNull()
           & (F.col('word').bitwiseAND(F.col('mask')) != 0))
    return (probes.join(words, on='word_idx', how='left')
            .groupBy(col)
            .agg(F.min(hit.cast('int')).cast('boolean').alias('maybe_seen')))


def seen_filter_report(seen: DataFrame, candidates: DataFrame,
                       col: str = 'url', m_bits: int = 1 << 20, k: int = 3,
                       seed: int = 0) -> DataFrame:
    """End-to-end frontier dedup audit: build the filter over ``seen``,
    probe every candidate, and attach the exact ground truth — one row
    per distinct candidate ``(url, maybe_seen, seen_truth)``. ``maybe_seen
    and not seen_truth`` rows are the false positives; ``seen_truth and
    not maybe_seen`` is impossible by construction (the zero-false-negative
    property this function exists to attest). The truth anti-join is for
    the AUDIT only — production probes run :func:`bloom_probe` alone."""
    words = bloom_pack(bloom_bits(seen, col, m_bits, k, seed), m_bits)
    flagged = bloom_probe(words, candidates.select(col).distinct(),
                          col, m_bits, k, seed)
    truth = seen.select(F.col(col)).distinct().withColumn(
        '_truth', F.lit(True))
    return (flagged.join(truth, on=col, how='left')
            .select(col, 'maybe_seen',
                    F.coalesce('_truth', F.lit(False)).alias('seen_truth')))
