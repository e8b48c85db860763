"""Real byte-pair-encoding token counts over a document corpus.

The reference-free "BPE-ish" regex count (tokenize.bpe_ish_token_count)
approximates sub-word inflation badly on long/rare words — misleading for
training-mixture weighting, where token counts decide sampling weights.
This module applies a GENUINE learned BPE merge table (the public
algorithm of Sennrich et al. 2016, as used by GPT-2: iteratively merge
the adjacent symbol pair with the lowest merge rank) with a vendored,
deterministically-trained merge fixture (fixtures/bpe_merges.txt, built
by scripts/train_bpe.py from the synthetic corpus generator).

Scale shape: BPE itself runs once per DISTINCT pre-token — cost bounded
by the vocabulary, not the corpus. The corpus side is pure column
algebra: regex pre-tokenize (JVM codegen) → per-doc word counts →
equi-join against the vocabulary-sized (word, n_subtokens) table → sum.
A hot word ("the") is one row per doc after the doc-local pre-aggregate,
and AQE skew-split handles the residual join skew; pass
``broadcast_vocab=True`` when the distinct-token table is known small.

Merge-order semantics (pinned by tests and mirrored by the DuckDB
oracle): repeatedly find the LOWEST-rank adjacent pair and merge its
LEFTMOST occurrence, until no pair is in the table. Merging one
occurrence per step is equivalent to GPT-2's merge-all-occurrences
left-to-right pass, because after the leftmost merge the same pair (if
still present) is still the lowest-ranked.
"""
import os

from pyspark.sql import DataFrame, functions as F

from .tokenize import BPE_ISH_PATTERN

DEFAULT_MERGES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), 'fixtures', 'bpe_merges.txt')


def load_merges(path=None):
    """Merge table as {(left, right): rank} from one-merge-per-line text."""
    ranks = {}
    with open(path or DEFAULT_MERGES_PATH, encoding='utf8') as fh:
        for line in fh:
            line = line.rstrip('\n')
            if not line or line.startswith('#'):
                continue
            left, right = line.split(' ')
            ranks[(left, right)] = len(ranks)
    return ranks


def bpe_apply(word: str, ranks: dict) -> list:
    """Tokenize one pre-token: char symbols, then lowest-rank-first merges
    (leftmost occurrence per step — see module docstring)."""
    toks = list(word)
    while len(toks) > 1:
        best_rank, best_i = None, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        toks[best_i:best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def train_bpe(word_counts: dict, n_merges: int) -> list:
    """Learn a merge table from a {word: count} dict (standard BPE:
    greedily merge the most frequent adjacent pair; ties break on the
    lexicographically smallest pair, so training is fully deterministic).
    Returns the ordered merge list [(left, right), ...]."""
    vocab = {tuple(w): c for w, c in word_counts.items() if w}
    merges = []
    for _ in range(n_merges):
        pair_counts = {}
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for toks, c in vocab.items():
            out = []
            i = 0
            while i < len(toks):
                if (i + 1 < len(toks)
                        and toks[i] == best[0] and toks[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def word_token_counts(words: DataFrame, ranks: dict,
                      word_col='word') -> DataFrame:
    """(word, n_subtokens) for a distinct-word DataFrame — the only Python
    stage, Arrow-batched, vocabulary-bounded."""
    import pandas as pd

    def compute(batches):
        cache = {}
        for pdf in batches:
            vals = []
            for w in pdf[word_col]:
                n = cache.get(w)
                if n is None:
                    n = len(bpe_apply(w, ranks))
                    cache[w] = n
                vals.append(n)
            yield pd.DataFrame({word_col: pdf[word_col],
                                'n_subtokens': pd.array(vals, dtype='int64')})

    return words.select(word_col).mapInPandas(
        compute, schema='{} string, n_subtokens long'.format(word_col))


def bpe_token_counts(docs: DataFrame, ranks: dict = None, id_col='doc_id',
                     text_col='text', broadcast_vocab=False) -> DataFrame:
    """(doc_id, n_bpe_real_tokens) — real-BPE token count per document.

    Pre-tokenize (JVM regex) → per-doc word counts (map-side combine
    caps hot-word multiplicity at one row per doc) → join the
    vocabulary-sized subtoken table → weighted sum. Docs with no
    pre-tokens count 0.
    """
    if ranks is None:
        ranks = load_merges()
    ids = docs.select(F.col(id_col).alias('doc_id'))
    doc_words = (
        docs.select(
            F.col(id_col).alias('doc_id'),
            F.explode(F.regexp_extract_all(
                F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)).alias('word'))
        .groupBy('doc_id', 'word')
        .agg(F.count(F.lit(1)).alias('n_occ'))
    )
    counts = word_token_counts(doc_words.select('word').distinct(), ranks)
    if broadcast_vocab:
        counts = F.broadcast(counts)
    per_doc = (
        doc_words.join(counts, on='word')
        .groupBy('doc_id')
        .agg(F.sum(F.col('n_occ') * F.col('n_subtokens'))
             .alias('n_bpe_real_tokens'))
    )
    return (
        ids.join(per_doc, on='doc_id', how='left')
        .select('doc_id',
                F.coalesce('n_bpe_real_tokens', F.lit(0))
                .alias('n_bpe_real_tokens'))
    )
