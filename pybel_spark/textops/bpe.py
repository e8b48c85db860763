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

_FIXTURES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), 'fixtures')
DEFAULT_MERGES_PATH = os.path.join(_FIXTURES_DIR, 'bpe_merges.txt')
#: realistic-vocabulary-scale table (32k merges over the deterministic
#: morphology vocabulary of synthetic_word_counts) — proves the
#: distinct-word join path is vocabulary-bounded, not toy-bounded
MERGES_32K_PATH = os.path.join(_FIXTURES_DIR, 'bpe_merges_32k.txt')


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


def _word_pairs(toks):
    return [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]


def _merge_word(toks, pair):
    """One left-to-right merge-all pass of ``pair`` over a symbol list
    (identical to the inner loop of train_bpe)."""
    out, i = [], 0
    merged = pair[0] + pair[1]
    while i < len(toks):
        if (i + 1 < len(toks)
                and toks[i] == pair[0] and toks[i + 1] == pair[1]):
            out.append(merged)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def train_bpe_fast(word_counts: dict, n_merges: int) -> list:
    """Indexed BPE trainer — output IDENTICAL to :func:`train_bpe`
    (same greedy most-frequent pair, same lexicographic tie-break),
    but each merge touches only the words that contain the pair instead
    of rescanning the whole vocabulary. O(merges × affected-words)
    instead of O(merges × vocab) — what makes a 32k-merge table
    trainable in seconds (equivalence pinned by pytest)."""
    import heapq

    vocab = {}
    for w, c in word_counts.items():
        if w:
            key = tuple(w)
            vocab[key] = vocab.get(key, 0) + c
    words = list(vocab.items())  # [(symbols tuple, count)]
    pair_counts = {}
    pair_words = {}  # pair -> set of word indices containing it
    for idx, (toks, c) in enumerate(words):
        for p in _word_pairs(list(toks)):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(idx)

    # lazy-deletion heap keyed by (-count, pair): stale entries are
    # skipped when their recorded count no longer matches
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges = []
    while len(merges) < n_merges and heap:
        neg_c, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if cur != -neg_c or cur == 0:
            continue  # stale heap entry
        if cur < 2:
            break
        merges.append(best)
        affected = pair_words.pop(best, set())
        pair_counts.pop(best, None)
        touched = set()
        for idx in affected:
            toks, c = words[idx]
            old = list(toks)
            new = _merge_word(old, best)
            for p in _word_pairs(old):
                if p == best:
                    continue
                pair_counts[p] = pair_counts.get(p, 0) - c
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(idx)
                        if not s:
                            pair_words.pop(p, None)
                else:
                    touched.add(p)
            words[idx] = (tuple(new), c)
            new_pairs = _word_pairs(new)
            for p in new_pairs:
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(idx)
                touched.add(p)
            # membership cleanup: old pairs no longer present in the word
            present = set(new_pairs)
            for p in set(_word_pairs(old)):
                if p != best and p not in present:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(idx)
                        if not s:
                            pair_words.pop(p, None)
        for p in touched:
            c = pair_counts.get(p)
            if c:
                heapq.heappush(heap, (-c, p))
    return merges


def synthetic_word_counts(n_stems=4000, n_suffixes=24, seed=7) -> dict:
    """Deterministic Zipf-weighted morphology-shaped vocabulary for
    training a REALISTIC-scale merge table without external data: words
    are stem+suffix (stems/suffixes derived from md5 bytes, so shared
    sub-units exist for BPE to discover, like natural morphology), and
    word i gets count ~ N/(i+1). Pure function of the parameters —
    retraining reproduces the fixture byte-for-byte."""
    import hashlib

    consonants = 'bcdfghjklmnpqrstvwz'
    vowels = 'aeiou'

    def syllables(tag, i, n_syll):
        h = hashlib.md5('{}:{}:{}'.format(seed, tag, i).encode()).digest()
        out = []
        for s in range(n_syll):
            out.append(consonants[h[2 * s] % len(consonants)])
            out.append(vowels[h[2 * s + 1] % len(vowels)])
        return ''.join(out)

    stems = [syllables('stem', i, 2 + (i % 3)) for i in range(n_stems)]
    suffixes = [''] + [syllables('suf', j, 1) + ('s' if j % 2 else '')
                       for j in range(n_suffixes - 1)]
    n_words = n_stems * n_suffixes
    counts = {}
    i = 0
    for stem in stems:
        for suf in suffixes:
            w = stem + suf
            counts[w] = counts.get(w, 0) + max(1, n_words // (i + 1))
            i += 1
    return counts


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
