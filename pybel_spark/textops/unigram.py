"""Unigram-LM (SentencePiece-style) subword tokenizer: EM training and
distributed Viterbi application.

Companion to :mod:`pybel_spark.textops.bpe`: the two public subword
algorithms (Sennrich BPE merges, Kudo 2018 unigram LM) over the same
pre-token contract. The reference has no tokenizer at all (it counts
pyparsing grammar tokens); training-mixture weighting over a web corpus
needs REAL subword counts, and unigram-LM is what Llama/T5-class
vocabularies actually use.

Algorithm (Kudo 2018, simplified the standard way for a whitespace
pre-tokenized corpus):

- Seed vocabulary: the most frequent substrings (length <= ``max_piece_len``)
  of the pre-token vocabulary, count-weighted, plus every single
  character (so any word stays segmentable).
- EM rounds: E-step computes each piece's expected occurrence count over
  all segmentations of every word (forward-backward over word positions,
  weighted by the word's corpus count); M-step re-normalizes
  ``logp = log(c / total)``; then the lowest-expected-count pieces are
  pruned by ``shrink`` (single chars are never pruned) until
  ``vocab_size`` remains. (Full SentencePiece prunes by loss delta; the
  expected-count criterion keeps the trainer deterministic and is the
  usual simplification.)
- Application: Viterbi — the segmentation maximizing the sum of piece
  log-probs; ties broken toward FEWER tokens. Scores are reproducible
  bit-for-bit because the DP accumulates prefix-score + piece-logp in
  the same association everywhere (the Python trainer, the Arrow
  applier, and the unrolled DuckDB oracle all walk the same recursion).

Scale shape (mirrors bpe.py exactly):

- Training statistics are VOCABULARY-bounded, never corpus-bounded: the
  corpus contributes one distributed (word, count) aggregate; EM runs
  either on the driver over that dict (fixture training — deterministic)
  or distributed via :func:`em_expected_counts` (Arrow forward-backward
  over the word table, piece-count partials combined per batch, one
  vocabulary-sized groupBy — the 10^8-distinct-word path).
- Application runs once per DISTINCT pre-token (Arrow Viterbi over the
  distinct-word table with the vocab dict shipped to executors), then a
  corpus-side join + weighted sum identical to bpe_token_counts.
"""
import math
import os

from pyspark.sql import DataFrame, functions as F

from .tokenize import BPE_ISH_PATTERN

_FIXTURES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), 'fixtures')
DEFAULT_VOCAB_PATH = os.path.join(_FIXTURES_DIR, 'unigram_vocab.txt')

#: longest piece the trainer considers / the appliers assume; the DuckDB
#: oracle unrolls its DP with the same bound
MAX_PIECE_LEN = 8


def load_vocab(path=None) -> dict:
    """{piece: logp} from tab-separated ``piece\\tlogp`` lines. logp is
    stored as Python ``repr`` (shortest round-trip), so loading here and
    CASTing the same literal in SQL yield the identical double."""
    vocab = {}
    with open(path or DEFAULT_VOCAB_PATH, encoding='utf8') as fh:
        for line in fh:
            line = line.rstrip('\n')
            if not line or line.startswith('#'):
                continue
            piece, lp = line.split('\t')
            vocab[piece] = float(lp)
    return vocab


def save_vocab(vocab: dict, path: str):
    with open(path, 'w', encoding='utf8') as fh:
        fh.write('# unigram-LM vocab: piece\\tlogp ({} pieces)\n'
                 .format(len(vocab)))
        for piece in sorted(vocab):
            fh.write('{}\t{}\n'.format(piece, repr(vocab[piece])))


def viterbi(word: str, vocab: dict,
            max_piece_len: int = MAX_PIECE_LEN):
    """(n_tokens, score) of the best segmentation — max score, ties to
    fewer tokens. Returns (None, None) if some prefix is unsegmentable
    (a character outside the vocab)."""
    n = len(word)
    # dp[j] = (score, ntoks) of the best segmentation of word[:j]
    dp = [None] * (n + 1)
    dp[0] = (0.0, 0)
    for j in range(1, n + 1):
        best = None
        for i in range(max(0, j - max_piece_len), j):
            if dp[i] is None:
                continue
            lp = vocab.get(word[i:j])
            if lp is None:
                continue
            cand = (dp[i][0] + lp, dp[i][1] + 1)
            if best is None or (cand[0], -cand[1]) > (best[0], -best[1]):
                best = cand
        dp[j] = best
    if dp[n] is None:
        return None, None
    return dp[n][1], dp[n][0]


def _forward_backward(word: str, vocab: dict, max_piece_len: int):
    """Per-piece-occurrence posterior weights for one word: list of
    ((i, j), weight) where weight = P(segmentation uses word[i:j] at
    position i). Standard lattice forward-backward in log space."""
    n = len(word)
    NEG = float('-inf')
    fwd = [NEG] * (n + 1)
    fwd[0] = 0.0
    arcs = []  # (i, j, lp)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            lp = vocab.get(word[i:j])
            if lp is not None:
                arcs.append((i, j, lp))
    for i, j, lp in sorted(arcs, key=lambda a: a[1]):
        if fwd[i] > NEG:
            x = fwd[i] + lp
            m = max(fwd[j], x)
            fwd[j] = m + math.log(math.exp(fwd[j] - m) + math.exp(x - m))
    if fwd[n] == NEG:
        return []
    bwd = [NEG] * (n + 1)
    bwd[n] = 0.0
    for i, j, lp in sorted(arcs, key=lambda a: -a[0]):
        if bwd[j] > NEG:
            x = bwd[j] + lp
            m = max(bwd[i], x)
            bwd[i] = m + math.log(math.exp(bwd[i] - m) + math.exp(x - m))
    z = fwd[n]
    out = []
    for i, j, lp in arcs:
        if fwd[i] > NEG and bwd[j] > NEG:
            out.append(((i, j), math.exp(fwd[i] + lp + bwd[j] - z)))
    return out


def seed_vocab_counts(word_counts: dict,
                      max_piece_len: int = MAX_PIECE_LEN) -> dict:
    """{substring: count-weighted frequency} over all substrings up to
    ``max_piece_len`` — the seed statistic, vocabulary-bounded."""
    freq = {}
    for w, n in word_counts.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_piece_len) + 1):
                s = w[i:j]
                freq[s] = freq.get(s, 0) + n
    return freq


def _em_prune_loop(estep, vocab: dict, chars, vocab_size: int,
                   n_rounds: int, shrink: float) -> dict:
    """The EM/prune schedule shared by BOTH trainers (driver reference
    and distributed): ``estep(vocab) -> {piece: expected_count}`` is the
    only moving part. n_rounds of re-normalization, then prune the
    lowest-logp pieces by ``shrink`` (single chars exempt, ties on
    (-logp, piece)) until vocab_size remains."""
    while True:
        for _ in range(n_rounds):
            exp = estep(vocab)
            tot = sum(exp.values())
            # guard the quotient, not the count: a denormal expected
            # count can divide to exactly 0.0 and blow up the log
            vocab = {p: math.log(c / tot) for p, c in exp.items()
                     if c / tot > 0.0}
            for c in chars:
                vocab.setdefault(c, math.log(1e-9))
        if len(vocab) <= vocab_size:
            return vocab
        keep = max(vocab_size, int(len(vocab) * shrink))
        ranked = sorted(vocab.items(),
                        key=lambda kv: (-kv[1], kv[0]))
        pruned = {}
        for p, lp in ranked:
            if len(p) == 1 or len(pruned) < keep:
                pruned[p] = lp
        if len(pruned) == len(vocab):
            # prune-exempt single chars alone exceed vocab_size (e.g. a
            # CJK corpus with more distinct codepoints than the target):
            # the pass cannot shrink further — return the floor instead
            # of looping forever (r6 ADVICE)
            return pruned
        vocab = pruned


def train_unigram(word_counts: dict, vocab_size: int = 2000,
                  seed_size: int = 8000, n_rounds: int = 4,
                  shrink: float = 0.75,
                  max_piece_len: int = MAX_PIECE_LEN) -> dict:
    """Deterministic driver-side reference trainer over a (word, count)
    dict — the fixture path (scripts/train_unigram.py), and the ground
    truth the distributed E-step is tested against. Pure function of its
    arguments: ties everywhere break on (count, piece) so retraining
    reproduces the vocab byte-for-byte."""
    chars = {c for w in word_counts for c in w}
    freq = seed_vocab_counts(word_counts, max_piece_len)
    seed = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    total = float(sum(n for _, n in seed))
    vocab = {p: math.log(n / total) for p, n in seed}
    for c in chars:
        vocab.setdefault(c, math.log(freq[c] / total))

    def estep(v):
        exp = {}
        for w, n in word_counts.items():
            for (i, j), weight in _forward_backward(w, v, max_piece_len):
                p = w[i:j]
                exp[p] = exp.get(p, 0.0) + n * weight
        return exp

    return _em_prune_loop(estep, vocab, chars, vocab_size, n_rounds,
                          shrink)


def em_expected_counts(word_counts: DataFrame, vocab: dict,
                       max_piece_len: int = MAX_PIECE_LEN) -> DataFrame:
    """Distributed E-step: (piece, exp_count) over a (word, n) DataFrame —
    Arrow-batched forward-backward with per-batch dict combining (the
    DSIR partial-aggregation pattern), then ONE vocabulary-sized groupBy
    sum. The corpus-sized table is never shuffled."""
    import pandas as pd

    def compute(batches):
        for pdf in batches:
            acc = {}
            for w, n in zip(pdf['word'], pdf['n']):
                for (i, j), weight in _forward_backward(
                        w, vocab, max_piece_len):
                    p = w[i:j]
                    acc[p] = acc.get(p, 0.0) + float(n) * weight
            if acc:
                yield pd.DataFrame(
                    {'piece': list(acc), 'exp_count': list(acc.values())})

    partials = word_counts.select(
        F.col('word').cast('string').alias('word'),
        F.col('n').cast('long').alias('n')).mapInPandas(
        compute, schema='piece string, exp_count double')
    return partials.groupBy('piece').agg(
        F.sum('exp_count').alias('exp_count'))


def train_unigram_spark(word_counts: DataFrame, vocab_size: int = 2000,
                        seed_size: int = 8000, n_rounds: int = 4,
                        shrink: float = 0.75,
                        max_piece_len: int = MAX_PIECE_LEN) -> dict:
    """Distributed trainer over a (word, n) DataFrame — the
    10^8-distinct-word path. Same EM/pruning schedule as
    :func:`train_unigram`; the E-step is :func:`em_expected_counts`
    (Arrow forward-backward, one vocab-sized groupBy per round) and the
    seed statistic is a JVM-side substring explode. Only
    vocabulary-sized tables ever reach the driver (the vocab dict ships
    to executors in the task closure each round). Expected counts from
    the distributed sum may differ from the driver reference in final
    bits (partition-order float addition), so pruning ties can resolve
    differently on adversarially-close counts — tested equal-within-rel
    vs the reference on well-separated corpora."""
    import math as _math

    wc = word_counts.select(F.col('word').cast('string').alias('word'),
                            F.col('n').cast('long').alias('n')).persist()
    # seed: count-weighted substring frequencies, JVM-side
    subs = wc.select(
        F.explode(F.expr(
            'flatten(transform(sequence(1, length(word)), i ->'
            ' transform(sequence(i, least(length(word), i + {L} - 1)),'
            ' j -> substring(word, i, j - i + 1))))'
            .format(L=max_piece_len))).alias('piece'),
        'n')
    freq = (subs.groupBy('piece').agg(F.sum('n').alias('freq'))
            .orderBy(F.desc('freq'), 'piece').limit(seed_size).collect())
    chars = {r['piece']: r['freq'] for r in
             subs.where(F.length('piece') == 1)
             .groupBy('piece').agg(F.sum('n').alias('freq')).collect()}
    total = float(sum(r['freq'] for r in freq))
    vocab = {r['piece']: _math.log(r['freq'] / total) for r in freq}
    for c, n in chars.items():
        vocab.setdefault(c, _math.log(n / total))

    def estep(v):
        return {r['piece']: r['exp_count'] for r in
                em_expected_counts(wc, v, max_piece_len).collect()}

    vocab = _em_prune_loop(estep, vocab, chars, vocab_size, n_rounds,
                           shrink)
    wc.unpersist()
    return vocab


def word_counts_from_docs(docs: DataFrame, text_col: str = 'text'
                          ) -> DataFrame:
    """(word, n) corpus statistic — the only corpus-sized stage of
    training: JVM regex pre-tokenize + one count shuffle on the word."""
    return (docs.select(F.explode(F.regexp_extract_all(
        F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)).alias('word'))
        .groupBy('word').agg(F.count(F.lit(1)).alias('n')))


def word_unigram_counts(words: DataFrame, vocab: dict,
                        word_col: str = 'word',
                        max_piece_len: int = MAX_PIECE_LEN) -> DataFrame:
    """(word, n_subtokens) via Viterbi — the only Python stage of
    application, Arrow-batched and vocabulary-bounded (runs once per
    distinct pre-token; bpe.word_token_counts shape). Unsegmentable
    words fall back to their character count."""
    import pandas as pd

    def compute(batches):
        cache = {}
        for pdf in batches:
            vals = []
            for w in pdf[word_col]:
                n = cache.get(w)
                if n is None:
                    n, _ = viterbi(w, vocab, max_piece_len)
                    if n is None:
                        n = len(w)
                    cache[w] = n
                vals.append(n)
            yield pd.DataFrame({word_col: pdf[word_col],
                                'n_subtokens': pd.array(vals,
                                                        dtype='int64')})

    return words.select(word_col).mapInPandas(
        compute, schema='{} string, n_subtokens long'.format(word_col))


def unigram_token_counts(docs: DataFrame, vocab: dict = None,
                         id_col: str = 'doc_id', text_col: str = 'text',
                         broadcast_vocab: bool = False) -> DataFrame:
    """(doc_id, n_unigram_tokens) per document — pre-tokenize (JVM regex),
    per-doc word counts, join the vocabulary-sized Viterbi table,
    weighted sum; docs with no pre-tokens count 0. Identical plan shape
    to bpe.bpe_token_counts (one corpus shuffle + one vocab join)."""
    if vocab is None:
        vocab = load_vocab()
    ids = docs.select(F.col(id_col).alias('doc_id'))
    doc_words = (
        docs.select(
            F.col(id_col).alias('doc_id'),
            F.explode(F.regexp_extract_all(
                F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)).alias('word'))
        .groupBy('doc_id', 'word')
        .agg(F.count(F.lit(1)).alias('n_occ'))
    )
    counts = word_unigram_counts(doc_words.select('word').distinct(), vocab)
    if broadcast_vocab:
        counts = F.broadcast(counts)
    per_doc = (
        doc_words.join(counts, on='word')
        .groupBy('doc_id')
        .agg(F.sum(F.col('n_occ') * F.col('n_subtokens'))
             .alias('n_unigram_tokens'))
    )
    return (
        ids.join(per_doc, on='doc_id', how='left')
        .select('doc_id',
                F.coalesce('n_unigram_tokens', F.lit(0))
                .alias('n_unigram_tokens'))
    )
