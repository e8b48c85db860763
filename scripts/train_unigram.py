"""Train the vendored unigram-LM vocab fixture (fixtures/unigram_vocab.txt).

Deterministic end to end, like scripts/train_bpe.py: the training
vocabulary is textops.bpe.synthetic_word_counts (pure function of its
parameters), EM accumulation follows dict insertion order, and every
pruning tie breaks on (logp, piece) — re-running reproduces the fixture
byte-for-byte. No Spark, no external data.

Usage: python scripts/train_unigram.py [vocab_size]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from pybel_spark.textops.bpe import synthetic_word_counts
    from pybel_spark.textops.unigram import (
        DEFAULT_VOCAB_PATH, save_vocab, train_unigram,
    )

    vocab_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    word_counts = synthetic_word_counts(n_stems=400, n_suffixes=12, seed=7)
    print('training vocabulary: {} words'.format(len(word_counts)))
    vocab = train_unigram(word_counts, vocab_size=vocab_size,
                          seed_size=6000, n_rounds=2)
    print('learned pieces: {}'.format(len(vocab)))
    save_vocab(vocab, DEFAULT_VOCAB_PATH)
    print('wrote {}'.format(DEFAULT_VOCAB_PATH))


if __name__ == '__main__':
    main()
