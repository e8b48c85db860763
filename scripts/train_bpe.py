"""Train the vendored BPE merge fixture (fixtures/bpe_merges.txt).

Deterministic end to end: the training corpus is the repo's own synthetic
document generator (pure function of the integer doc index), pre-tokenized
with the same regex the runtime uses, and BPE training breaks ties
lexicographically. Re-running this script reproduces the fixture byte-
for-byte.

Usage: python scripts/train_bpe.py [n_docs] [n_merges]
       python scripts/train_bpe.py large [n_merges]

The ``large`` mode trains fixtures/bpe_merges_32k.txt (default 32768
merges) over the deterministic morphology vocabulary of
textops.bpe.synthetic_word_counts with the indexed trainer — no Spark,
no external data, reproducible byte-for-byte.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main_large():
    from pybel_spark.textops.bpe import (
        MERGES_32K_PATH, synthetic_word_counts, train_bpe_fast,
    )

    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    word_counts = synthetic_word_counts()
    print('synthetic vocabulary: {} words'.format(len(word_counts)))
    merges = train_bpe_fast(word_counts, n_merges)
    print('learned merges: {}'.format(len(merges)))
    with open(MERGES_32K_PATH, 'w', encoding='utf8') as fh:
        fh.write('# BPE merges learned by scripts/train_bpe.py large '
                 '(synthetic_word_counts defaults, n_merges={}); '
                 'rank = line order\n'.format(n_merges))
        for left, right in merges:
            fh.write('{} {}\n'.format(left, right))
    print('wrote {}'.format(MERGES_32K_PATH))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from pybel_spark.corpus import generate_documents
    from pybel_spark.session import get_spark
    from pybel_spark.textops.bpe import DEFAULT_MERGES_PATH, train_bpe
    from pybel_spark.textops.tokenize import BPE_ISH_PATTERN

    from pyspark.sql import functions as F

    spark = get_spark(app_name='train-bpe', cores=8)
    spark.sparkContext.setLogLevel('ERROR')

    docs = generate_documents(spark, n_docs)
    wc = (
        docs.select(F.explode(F.regexp_extract_all(
            F.col('text'), F.lit(BPE_ISH_PATTERN), 0)).alias('word'))
        .groupBy('word').count().collect()
    )
    word_counts = {r['word']: r['count'] for r in wc}
    print('distinct pre-tokens: {}'.format(len(word_counts)))

    merges = train_bpe(word_counts, n_merges)
    print('learned merges: {}'.format(len(merges)))

    with open(DEFAULT_MERGES_PATH, 'w', encoding='utf8') as fh:
        fh.write('# BPE merges learned by scripts/train_bpe.py '
                 '(n_docs={}, n_merges={}); rank = line order\n'
                 .format(n_docs, n_merges))
        for left, right in merges:
            fh.write('{} {}\n'.format(left, right))
    print('wrote {}'.format(DEFAULT_MERGES_PATH))
    spark.stop()


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'large':
        main_large()
    else:
        main()
