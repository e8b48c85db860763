"""Tokenization and shingling as JVM-side column expressions.

Everything here compiles to built-in Spark SQL functions (whole-stage
codegen) — no Python in the hot path.
"""
from pyspark.sql import Column, DataFrame, functions as F

#: BPE-ish word/punctuation splitter: words, numbers, or single punctuation
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_tokens(col='text') -> Column:
    """Whitespace tokenization (empty text → empty array)."""
    return F.split(F.trim(F.col(col)), r'\s+')


def token_count(col='text') -> Column:
    return F.size(whitespace_tokens(col))


def bpe_ish_tokens(col='text') -> Column:
    """Sub-word-ish tokenization via regexp extraction."""
    return F.regexp_extract_all(F.col(col), F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col='text') -> Column:
    return F.size(bpe_ish_tokens(col))


def shingles(col='text', n=3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    Built from transform() over token indices — stays in codegen.
    """
    tokens = whitespace_tokens(col)
    count = F.size(tokens)
    return F.when(count >= n, F.transform(
        F.sequence(F.lit(0), count - n),
        lambda i: F.concat_ws(' ', F.slice(tokens, i + 1, n)),
    )).otherwise(F.array(F.concat_ws(' ', tokens)))


def with_token_stats(docs: DataFrame, text_col='text') -> DataFrame:
    return docs.select(
        '*',
        token_count(text_col).alias('n_tokens'),
        bpe_ish_token_count(text_col).alias('n_bpe_tokens'),
        F.length(text_col).alias('n_chars_computed'),
    )
