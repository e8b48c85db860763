"""Language-ID heuristic, quality scoring, and document fingerprinting.

All deterministic column expressions (codegen-friendly); formulas are simple
integer-ratio arithmetic so an external SQL engine reproduces them bit-exact.
"""
from pyspark.sql import Column, DataFrame, functions as F

from .tokenize import whitespace_tokens

#: tiny stopword seed lists for the n-gram/stopword language heuristic
#: (Latin-script languages; non-Latin scripts are handled by character-
#: range detection below, where stopword tokenization does not apply)
STOPWORDS = {
    'en': ['the', 'of', 'and', 'to', 'in', 'a', 'is', 'that', 'for', 'it',
           'with', 'as', 'was', 'on', 'are', 'by', 'this', 'be', 'or', 'an'],
    'de': ['der', 'die', 'das', 'und', 'ist', 'nicht', 'mit', 'ein', 'eine',
           'zu', 'den', 'von', 'für', 'auf', 'im', 'des', 'sich', 'dem'],
    'fr': ['le', 'la', 'les', 'de', 'des', 'et', 'est', 'un', 'une', 'du',
           'que', 'qui', 'dans', 'pour', 'pas', 'sur', 'au', 'avec'],
    'es': ['el', 'la', 'los', 'las', 'de', 'del', 'que', 'y', 'en', 'un',
           'una', 'es', 'no', 'se', 'con', 'por', 'para', 'su', 'al',
           'como', 'pero'],
    'pt': ['o', 'os', 'as', 'do', 'da', 'dos', 'das', 'que', 'e', 'em',
           'um', 'uma', 'para', 'com', 'por', 'se', 'mais', 'como', 'ao',
           'uns'],
    'it': ['il', 'lo', 'gli', 'i', 'le', 'di', 'che', 'e', 'in', 'un',
           'una', 'per', 'con', 'non', 'si', 'al', 'della', 'sono', 'ed',
           'anche'],
    'nl': ['de', 'het', 'een', 'en', 'van', 'dat', 'op', 'te', 'met',
           'voor', 'niet', 'aan', 'er', 'ook', 'als', 'bij', 'maar', 'om',
           'zijn', 'naar'],
}

#: unicode character ranges for script-based detection — stopword lists
#: cannot identify unsegmented / non-Latin text, character classes can
#: (the CLD/fastText first-stage signal). Literal range chars so the SAME
#: pattern string works in both Java regex (Spark) and RE2 (DuckDB).
SCRIPT_RANGES = {
    'kana': '぀-ヿ',        # hiragana + katakana
    'han': '一-鿿',         # CJK unified ideographs
    'hangul': '가-힣',      # precomposed syllables
    'cyrillic': 'Ѐ-ӿ',
    'arabic': '؀-ۿ',
    'devanagari': 'ऀ-ॿ',
    'greek': 'Ͱ-Ͽ',
}

#: (language, script) pairs tried IN ORDER after the ja/zh disambiguation
SCRIPT_LANGS = [('ko', 'hangul'), ('ru', 'cyrillic'), ('ar', 'arabic'),
                ('hi', 'devanagari'), ('el', 'greek')]

#: minimum fraction of characters in a script to claim the language
SCRIPT_THRESHOLD = 0.15


def script_char_count(script: str, col='text') -> Column:
    """Number of characters of ``col`` falling in the script's range."""
    return F.length(F.regexp_replace(
        F.col(col), '[^{}]'.format(SCRIPT_RANGES[script]), ''))


def stopword_hits(lang: str, col='text') -> Column:
    """Number of tokens that are stopwords of the given language."""
    words = STOPWORDS[lang]
    return F.size(F.filter(
        F.transform(whitespace_tokens(col), lambda t: F.lower(t)),
        lambda t: t.isin(words),
    ))


def detect_language(docs: DataFrame, id_col='doc_id', text_col='text') -> DataFrame:
    """Two-stage language ID, deterministic and engine-portable.

    Stage 1 — script detection: if ≥ ``SCRIPT_THRESHOLD`` of the
    characters fall in a non-Latin script range, answer from the script
    (kana present → 'ja' before han → 'zh', then ko/ru/ar/hi/el in fixed
    order). Stopword tokenization is useless for unsegmented scripts, so
    this runs FIRST.

    Stage 2 — Latin-script stopword argmax over ``STOPWORDS`` (ties
    broken by language code order; zero hits everywhere → 'unknown').
    """
    scored = docs.select(
        F.col(id_col).alias('doc_id'),
        F.greatest(F.length(F.col(text_col)), F.lit(1)).alias('n_chars'),
        *[script_char_count(s, text_col).alias('sc_{}'.format(s))
          for s in sorted(SCRIPT_RANGES)],
        *[stopword_hits(lang, text_col).alias('hits_{}'.format(lang))
          for lang in sorted(STOPWORDS)],
    )
    n = F.col('n_chars').cast('double')
    thresh = F.lit(SCRIPT_THRESHOLD)
    detected = F.when(
        (F.col('sc_kana') > 0)
        & ((F.col('sc_kana') + F.col('sc_han')).cast('double') / n >= thresh),
        F.lit('ja'),
    ).when(F.col('sc_han').cast('double') / n >= thresh, F.lit('zh'))
    for lang, script in SCRIPT_LANGS:
        detected = detected.when(
            F.col('sc_{}'.format(script)).cast('double') / n >= thresh,
            F.lit(lang))
    best = F.greatest(*[F.col('hits_{}'.format(lang))
                        for lang in sorted(STOPWORDS)])
    detected = detected.when(best <= 0, F.lit('unknown'))
    for lang in sorted(STOPWORDS):
        detected = detected.when(F.col('hits_{}'.format(lang)) == best,
                                 F.lit(lang))
    return scored.select('doc_id', detected.alias('detected_lang'))


def quality_features(docs: DataFrame, id_col='doc_id',
                     text_col='text') -> DataFrame:
    """Per-document quality features: sizes, mean token length, stopword and
    alphabetic ratios. All exact-integer ratios → engine-portable."""
    tokens = whitespace_tokens(text_col)
    n_tokens = F.size(tokens)
    n_chars = F.length(text_col)
    token_chars = F.aggregate(
        tokens, F.lit(0), lambda acc, t: acc + F.length(t))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r'[^A-Za-z]', ''))
    stop_hits = stopword_hits('en', text_col)
    return docs.select(
        F.col(id_col).alias('doc_id'),
        n_chars.alias('n_chars_computed'),
        n_tokens.alias('n_tokens'),
        # denominators guarded with greatest(..., 1): an EMPTY document
        # (n_chars 0) must yield a zero ratio, not an ANSI-mode
        # divide-by-zero that kills the whole corpus job
        (token_chars.cast('double') / F.greatest(n_tokens, F.lit(1)))
        .alias('mean_token_len'),
        (stop_hits.cast('double') / F.greatest(n_tokens, F.lit(1)))
        .alias('stopword_ratio'),
        (alpha_chars.cast('double') / F.greatest(n_chars, F.lit(1)))
        .alias('alpha_ratio'),
    )


def quality_score_col(text_col='text', min_tokens=10,
                      max_mean_token_len=15.0) -> Column:
    """The keep/drop signal as a pure COLUMN over the text — usable in
    projections where a join against the feature table is illegal
    (e.g. inside a stream). Same formula as :func:`quality_score`."""
    tokens = whitespace_tokens(text_col)
    n_tokens = F.size(tokens)
    n_tokens_g = F.greatest(n_tokens, F.lit(1))
    n_chars_g = F.greatest(F.length(text_col), F.lit(1))
    token_chars = F.aggregate(
        tokens, F.lit(0), lambda acc, t: acc + F.length(t))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r'[^A-Za-z]', ''))
    length_ok = (n_tokens >= min_tokens).cast('int')
    token_len_ok = (token_chars.cast('double') / n_tokens_g
                    <= max_mean_token_len).cast('int')
    alpha_ok = (alpha_chars.cast('double') / n_chars_g >= 0.6).cast('int')
    stop_ok = (stopword_hits('en', text_col).cast('double') / n_tokens_g
               >= 0.01).cast('int')
    return (length_ok + token_len_ok + alpha_ok + stop_ok) / F.lit(4.0)


def quality_score(docs: DataFrame, id_col='doc_id', text_col='text',
                  min_tokens=10, max_mean_token_len=15.0) -> DataFrame:
    """A simple keep/drop signal in [0,1] combining the features — the shape
    of a Gopher/C4-style heuristic filter."""
    return docs.select(
        F.col(id_col).alias('doc_id'),
        quality_score_col(text_col, min_tokens, max_mean_token_len)
        .alias('quality_score'),
    )


def repetition_features(docs: DataFrame, id_col='doc_id',
                        text_col='text') -> DataFrame:
    """Gopher-style within-document repetition signals:

    - dup_token_ratio: 1 − distinct tokens / total tokens
    - top_bigram_ratio: share of the most frequent bigram among all bigrams

    Boilerplate and spam pages score high on both. Pure column algebra.
    """
    tokens = whitespace_tokens(text_col)
    n_tokens = F.size(tokens)
    n_distinct = F.size(F.array_distinct(tokens))
    bigrams = F.when(n_tokens >= 2, F.transform(
        F.sequence(F.lit(0), n_tokens - 2),
        lambda i: F.concat_ws(' ', F.slice(tokens, i + 1, 2)),
    )).otherwise(F.array())
    # most-frequent-bigram count as the longest run in the SORTED bigram
    # array — O(n log n) per doc and fully in codegen (the naive
    # distinct×filter formulation is O(n²) per doc: fatal on long pages)
    top_bigram_count = F.aggregate(
        F.array_sort(bigrams),
        F.struct(F.lit(0).alias('best'), F.lit(0).alias('cur'),
                 F.lit(None).cast('string').alias('prev')),
        lambda acc, x: F.struct(
            F.greatest(
                acc['best'],
                F.when(x == acc['prev'], acc['cur'] + 1).otherwise(F.lit(1)),
            ).alias('best'),
            F.when(x == acc['prev'], acc['cur'] + 1).otherwise(F.lit(1))
            .alias('cur'),
            x.alias('prev'),
        ),
        lambda acc: acc['best'],
    )
    n_bigrams = F.size(bigrams)
    return docs.select(
        F.col(id_col).alias('doc_id'),
        (F.lit(1.0) - n_distinct.cast('double') / n_tokens)
        .alias('dup_token_ratio'),
        F.when(n_bigrams > 0,
               top_bigram_count.cast('double') / n_bigrams)
        .otherwise(F.lit(0.0)).alias('top_bigram_ratio'),
    )


def fingerprint(docs: DataFrame, id_col='doc_id', text_col='text') -> DataFrame:
    """Normalization-robust document fingerprint: md5 of lowercased,
    whitespace-collapsed text."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                         r'\s+', ' '))
    return docs.select(F.col(id_col).alias('doc_id'),
                       F.md5(normalized).alias('fingerprint'))


# --------------------------------------------------------------------- #
# C4-style cleaning (Raffel et al. 2020, the public web-curation recipe):
# line-level retention rules + page-level drops, all as column algebra in
# the Java-regex ∩ RE2 dialect so the DuckDB oracle runs the identical
# pattern strings. Deliberately conservative where the paper is vague
# (e.g. a line ending in trailing whitespace fails the terminal-punct
# rule on both engines identically).

#: a retained line must end in terminal punctuation
C4_TERMINAL_RE = '[.!?"]$'

#: ... and must not mention javascript (boilerplate cookie/JS warnings)
C4_JAVASCRIPT_RE = 'javascript'


def c4_clean_col(text_col='text', min_words=3) -> Column:
    """The cleaned text as a Column: keep lines that end in terminal
    punctuation, have ≥ ``min_words`` whitespace words, and don't
    mention javascript; re-join survivors with newlines. NULL text
    cleans to the empty string."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit('')), '\n')
    kept = F.filter(
        lines,
        lambda x: x.rlike(C4_TERMINAL_RE)
        & (F.size(F.split(F.trim(x), r'\s+')) >= min_words)
        & ~F.lower(x).rlike(C4_JAVASCRIPT_RE))
    return F.array_join(kept, '\n')


def c4_clean(docs: DataFrame, id_col='doc_id', text_col='text',
             min_words=3, min_sentences=5) -> DataFrame:
    """C4 page cleaning: apply :func:`c4_clean_col` to the text, then
    drop pages whose RAW text contains 'lorem ipsum' (any case) or a
    curly brace (code), and pages whose CLEANED text has fewer than
    ``min_sentences`` terminal punctuation marks. Output keeps every
    other column, replaces ``text_col`` with the cleaned text, and adds
    ``n_sentences``. Map-side only — no shuffle, no Python."""
    raw = F.coalesce(F.col(text_col), F.lit(''))
    out = (docs.withColumn('__c4_clean', c4_clean_col(text_col, min_words))
           .withColumn('n_sentences',
                       F.coalesce(F.regexp_count(F.col('__c4_clean'),
                                                 F.lit('[.!?]')),
                                  F.lit(0)))
           .where(~F.lower(raw).contains('lorem ipsum')
                  & ~raw.contains('{')
                  & (F.col('n_sentences') >= min_sentences))
           .withColumn(text_col, F.col('__c4_clean'))
           .drop('__c4_clean'))
    return out
