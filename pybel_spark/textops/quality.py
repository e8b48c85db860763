"""Language-ID heuristic, quality scoring, and document fingerprinting.

All deterministic column expressions (codegen-friendly); formulas are simple
integer-ratio arithmetic so an external SQL engine reproduces them bit-exact.
"""
import re as _re

import numpy as _np
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


# --------------------------------------------------------------------- #
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models",
# Appendix A1.1) — the standard web-corpus document filter: word-count /
# word-length bounds, symbol and bullet/ellipsis line ratios, stop-word
# presence, duplicate-line mass, and the top/duplicate n-gram character
# fractions. Everything below is ONE map-side projection per document —
# no shuffle, no Python — built on sorted-array run-length folds (the
# same technique as repetition_features' top_bigram_count). Exact
# integer character masses everywhere; the only doubles are the final
# ratio divisions, so an external SQL engine reproduces every feature.
#
# Definition notes (the paper leaves these open; pinned here so the
# DuckDB oracle can mirror them exactly):
#  - "characters" = non-separator characters; an n-gram's char mass is
#    length(gram) − (n−1) join spaces. Because windows OVERLAP, n-gram
#    fractions are normalized by the TOTAL n-gram char mass
#    Σ_g count(g)×chars(g) (not by document chars), which keeps every
#    fraction a true [0,1] ratio.
#  - top_ngram_char_frac(n) = count(g*) × chars(g*) / total_gram_mass
#    where g* is the most frequent n-gram (ties → larger char mass).
#  - dup_ngram_char_frac(n) = Σ_{count(g)≥2} count(g) × chars(g) /
#    total_gram_mass (overlap-counting variant — deterministic, engine-
#    portable; position-marking variants are not expressible as one
#    aggregation in either engine).
#  - dup_line_char_frac counts only the EXTRA copies of a repeated line
#    ((count−1) × chars), matching "fraction of characters contained in
#    duplicate lines".

#: the Gopher stop-word presence list (≥ 2 of these must appear)
GOPHER_STOPWORDS = ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']

#: filter thresholds from the paper, overridable per call
GOPHER_THRESHOLDS = {
    'min_words': 50, 'max_words': 100000,
    'min_mean_word_len': 3.0, 'max_mean_word_len': 10.0,
    'max_symbol_word_ratio': 0.1,
    'max_bullet_line_frac': 0.9, 'max_ellipsis_line_frac': 0.3,
    'min_alpha_word_frac': 0.8, 'min_stop_words': 2,
    'max_dup_line_frac': 0.3, 'max_dup_line_char_frac': 0.2,
    'max_top_ngram_char_frac': {2: 0.20, 3: 0.18, 4: 0.16},
    'max_dup_ngram_char_frac': {5: 0.15, 6: 0.14, 7: 0.13,
                                8: 0.12, 9: 0.11, 10: 0.10},
}


def _run_length_masses(sorted_arr: Column, sep_chars: int) -> Column:
    """Fold a SORTED string array into struct(top_mass, dup_mass,
    dup_extra_mass) where for each run of equal elements with length r
    and per-element char mass m = length(x) − sep_chars:

    - top_mass   = r×m of the longest run (ties → larger mass)
    - dup_mass   = Σ over runs with r≥2 of r×m
    - dup_extra_mass = Σ over runs with r≥2 of (r−1)×m
    - tot_mass   = Σ over all elements of m

    O(n) per document after the O(n log n) array_sort, entirely inside
    whole-stage codegen.
    """
    sep = F.lit(sep_chars)
    init = F.struct(
        F.lit(None).cast('string').alias('prev'),
        F.lit(0).cast('long').alias('run'),
        F.lit(0).cast('long').alias('best_cnt'),
        F.lit(0).cast('long').alias('top_mass'),
        F.lit(0).cast('long').alias('dup_mass'),
        F.lit(0).cast('long').alias('dup_extra'),
        F.lit(0).cast('long').alias('tot_mass'),
    )

    def close(acc):
        # masses of the run being closed (prev NULL → zero-row no-op)
        m = F.when(acc['prev'].isNotNull(),
                   F.length(acc['prev']).cast('long') - sep
                   ).otherwise(F.lit(0).cast('long'))
        run_mass = acc['run'] * m
        is_dup = acc['prev'].isNotNull() & (acc['run'] >= 2)
        better = (acc['run'] > acc['best_cnt']) | (
            (acc['run'] == acc['best_cnt']) & (run_mass > acc['top_mass']))
        better = acc['prev'].isNotNull() & better
        return (
            F.when(better, acc['run']).otherwise(acc['best_cnt']),
            F.when(better, run_mass).otherwise(acc['top_mass']),
            acc['dup_mass'] + F.when(is_dup, run_mass).otherwise(F.lit(0)),
            acc['dup_extra'] + F.when(is_dup, (acc['run'] - 1) * m)
            .otherwise(F.lit(0)),
        )

    def step(acc, x):
        same = acc['prev'].isNotNull() & (x == acc['prev'])
        best_cnt, top_mass, dup_mass, dup_extra = close(acc)
        return F.struct(
            x.alias('prev'),
            F.when(same, acc['run'] + 1).otherwise(F.lit(1).cast('long'))
            .alias('run'),
            F.when(same, acc['best_cnt']).otherwise(best_cnt)
            .alias('best_cnt'),
            F.when(same, acc['top_mass']).otherwise(top_mass)
            .alias('top_mass'),
            F.when(same, acc['dup_mass']).otherwise(dup_mass)
            .alias('dup_mass'),
            F.when(same, acc['dup_extra']).otherwise(dup_extra)
            .alias('dup_extra'),
            (acc['tot_mass'] + F.length(x).cast('long') - sep)
            .alias('tot_mass'),
        )

    def finish(acc):
        best_cnt, top_mass, dup_mass, dup_extra = close(acc)
        return F.struct(top_mass.alias('top_mass'),
                        dup_mass.alias('dup_mass'),
                        dup_extra.alias('dup_extra'),
                        acc['tot_mass'].alias('tot_mass'))

    return F.aggregate(sorted_arr, init, step, finish)


def gopher_features_expr(docs: DataFrame, id_col='doc_id',
                         text_col='text') -> DataFrame:
    """All Gopher rule features per document, one map-side projection.

    Columns: n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, n_stop_words, dup_line_frac,
    dup_line_char_frac, top_{2,3,4}gram_char_frac,
    dup_{5..10}gram_char_frac.

    Unlike shingle_windows (whole-text collapse), documents shorter than
    n tokens contribute NO n-gram windows — their n-gram fractions are 0,
    which is what the Gopher thresholds expect of short pages.
    """
    # two-phase projection: tokens/lines as real attributes so codegen
    # does not re-evaluate the split per produced window (tokenize.py's
    # measured 3.6× pitfall)
    safe_text = F.coalesce(F.col(text_col), F.lit(''))
    docs = docs.select(
        F.col(id_col).alias(id_col),
        safe_text.alias('__text'),
        F.split(F.trim(safe_text), r'\s+').alias('__toks'),
        F.split(safe_text, '\n').alias('__lines'),
    )
    text = F.col('__text')
    tokens = F.col('__toks')

    def windows(n):
        count = F.size(tokens)
        return F.when(count >= n, F.transform(
            F.sequence(F.lit(0), count - n),
            lambda i: F.concat_ws(' ', F.slice(tokens, i + 1, n)),
        )).otherwise(F.array().cast('array<string>'))

    n_words = F.size(tokens)
    n_words_g = F.greatest(n_words, F.lit(1)).cast('double')
    token_chars = F.aggregate(
        tokens, F.lit(0).cast('long'), lambda acc, t: acc + F.length(t))
    token_chars_g = F.greatest(token_chars, F.lit(1)).cast('double')

    # symbols: '#' plus both ellipsis spellings ('...' counted per triple)
    hash_cnt = F.length(text) - F.length(F.replace(text, F.lit('#')))
    dots_cnt = (F.length(text)
                - F.length(F.replace(text, F.lit('...')))) / F.lit(3)
    uni_ellipsis_cnt = F.length(text) - F.length(F.replace(text, F.lit('…')))

    lines = F.col('__lines')
    n_lines = F.size(lines)
    n_lines_g = F.greatest(n_lines, F.lit(1)).cast('double')
    bullet_lines = F.size(F.filter(
        lines, lambda x: F.ltrim(x).rlike(r'^[-*•]')))
    ellipsis_lines = F.size(F.filter(
        lines, lambda x: F.rtrim(x).rlike(r'(\.\.\.|…)$')))
    alpha_words = F.size(F.filter(tokens, lambda t: t.rlike('[A-Za-z]')))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(F.transform(tokens, F.lower)),
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])))

    line_chars = F.aggregate(
        lines, F.lit(0).cast('long'), lambda acc, x: acc + F.length(x))
    n_distinct_lines = F.size(F.array_distinct(lines))

    # three-phase projection: the run-length stat STRUCTS become real
    # attributes before their fields are read. Accessing two fields of the
    # same struct EXPRESSION re-evaluates the whole sort+window+fold
    # subtree per field (higher-order functions sit outside codegen
    # subexpression elimination) — measured 63.6 s → ~2× faster at sf0.1
    # once each struct is computed exactly once here.
    stat_cols = [
        F.col(id_col).alias('doc_id'),
        n_words.alias('n_words'),
        (token_chars.cast('double') / n_words_g).alias('mean_word_len'),
        ((hash_cnt + dots_cnt + uni_ellipsis_cnt).cast('double') / n_words_g)
        .alias('symbol_word_ratio'),
        (bullet_lines.cast('double') / n_lines_g).alias('bullet_line_frac'),
        (ellipsis_lines.cast('double') / n_lines_g)
        .alias('ellipsis_line_frac'),
        (alpha_words.cast('double') / n_words_g).alias('alpha_word_frac'),
        stop_hits.alias('n_stop_words'),
        ((n_lines - n_distinct_lines).cast('double') / n_lines_g)
        .alias('dup_line_frac'),
        line_chars.alias('__line_chars'),
        _run_length_masses(F.array_sort(lines), 0).alias('__stl'),
    ]
    for n in range(2, 11):
        stat_cols.append(
            _run_length_masses(F.array_sort(windows(n)), n - 1)
            .alias('__st{}'.format(n)))
    staged = docs.select(*stat_cols)

    cols = [
        F.col(c) for c in
        ('doc_id', 'n_words', 'mean_word_len', 'symbol_word_ratio',
         'bullet_line_frac', 'ellipsis_line_frac', 'alpha_word_frac',
         'n_stop_words', 'dup_line_frac')
    ]
    cols.append(
        (F.col('__stl')['dup_extra'].cast('double')
         / F.greatest(F.col('__line_chars'), F.lit(1)).cast('double'))
        .alias('dup_line_char_frac'))
    for n in (2, 3, 4):
        st = F.col('__st{}'.format(n))
        cols.append((st['top_mass'].cast('double')
                     / F.greatest(st['tot_mass'], F.lit(1)).cast('double'))
                    .alias('top_{}gram_char_frac'.format(n)))
    for n in range(5, 11):
        st = F.col('__st{}'.format(n))
        cols.append((st['dup_mass'].cast('double')
                     / F.greatest(st['tot_mass'], F.lit(1)).cast('double'))
                    .alias('dup_{}gram_char_frac'.format(n)))
    return staged.select(*cols)


#: gopher_features output columns after doc_id (order is part of the API)
_GOPHER_FEATURE_COLS = (
    ['n_words', 'mean_word_len', 'symbol_word_ratio', 'bullet_line_frac',
     'ellipsis_line_frac', 'alpha_word_frac', 'n_stop_words',
     'dup_line_frac', 'dup_line_char_frac']
    + ['top_{}gram_char_frac'.format(n) for n in (2, 3, 4)]
    + ['dup_{}gram_char_frac'.format(n) for n in range(5, 11)])

# Spark-equivalent text primitives (Java regex \s is ASCII-only; Spark
# trim/ltrim/rtrim strip ONLY the space character) — the Arrow stage must
# reproduce the expression semantics bit-exactly so the DuckDB oracle and
# the pinned golden tests keep matching.
_JAVA_WS_RE = _re.compile('[ \t\n\x0b\f\r]+')
_ALPHA_RE = _re.compile('[A-Za-z]')
_GOPHER_STOP_SET = frozenset(GOPHER_STOPWORDS)


def _gopher_one(text):
    """All 18 Gopher features for one document — numpy suffix-doubling
    over integer token ids for the nine n-gram run-length families
    (gram identity = token-id tuple; join-string keys are never built:
    tokens cannot contain the separator, so id tuples are equivalent).
    Mirrors gopher_features_expr / the DuckDB oracle exactly, including
    the IEEE int/int divisions."""
    toks = _JAVA_WS_RE.split(text.strip(' '))
    nw = len(toks)
    nwg = max(nw, 1)
    tok_lens = _np.fromiter((len(t) for t in toks), _np.int64, count=nw)
    token_chars = int(tok_lens.sum())
    symbol_cnt = text.count('#') + text.count('...') + text.count('…')

    lines = text.split('\n')
    nl = len(lines)
    nlg = max(nl, 1)
    bullet = 0
    ellipsis = 0
    line_chars = 0
    line_counts = {}
    for ln in lines:
        first = ln.lstrip(' ')[:1]
        if first in ('-', '*', '•'):
            bullet += 1
        if ln.rstrip(' ').endswith(('...', '…')):
            ellipsis += 1
        line_chars += len(ln)
        line_counts[ln] = line_counts.get(ln, 0) + 1
    dup_extra = sum((c - 1) * len(ln)
                    for ln, c in line_counts.items() if c >= 2)

    alpha = sum(1 for t in toks if _ALPHA_RE.search(t))
    stop = len(_GOPHER_STOP_SET.intersection(t.lower() for t in toks))

    feats = [
        nw,
        token_chars / nwg,
        symbol_cnt / nwg,
        bullet / nlg,
        ellipsis / nlg,
        alpha / nwg,
        stop,
        (nl - len(line_counts)) / nlg,
        dup_extra / max(line_chars, 1),
    ]

    # token ids, prefix char sums; grams extended one token per round so
    # round n's unique-ids seed round n+1 (suffix-doubling by one)
    tid = {}
    ids = _np.empty(nw, dtype=_np.int64)
    for i, t in enumerate(toks):
        ids[i] = tid.setdefault(t, len(tid))
    cum = _np.concatenate(([0], _np.cumsum(tok_lens)))
    K = nw + 1
    g = ids
    top_fracs, dup_fracs = [], []
    for n in range(2, 11):
        w = nw - n + 1
        if w <= 0:
            # shorter than n tokens → no windows → 0/1 fractions
            (top_fracs if n <= 4 else dup_fracs).append(0.0)
            continue
        comb = g[:w] * K + ids[n - 1:]
        _, first_idx, inv, cnts = _np.unique(
            comb, return_index=True, return_inverse=True,
            return_counts=True)
        wmass = cum[n:] - cum[:-n]          # gram mass = Σ token lens
        tot = max(int(wmass.sum()), 1)
        per = cnts * wmass[first_idx]
        if n <= 4:
            best = cnts.max()
            top_fracs.append(int(per[cnts == best].max()) / tot)
        else:
            dup_fracs.append(int(per[cnts >= 2].sum()) / tot)
        g = inv
    return feats + top_fracs + dup_fracs


def gopher_features(docs: DataFrame, id_col='doc_id',
                    text_col='text') -> DataFrame:
    """All Gopher rule features (Rae et al. 2021 A1.1) per document as ONE
    Arrow-batched mapInPandas stage — tokenize once, then numpy
    sort/unique per n-gram family over integer token ids.

    Same columns and bit-exact values as gopher_features_expr (the pure
    column-expression variant kept for cross-validation), but ~10× cheaper:
    the nine interpreted higher-order ``aggregate`` folds become vectorized
    numpy inside one Python worker pass. Map-side, zero shuffle; linear in
    corpus size, so the plan is unchanged at 100 TB — pruned (id, text)
    scan → one Arrow stage.
    """
    from pyspark.sql import types as T

    id_field = docs.schema[id_col]
    fields = [T.StructField('doc_id', id_field.dataType, id_field.nullable)]
    for c in _GOPHER_FEATURE_COLS:
        typ = (T.IntegerType() if c in ('n_words', 'n_stop_words')
               else T.DoubleType())
        fields.append(T.StructField(c, typ, False))
    out_schema = T.StructType(fields)

    src = docs.select(
        F.col(id_col).alias('doc_id'),
        F.coalesce(F.col(text_col), F.lit('')).alias('__text'))

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            res = pd.DataFrame(
                [_gopher_one(t) for t in pdf['__text']],
                columns=_GOPHER_FEATURE_COLS)
            res['n_words'] = res['n_words'].astype('int32')
            res['n_stop_words'] = res['n_stop_words'].astype('int32')
            res.insert(0, 'doc_id', pdf['doc_id'].values)
            yield res

    return src.mapInPandas(compute, out_schema)


def gopher_filter(docs: DataFrame, id_col='doc_id', text_col='text',
                  **overrides) -> DataFrame:
    """(doc_id, keep) under the Gopher rules; threshold overrides by
    GOPHER_THRESHOLDS key (n-gram families take whole dicts)."""
    t = dict(GOPHER_THRESHOLDS)
    t.update(overrides)
    feats = gopher_features(docs, id_col, text_col)
    keep = (
        (F.col('n_words') >= t['min_words'])
        & (F.col('n_words') <= t['max_words'])
        & (F.col('mean_word_len') >= t['min_mean_word_len'])
        & (F.col('mean_word_len') <= t['max_mean_word_len'])
        & (F.col('symbol_word_ratio') <= t['max_symbol_word_ratio'])
        & (F.col('bullet_line_frac') <= t['max_bullet_line_frac'])
        & (F.col('ellipsis_line_frac') <= t['max_ellipsis_line_frac'])
        & (F.col('alpha_word_frac') >= t['min_alpha_word_frac'])
        & (F.col('n_stop_words') >= t['min_stop_words'])
        & (F.col('dup_line_frac') <= t['max_dup_line_frac'])
        & (F.col('dup_line_char_frac') <= t['max_dup_line_char_frac'])
    )
    for n, thr in t['max_top_ngram_char_frac'].items():
        keep = keep & (F.col('top_{}gram_char_frac'.format(n)) <= thr)
    for n, thr in t['max_dup_ngram_char_frac'].items():
        keep = keep & (F.col('dup_{}gram_char_frac'.format(n)) <= thr)
    return feats.select('doc_id', keep.alias('keep'))


def adaptive_quality_gate(docs: DataFrame, quantile: float = 0.25,
                          id_col='doc_id', text_col='text',
                          source_col='source') -> DataFrame:
    """Per-source ADAPTIVE quality gating: a document survives when its
    quality score reaches its OWN source's ``quantile`` score (exact
    percentile, linear interpolation) — so a uniformly-low-quality source
    still contributes its best quarter instead of being wiped out by one
    global constant, and a high-quality source is trimmed harder. The
    per-source-budget counterpart to the fixed-threshold gate.

    Returns the surviving (doc, source, score_r, threshold_r) rows.
    Scale: one score projection (map-side), one tiny per-source exact
    percentile aggregate joined back on the source key (broadcast), one
    filter — no window over the corpus.
    """
    scored = docs.select(
        F.col(id_col).alias('doc_id'),
        F.col(source_col).alias('source'),
        quality_score_col(text_col).alias('score'))
    thr = scored.groupBy('source').agg(
        F.expr('percentile(score, {})'.format(quantile)).alias('thr'))
    return (
        scored.join(F.broadcast(thr), on='source')
        .where(F.round('score', 6) >= F.round('thr', 6))
        .select('doc_id', 'source',
                F.round('score', 6).alias('score_r'),
                F.round('thr', 6).alias('threshold_r'))
    )
