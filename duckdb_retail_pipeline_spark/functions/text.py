"""Text-analysis functions for the training-data pipeline surface.

All hot-path logic is Spark built-ins / higher-order functions (JVM
side). The one deliberate design choice: every hash used by dedup
fingerprints is derived from ``md5`` (not Spark's ``hash``/
``xxhash64``) so the exact same value is computable in any SQL engine
— that is what makes MinHash/SimHash oracle-checkable in the driver's
DuckDB differential gate:

    Spark : conv(substr(md5(s), 1, 15), 16, 10)  → 60-bit int
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

md5 is ~2× slower than xxhash64 but still JVM-vectorized; at 100 TB
the dedup bottleneck is the shuffle, not the hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed salts for the MinHash permutation family — (a*h + b) mod P on
# a shared **28-bit** base hash (first 7 md5 hex chars). 28 bits keeps
# a*h + b well inside signed 64-bit for small salts, which matters
# because Spark runs ANSI mode (bigint overflow would raise) and
# DuckDB likewise errors on int64 overflow. P = 2^31 - 1 (Mersenne).
MINHASH_PRIME = 2147483647


def _c(col: Column | str) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string, cross-engine
    reproducible (see module docstring)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def md5_int28(col: Column | str) -> Column:
    """28-bit variant for salted-multiply MinHash permutations
    (overflow-safe in ANSI int64 math; see MINHASH_PRIME note)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 7), 16, 10).cast("bigint")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty tokens dropped."""
    return F.filter(F.split(_c(col), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer pattern, restricted to the Java-regex /
# RE2 common subset (no lookahead): contraction suffixes, then
# space-prefixed letter runs, digit runs, punctuation runs, then
# bare whitespace runs. Tokenizes any text the way a BPE
# pre-tokenizer would split it before merges.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-style pre-tokenization via regexp_extract_all — the
    second tokenizer the token-counting surface supports next to
    whitespace ``tokens`` (a BPE token count ≈ what an LLM would be
    billed, a whitespace count ≈ words)."""
    return F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0)


def char_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams (shingles) of a string, as an array.

    Built with transform-over-sequence — the Spark equivalent of a
    DuckDB list comprehension — so both engines produce the same set.
    """
    c = _c(col)
    # Guard: sequence(1, 0) would DESCEND in Spark ([1, 0]); short
    # strings must yield an empty shingle set instead.
    idx = F.when(
        F.length(c) >= n, F.sequence(F.lit(1), F.length(c) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(n))))


def word_shingles(col: Column | str, n: int = 3, sep: str = " ") -> Column:
    """Distinct word n-grams, each joined with ``sep``."""
    toks = tokens(col)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - F.lit(n))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(sep, F.slice(toks, i + 1, n)))
    )


def word_ngrams_all(col: Column | str, n: int = 2, sep: str = " ") -> Column:
    """ALL word n-gram occurrences (non-distinct, in order) — the
    repetition metrics need occurrence counts, not the set that
    ``word_shingles`` returns for dedup."""
    toks = tokens(col)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - F.lit(n))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(sep, F.slice(toks, i + 1, n)))


def jaccard(a: Column | str, b: Column | str) -> Column:
    """Exact Jaccard similarity of two array-typed sets."""
    a, b = _c(a), _c(b)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b) - F.size(F.array_intersect(a, b))).cast("double")
    return inter / F.nullif(union, F.lit(0.0))


def minhash_signature(shingles: Column | str, num_hashes: int = 16) -> Column:
    """MinHash signature: array of ``num_hashes`` minima of salted
    28-bit shingle hashes. Permutation i is (a_i*h + b_i) mod P with
    fixed odd salts — exact integer math, reproducible in ANSI SQL.

    NOTE: prefer hashing once into a column and calling
    ``minhash_signature_from_hashes`` — inlining this expression N
    times recomputes the md5s N times (no cross-expression CSE)."""
    sh = _c(shingles)
    base = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("bigint")
    )
    return minhash_signature_from_hashes(base, num_hashes)


def shingle_hashes28(shingles: Column | str) -> Column:
    """28-bit md5-derived hash per shingle (the MinHash base)."""
    return F.transform(
        _c(shingles),
        lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("bigint"),
    )


def minhash_signature_from_hashes(base: Column | str, num_hashes: int = 16) -> Column:
    """MinHash signature over pre-computed 28-bit shingle hashes —
    the md5 work happens once however many permutations run."""
    base = _c(base)
    def perm(a: int, b: int):
        # NB: a plain closure, not default-arg binding — Spark counts
        # a lambda's parameters to bind HOF variables, so extra
        # default args break arity detection.
        return lambda h: (h * a + b) % F.lit(MINHASH_PRIME)

    sigs = []
    for i in range(num_hashes):
        sigs.append(
            F.array_min(F.transform(base, perm(2 * i + 1, 1000003 * (i + 1))))
        )
    return F.array(*sigs)


def simhash64(toks: Column | str) -> Column:
    """64-bit-style SimHash over a token array, built from two 30-bit
    md5-derived halves (kept ≤60 bits so the same arithmetic is exact
    in any SQL engine). Returns a bigint whose bits are the sign of
    per-bit weighted sums."""
    t = _c(toks)
    # For each of 60 bits: sum over tokens of (bit set ? +1 : -1);
    # bit b of token hash h = (h >> b) & 1. Expressed as one
    # aggregate per bit over the token array — JVM-side, no UDF.
    base = F.transform(t, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"))

    def bit_vote(b: int):
        # closure (not default-arg lambda) — see minhash_signature note
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = []
    for b in range(60):
        vote = F.aggregate(base, F.lit(0).cast("bigint"), bit_vote(b))
        bits.append(F.when(vote > 0, F.lit(2**b).cast("bigint")).otherwise(F.lit(0).cast("bigint")))
    out = bits[0]
    for bit in bits[1:]:
        out = out + bit
    return out


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality score in [0,1]: blends length,
    alphabetic ratio, mean word length sanity, and repetition
    (distinct-token ratio). Mirrors common LLM-corpus filters
    (Gopher/C4-style rules), expressed entirely in built-ins."""
    c = _c(col)
    toks = tokens(c)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(c).cast("double")
    alpha_ratio = (
        F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
        / F.nullif(n_chars, F.lit(0.0))
    )
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / F.nullif(
        n_tok, F.lit(0.0)
    )
    mean_wordlen = n_chars / F.nullif(n_tok, F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    wordlen_ok = F.when((mean_wordlen >= 2.0) & (mean_wordlen <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    score = (
        F.coalesce(alpha_ratio, F.lit(0.0)) * 0.3
        + F.coalesce(distinct_ratio, F.lit(0.0)) * 0.3
        + len_ok * 0.2
        + wordlen_ok * 0.2
    )
    return F.round(score, 4)


# Tiny per-language stopword marker lists for the n-gram/stopword
# language heuristic. Deliberately small and fixed so the identical
# CASE expression is writable in oracle SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "de", "es"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}


def lang_marker_hits(col: Column | str, lang: str) -> Column:
    """Count of tokens that are marker stopwords for ``lang``."""
    toks = tokens(col)
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def predict_lang(col: Column | str) -> Column:
    """Pick the language with the most marker hits; ties and
    zero-hit documents fall back to 'und' (undetermined)."""
    c = _c(col)
    hit_cols = {lang: lang_marker_hits(c, lang) for lang in LANG_MARKERS}
    best = F.greatest(*hit_cols.values())
    out = F.lit("und")
    # Reverse-alphabetical cascade so the FIRST when() that wins is
    # the alphabetically-smallest language — pinned tie-break.
    for lang in sorted(hit_cols, reverse=True):
        out = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def char_gram_hashes(col: Column | str, k: int = 5) -> Column:
    """Ordered character-k-gram 28-bit hash sequence (winnowing
    input). MUST be materialized as a real column value (behind an
    exchange or cache) before ``winnow_from_hashes`` references it:
    a lambda that references this expression re-evaluates the entire
    gram+md5 pipeline per element — Catalyst has no cross-lambda
    common-subexpression elimination (measured 400× slowdown)."""
    c = _c(col)
    grams = F.when(
        F.length(c) >= k, F.sequence(F.lit(1), F.length(c) - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        F.transform(grams, lambda i: c.substr(i, F.lit(k))),
        lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("bigint"),
    )


def winnow_from_hashes(hs: Column | str, window: int = 4) -> Column:
    """Winnowing (Schleimer et al., MOSS) fingerprints from a
    materialized k-gram hash sequence: the distinct minima of each
    ``window``-sized sliding window. Any match of length ≥
    k+window-1 shares a fingerprint."""
    h = _c(hs)
    positions = F.when(
        F.size(h) >= window, F.sequence(F.lit(1), F.size(h) - F.lit(window - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(positions, lambda p: F.array_min(F.slice(h, p, window)))
    )


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the lower-cased,
    whitespace-normalized text. Exact-dedup key that survives
    formatting noise."""
    c = _c(col)
    return F.md5(F.concat_ws(" ", tokens(F.lower(c))))


def chunk_starts(toks: Column | str, chunk_size: int, overlap: int) -> Column:
    """0-based token offsets of overlapping chunks: 0, stride, 2·stride
    … up to the last token (stride = chunk_size − overlap). Empty
    docs still yield one (empty) chunk at offset 0, which keeps the
    per-doc chunk count ≥ 1 for downstream bookkeeping."""
    t = _c(toks)
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("chunk_size must exceed overlap")
    return F.sequence(
        F.lit(0), F.greatest(F.size(t) - 1, F.lit(0)), F.lit(stride)
    )


def chunk_text(toks: Column | str, start: Column, chunk_size: int) -> Column:
    """The chunk at token offset ``start``: chunk_size tokens re-joined
    with single spaces (the canonical whitespace form the fingerprint
    and dedup operators already assume)."""
    t = _c(toks)
    return F.array_join(F.slice(t, start + 1, chunk_size), " ")
