"""Pairwise similarity scorers.

The reference outsources ALL similarity to an external embedding model
plus L2 kNN (embeddings/ollama.go:86-113 + vector/sqlite.go:368-437).
Per north_star this engine replaces that with three local, deterministic,
vectorized scorers:

- Jaro-Winkler on paths           (pandas UDF, Arrow-batched numpy/python)
- token-shingle Jaccard on content (native Columns where possible,
                                    pandas UDF for the batched pair path)
- cosine over hashed n-gram vectors (pandas UDF, numpy batched —
                                    HashingTF-style, no model service)

No per-row Python anywhere: the UDFs are ``pandas_udf`` (Arrow batches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- tokenizers


def word_tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace/punct word tokens as a native Column (no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    toks = F.split(c, r"[^a-z0-9_]+" if lowercase else r"[^A-Za-z0-9_]+")
    return F.filter(toks, lambda t: t != "")


def char_ngrams(colname: str, n: int = 3) -> Column:
    """Character n-gram shingles of a string column, as a native Column
    (sequence+transform+substring — stays in whole-stage codegen)."""
    return F.expr(
        f"CASE WHEN length({colname}) < {n} THEN array({colname}) "
        f"ELSE transform(sequence(1, length({colname}) - {n} + 1), "
        f"i -> substring({colname}, i, {n})) END"
    )


# ------------------------------------------------------------- Jaro-Winkler


def _jaro_winkler(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler similarity over UTF-8 BYTES.

    Matches DuckDB's ``jaro_winkler_similarity`` (differential-tested in
    tests/test_similarity.py against random ASCII and non-ASCII strings)
    so results are checkable by the SQL oracle: prefix length <= 4,
    scaling 0.1, boost only when jaro > 0.7. Byte (not codepoint)
    comparison is deliberate — it is what DuckDB/rapidfuzz do, and what
    the batched :func:`_jaro_winkler_batch` does; the two
    implementations are differential-tested for bit-identity.
    """
    b1, b2 = s1.encode("utf-8"), s2.encode("utf-8")
    return _jaro_winkler_bytes(b1, b2)


def _jaro_winkler_bytes(s1: bytes, s2: bytes) -> float:
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    match_window = max(max(len1, len2) // 2 - 1, 0)
    s2_matched = [False] * len2
    s1_matched_chars: list[int] = []
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not s2_matched[j] and s2[j] == c1:
                s2_matched[j] = True
                s1_matched_chars.append(c1)
                break
    m = float(len(s1_matched_chars))
    if m == 0:
        return 0.0
    s2_matched_chars = [s2[j] for j in range(len2) if s2_matched[j]]
    # integer division matches DuckDB's (rapidfuzz-style) C++ impl
    t = sum(1 for a, b in zip(s1_matched_chars, s2_matched_chars) if a != b) // 2
    jaro = (m / len1 + m / len2 + (m - t) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 == c2:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1.0 - jaro)


def _jaro_winkler_batch(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Numpy-vectorized Jaro-Winkler over a batch of string pairs.

    Strings are UTF-8-encoded into fixed-width uint8 matrices; the
    greedy window-matching loop runs over BYTE POSITIONS (max length L
    iterations), with every step vectorized across the batch — ~20x
    faster than per-row Python. Produces bit-identical results to
    :func:`_jaro_winkler` (both operate on UTF-8 bytes, matching
    DuckDB; differential-tested in tests/test_similarity.py)."""
    s1 = a.fillna("").astype(str).to_numpy()
    s2 = b.fillna("").astype(str).to_numpy()
    n = len(s1)
    out = np.zeros(n, dtype="float64")
    if n == 0:
        return out
    b1 = [x.encode("utf-8") for x in s1]
    b2 = [x.encode("utf-8") for x in s2]
    len1 = np.array([len(x) for x in b1], dtype=np.int64)
    len2 = np.array([len(x) for x in b2], dtype=np.int64)
    L = max(1, int(max(len1.max(), len2.max())))
    m1 = np.zeros((n, L), dtype=np.uint8)
    m2 = np.zeros((n, L), dtype=np.uint8)
    for i, x in enumerate(b1):
        m1[i, : len(x)] = np.frombuffer(x, dtype=np.uint8)
    for i, x in enumerate(b2):
        m2[i, : len(x)] = np.frombuffer(x, dtype=np.uint8)

    window = np.maximum(np.maximum(len1, len2) // 2 - 1, 0)
    cols = np.arange(L)
    matched2 = np.zeros((n, L), dtype=bool)
    matched1 = np.zeros((n, L), dtype=bool)
    active = (len1 > 0) & (len2 > 0)
    for i in range(L):
        c = m1[:, i]
        lo = np.maximum(0, i - window)
        hi = np.minimum(len2, i + window + 1)
        cand = (
            (m2 == c[:, None])
            & ~matched2
            & (cols >= lo[:, None])
            & (cols < hi[:, None])
            & (c != 0)[:, None]
            & active[:, None]
            & (i < len1)[:, None]
        )
        has = cand.any(axis=1)
        j = cand.argmax(axis=1)
        matched2[has, j[has]] = True
        matched1[:, i] = has
    m = matched1.sum(axis=1).astype(np.float64)

    # compress matched chars in order for the transposition count
    order1 = np.where(matched1, np.cumsum(matched1, axis=1) - 1, L)
    order2 = np.where(matched2, np.cumsum(matched2, axis=1) - 1, L)
    c1 = np.zeros((n, L + 1), dtype=np.uint8)
    c2 = np.zeros((n, L + 1), dtype=np.uint8)
    rows = np.arange(n)[:, None]
    c1[rows, order1] = np.where(matched1, m1, 0)
    c2[rows, order2] = np.where(matched2, m2, 0)
    t = ((c1 != c2) & (c1 != 0) & (c2 != 0)).sum(axis=1) // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = np.where(
            m > 0,
            (m / len1 + m / len2 + (m - t) / np.where(m > 0, m, 1)) / 3.0,
            0.0,
        )
    # winkler prefix boost (<=4 common leading chars, only when jaro > 0.7)
    pref_eq = (m1[:, :4] == m2[:, :4]) & (m1[:, :4] != 0) & (m2[:, :4] != 0)
    prefix = np.where(
        pref_eq.all(axis=1), pref_eq.shape[1], (~pref_eq).argmax(axis=1)
    ).astype(np.float64)
    boosted = jaro + prefix * 0.1 * (1.0 - jaro)
    out = np.where(jaro > 0.7, boosted, jaro)
    out = np.where(active, out, 0.0)
    exact = np.array([x == y for x, y in zip(b1, b2)]) & (len1 > 0)
    return np.where(exact, 1.0, out)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched, numpy-vectorized Jaro-Winkler over two string
    columns (bit-exact vs DuckDB's jaro_winkler_similarity)."""
    return pd.Series(_jaro_winkler_batch(a, b))


# r7 audit note: the score>=t filters above this UDF do NOT trigger the
# guide-§4.4 duplication (verified — one ArrowEvalPython node, filter
# evaluated above it), so no asNondeterministic() mark is needed here;
# srp_bucket in operators/ann.py is the one that needed it.


@pandas_udf(StructType([
    StructField("jw", DoubleType()),
    StructField("cos", DoubleType()),
]))
def path_vec_scores_udf(pa: pd.Series, pb: pd.Series,
                        va: pd.Series, vb: pd.Series) -> pd.DataFrame:
    """One Arrow pass computing BOTH pairwise features: Jaro-Winkler on
    the path strings and cosine (= dot, vectors pre-normalized by
    hashed_ngram_vector_udf) via a single numpy einsum per batch.

    Why one UDF: a Catalyst higher-order-function dot product
    (zip_with + aggregate) is interpreted, not codegen'd — measured
    ~10x the per-pair cost of this batched numpy path at dim 256."""
    jw = _jaro_winkler_batch(pa, pb)
    ma = np.array(va.tolist(), dtype="float64")
    mb = np.array(vb.tolist(), dtype="float64")
    if ma.size == 0:
        cos = np.zeros(len(pa))
    else:
        cos = np.einsum("ij,ij->i", ma, mb)
    return pd.DataFrame({"jw": jw, "cos": cos})


# ------------------------------------------------------------ token Jaccard


def token_shingles(tokens: Column, n: int = 3, sep: str = " ") -> Column:
    """n-token shingles of an array<string> column, native (no UDF).

    Unigram Jaccard over code is too forgiving (identifier vocabularies
    are tiny, so unrelated files share most tokens); order-sensitive
    shingles restore discrimination. Arrays shorter than n collapse to a
    single whole-array shingle.
    """
    joined_all = F.array(F.concat_ws(sep, tokens))
    shingled = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(sep, F.slice(tokens, i, n)),
    )
    return F.when(F.size(tokens) < n, joined_all).otherwise(shingled)


def token_jaccard_expr(a: str, b: str) -> Column:
    """Native-Column Jaccard over two array columns (exact, no UDF):
    |distinct intersection| / |distinct union|. Division of exact ints
    is bit-identical across engines — oracle-safe."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


# --------------------------------------------- hashed n-gram cosine (X1+X2)


# 128 dims keeps the labeled-fixture separation (hard-neg cosine <=
# 0.83 vs near >= 0.90 at n=5) at half the per-pair bytes of 256
HASH_DIM = 128
NGRAM_N = 5

# Odd 32-bit mixing constants (xxhash/Murmur primes) — one per n-gram
# byte position. The gram hash is their dot product with the window's
# bytes in wrapping uint64 arithmetic: deterministic everywhere, and
# fully numpy-vectorizable, unlike a per-gram hashlib.md5 loop
# (measured ~60x faster per batch; the ngram vectors feed only the
# cosine FEATURE, not any SQL oracle, so cryptographic strength buys
# nothing here).
_GRAM_COEF = np.array(
    [0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1],
    dtype=np.uint64,
)


def _gram_coef(n: int) -> np.ndarray:
    """Per-position mixing constants for an n-wide window. The first 5
    are the fixed xxhash primes above (keeps every n <= 5 vector, and
    therefore every existing score, bit-identical); wider windows extend
    the set deterministically with splitmix64-mixed odd constants."""
    if n <= len(_GRAM_COEF):
        return _GRAM_COEF[:n]
    extra = []
    for i in range(len(_GRAM_COEF), n):
        with np.errstate(over="ignore"):
            x = np.uint64(i + 1) * np.uint64(0x9E3779B97F4A7C15)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        extra.append(x | np.uint64(1))  # odd -> invertible mod 2^64
    return np.concatenate([_GRAM_COEF, np.array(extra, dtype=np.uint64)])


def _hash_vector(text: str, n: int = NGRAM_N, dim: int = HASH_DIM) -> np.ndarray:
    """Hashed char-n-gram count vector over UTF-8 bytes: sliding-window
    polynomial bucketing, one numpy pass per record. Any n >= 1 works
    (coefficients come from ``_gram_coef``)."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(dim, dtype="float64")
    if len(b) < n:
        b = np.pad(b, (0, n - len(b)))
        windows = b[None, :]
    else:
        windows = np.lib.stride_tricks.sliding_window_view(b, n)
    h = (windows.astype(np.uint64) * _gram_coef(n)).sum(
        axis=1, dtype=np.uint64)
    # avalanche: without a final mix, near-identical windows map to
    # near-identical buckets and the count vector loses discrimination
    h ^= h >> 33
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> 33
    return np.bincount((h % np.uint64(dim)).astype(np.int64),
                       minlength=dim).astype("float64")


@pandas_udf(ArrayType(FloatType()))
def hashed_ngram_vector_udf(texts: pd.Series) -> pd.Series:
    """Per-RECORD normalized hashed n-gram vector (Arrow-batched).

    Computing the vector once per record and taking native dot products
    per pair replaces a per-pair variant that re-hashed every n-gram of
    both sides for every candidate pair — O(pairs x grams) python
    hashing vs O(records x grams) numpy hashing."""
    out = []
    for t in texts:
        v = _hash_vector(t if t is not None else "")
        n = np.linalg.norm(v)
        out.append((v / n if n > 0 else v).astype("float32").tolist())
    return pd.Series(out)
