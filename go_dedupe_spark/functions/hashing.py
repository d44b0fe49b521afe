"""Deterministic hashing / blocking-key expressions — all native Columns.

Ancestors in the reference:
- record id namespacing: ids.go:7-25 (``"{prefix}:id={id}"``)
- blocking key: geohash precision 5 of the centroid,
  location/location.go:14-15, 67-77 — here replaced (per north_star) by
  ``lang``, a ``sha256(content)`` prefix (exact-dup fast path) and
  MinHash bands over path tokens.

Why md5-chained MinHash instead of the classic (a*h+b) mod p family:
``md5`` is a built-in on BOTH Spark and DuckDB with bit-identical
output, so every blocking key the pipeline produces can be verified by
the SQL oracle, stays inside whole-stage codegen (no Python at all),
and needs no overflow-safe modular arithmetic. The per-permutation
recompute is k extra md5 calls per token — JVM-side and cheap relative
to one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed permutation count / band geometry defaults. 12 hashes in 4 bands
# of 3 rows gives banding selectivity roughly comparable to the
# reference's precision-5 geohash (~2.4 km cells, README.md:34-45).
DEFAULT_NUM_HASHES = 12
DEFAULT_BAND_ROWS = 3


def record_id_expr(repo: Column | str = "repo", path: Column | str = "path",
                   commit: Column | str = "commit") -> Column:
    """sha256 over the natural key, unit-separator joined (ids.go:23-25)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (repo, path, commit)]
    return F.sha2(F.concat_ws("\x1f", *cols), 256)


def content_sha256(content: Column | str = "content") -> Column:
    """The per-row invariant column (BASELINE.json input_hint)."""
    col = F.col(content) if isinstance(content, str) else content
    return F.sha2(col, 256)


def path_tokens(path: Column | str = "path") -> Column:
    """Lowercased path tokens: split on /, _, -, ., camelCase boundaries.

    The tokenization the MinHash bands block on — the analog of the
    matching-text projection location/location.go:38-40.
    """
    col = F.col(path) if isinstance(path, str) else path
    # break camelCase before lowering, then split on separators
    decamel = F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1 $2")
    lowered = F.lower(decamel)
    toks = F.split(lowered, r"[/_\-.\s]+")
    return F.filter(toks, lambda t: t != "")


def token_hash64(token: Column) -> Column:
    """64-bit-ish deterministic token hash via md5 prefix (cross-engine:
    DuckDB equivalent ``('0x' || substr(md5(t),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("long")


def minhash_signature(tokens: Column, num_hashes: int = DEFAULT_NUM_HASHES) -> Column:
    """MinHash signature: array of ``min(md5(i || ':' || token))`` strings.

    One element per permutation i. Pure Column expression — identical
    results in the DuckDB oracle via ``min(md5(i || ':' || t))``.
    """
    def perm_hash(i: int):
        # NB: a plain ``lambda t, i=i`` would change the lambda's arity —
        # pyspark's transform() introspects it and would pass the array
        # INDEX as the second argument, silently overriding the default.
        prefix = f"{i}:"
        return lambda t: F.md5(F.concat(F.lit(prefix), t))

    sig = [F.array_min(F.transform(tokens, perm_hash(i)))
           for i in range(num_hashes)]
    return F.array(*sig)


def minhash_band_keys(
    tokens: Column,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    prefix: str = "mh",
) -> Column:
    """Array of LSH band keys: ``"{prefix}:{band}:" + md5(concat of the
    band's signature rows)``. Records sharing any band key become
    candidate pairs — the generalization of the reference's single
    geohash block key to multi-key blocking (README.md:44-45
    foreshadows exactly this with variable-precision geohashes)."""
    sig = minhash_signature(tokens, num_hashes)
    n_bands = num_hashes // band_rows
    keys = [
        F.concat(
            F.lit(f"{prefix}:{b}:"),
            F.md5(F.concat_ws(",", *[sig[b * band_rows + r] for r in range(band_rows)])),
        )
        for b in range(n_bands)
    ]
    # Empty token arrays get NO band keys (so whitespace/punct-only
    # records never block together): array_min over an empty array is
    # NULL, and concat_ws would silently skip the NULLs, giving every
    # empty record the identical md5('') key — while the SQL oracle's
    # `||` propagates NULL instead. Emitting nothing is the semantics
    # both engines can agree on (oracle: WHERE len(toks) > 0).
    return F.when(F.size(tokens) > 0, F.array(*keys)) \
            .otherwise(F.array().cast("array<string>"))
