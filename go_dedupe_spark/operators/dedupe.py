"""Deduplication operators for large-scale training-data pipelines.

These generalize the engine's core blocking+scoring machinery into the
standard dedup toolbox: exact (hash groupBy), MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup. All hot paths are native
Column expressions (md5/sha2/array ops -> whole-stage codegen); nothing
here is per-row Python.

Scale notes: every pair-producing operator blocks first (LSH bands,
simhash bands, or an explicit block column) AND caps dense buckets —
``minhash_lsh_pairs`` salts any band bucket larger than ``max_block``
into deterministic sub-blocks (operators/pairs.salted_rekey), so the
pair count from one bucket of n docs is bounded by ~n*salt_cap/2, never
n(n-1)/2. AQE skew-join splits residual partition skew, but AQE alone
cannot bound a quadratic pair count — the salt cap does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_dedupe_spark.functions.hashing import minhash_band_keys, token_hash64
from go_dedupe_spark.functions.similarity import char_ngrams, word_tokens


# ------------------------------------------------------------------ exact


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup via sha256 groupBy: one row per duplicated content,
    canonical_id = min id, n_dups = group size. (Ancestor: the sha
    fast-path block; reference analog is the upsert-by-id skip,
    vector/sqlite.go:273-303.)"""
    return (
        df.select(F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .groupBy("content_sha256")
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


# ------------------------------------------------------------- MinHash+LSH


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_rows: int = 2,
    scope_col: str | None = None,
    max_block: int = 100,
    salt_cap: int = 40,
    checkpoint_fn=None,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding over word tokens:
    shingle -> minhash -> band -> SKEW-CAPPED bucket self-join. Returns
    distinct (id_a, id_b) with id_a < id_b. ``scope_col`` (e.g. lang)
    prefixes every band key so buckets never cross scopes.

    A dense bucket (shared-vocabulary corpus — the mega-repo analog of
    a downtown geohash) would emit n(n-1)/2 pairs; buckets larger than
    ``max_block`` are md5-salted into sub-blocks of ~``salt_cap``
    members (operators/pairs.salted_rekey), bounding the candidate set
    at the documented cost of cross-sub-block recall."""
    from go_dedupe_spark.operators.pairs import salted_rekey

    toked = df.select(
        F.col(id_col).alias("id"),
        word_tokens(F.col(text_col)).alias("_toks"),
        *([F.col(scope_col).cast("string").alias("_scope")] if scope_col else []),
    )
    keys = minhash_band_keys(F.col("_toks"), num_hashes=num_hashes,
                             band_rows=band_rows, prefix="lsh")
    if scope_col:
        keyed = toked.select(
            "id", F.explode(keys).alias("k0"), "_scope"
        ).select("id", F.concat(F.col("_scope"), F.lit(":"), F.col("k0")).alias("block_key"))
    else:
        keyed = toked.select(F.col("id"), F.explode(keys).alias("block_key"))
    # materialize the salted keyed table once (r7): the self-join's two
    # sides otherwise EACH recompute tokenize + minhash + explode +
    # rekey (the broadcast build side re-runs the full subtree). One
    # (id, block_key) row per band membership — a bands-x-corpus-rows
    # table of short rows, distributed executor storage.
    # ``checkpoint_fn`` is the lifecycle seam: long-lived callers (the
    # streaming per-batch path) inject a TRACKED checkpoint so the
    # pinned RDD is released at end of batch; the default suits
    # run-once queries (the session's ContextCleaner frees it on GC).
    if checkpoint_fn is None:
        def checkpoint_fn(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)
    keyed = checkpoint_fn(
        salted_rekey(keyed, max_block=max_block, salt_cap=salt_cap))
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, (F.col("a.block_key") == F.col("b.block_key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


# ----------------------------------------------------------------- SimHash


def simhash_column(df: DataFrame, id_col: str, text_col: str,
                   bits: int = 16) -> DataFrame:
    """-> (id, simhash): per-bit majority vote of token md5 hashes.

    Relational shape: explode tokens -> ONE 60-bit hash per token ->
    per-bit vote columns (cheap bit ops on the single hash) -> groupBy
    id with map-side partial sums. A pure column-expression formulation
    would re-evaluate the token-hash array once per bit aggregate
    (16x the tokenizer + md5 work per row).

    Zero-token docs are EXCLUDED — the explode emits no row for an
    empty token array, which IS the guard (an explicit ``where`` on
    size(toks) would defeat common-subexpression reuse and run the
    tokenizer twice per row — measured 2x on the whole query). SQL
    twins must carry an explicit ``len(toks) > 0`` guard (unnest
    semantics differ) or they diverge on degenerate input."""
    toked = df.select(
        F.col(id_col).alias("id"),
        word_tokens(F.col(text_col)).alias("toks"),
    )
    ex = toked.select(
        "id", F.size("toks").alias("n_toks"), F.explode("toks").alias("tok")
    ).withColumn("h", token_hash64(F.col("tok")))
    votes = ex.groupBy("id", "n_toks").agg(
        *[F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"v{b}")
          for b in range(bits)]
    )
    sim = None
    for b in range(bits):
        bit = F.shiftleft((F.col(f"v{b}") * 2 > F.col("n_toks")).cast("long"), b)
        sim = bit if sim is None else sim + bit
    return votes.select("id", sim.alias("simhash"))


def simhash_duplicates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", bits: int = 16) -> DataFrame:
    """Docs whose simhash collides exactly (the cheap first pass; for
    near-dup recall at small Hamming distance use
    ``simhash_hamming_pairs``). Returns (simhash, canonical_id, n_docs)."""
    return (
        simhash_column(df, id_col, text_col, bits)
        .groupBy("simhash")
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 8,
    max_block: int = 100,
    salt_cap: int = 40,
    checkpoint_fn=None,
) -> DataFrame:
    """Near-duplicate pairs via wide SimHash + banded Hamming join —
    the standard large-corpus near-dedup (Manku et al., WWW'07 shape):

    1. 60-bit simhash per doc (per-bit token majority vote; 60 = the
       md5-prefix hash width that stays inside a signed BIGINT in both
       engines).
    2. Split into ``bands`` bands of bits/bands bits; two docs within
       Hamming distance < bands MUST agree exactly on at least one band
       (pigeonhole) -> exact-match band buckets are a complete blocking
       scheme for max_hamming <= bands - 1, and a high-recall one a bit
       beyond.
    3. Dense band buckets (e.g. the all-zeros band of short docs) are
       salt-capped like every other block in this engine.
    4. Verify: popcount(xor) <= max_hamming, native bit_count.

    Returns (id_a, id_b, hamming)."""
    from go_dedupe_spark.operators.pairs import salted_rekey

    width = bits // bands
    mask = (1 << width) - 1
    sim = simhash_column(df, id_col, text_col, bits=bits)
    band_keys = F.array(*[
        F.concat(
            F.lit(f"{i}:"),
            F.shiftright(F.col("simhash"), i * width)
             .bitwiseAND(F.lit(mask)).cast("string"),
        )
        for i in range(bands)
    ])
    keyed = sim.select("id", "simhash", F.explode(band_keys).alias("block_key"))
    # materialize once (r7): both self-join sides otherwise recompute
    # the simhash vote aggregation + banding + rekey — the single most
    # expensive subtree of this operator. checkpoint_fn is the same
    # lifecycle seam as minhash_lsh_pairs (streaming callers inject a
    # tracked checkpoint).
    if checkpoint_fn is None:
        def checkpoint_fn(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)
    keyed = checkpoint_fn(
        salted_rekey(keyed, max_block=max_block, salt_cap=salt_cap))
    a = keyed.select(F.col("id").alias("id_a"),
                     F.col("simhash").alias("sim_a"), "block_key")
    b = keyed.select(F.col("id").alias("id_b"),
                     F.col("simhash").alias("sim_b"), "block_key")
    return (
        a.join(b, "block_key")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
             .cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ----------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
    hash_grams: bool = True,
    checkpoint_fn=None,
) -> DataFrame:
    """Exact char-n-gram Jaccard on candidate pairs (distinct grams).
    candidate_pairs: (id_a, id_b). Native array_intersect/union.

    With ``hash_grams`` (default) every gram is md5-prefix-hashed to a
    60-bit long BEFORE the pair join, so the per-pair shuffle carries
    8-byte ints instead of full n-char strings — a doc appearing in p
    candidate pairs ships its gram set p times, and at n=5 the hashed
    array is ~5x smaller wire weight (~10x on longer grams). Jaccard on
    hashed sets equals Jaccard on string sets up to 60-bit collisions
    (~1e-14 per gram pair; differential-tested identical on the fixture
    corpus). The hash is DuckDB-reproducible:
    ``('0x' || substr(md5(g), 1, 15))::BIGINT``. Set ``hash_grams=
    False`` for the exact string-set path."""
    raw = char_ngrams(text_col, n)
    gram_expr = (
        F.array_distinct(F.transform(raw, token_hash64))
        if hash_grams else F.array_distinct(raw)
    )
    # Materialize the gram table once (r7, guide §2.4): it feeds BOTH
    # join sides, and each side's exchange/broadcast build would
    # otherwise re-run the n-gram md5 hashing over the full corpus
    # (~n_chars md5 calls per doc). Same distributed-materialization
    # policy as scoring.build_features. The per-doc distinct gram COUNT
    # is computed here too, so the per-pair union can be the identity
    # |A∪B| = |A|+|B|-|A∩B| instead of materializing a union array per
    # pair (both gram arrays are distinct, so the identity is exact).
    if checkpoint_fn is None:
        def checkpoint_fn(d: DataFrame) -> DataFrame:
            return d.localCheckpoint(eager=True)
    grams = checkpoint_fn(
        df.select(F.col(id_col).alias("id"), gram_expr.alias("grams"))
        .withColumn("n_grams", F.size("grams")))
    # NO manual broadcast of the gram table: the full per-doc gram
    # dimension cannot broadcast at corpus scale. Shuffle joins by
    # default; AQE converts to broadcast at runtime when the gram table
    # is measured under autoBroadcastJoinThreshold (the sf0.01/0.1 case)
    # — the same conditional policy as scoring.score_pairs.
    a = grams.select(F.col("id").alias("id_a"), F.col("grams").alias("grams_a"),
                     F.col("n_grams").alias("n_a"))
    b = grams.select(F.col("id").alias("id_b"), F.col("grams").alias("grams_b"),
                     F.col("n_grams").alias("n_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.col("n_a") + F.col("n_b") - inter
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    # explicit repartition on BOTH pair ids before the CPU-heavy array
    # ops, KEPT after an r7 removal attempt: a pair row here is two
    # bare ids (~16 B) while its jaccard costs ~2x n_grams array-hash
    # ops — the most CPU-per-byte stage in the suite. AQE's size-based
    # coalescer sees the ~3 MB pair shuffle and folds it to a handful
    # of partitions, serializing that CPU (measured: removing this
    # repartition took the query from ~3.4s to ~13s at sf0.1 once the
    # gram/keyed tables were materialized). Keying on both ids; id_a
    # alone can skew when one record dominates the pair set.
    par = candidate_pairs.sparkSession.sparkContext.defaultParallelism
    return (
        candidate_pairs.repartition(par, "id_a", "id_b")
        .join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------- embedding cosine


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity between two array<numeric> columns, native
    (zip_with product + aggregate sums — sequential, deterministic)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return cosine_from_norms(a, b, vec_norm_expr(a), vec_norm_expr(b))


def vec_norm_expr(v: str | Column) -> Column:
    """L2 norm of an array<numeric> column — the exact norm
    subexpression of ``cosine_expr``, exposed so PAIR producers can
    compute it once per ROW instead of once per pair (r7, guide §2.3
    applied to interpreted HOF cost: the higher-order-function lambdas
    are evaluated per element per call, so hoisting both norms to the
    row side cuts each pairwise cosine from 3 array passes to 1)."""
    v = F.col(v) if isinstance(v, str) else v
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine given precomputed L2 norms. Bit-identical to
    ``cosine_expr``: same dot expression, same guard, same division —
    only WHERE the norms are evaluated moves."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.9,
    max_block: int = 100,
    salt_cap: int = 40,
) -> DataFrame:
    """Near-dup pairs by embedding cosine >= threshold. Pairs are
    generated within ``block_col`` groups (or use an LSH bucketing for
    unblocked data — see ann.cosine_topk_lsh) so the join never goes
    quadratic over the corpus, AND dense blocks are md5-salted into
    sub-blocks of ~``salt_cap`` members (operators/pairs.salted_rekey,
    the same cap every other pair generator here uses) — one mega label
    can no longer emit n(n-1)/2 pairs. With ``block_col=None`` the whole
    corpus is one block and therefore gets salted: a bounded-recall
    sub-sampling, not all-pairs — unblocked corpora should LSH-bucket
    first (ann.make_srp_bucketer) and pass the bucket as block_col."""
    from go_dedupe_spark.operators.pairs import salted_rekey

    if block_col is None:
        sel = emb.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("vec"),
                         F.lit("__all__").alias("block_key"))
    else:
        sel = emb.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("vec"),
                         F.col(block_col).cast("string").alias("block_key"))
    keyed = salted_rekey(sel, max_block=max_block, salt_cap=salt_cap) \
        .withColumn("vn", vec_norm_expr("vec"))
    a = keyed.select(F.col("id").alias("id_a"),
                     F.col("vec").alias("vec_a"),
                     F.col("vn").alias("vn_a"), "block_key")
    b = keyed.select(F.col("id").alias("id_b"),
                     F.col("vec").alias("vec_b"),
                     F.col("vn").alias("vn_b"), "block_key")
    return (
        a.join(b, "block_key")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(cosine_from_norms(F.col("vec_a"), F.col("vec_b"),
                                          F.col("vn_a"), F.col("vn_b")),
                        6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
