"""Deduplication operators for training-data pipelines (100 TB design).

Four families, each a different cost/recall point:

  exact_dedup          hash-groupBy on a content fingerprint — one shuffle
                       on the hash, map-side partial agg.
  ngram_jaccard_pairs  inverted-index self-join on word shingles: only
                       docs SHARING a shingle ever meet (no N^2), then
                       exact Jaccard on the candidate pairs.
  minhash_lsh_pairs    MinHash signatures (H seeded xxhash64 mins) ->
                       LSH banding -> bucket join -> exact-Jaccard verify.
                       The classic sub-quadratic near-dup path; all
                       hashing stays JVM-side (xxhash64 expressions).
  simhash64            64-bit SimHash per doc + banded Hamming-distance
                       pairing (bit_count(xor) <= radius).

Plus embedding_near_dup: cosine-similarity pairs over an embedding
column — brute within-block for exactness, or cluster-bucketed (IVF
assignment) so only same-cluster pairs are compared at scale.

Scale notes: every operator here shuffles on a *derived small key*
(hash, shingle, band, cluster) — never on raw text; skew from hot
shingles is capped with a frequency cutoff (`max_shingle_freq`), the
standard stop-shingle trick.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fabstir_vectordb_spark.functions import distance as D
from fabstir_vectordb_spark.functions.text import (
    fingerprint,
    whitespace_tokens,
    word_shingles,
    word_shingles_from,
)

def _parallelize(df: DataFrame) -> DataFrame:
    """Spread a low-partition-count input across the cluster.

    Small single-file tables arrive as 1 scan partition, serializing the
    expensive per-row work (shingling, hashing) onto one core.  At real
    scale inputs arrive in many files/row-groups and this is a no-op; the
    repartition only fires when scan parallelism is clearly below the
    cluster's, so we never add a raw-text shuffle to an already-parallel
    plan."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def _shingled(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, __shingles) with the token split materialized BEHIND an
    exchange: tokenize -> repartition -> shingle.  The barrier stops
    CollapseProject from re-inlining the regex split into every
    element_at of the shingle lambda (which costs O(tokens * n) splits
    per row), and simultaneously spreads single-file inputs across the
    cluster.

    Emits only rows with >= n tokens (exactly the rows whose shingle set
    is non-empty).  The filter is expressed on the token count, NOT on
    size(__shingles): a shingle-level filter gets predicate-pushed below
    the exchange, re-inlining the whole shingle expression into the
    narrow pre-shuffle stage — the exact pathology the barrier exists to
    prevent."""
    toks = (
        df.select(
            F.col(id_col).alias("id"), whitespace_tokens(text_col).alias("__toks")
        )
        .filter(F.size("__toks") >= n)
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    return toks.select("id", word_shingles_from("__toks", n).alias("__shingles"))


# ---------------------------------------------------------------- exact


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group by content fingerprint; keep min-id as canonical.

    Output: one row per input doc with (id, fingerprint, canonical_id,
    group_size, is_duplicate)."""
    w = Window.partitionBy("fingerprint")
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("fingerprint"))
        .withColumn("canonical_id", F.min("id").over(w))
        .withColumn("group_size", F.count("*").over(w))
        .withColumn("is_duplicate", F.col("id") != F.col("canonical_id"))
    )


def drop_exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per identical text."""
    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# -------------------------------------------------------- n-gram Jaccard


def _shingle_table(
    df: DataFrame, text_col: str, id_col: str, n: int, max_shingle_freq: int | None
) -> DataFrame:
    sh = _shingled(df, text_col, id_col, n).select(
        "id", F.explode("__shingles").alias("shingle")
    )
    if max_shingle_freq is not None:
        # stop-shingle cutoff: a shingle appearing in > max_shingle_freq docs
        # contributes candidate pairs quadratically — drop it (it cannot be
        # discriminative).  This is the skew guard at corpus scale.
        hot = (
            sh.groupBy("shingle").count()
            .filter(F.col("count") > max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard >= threshold.

    Inverted-index plan: explode shingles -> self-join on shingle ->
    count intersections per pair -> join per-doc set sizes ->
    |A∩B| / (|A|+|B|-|A∩B|).  Only candidate pairs (sharing >= 1
    shingle) are ever materialized.

    Output: (a_id, b_id, jaccard) with a_id < b_id, jaccard rounded 6.
    """
    sh = _shingle_table(df, text_col, id_col, n, max_shingle_freq).cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a_id"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("id").alias("b_id"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "a_id").join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ) + F.lit(0.0),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# ---------------------------------------------------------- MinHash LSH


def minhash_signature(
    text: Column | str, num_hashes: int = 64, n: int = 3
) -> Column:
    """H seeded min-hashes over the shingle set, as one array<bigint>.

    Seeding trick: xxhash64(seed_literal, shingle) — stays in codegen,
    no Python, no UDF."""
    sh = word_shingles(text, n)
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s, i=i: F.xxhash64(F.lit(f"mh{i}"), s))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-quadratic near-dup detection: band-bucket join on MinHash
    signatures, then EXACT Jaccard verification of candidates.

    With H=64, b=16 bands of r=4 rows, the S-curve midpoint is
    (1/16)^(1/4) ≈ 0.5 — pairs above `threshold` 0.8 are caught with
    probability >0.999.

    Plan shape (the scale path): shingles explode once, then ONE
    groupBy(id) computes all H min-hashes as map-side partial aggregates
    — H min() aggs over one pass, not H array-transform expressions per
    row (the latter re-evaluates the shingle expression H times and
    melts codegen).  Band bucketing, candidate join, and the verify join
    all shuffle on small derived keys.

    Output matches ngram_jaccard_pairs: (a_id, b_id, jaccard).
    """
    rows_per_band = num_hashes // bands
    base = _shingled(df, text_col, id_col, n).cache()
    # hash each shingle string ONCE, then derive the H seeded hashes from
    # the fixed-width base hash — 64 hashes of 12 bytes, not 64 re-hashes
    # of a ~30-char string
    exploded = base.select("id", F.explode("__shingles").alias("s")).select(
        "id", F.xxhash64("s").alias("bh")
    )
    sig = exploded.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("bh"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    band_cols = F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("id", F.posexplode(band_cols).alias("band", "bucket"))

    a = banded.alias("a")
    b_ = banded.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    sa = base.select(F.col("id").alias("a_id"), F.col("__shingles").alias("sa"))
    sb = base.select(F.col("id").alias("b_id"), F.col("__shingles").alias("sb"))
    verified = cand.join(sa, "a_id").join(sb, "b_id")
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    return (
        verified.withColumn("jaccard", F.round(inter / union, 6) + F.lit(0.0))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# -------------------------------------------------------------- SimHash


def simhash64(text: Column | str, n: int = 1) -> Column:
    """64-bit SimHash over token (or n-gram) hashes, as bigint.

    Per token: xxhash64 -> for each bit, +1/-1 vote; final bit = sign.
    Expressed as a single aggregate over a 64-wide counter array —
    all JVM-side."""
    sh = word_shingles(text, n) if n > 1 else F.array_distinct(
        F.split(F.trim(F.col(text) if isinstance(text, str) else text), r"\s+")
    )
    # hash each token once, then take 64 per-bit votes over the hash array
    hashes = F.transform(sh, lambda tok: F.xxhash64(tok))

    def _vote(bit: int):
        # closure factory: PySpark infers HOF arity from the lambda
        # signature, so the bit index must NOT be a lambda default arg
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("bigint")
    for b in range(64):
        vote = _vote(b)
        bit_value = (1 << b) if b < 63 else -(1 << 63)  # signed 64-bit top bit
        out = out.bitwiseOR(
            F.when(vote > 0, F.lit(bit_value).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        )
    return out


def simhash64_agg(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distributed SimHash: explode distinct tokens, hash each ONCE, then
    ONE groupBy computes all 64 per-bit votes as map-side partial sums.
    Identical output to the per-row `simhash64` expression (vote totals
    are order-independent), but one pass instead of 64 array traversals
    per row — the shape that survives a 100 TB corpus.

    Output: (id, sim bigint)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    toks = F.array_distinct(
        F.split(F.trim(F.col(text_col)), r"\s+")
    )
    hashed = _parallelize(df).select(
        F.col(id_col).alias("id"), F.explode(toks).alias("t")
    ).select("id", F.xxhash64("t").alias("h"))
    # collect the (small, fixed-width) hash list per doc, then compute all
    # 64 bit-votes in one vectorized kernel.  64 sum(when(...)) aggregate
    # columns would stay "JVM-side" but blow the codegen method limit and
    # fall back to interpreted aggregation — an order of magnitude slower
    # than this Arrow-batched path.
    grouped = hashed.groupBy("id").agg(F.collect_list("h").alias("__hs"))
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type, False),
            T.StructField("sim", T.LongType(), False),
        ]
    )
    bitpos = np.arange(64, dtype=np.uint64)
    powers = np.uint64(1) << bitpos

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            sims = np.empty(len(pdf), dtype=np.uint64)
            for i, hs in enumerate(pdf["__hs"]):
                a = np.asarray(hs, dtype=np.int64).view(np.uint64)
                bits = ((a[:, None] >> bitpos[None, :]) & np.uint64(1)).astype(np.int32)
                votes = (bits * 2 - 1).sum(axis=0)
                sims[i] = powers[votes > 0].sum(dtype=np.uint64)
            yield pd.DataFrame({"id": pdf["id"], "sim": sims.view(np.int64)})

    return grouped.mapInPandas(kernel, out_schema)


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hamming-near pairs via 4x16-bit band exact-match + bit_count verify.

    Any pair within Hamming distance 3 must agree exactly on at least one
    of four 16-bit bands (pigeonhole) — so the bucket join finds all of
    them without an N^2 compare.
    """
    sh = simhash64_agg(df, text_col=text_col, id_col=id_col)
    bands = F.array(
        *[
            F.shiftright("sim", b * 16).bitwiseAND(F.lit(0xFFFF)).cast("bigint")
            for b in range(4)
        ]
    )
    banded = sh.select("id", "sim", F.posexplode(bands).alias("band", "bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("a_id", "b_id", "hamming")


# ------------------------------------------------- embedding near-dup


def _embedding_near_dup_kernel(
    df: DataFrame, threshold: float, id_col: str, vector_col: str
) -> DataFrame:
    """Map-only exact all-pairs: broadcast the (small-side) matrix, each
    partition BLAS-multiplies its row block against the full matrix and
    emits only pairs over threshold — zero shuffle, no N^2 row
    materialization.  Same small-side assumption as knn_kernel; the
    cluster method is the unbounded-N path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    rows = df.select(id_col, vector_col).collect()
    ids_all = [r[0] for r in rows]
    M = np.asarray([np.asarray(r[1], dtype=np.float64) for r in rows])
    bc = spark.sparkContext.broadcast((ids_all, M))

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("a_id", id_type, False),
            T.StructField("b_id", id_type, False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def kernel(batches):
        ids_l, M_l = bc.value
        norms = np.linalg.norm(M_l, axis=1)
        ids_arr = np.asarray(ids_l)
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vector_col]]
            )
            vids = pdf[id_col].to_numpy()
            vn = np.linalg.norm(V, axis=1)
            denom = np.outer(vn, norms)
            sims = np.divide(
                V @ M_l.T, denom, out=np.zeros_like(denom), where=denom != 0.0
            )
            simr = np.round(sims, 6) + 0.0
            a_out, b_out, c_out = [], [], []
            for i in range(len(vids)):
                mask = (ids_arr > vids[i]) & (simr[i] >= threshold)
                js = np.flatnonzero(mask)
                a_out.extend([vids[i]] * len(js))
                b_out.extend(ids_arr[js].tolist())
                c_out.extend(simr[i, js].tolist())
            yield pd.DataFrame({"a_id": a_out, "b_id": b_out, "cosine": c_out})

    return _parallelize(df.select(id_col, vector_col)).mapInPandas(kernel, out_schema)


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    method: str = "brute",
    ivf_index=None,
) -> DataFrame:
    """Cosine-similar pairs over an embedding column.

    method="brute": exact all-pairs via the broadcast numpy kernel (use
    under ~100k rows; within that regime it is map-only — no shuffle).
    method="brute_expr": same semantics as a pure Catalyst self-join
    (the declarative fallback). method="cluster": prune with an IVFIndex
    — only same-cluster pairs are compared (the 100 TB path; recall
    depends on cluster granularity, measured by the recall harness).

    Output: (a_id, b_id, cosine) with a_id < b_id, rounded 6.
    """
    if method == "brute":
        return _embedding_near_dup_kernel(df, threshold, id_col, vector_col)
    base = df.select(F.col(id_col).alias("id"), F.col(vector_col).alias("v"))
    if method == "cluster":
        if ivf_index is None:
            raise ValueError("method='cluster' requires ivf_index")
        assigned = ivf_index.assign(
            df.select(F.col(id_col).alias("id"), F.col(vector_col).alias(vector_col)),
        )
        base = assigned.select("id", F.col(vector_col).alias("v"), "cluster_id")
        join_cond = (F.col("a.cluster_id") == F.col("b.cluster_id")) & (
            F.col("a.id") < F.col("b.id")
        )
    elif method == "brute_expr":
        join_cond = F.col("a.id") < F.col("b.id")
    else:
        raise ValueError(f"unknown method {method!r}")
    a, b = base.alias("a"), base.alias("b")
    cos = D.cosine_similarity(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, join_cond)
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            (F.round(cos, 6) + F.lit(0.0)).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
