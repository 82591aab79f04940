"""Data Selection with Importance Resampling (DSIR) — select raw-corpus
documents whose hashed n-gram distribution looks like a small TARGET
corpus (Xie et al., NeurIPS 2023, "Data Selection for Language Models
via Importance Resampling"; the hashed-n-gram formulation is the
paper's own scalable variant).

Method, faithfully:

1. Hash every word n-gram of both corpora into ``num_buckets`` buckets
   (the hashing trick — same md5 arithmetic as
   functions/text.hashed_embedding, so every step replays exactly in
   any SQL engine).
2. Fit two smoothed bag-of-hashed-n-grams unigram models — target and
   raw — as per-bucket probabilities.
3. Importance weight per document: mean over its n-grams of
   ``ln p_target(bucket) - ln p_raw(bucket)`` (the paper sums; the mean
   is the length-normalized variant, which keeps the weight comparable
   across document lengths — selection by sum degenerates to "prefer
   long documents" under budget-per-document sampling).
4. Gumbel top-k resampling: keep the ``k_keep`` documents with the
   largest ``weight / temperature + Gumbel(0,1)`` — sampling WITHOUT
   replacement proportional to softmax(weight / temperature) (the
   Gumbel-top-k trick, Kool et al., ICML 2019).  The Gumbel noise is
   derived from md5(doc id), so the draw is deterministic, reproducible
   across runs/engines, and independent of partitioning.

100 TB shape: the target corpus is SMALL by definition (that is the
premise of the method) — its bucket counts collapse to at most
``num_buckets`` rows.  The raw corpus is touched twice, both times
map-side-combinable: one aggregation to ``num_buckets`` keys to fit
p_raw, one explode→broadcast-join→per-doc mean to score (shuffle keyed
on doc id only).  The ratio table (num_buckets rows) is broadcast; the
raw text itself never shuffles.  Selection ranks one scalar per doc —
a single global sort of (id, key) pairs, the same cost class as any
top-k; for a fraction-based keep at extreme scale, replace the
row_number with a quantile threshold on the key.

No reference counterpart (the reference engine has no text surface);
extension-axis per SURVEY §2's LLM-pipeline mandate, same family as
operators/sampling.py's capping/mixing and operators/lm.py's
typicality gate: DSIR is the standard *target-directed* selector those
corpus-level controls lack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fabstir_vectordb_spark.functions.text import whitespace_tokens
from fabstir_vectordb_spark.operators.dedup import _parallelize
from fabstir_vectordb_spark.operators.sampling import _bucket

__all__ = ["fit_dsir_ratios", "dsir_score", "dsir_select"]


def _hash_bucket(col: Column, num_buckets: int, salt: str) -> Column:
    """Engine-reproducible bucket id: the md5(value|salt) uniform that
    cap_per_group / assign_split certify against DuckDB
    (operators/sampling.py:_bucket — ONE copy of the hash arithmetic),
    folded mod num_buckets."""
    return F.pmod(_bucket(col, salt), F.lit(num_buckets))


def _ns(n) -> list[int]:
    """Normalize the n-gram order spec: an int is one order, a (lo, hi)
    tuple is the inclusive range — (1, 2) is the DSIR paper's
    unigram+bigram feature set."""
    if isinstance(n, tuple):
        if len(n) != 2:
            raise ValueError(
                f"n must be an int or a (lo, hi) PAIR, got {n!r} — a longer "
                "tuple would silently drop orders"
            )
        lo, hi = int(n[0]), int(n[1])
        if lo < 1 or hi < lo:
            raise ValueError(f"n range must satisfy 1 <= lo <= hi, got {n}")
        return list(range(lo, hi + 1))
    if int(n) < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return [int(n)]


def _doc_ngram_buckets(
    docs: DataFrame,
    n,
    num_buckets: int,
    text_col: str,
    id_col: str,
    salt: str,
) -> DataFrame:
    """(id, bucket): one row per word n-gram occurrence, over every
    order in ``n`` (int or inclusive (lo, hi) range).  Each n-gram is
    the space-join of consecutive whitespace tokens, hashed straight to
    its bucket — the gram string never leaves the expression."""
    toks = whitespace_tokens(text_col)
    # an empty document has NO n-grams — never the [''] that split('')
    # produces (one phantom empty gram at order 1)
    nonempty = ~((F.size("__t") == 1) & (F.element_at("__t", 1) == ""))

    def gram_arr(order: int):
        return F.when(
            (F.size("__t") >= order) & nonempty,
            F.transform(
                F.sequence(F.lit(0), F.size("__t") - F.lit(order)),
                lambda i: F.array_join(F.slice("__t", i + 1, order), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    orders = _ns(n)
    grams = (
        gram_arr(orders[0])
        if len(orders) == 1
        else F.concat(*[gram_arr(o) for o in orders])
    )
    return (
        _parallelize(
            docs.select(F.col(id_col).alias("id"), toks.alias("__t"))
        )
        .select("id", F.explode(grams).alias("__g"))  # empty arrays vanish
        .select("id", _hash_bucket(F.col("__g"), num_buckets, salt).alias("bucket"))
    )


def fit_dsir_ratios(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    n: int | tuple[int, int] = 2,
    num_buckets: int = 4096,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Per-bucket importance log-ratio table: (bucket, log_ratio) for
    every bucket 0..num_buckets-1 (unseen buckets get the smoothed
    floor on both sides, hence ratio 0 only when both corpora miss the
    bucket equally).  ``k`` is add-k smoothing on counts.

    Output is at most ``num_buckets`` rows — broadcast it to score.
    """
    _ns(n)  # validates int or (lo, hi) range
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    if k <= 0:
        raise ValueError(f"smoothing k must be > 0, got {k}")
    spark = raw_docs.sparkSession
    B = int(num_buckets)

    def counts(docs: DataFrame, name: str) -> DataFrame:
        return (
            _doc_ngram_buckets(docs, n, B, text_col, id_col, salt)
            .groupBy("bucket")
            .agg(F.count("*").alias(name))
        )

    tc = counts(target_docs, "tc")
    rc = counts(raw_docs, "rc")
    # dense bucket spine so unseen buckets carry their smoothed floor
    spine = spark.range(B).select(F.col("id").alias("bucket"))
    joined = (
        spine.join(tc, "bucket", "left")
        .join(rc, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("tc", F.lit(0)).alias("tc"),
            F.coalesce("rc", F.lit(0)).alias("rc"),
        )
    )
    # totals are two scalars: fold them in via a 1-row cross join (the
    # broadcast-totals pattern mix_by_source certifies)
    totals = joined.agg(
        F.sum("tc").alias("tt"), F.sum("rc").alias("rt")
    )
    kB = float(k) * B
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("tc") + F.lit(float(k))) / (F.col("tt") + F.lit(kB)))
            - F.log((F.col("rc") + F.lit(float(k))) / (F.col("rt") + F.lit(kB)))
        ).alias("log_ratio"),
    )


def dsir_score(
    docs: DataFrame,
    ratios: DataFrame,
    n: int | tuple[int, int] = 2,
    num_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    out_col: str = "dsir_score",
) -> DataFrame:
    """(id, out_col): mean per-n-gram importance log-ratio; NULL when
    the document has no gram at ANY requested order — fewer than the
    smallest order's tokens, or empty (no evidence — same
    contract, and for the same gate-safety reason, as
    lm.BigramLM.score's NULL)."""
    bg = _doc_ngram_buckets(docs, n, int(num_buckets), text_col, id_col, salt)
    per_doc = (
        bg.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(F.avg("log_ratio").alias(out_col))
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(per_doc, "id", "left").select("id", out_col)


def dsir_select(
    scored: DataFrame,
    k_keep: int | None = None,
    temperature: float = 1.0,
    id_col: str = "id",
    score_col: str = "dsir_score",
    salt: str = "gum",
    key_col: str = "dsir_key",
    selected_col: str = "selected",
    keep_fraction: float | None = None,
) -> DataFrame:
    """Gumbel top-k resampling over scored documents: adds
    ``key_col = score/temperature + Gumbel(0,1)`` and a boolean
    ``selected_col`` marking the kept documents.

    The Gumbel variate is hash-derived — u = (md5-int mod 2^24 + 0.5)
    / 2^24 in (0,1), g = -ln(-ln(u)) — so the key is a pure function
    of (id, score): deterministic under retries, re-partitioning, and
    engine replay.  NULL scores (no n-gram evidence) get a NULL key and
    are never selected.

    Exactly one of two keep rules:

    * ``k_keep`` — exact count via a global rank on the 6-dp-rounded
      key with id as the tiebreak (the repo-wide cross-engine ordering
      contract; this is the oracle-certifiable mode).  The rank is a
      single-partition sort of ONE scalar per doc — fine up to ~10^8
      docs; beyond that use the fraction mode.
    * ``keep_fraction`` — the 100 TB path: the cut point is an
      approxQuantile over the key (one aggregate pass, no global
      sort), and the keep is a plain distributed filter.  The kept
      count is approximate by the quantile's 1e-3 relative error —
      the standard trade for unbounded scale."""
    if (k_keep is None) == (keep_fraction is None):
        raise ValueError("pass exactly one of k_keep / keep_fraction")
    if k_keep is not None and k_keep < 0:
        raise ValueError(f"k_keep must be >= 0, got {k_keep}")
    if keep_fraction is not None and not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    from pyspark.sql import Window

    u = (
        F.pmod(_bucket(F.col(id_col), salt), F.lit(1 << 24)) + F.lit(0.5)
    ) / F.lit(float(1 << 24))
    gumbel = -F.log(-F.log(u))
    key = F.col(score_col) / F.lit(float(temperature)) + gumbel
    keyed = scored.withColumn(key_col, key)

    if keep_fraction is not None:
        q = keyed.approxQuantile(key_col, [1.0 - float(keep_fraction)], 0.001)
        thresh = q[0] if q else None  # None: every key NULL or empty frame
        return keyed.withColumn(
            selected_col,
            F.lit(False) if thresh is None
            else (F.col(key_col).isNotNull() & (F.col(key_col) >= F.lit(thresh))),
        )

    w = Window.orderBy(
        F.desc(F.round(key_col, 6)), F.col(id_col)
    )
    return keyed.withColumn(
        selected_col,
        F.when(
            F.col(key_col).isNotNull(),
            F.row_number().over(w) <= F.lit(int(k_keep)),
        ).otherwise(F.lit(False)),
    )
