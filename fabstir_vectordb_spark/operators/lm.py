"""Corpus n-gram language-model scoring — the dependency-free analogue
of the perplexity filter every web-scale curation pipeline runs (score
each document under a small LM trained on trusted text; drop the tail).

Public procedure (CCNet-style filtering, Wenzek et al. 2020, and the
classic add-k-smoothed bigram model from any NLP textbook): estimate

    P(w2 | w1) = (c(w1 w2) + k) / (c_ctx(w1) + k * V)

where ``c(w1 w2)`` is the corpus bigram count, ``c_ctx(w1)`` the count
of bigrams whose first token is ``w1`` (so the conditional sums to one
over the vocabulary), ``V`` the distinct-token vocabulary size, and
``k`` the add-k smoothing mass.  A document's score is the mean natural
log-probability over its bigrams — higher = more corpus-typical; the
filter drops the low tail (boilerplate, gibberish, wrong-language
text score far from the corpus mode).

Spark shape, sized for 100 TB:
  * fit: one tokenize projection, one explode, two hash aggregations
    (bigram counts, context counts) — both benefit from map-side
    partial aggregation, so the shuffled volume is the *distinct*
    n-gram set (Zipf-bounded), not the token stream.
  * score: the document bigram stream joins the count tables on their
    natural keys.  The context table is |vocab|-sized and broadcast
    when small; the bigram join is a plain hash join that AQE handles
    (skewed hot bigrams split at runtime).  No driver loops, no UDFs —
    every expression is codegen'd.
  * Model tables are DataFrames: persist them with ``.write.parquet``
    partitioned by ``w1`` and the scoring join prunes like any other
    keyed table.

The whole computation is exactly SQL-replayable (same tokenize split,
integer counts, one rounded float per doc) — certified as the
``lm_bigram`` column of the ``text_stats`` driver row.

Reference parity: none — the reference is a vector DB with no text
modeling surface; this module belongs to the LLM-pipeline extension
axis (SURVEY §2.11).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens
from .dedup import _parallelize


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram occurrence, document order
    preserved by construction (transform over the token array), zero
    rows for docs with < 2 tokens.

    The conditional `_parallelize` spread (dedup.py) protects the
    explode from a single-file scan's 1-partition layout — a no-op on
    an already-parallel 100 TB input."""
    toks = _parallelize(
        docs.select(
            F.col(id_col).alias("id"), whitespace_tokens(text_col).alias("__t")
        )
    )
    pairs = F.when(
        F.size("__t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("__t") - 2),
            lambda i: F.struct(
                F.element_at("__t", i + 1).alias("w1"),
                F.element_at("__t", i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array())
    return toks.select("id", F.explode(pairs).alias("bg")).select(
        "id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


@dataclass
class BigramLM:
    """Fitted bigram model: three DataFrames + the smoothing mass.

    ``bigrams``  — (w1, w2, c12): corpus bigram counts
    ``contexts`` — (w1, cctx): bigram-start counts (denominator)
    ``vocab``    — single row (v): distinct-token count
    """

    bigrams: DataFrame
    contexts: DataFrame
    vocab: DataFrame
    k: float

    @staticmethod
    def fit(
        docs: DataFrame,
        k: float = 0.5,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "BigramLM":
        if k <= 0:
            raise ValueError(f"smoothing k must be > 0, got {k}")
        bg = _doc_bigrams(docs, text_col, id_col)
        bigrams = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
        contexts = bg.groupBy("w1").agg(F.count("*").alias("cctx"))
        vocab = (
            _parallelize(docs.select(whitespace_tokens(text_col).alias("__t")))
            .select(F.explode("__t").alias("tok"))
            .agg(F.countDistinct("tok").alias("v"))
        )
        return BigramLM(bigrams=bigrams, contexts=contexts, vocab=vocab, k=k)

    def score(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        out_col: str = "lm_score",
    ) -> DataFrame:
        """(id, out_col): mean ln P(w2|w1) over the document's bigrams;
        NULL for documents with < 2 tokens (no bigram evidence).

        NULL — not 0.0 — because 0.0 is strictly greater than every
        real mean ln-probability, so a 0.0 sentinel would make any
        "drop the low tail" gate (pipelines.curate_corpus
        lm_drop_fraction) unconditionally KEEP empty/one-token docs —
        the opposite of a typicality filter's intent.  NULL is ignored
        by approxQuantile and fails a ``>= threshold`` predicate, so
        such docs are excluded from the quantile and dropped by the
        gate.

        Unseen bigrams/contexts (scoring text outside the training
        corpus) coalesce to count 0 — exactly the smoothed floor
        ``k / (0 + k*V)``, so out-of-domain text scores low rather
        than erroring."""
        bg = _doc_bigrams(docs, text_col, id_col)
        scored = (
            bg.join(self.bigrams, ["w1", "w2"], "left")
            .join(self.contexts, ["w1"], "left")
            .crossJoin(F.broadcast(self.vocab))
            .select(
                "id",
                F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(self.k))
                    / (F.coalesce(F.col("cctx"), F.lit(0)) + F.lit(self.k) * F.col("v"))
                ).alias("__lp"),
            )
        )
        per_doc = scored.groupBy("id").agg(F.avg("__lp").alias(out_col))
        ids = docs.select(F.col(id_col).alias("id"))
        return ids.join(per_doc, "id", "left").select("id", out_col)


def bigram_lm_score(
    docs: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "lm_score",
) -> DataFrame:
    """Fit-and-score on the same corpus — the self-scoring form the
    curation funnel uses (documents atypical of their own corpus are
    the filter targets)."""
    return BigramLM.fit(docs, k=k, text_col=text_col, id_col=id_col).score(
        docs, text_col=text_col, id_col=id_col, out_col=out_col
    )
