"""End-to-end training-data pipeline: the composition a pretraining
corpus actually runs, built from this repo's certified operators.

    raw documents
      → line-level boilerplate removal     (operators/dedup.py)
      → cross-doc repeated-span trim       (operators/dedup.py)
      → language / quality / length gates  (functions/text.py)
      → exact dedup                        (operators/dedup.py)
      → MinHash-LSH near-dup + canonical   (operators/dedup.py)
      → per-source frequency cap           (operators/sampling.py)
      → bigram-LM typicality tail drop     (operators/lm.py)
      → model-based quality filter         (operators/quality_model.py)
      → benchmark decontamination          (operators/dedup.py)
      → deterministic train/val/test split (operators/sampling.py)
      → sequence packing into context windows (operators/sampling.py)

Every stage is the operator already certified by a driver oracle row;
this module only wires them, so the composition inherits their scale
shapes: one tokenize projection, broadcast hot-set boilerplate filter,
fingerprint-keyed dedup shuffle, banded near-dup join with guards ON,
id-hash split (no shuffle), two-phase prefix-sum packing.  No reference
analogue — the reference is the vector store this pipeline would feed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fabstir_vectordb_spark.functions import text as X
from fabstir_vectordb_spark.operators import dedup as DD
from fabstir_vectordb_spark.operators.lm import bigram_lm_score
from fabstir_vectordb_spark.operators.sampling import (
    assign_split,
    cap_per_group,
    mix_by_source,
    pack_sequences,
)


def gate_signal_columns(
    text_col: str = "text",
    toks_col: str = "__toks",
    gopher: bool | dict = False,
):
    """The funnel's per-document gate signals over a pre-tokenized text
    column — THE single definition both the batch gate stage
    (curate_corpus) and the streaming gate (streaming/ingest.py
    curate_stream) select from, so the two surfaces cannot silently
    diverge.  Pure column expressions: no state, no shuffle.

    ``gopher``: truthy adds the Gopher heuristic bundle
    (functions/text.gopher_rules, certified in text_quality) as a
    struct signal; a dict overrides the paper thresholds (its keys are
    gopher_rules keyword arguments)."""
    cols = [
        X.lang_id(text_col, toks_col).alias("lang"),
        X.quality_score(text_col, toks_col).alias("quality"),
        X.token_count_from(toks_col).cast("long").alias("n_tokens"),
        X.repetition_ratio_from(toks_col, 3).alias("rep_3gram"),
    ]
    if gopher:
        kw = gopher if isinstance(gopher, dict) else {}
        cols.append(X.gopher_rules(text_col, toks_col, **kw).alias("gopher"))
    return cols


def gate_predicate(
    token_bounds: tuple[int, int],
    max_repetition: float,
    lang: str | None,
    min_quality: float | None,
    gopher: bool | dict = False,
):
    """The gate verdict over gate_signal_columns' outputs — shared by
    the batch and streaming gates (see gate_signal_columns)."""
    gate = F.col("n_tokens").between(*token_bounds) & (
        F.col("rep_3gram") <= max_repetition
    )
    if lang is not None:
        gate = gate & (F.col("lang") == lang)
    if min_quality is not None:
        gate = gate & (F.col("quality") >= min_quality)
    if gopher:
        gate = gate & F.col("gopher")["pass"]
    return gate


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    html_input: bool = False,
    normalize_nfc: bool = False,
    c4_rules: bool = False,
    boilerplate_min_doc_freq: int | None = 1000,
    lang: str | None = "en",
    min_quality: float = 0.3,
    max_repetition: float = 0.2,
    token_bounds: tuple[int, int] = (10, 5000),
    gopher: bool | dict = False,
    gopher_repetition: bool | dict = False,
    near_dup_threshold: float | None = 0.8,
    split_weights: list[tuple[str, float]] | None = None,
    benchmark: DataFrame | None = None,
    decontaminate_ngram: int = 13,
    source_col: str | None = None,
    max_per_source: int | None = None,
    mixture: dict[str, float] | None = None,
    mixture_tokens: int | None = None,
    lm_drop_fraction: float | None = None,
    lm_exact_threshold: bool = False,
    dsir_target: DataFrame | None = None,
    dsir_keep: int | None = None,
    dsir_keep_fraction: float | None = None,
    dsir_temperature: float = 1.0,
    dsir_num_buckets: int = 4096,
    dsir_ngram: int = 2,
    quality_model=None,
    pareto_alpha: float | None = None,
    paragraph_dedup: bool = False,
    trim_span_tokens: int | None = None,
    trim_span_min_occurrences: int = 2,
    subword_vocab: list[str] | None = None,
    cache_stages: bool = True,
    audit: dict | None = None,
) -> DataFrame:
    """Run the curation funnel; returns one row per SURVIVING document:
    (id, text, n_tokens, quality, lang, split) — with boilerplate
    stripped, gates applied, exact and near duplicates removed (the
    canonical member of each duplicate group survives), and — when a
    ``benchmark`` eval set is given — docs overlapping it by
    ``decontaminate_ngram``-gram collision dropped.

    Set a stage's parameter to None to skip it.  Gates mirror
    corpus_filter's certified thresholds; near-dup canonicalization
    keeps the min-id representative (dedup_canonical semantics).

    Optional round-5 stages (all None-skipped by default):
      * ``max_per_source`` (+ ``source_col``): at most N survivors per
        domain, chosen by the deterministic md5-rank window
        (cap_per_group) — runs AFTER dedup so duplicates don't consume
        a domain's budget.
      * ``mixture`` (+ ``mixture_tokens``, ``source_col``): token-budget
        data mixing (mix_by_source) — per-source keep fractions derived
        from the survivors' real token totals against the target
        mixture; runs after capping so budgets see the capped corpus.
      * ``lm_drop_fraction``: fit the bigram LM on the surviving corpus
        and drop the least-typical fraction (the perplexity-filter
        analogue).  The cut point is an approxQuantile over the score
        column — one extra aggregate pass, scalar to the driver.
      * ``dsir_target`` (+ ``dsir_keep`` or ``dsir_keep_fraction``):
        target-directed selection
        (DSIR, Xie et al. 2023 — operators/dsir.py): fit hashed-n-gram
        importance log-ratios between the target frame and the
        survivors, then keep the ``dsir_keep`` documents with the
        largest Gumbel-perturbed weights (deterministic, hash-derived
        noise; ``dsir_temperature`` sharpens toward pure top-k as it
        approaches 0).  Runs after the LM gate: typicality first
        prunes junk, then DSIR steers toward the target domain.
      * ``quality_model``: a fitted QualityClassifier; survivors are
        scored JVM-side and, when ``pareto_alpha`` is set, kept by the
        stochastic Pareto rule, else by prob > 0.5.
      * ``gopher`` (round 7): add the Gopher heuristic bundle
        (functions/text.gopher_rules, certified in text_quality) to the
        gate conjunction — True for paper thresholds, a dict to
        override them.  Same stage, zero extra passes: the rules are
        pure column expressions over the already-materialized token
        array, and the streaming gate (curate_stream) accepts the same
        knob so batch and stream cannot diverge.
      * ``c4_rules`` (round 7): the C4 §2.2 cleaning pass (certified in
        pii_redact) — lorem-ipsum/curly-brace pages dropped wholesale,
        then only terminal-punctuation lines with >= 3 words and no
        'javascript' retained; runs after NFC, before boilerplate, so
        every later stage judges the cleaned lines.
      * ``gopher_repetition`` (round 7): drop documents whose Gopher
        A1.2 repetition signals (operators/repetition.py, certified in
        text_stats) exceed the paper thresholds — True for the paper's
        numbers, a dict to override individual thresholds (keys from
        GOPHER_REPETITION_THRESHOLDS).  One extra Arrow map pass +
        an id-only join back; runs with the gate stage, before any
        dedup, like the other stateless quality screens.
      * ``normalize_nfc``: NFC-compose + strip C0 control chars before
        anything fingerprints the text, so byte-variant spellings of
        the same string dedup together (runs after ``html_input``).
      * ``html_input``: run strip_html first, so every downstream stage
        judges extracted text, not markup.
      * ``paragraph_dedup``: keep-first paragraph dedup
        (dedup_paragraphs — RefinedWeb granularity): later copies of a
        normalized paragraph are removed across and within documents,
        first occurrence always survives; runs after boilerplate
        removal and before the span trim.
      * ``trim_span_tokens``: cross-document repeated-substring trim
        (duplicated_spans / Lee et al.) — windows of this many tokens
        occurring twice+ corpus-wide are removed from every document,
        right after boilerplate removal and before the gates (so
        length/repetition gates judge the trimmed text).

    ``subword_vocab`` (a BPE merge list from operators/subword.learn_bpe
    or any literal vocabulary) switches every token BUDGET downstream of
    the gates — n_tokens, the length gate itself, mix_by_source's
    totals, and pack_corpus over the returned frame — to subword counts
    (greedy longest-match), the unit an LLM trainer actually bills in;
    whitespace counts overestimate a trainer's budget by a
    corpus-dependent 1.2-1.5x.  Gate signals that are linguistic rather
    than budgetary (quality, lang, repetition) stay whitespace-based.

    ``lm_exact_threshold=True`` replaces the approxQuantile cut with an
    EXACT rank rule on round-6 scores — keep docs whose round(score, 6)
    is >= the ceil(lm_drop_fraction * n)-th smallest such score (n =
    docs with a non-NULL score) — making the gate bit-reproducible
    across engines (the certification/replay mode; the approx sketch
    stays the scale default).  ``trim_span_min_occurrences`` threads
    through to remove_duplicated_spans.

    ``audit`` (pass an empty dict) collects, per drop-capable stage, the
    slim survivor-id frame right after that stage runs — keys in funnel
    order: gates, exact_dedup, near_dup, cap, mix, lm, dsir, quality,
    decontaminate (only stages that ran appear).  The frames share the
    funnel's checkpointed lineage, so materializing them re-reads
    truncated plans, not the whole funnel per stage.

    ``cache_stages`` (default True) checkpoints the running frame at
    every self-referencing stage boundary.  This is load-bearing at
    scale, for TWO compounding reasons: dedup/near-dup/LM/model/
    decontaminate each reference the running frame in MULTIPLE plan
    branches (the frame plus a derived aggregate joined back), Spark
    does not common-subexpression-eliminate across join branches, and
    the duplication is a TREE — both the recompute work and the logical
    plan itself grow ~2^stages.  Measured at 200k docs: the naive
    funnel ran 2000+ stages without finishing in 20 min, and a
    persist()-only variant (which bounds recompute but keeps the full
    lineage tree) OOM'd the driver building a 1.3 GB plan string.  So
    plan TRUNCATION is required, not just caching: with a configured
    ``sparkContext.setCheckpointDir`` the frame takes a RELIABLE
    checkpoint (truncated plan + blocks on durable storage =
    fault-tolerant on a real cluster); without one it falls back to
    ``localCheckpoint`` (truncated plan, executor-local blocks — fine
    for local mode, lost-executor recompute impossible, which is the
    documented trade-off of not setting a checkpoint dir).  Set False
    only for tiny corpora where full laziness matters more.
    """
    def _trunc(df: DataFrame, eager: bool = False) -> DataFrame:
        if not cache_stages:
            return df
        sc = df.sparkSession.sparkContext
        get_dir = getattr(sc, "getCheckpointDir", lambda: None)
        if get_dir() is not None:
            # persist BEFORE the reliable checkpoint: RDD.checkpoint()
            # does not persist, so without this the lineage would
            # recompute once per plan branch AND once more for the
            # checkpoint-write job (the Spark docs' own recommendation)
            from pyspark import StorageLevel

            return df.persist(StorageLevel.MEMORY_AND_DISK).checkpoint(
                eager=eager
            )
        return df.localCheckpoint(eager=eager)

    def _audit(name: str, frame: DataFrame) -> None:
        if audit is not None:
            audit[name] = frame.select("id")

    cur = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    if html_input:
        # ingest extraction first: every downstream stage (boilerplate,
        # dedup, gates, LM) judges TEXT, not markup.  Pure column
        # expression — no state, no shuffle.
        cur = cur.select("id", X.strip_html("text").alias("text"))

    if normalize_nfc:
        # canonical byte form before any fingerprint: NFC composition
        # (Arrow map pass) + C0 control strip (column expr), so 'e'+
        # COMBINING ACUTE and precomposed 'é' dedup as the same doc
        cur = X.normalize_unicode(cur, text_col="text")
        cur = cur.select("id", X.strip_control_chars("text").alias("text"))

    if c4_rules:
        # C4 §2.2 (functions/text.py, certified in pii_redact): drop
        # lorem-ipsum / curly-brace pages wholesale, then keep only
        # terminal-punctuation lines with enough words.  Page flags
        # evaluate BEFORE the line rewrite (a brace on a discarded line
        # still damns the page, per the paper).  Pure column
        # expressions — no state, no shuffle.
        flags = X.c4_page_flags("text")
        cur = cur.filter(
            ~flags["has_lorem_ipsum"] & ~flags["has_curly_brace"]
        ).select(
            "id", X.c4_clean_lines("text")["clean_text"].alias("text")
        )

    if boilerplate_min_doc_freq is not None:
        cleaned = DD.remove_boilerplate_lines(
            cur, boilerplate_min_doc_freq, text_col="text", id_col="id"
        )
        cur = cleaned.select("id", F.col("clean_text").alias("text"))

    if paragraph_dedup:
        # keep-first paragraph dedup (dedup_paragraphs): self-
        # referencing (the drop table derives from cur and joins back),
        # so barrier first — same rule as the span trim below
        cur = _trunc(cur)
        pd_ = DD.dedup_paragraphs(cur, text_col="text", id_col="id")
        cur = pd_.select("id", F.col("clean_text").alias("text"))

    if trim_span_tokens is not None:
        cur = _trunc(cur)
        trimmed = DD.remove_duplicated_spans(
            cur, span_tokens=trim_span_tokens,
            min_occurrences=trim_span_min_occurrences,
            text_col="text", id_col="id",
        )
        cur = trimmed.select("id", F.col("clean_text").alias("text"))

    # Conditional spread (operators/dedup._parallelize): single-file
    # small-SF inputs arrive as 1 scan partition and must fan out, but an
    # already-parallel 100 TB corpus must NOT pay a full raw-text shuffle
    # here — the exchange only fires when scan parallelism is clearly
    # below the cluster's.  Expression duplication without the barrier is
    # bounded: Spark's CollapseProject refuses to inline a non-cheap
    # producer (the tokenize split) that is referenced more than once.
    toks = X.whitespace_tokens("text")
    cur = DD._parallelize(cur.select("id", "text", toks.alias("__toks")))
    cur = cur.select(
        "id", "text", *gate_signal_columns("text", "__toks", gopher=gopher)
    )
    if subword_vocab is not None:
        from fabstir_vectordb_spark.operators.subword import (
            subword_token_counts,
        )

        # self-referencing stage: `sub` derives from cur (two internal
        # scans — distinct-word explode + per-doc explode) and joins back
        # onto cur, so without a barrier the whole pre-gate pipeline
        # (boilerplate removal, span trim, tokenize) evaluates three
        # times.  Same rule as every other self-joining funnel stage.
        cur = _trunc(cur)
        sub = subword_token_counts(
            cur, subword_vocab, id_col="id", text_col="text",
            out_col="__n_sub",
        )
        cur = cur.join(sub, "id").withColumn(
            "n_tokens", F.col("__n_sub")
        ).drop("__n_sub")
    gate = gate_predicate(
        token_bounds, max_repetition, lang, min_quality, gopher=gopher
    )
    cur = cur.filter(gate).drop("rep_3gram", "gopher")

    if gopher_repetition:
        from fabstir_vectordb_spark.operators.repetition import (
            GOPHER_REPETITION_THRESHOLDS,
            repetition_signals,
        )

        thresholds = dict(GOPHER_REPETITION_THRESHOLDS)
        if isinstance(gopher_repetition, dict):
            thresholds.update(gopher_repetition)
        # self-referencing stage (signals derive from cur and join
        # back): barrier first, same rule as every other such stage
        cur = _trunc(cur)
        sig = repetition_signals(cur, text_col="text", id_col="id")
        keep = sig.filter(
            reduce(
                lambda a, b: a & b,
                [F.col(c) <= t for c, t in thresholds.items()],
            )
        ).select("id")
        cur = cur.join(keep, "id")
    _audit("gates", cur)

    # exact dedup: keep the canonical (min-id) member of each group
    cur = _trunc(cur)
    groups = DD.exact_dedup(cur.select("id", "text"), text_col="text", id_col="id")
    cur = cur.join(
        groups.filter(~F.col("is_duplicate")).select("id"), "id"
    )
    _audit("exact_dedup", cur)

    if near_dup_threshold is not None:
        cur = _trunc(cur)
        pairs = DD.minhash_lsh_pairs(
            cur, threshold=near_dup_threshold, text_col="text", id_col="id"
        )
        canon = DD.canonicalize_pairs(cur, pairs, id_col="id")
        cur = cur.join(
            canon.filter(F.col("id") == F.col("canonical_id")).select("id"),
            "id",
        )
        _audit("near_dup", cur)

    if max_per_source is not None:
        if source_col is None:
            raise ValueError("max_per_source requires source_col")
        srcmap = docs.select(
            F.col(id_col).alias("id"), F.col(source_col).alias("__src")
        )
        capped = cap_per_group(
            cur.join(srcmap, "id"), max_per_source,
            group_col="__src", id_col="id",
        )
        cur = capped.filter(F.col("grp_kept")).drop(
            "__src", "grp_rank", "grp_kept"
        )
        _audit("cap", cur)

    if mixture is not None:
        if source_col is None:
            raise ValueError("mixture requires source_col")
        if mixture_tokens is None:
            raise ValueError("mixture requires mixture_tokens")
        cur = _trunc(cur)  # mix_by_source joins its totals aggregate back
        srcmap = docs.select(
            F.col(id_col).alias("id"), F.col(source_col).alias("__src")
        )
        mixed = mix_by_source(
            cur.join(srcmap, "id"), mixture, mixture_tokens,
            group_col="__src", id_col="id", n_tokens_col="n_tokens",
        )
        cur = mixed.filter(F.col("mix_kept")).drop(
            "__src", "mix_frac", "mix_kept"
        )
        _audit("mix", cur)

    if lm_drop_fraction is not None:
        if not 0.0 <= lm_drop_fraction < 1.0:
            raise ValueError(f"lm_drop_fraction must be in [0, 1), got {lm_drop_fraction}")
        if lm_drop_fraction > 0.0:
            cur = _trunc(cur)
            # persist: approxQuantile is an action, and without the cache
            # the filter below would re-execute the whole upstream funnel
            # (boilerplate, span trim, dedup joins, LM fit) a second time.
            # The persist is released below (eager truncation of the gated
            # survivors first, so nothing downstream still needs the
            # blocks) — otherwise every curate_corpus call would leak a
            # cached frame for the lifetime of the session.
            scored = cur.join(
                bigram_lm_score(cur, id_col="id", text_col="text"), "id"
            )
            # UNCONDITIONAL persist (independent of cache_stages): the
            # threshold computation below is an action, and without the
            # cache it plus the downstream filter would re-execute the
            # whole upstream funnel two to three times.  Released
            # unconditionally after the gate (see below).
            scored = scored.persist()
            # NULL scores (<2-token docs: no bigram evidence) are ignored
            # by the cut-point computation and FAIL the >= gate — a
            # typicality filter must drop, not keep, evidence-free
            # documents (ADVICE r5).
            if lm_exact_threshold:
                import math

                scores = scored.filter(
                    F.col("lm_score").isNotNull()
                ).select(F.round("lm_score", 6).alias("__s"))
                n = scores.count()
                if n > 0:
                    kth = max(1, math.ceil(lm_drop_fraction * n))
                    t = (
                        scores.orderBy("__s").limit(kth)
                        .agg(F.max("__s")).first()[0]
                    )
                    cur = scored.filter(F.round("lm_score", 6) >= t)
                else:
                    cur = scored
            else:
                q = scored.approxQuantile(
                    "lm_score", [lm_drop_fraction], 0.001
                )
                if q:  # empty corpus at this stage -> nothing to drop
                    cur = scored.filter(F.col("lm_score") >= q[0])
                else:
                    cur = scored
            cur = cur.drop("lm_score")
            if cache_stages:
                # eager truncation of the gated survivors first, so
                # nothing downstream still needs the blocks
                cur = _trunc(cur, eager=True)
            # release in BOTH modes — otherwise every curate_corpus call
            # leaks a cached frame for the session's lifetime.  With
            # cache_stages=False the downstream filter recomputes its
            # lineage once when consumed (the explicit no-cache trade);
            # the threshold actions above were still served from cache.
            scored.unpersist()
            _audit("lm", cur)

    if dsir_target is not None:
        if dsir_keep is None and dsir_keep_fraction is None:
            raise ValueError(
                "dsir_target requires dsir_keep (exact count) or "
                "dsir_keep_fraction (quantile threshold, the no-global-"
                "sort scale mode)"
            )
        from fabstir_vectordb_spark.operators.dsir import (
            dsir_score,
            dsir_select,
            fit_dsir_ratios,
        )

        # target-directed selection (DSIR, Xie et al. 2023): fit the
        # hashed-n-gram log-ratio on (target, survivors-so-far) and
        # Gumbel-top-k the survivors.  Self-referencing stage (the raw
        # model AND the scores both derive from cur) — barrier first,
        # same rule as the LM gate.
        cur = _trunc(cur)
        # the target only contributes n-gram counts — accept any frame
        # with the text column, id optional (mirrors ``benchmark``)
        tgt = dsir_target.select(
            F.col(text_col).alias("text"),
            F.lit(0).cast("long").alias("id"),
        )
        ratios = fit_dsir_ratios(
            tgt, cur, n=dsir_ngram, num_buckets=dsir_num_buckets,
            text_col="text", id_col="id",
        )
        sel = dsir_select(
            dsir_score(
                cur, ratios, n=dsir_ngram, num_buckets=dsir_num_buckets,
                id_col="id",
            ),
            k_keep=dsir_keep, keep_fraction=dsir_keep_fraction,
            temperature=dsir_temperature,
        )
        cur = cur.join(
            sel.filter(F.col("selected")).select("id"), "id"
        )
        _audit("dsir", cur)

    if quality_model is not None:
        cur = _trunc(cur)
        qscored = cur.join(
            quality_model.score(cur, id_col="id", text_col="text"), "id"
        )
        if pareto_alpha is not None:
            kept = quality_model.keep_pareto(qscored, alpha=pareto_alpha)
            cur = kept.filter(F.col("kept")).drop("quality_prob", "kept")
        else:
            cur = qscored.filter(F.col("quality_prob") > 0.5).drop("quality_prob")
        _audit("quality", cur)

    if benchmark is not None:
        cur = _trunc(cur)
        cur = DD.remove_contaminated(
            cur, benchmark, n=decontaminate_ngram, id_col="id", text_col="text"
        )
        _audit("decontaminate", cur)

    return assign_split(cur, weights=split_weights, id_col="id")


def pack_corpus(
    curated: DataFrame,
    context_len: int,
    split: str = "train",
) -> DataFrame:
    """Pack one split of a curated corpus into fixed context windows:
    (id, bin_id, start_tok, tokens_in_bin) — the materialized dataloader
    plan (pack_sequences' certified layout over the curated stream)."""
    part = curated.filter(F.col("split") == split)
    return pack_sequences(part, context_len, id_col="id", n_tokens_col="n_tokens")


def rag_search(
    idx,
    assigned_chunks: DataFrame,
    queries: DataFrame,
    k_docs: int,
    k_chunks: int = 32,
    n_probe: int | None = None,
    metric: str = "l2",
) -> DataFrame:
    """Document-level retrieval over a chunked index — the query half
    of the RAG workflow rag_ingest feeds: search the chunk index, pool
    each document's score to its BEST chunk (min distance — MaxSim
    pooling in distance form), and return the top ``k_docs`` documents
    per query as (query_id, id, distance).

    ``assigned_chunks`` is the rag_ingest frame after ``idx.assign``
    (it must carry chunk_id + doc_id).  ``k_chunks`` is the chunk-level
    over-fetch: a document can only rank by chunks that survived the
    chunk top-k, so raise it when documents are long relative to the
    chunk size.

    Scale shape: the chunk search is the index's own probe-pruned
    plan; everything after operates on Q x k_chunks rows — the
    chunk->doc attribution joins THAT tiny side against the slim
    (chunk_id, doc_id) projection (broadcast-friendly), and the pooling
    groupBy touches the same rows.  The chunk table itself is never
    re-shuffled."""
    from fabstir_vectordb_spark.operators.topk import topk_per_query

    import inspect

    # forward only the knobs THIS index's search accepts — rag_ingest
    # output serves IVF, IVFPQ, and HNSW indexes, whose search_bulk
    # signatures differ (metric / n_probe / ef)
    accepted = inspect.signature(idx.search_bulk).parameters
    kwargs = {}
    if "metric" in accepted:
        kwargs["metric"] = metric
    if n_probe is not None and "n_probe" in accepted:
        kwargs["n_probe"] = n_probe
    hits = idx.search_bulk(assigned_chunks, queries, k_chunks, **kwargs)
    doc_map = assigned_chunks.select(
        F.col("chunk_id").alias("id"), "doc_id"
    )
    pooled = (
        # broadcast the PROVABLY tiny side (Q x k_chunks rows): hits
        # comes out of a mapInPandas kernel, so Catalyst has no size
        # statistics and would otherwise sort-merge-shuffle the whole
        # chunk table
        doc_map.join(F.broadcast(hits), "id")
        .groupBy("query_id", "doc_id")
        .agg(F.min("distance").alias("distance"))
        .select("query_id", F.col("doc_id").alias("id"), "distance")
    )
    return topk_per_query(pooled, k_docs)


def curate_incremental(
    ledger,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    commit: bool = True,
    **curate_kwargs,
) -> DataFrame:
    """Incremental curation for a continuously-crawled corpus: drop
    everything the FingerprintLedger (sources/ledger.py) has already
    processed, run the batch funnel over only the genuinely new
    documents, and record them as processed.

    Ledger semantics are PROCESSED-not-kept: a document the gates
    rejected is still committed, so a future identical crawl is never
    re-curated (re-processing rejected content every batch is the
    failure mode a crawl ledger exists to prevent).  Within and across
    batches the first occurrence wins — the same keep-first contract
    as dedup_paragraphs, at document granularity over unbounded
    history.

    Durability contract — choose per deployment:

    * ``commit=True`` (default): the ledger is updated HERE, before the
      caller persists the curated output.  A crash in that window skips
      the batch permanently (at-most-once OUTPUT) — acceptable when a
      crawl re-delivers content eventually.
    * ``commit=False`` (at-least-once output): persist the returned
      frame first, then call ``ledger.commit(new_docs)`` — committing
      the WHOLE batch is a valid superset (duplicate ledger rows are
      set-membership-harmless and compactable), so no intermediate
      frame needs to survive the crash.

    The fresh set is checkpointed once — reliably when a checkpoint
    dir is configured (the funnel's own _trunc rule), else locally —
    because both the funnel and the commit consume it and must see
    exactly the same rows."""
    fresh = ledger.filter_new(new_docs, text_col=text_col, id_col=id_col)
    sc = new_docs.sparkSession.sparkContext
    get_dir = getattr(sc, "getCheckpointDir", lambda: None)
    if get_dir() is not None:
        # persist BEFORE the reliable checkpoint — same rule as the
        # funnel's _trunc (RDD.checkpoint() does not persist, so the
        # lineage would otherwise recompute per consumer) — and RELEASE
        # the pre-checkpoint cache once the eager write lands: a crawl
        # loop calls this per batch, and DataFrame caches are not
        # GC-reclaimed, so a leak here grows executor storage without
        # bound
        from pyspark import StorageLevel

        held = fresh.persist(StorageLevel.MEMORY_AND_DISK)
        fresh = held.checkpoint(eager=True)
        held.unpersist()
    else:
        fresh = fresh.localCheckpoint(eager=True)
    out = curate_corpus(fresh, id_col=id_col, text_col=text_col, **curate_kwargs)
    if commit:
        ledger.commit(fresh, text_col=text_col)
    return out


def rag_ingest(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
    embedding_dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style ingestion: chunk documents into overlapping token
    windows and attach a feature-hashed embedding per chunk — the
    documents -> vectors half of the vector-DB workflow, fully real and
    engine-reproducible (no model dependency; swap `hashed_embedding`
    for a mapInPandas encoder to plug a learned model in).  Output:
    (chunk_id, doc_id, chunk_idx, chunk_text, embedding) — ready for
    IVFIndex.fit/assign, HNSWIndex.build, or
    VectorDbSession.from_dataframe.

    Scale shape: chunking is explode-only (no shuffle) and the
    embedding is a pure column expression over each chunk's own tokens,
    so the whole ingest is one scan-shaped pass."""
    from fabstir_vectordb_spark.functions.text import (
        hashed_embedding,
        whitespace_tokens,
    )
    from fabstir_vectordb_spark.operators.sampling import chunk_documents

    chunks = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap_tokens=overlap_tokens,
        id_col=id_col, text_col=text_col, emit_text=True,
    )
    return chunks.select(
        F.concat_ws(
            "#", F.col("id").cast("string"), F.col("chunk_idx").cast("string")
        ).alias("chunk_id"),
        F.col("id").alias("doc_id"),
        "chunk_idx",
        "chunk_text",
        hashed_embedding(
            whitespace_tokens(F.col("chunk_text")), embedding_dim
        ).alias("embedding"),
    )
