"""End-to-end corpus pipeline: curation funnel -> dedup -> split -> pack."""

from pyspark.sql import functions as F

from fabstir_vectordb_spark.pipelines import curate_corpus, pack_corpus


def _corpus(spark):
    # each doc draws a DISTINCT token stream (w{i}_{j}) so the corpus is
    # not one giant near-dup clique; English stopwords keep lang_id=en
    base = [
        (i, "the and of " + " ".join(f"w{i}_{j} the" for j in range(15))
            + " is in it a " + " ".join(f"x{i}_{j}" for j in range(10))
            + " and some more filler words to stay realistic")
        for i in range(40)
    ]
    extra = [
        # exact duplicate of doc 0
        (100, base[0][1]),
        # near duplicate of doc 1 (one word changed)
        (101, base[1][1].replace("filler", "padding")),
        # too short
        (102, "tiny doc"),
        # boilerplate carrier: every doc gets the footer below
    ]
    rows = [(i, t + "\nSUBSCRIBE NOW footer line") for i, t in base + extra]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_funnel(spark):
    docs = _corpus(spark)
    out = curate_corpus(
        docs,
        boilerplate_min_doc_freq=10,
        lang="en",
        min_quality=0.0,
        max_repetition=0.9,
        token_bounds=(10, 5000),
        near_dup_threshold=0.7,
    ).cache()
    ids = {r["id"] for r in out.select("id").collect()}
    assert 102 not in ids          # length gate
    assert 100 not in ids and 0 in ids    # exact dup removed, canonical kept
    assert 101 not in ids and 1 in ids    # near dup removed, canonical kept
    # boilerplate footer stripped before tokenization
    sample = out.filter(F.col("id") == 0).collect()[0]
    assert "SUBSCRIBE" not in sample["text"]
    # split column present and total preserved
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    assert out.count() == 40


def test_pack_corpus_layout(spark):
    docs = _corpus(spark)
    curated = curate_corpus(
        docs, boilerplate_min_doc_freq=10, lang=None, min_quality=None,
        max_repetition=1.0, near_dup_threshold=None,
    )
    packed = pack_corpus(curated, context_len=64, split="train")
    rows = packed.collect()
    assert rows
    # bins full except the last
    from collections import defaultdict

    fill = defaultdict(int)
    for r in rows:
        fill[r["bin_id"]] += r["tokens_in_bin"]
    bins = sorted(fill)
    assert all(fill[b] == 64 for b in bins[:-1])
    # packed token total == curated train-split token total
    n_train = (
        curated.filter(F.col("split") == "train")
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    assert sum(fill.values()) == n_train


def test_curate_corpus_decontaminates(spark):
    docs = _corpus(spark)
    # benchmark = doc 5's distinctive token stream: doc 5 (and only it)
    # must be dropped by the decontamination stage
    bench = spark.createDataFrame(
        [(" ".join(f"w5_{j} the" for j in range(15)),)], ["text"]
    )
    out = curate_corpus(
        docs,
        boilerplate_min_doc_freq=10,
        lang="en",
        min_quality=0.0,
        max_repetition=0.9,
        token_bounds=(10, 5000),
        near_dup_threshold=None,
        benchmark=bench,
        decontaminate_ngram=8,
    )
    ids = {r["id"] for r in out.select("id").collect()}
    assert 5 not in ids
    assert {0, 1, 6} <= ids


def test_rag_ingest_end_to_end(spark):
    """chunk -> feature-hashed embed -> IVF index -> search: a chunk's
    own embedding must retrieve that chunk at rank 1 (distance 0), and
    identical chunk texts embed identically."""
    from fabstir_vectordb_spark.operators.ivf import IVFIndex
    from fabstir_vectordb_spark.pipelines import rag_ingest

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}_{j}" for j in range(40)) + " shared tail words")
            for i in range(30)
        ]
        + [(99, " ".join(f"w7_{j}" for j in range(40)) + " shared tail words")],
        "doc_id long, text string",
    )
    ing = rag_ingest(
        docs, chunk_tokens=16, overlap_tokens=4, embedding_dim=32
    ).cache()
    rows = ing.collect()
    assert all(len(r["embedding"]) == 32 for r in rows)
    # doc 99 duplicates doc 7's text -> identical chunk embeddings
    by_key = {(r["doc_id"], r["chunk_idx"]): r["embedding"] for r in rows}
    assert by_key[(99, 0)] == by_key[(7, 0)]
    assert by_key[(99, 0)] != by_key[(8, 0)]

    idx = IVFIndex.fit(
        ing, n_clusters=4, seed=3, id_col="chunk_id", vector_col="embedding"
    )
    assigned = idx.assign(ing)
    probe = ing.filter(
        (F.col("doc_id") == 12) & (F.col("chunk_idx") == 1)
    ).select(
        F.col("chunk_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    res = idx.search_bulk(assigned, probe, 3, n_probe=4).orderBy(
        "distance", "id"
    ).collect()
    assert res[0]["id"] == "12#1" and res[0]["distance"] == 0.0


def test_chunk_documents_layout(spark):
    from fabstir_vectordb_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))), (1, "a b"), (2, "  ")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=4, overlap_tokens=1).collect()
    got = {(r["id"], r["chunk_idx"]): r for r in rows}
    # doc 0: starts 0,3,6 (stride 3), last chunk full
    assert sorted(k for k in got if k[0] == 0) == [(0, 0), (0, 1), (0, 2)]
    assert got[(0, 1)]["start_tok"] == 3 and got[(0, 1)]["chunk_text"] == "t3 t4 t5 t6"
    assert got[(0, 2)]["n_tokens"] == 4
    # short doc: one chunk, short
    assert got[(1, 0)]["n_tokens"] == 2 and got[(1, 0)]["chunk_text"] == "a b"
    # whitespace-only doc emits nothing
    assert not any(k[0] == 2 for k in got)


def _sourced_corpus(spark):
    rows = [
        (i, "the and of " + " ".join(f"w{i}_{j} the" for j in range(15))
            + " is in it a words to stay realistic", f"src{i % 2}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_curate_corpus_source_cap(spark):
    docs = _sourced_corpus(spark)
    out = curate_corpus(
        docs,
        boilerplate_min_doc_freq=None,
        lang="en", min_quality=0.0, max_repetition=0.9,
        token_bounds=(5, 5000), near_dup_threshold=None,
        source_col="source", max_per_source=7,
    )
    counts = {
        r["source"]: r["c"]
        for r in out.join(
            docs.select(F.col("doc_id").alias("id"), "source"), "id"
        ).groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    assert counts == {"src0": 7, "src1": 7}
    # internal columns don't leak
    assert {"__src", "grp_rank", "grp_kept"}.isdisjoint(out.columns)


def test_curate_corpus_lm_tail_drop(spark):
    # 32 docs sharing a dominant bigram pattern + 8 gibberish docs whose
    # bigrams are all singletons — the LM tail the filter must drop
    typical = [
        (i, " ".join(["alpha beta"] * 12) + f" tail{i}") for i in range(32)
    ]
    # gibberish docs with DISTINCT scores (mixing in i common bigrams
    # raises doc i's mean slightly) — ties would all sit exactly on the
    # quantile threshold, where the conservative >= keep retains them
    gibberish = [
        (
            50 + i,
            " ".join(f"g{i}_{j}" for j in range(24))
            + " " + " ".join(["alpha beta"] * i),
        )
        for i in range(8)
    ]
    docs = spark.createDataFrame(
        typical + gibberish, "doc_id long, text string"
    )
    out = curate_corpus(
        docs, boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(1, 5000), near_dup_threshold=None,
        lm_drop_fraction=0.2,
    )
    ids = {r["id"] for r in out.select("id").collect()}
    assert set(range(32)) <= ids            # every typical doc survives
    dropped = {50 + i for i in range(8)} - ids
    assert len(dropped) >= 7                # the tail is gone (boundary
    #   doc may survive the conservative >= threshold keep)
    assert "lm_score" not in out.columns


def test_curate_corpus_quality_model_stage(spark):
    from fabstir_vectordb_spark.operators.quality_model import QualityClassifier

    good = [
        (i, "the and of " + " ".join(f"w{i}_{j} the" for j in range(15))
            + " is in it a words to stay realistic", 1)
        for i in range(30)
    ]
    bad = [(100 + i, " ".join(["spam"] * 25), 0) for i in range(30)]
    labeled = spark.createDataFrame(
        good + bad, "doc_id long, text string, label int"
    )
    clf = QualityClassifier.fit(labeled, dim=16)
    out = curate_corpus(
        labeled.drop("label"),
        boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(1, 5000), near_dup_threshold=None,
        quality_model=clf,
    )
    ids = {r["id"] for r in out.select("id").collect()}
    assert all(i < 100 for i in ids)   # spam docs filtered
    assert len(ids) >= 25              # good docs overwhelmingly kept


def test_curate_corpus_span_trim(spark):
    shared = " ".join(f"c{j}" for j in range(12))
    rows = [
        (i, "the and of is in it a " + " ".join(f"w{i}_{j}" for j in range(10))
            + " " + shared)
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(
        docs, boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(1, 5000), near_dup_threshold=None,
        trim_span_tokens=8,
    )
    texts = {r["id"]: r["text"] for r in out.collect()}
    assert len(texts) == 20
    # the shared 12-token tail is trimmed from every doc
    assert all("c0" not in t and "c11" not in t for t in texts.values())
    # each doc's unique prefix survives
    assert all(f"w{i}_0" in texts[i] for i in range(20))


def test_curate_corpus_reliable_checkpoint_when_dir_set(spark, tmp_path):
    """With a checkpoint dir configured, stage boundaries take RELIABLE
    checkpoints (fault-tolerant truncation); the funnel output is
    unchanged either way."""
    docs = _sourced_corpus(spark)
    base = {
        r["id"] for r in curate_corpus(
            docs, boilerplate_min_doc_freq=None, lang=None, min_quality=None,
            max_repetition=1.0, token_bounds=(1, 5000), near_dup_threshold=0.7,
        ).select("id").collect()
    }
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        with_dir = {
            r["id"] for r in curate_corpus(
                docs, boilerplate_min_doc_freq=None, lang=None, min_quality=None,
                max_repetition=1.0, token_bounds=(1, 5000), near_dup_threshold=0.7,
            ).select("id").collect()
        }
        import glob as _glob

        # setCheckpointDir itself mkdirs an empty <uuid> subdir, so
        # assert on actual rdd-* checkpoint payload directories
        assert _glob.glob(str(tmp_path / "ckpt" / "*" / "rdd-*"))
    finally:
        getattr(spark.sparkContext._jsc.sc(), "checkpointDir_$eq")(
            spark.sparkContext._jvm.scala.Option.empty()
        )
    assert with_dir == base


def test_curate_corpus_survives_empty_survivor_set(spark):
    """Every stage ON, gates tuned so NOTHING survives: the funnel must
    return an empty frame (correct schema), not crash in a later stage
    (quantile on empty, model scoring on empty, decontaminate on empty)."""
    from fabstir_vectordb_spark.operators.quality_model import QualityClassifier

    docs = _sourced_corpus(spark)
    labeled = docs.withColumn("label", (F.col("doc_id") % 2 == 0).cast("int"))
    clf = QualityClassifier.fit(labeled, dim=8, max_iter=5)
    bench = docs.limit(1).select("text")
    out = curate_corpus(
        docs,
        boilerplate_min_doc_freq=1000,
        lang="en", min_quality=0.99, max_repetition=0.0,   # kills everything
        token_bounds=(10, 5000),
        near_dup_threshold=0.8,
        benchmark=bench, decontaminate_ngram=8,
        source_col="source", max_per_source=5,
        lm_drop_fraction=0.2,
        quality_model=clf, pareto_alpha=9.0,
        trim_span_tokens=8,
    )
    assert out.count() == 0
    assert {"id", "text", "n_tokens", "split"} <= set(out.columns)


def test_curate_corpus_mixture_stage(spark):
    from pyspark.sql import functions as _F

    # src0 holds 10x the tokens of src1; a 50/50 mixture with a budget
    # of twice src1's tokens keeps ~all of src1 and ~10% of src0
    rows = [
        (i, "the and of " + " ".join(f"w{i}_{j}" for j in range(12)), "src0")
        for i in range(200)
    ] + [
        (1000 + i, "the and of " + " ".join(f"v{i}_{j}" for j in range(12)), "src1")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus(
        docs, boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(1, 5000), near_dup_threshold=None,
        source_col="source", mixture={"src0": 0.5, "src1": 0.5},
        mixture_tokens=2 * 20 * 15,
    )
    kept = {r["source"]: r["c"] for r in out.join(
        docs.select(_F.col("doc_id").alias("id"), "source"), "id"
    ).groupBy("source").agg(_F.count("*").alias("c")).collect()}
    assert kept.get("src1", 0) == 20            # small source kept whole
    assert 5 <= kept.get("src0", 0) <= 40       # ~10% of 200
    assert {"mix_frac", "mix_kept", "__src"}.isdisjoint(out.columns)


def test_curate_corpus_audit_and_exact_lm_threshold(spark):
    """The round-6 certification hooks: `audit` collects per-stage
    survivor-id frames in funnel order, and lm_exact_threshold makes the
    LM gate an exact rank rule on round-6 scores (drop the lowest
    ceil(p*n), NULL-score docs always dropped)."""
    rows = (
        [(i, "the cat sat on the mat and then the dog sat too " + f"u{i}",
          "src0") for i in range(30)]
        + [(100, "zz qq xx yy ww vv uu tt ss rr aa bb", "src0")]  # atypical
        + [(101, "one", "src0")]                                  # <2 tokens
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    aud = {}
    out = curate_corpus(
        docs, boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(1, 5000), near_dup_threshold=None,
        lm_drop_fraction=0.1, lm_exact_threshold=True, audit=aud,
    )
    assert list(aud) == ["gates", "exact_dedup", "lm"]
    ids = {r["id"] for r in out.select("id").collect()}
    lm_ids = {r["id"] for r in aud["lm"].collect()}
    assert ids == lm_ids
    assert 101 not in ids          # NULL score -> dropped by the gate
    assert 100 not in ids          # the planted atypical doc is the low tail
    # exact rule: n=31 scored docs, ceil(0.1*31)=4 lowest round-6 scores
    # define the threshold; everything >= survives
    gate_n = {r["id"] for r in aud["exact_dedup"].collect()}
    assert len(gate_n) == 32 and len(ids) >= 31 - 4


def test_curate_corpus_releases_persisted_blocks(spark):
    """Unpersist discipline (VERDICT r5 wrong-#3): repeated
    curate_corpus runs with the LM stage ON must leave the DataFrame
    cache manager EMPTY — the approxQuantile persist is released once
    the gated survivors are truncated past it, so a long-lived session
    driving many funnels accumulates no cached frames.  (localCheckpoint
    blocks are RDD-level, weakly held, and reclaimed by Spark's
    ContextCleaner on GC — they never pass through the cache manager.)"""
    rows = [
        (i, "the cat sat on the mat and then the dog sat too " + f"u{i}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    cm = spark._jsparkSession.sharedState().cacheManager()
    baseline = cm.cachedData().size()  # other tests may legitimately cache
    for _ in range(2):
        out = curate_corpus(
            docs, boilerplate_min_doc_freq=None, lang=None, min_quality=None,
            max_repetition=1.0, token_bounds=(1, 5000),
            near_dup_threshold=None, lm_drop_fraction=0.1,
        )
        out.count()
        assert cm.cachedData().size() == baseline


def test_curate_corpus_dsir_stage(spark):
    """Target-directed selection inside the funnel: with a style-A
    target, DSIR keeps style-A survivors and drops style-B, the audit
    frame records the stage, and the id set is deterministic across
    repartitionings."""
    rows = []
    for i in range(30):
        rows.append((i, " ".join(f"alpha{j % 5} beta{(i + j) % 4}"
                                 for j in range(8)) + f" uniq{i}"))
    for i in range(30, 90):
        rows.append((i, " ".join(f"gamma{j % 5} delta{(i + j) % 4}"
                                 for j in range(8)) + f" uniq{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter(F.col("doc_id") < 10).select("text")

    aud = {}
    out = curate_corpus(
        docs, boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(1, 5000), near_dup_threshold=None,
        dsir_target=target, dsir_keep=20, dsir_temperature=0.05,
        dsir_num_buckets=256, audit=aud,
    )
    kept = {r["id"] for r in out.select("id").collect()}
    assert len(kept) == 20
    assert kept <= set(range(30))  # near-zero temperature: pure top-k = style A
    assert "dsir" in aud and aud["dsir"].count() == 20

    out2 = curate_corpus(
        docs.repartition(7), boilerplate_min_doc_freq=None, lang=None,
        min_quality=None, max_repetition=1.0, token_bounds=(1, 5000),
        near_dup_threshold=None,
        dsir_target=target, dsir_keep=20, dsir_temperature=0.05,
        dsir_num_buckets=256,
    )
    assert {r["id"] for r in out2.select("id").collect()} == kept

    import pytest

    with pytest.raises(ValueError):
        curate_corpus(docs, dsir_target=target)  # dsir_keep required


def test_curate_corpus_paragraph_dedup_stage(spark):
    """paragraph_dedup inside the funnel: the shared paragraph survives
    only in the first document; unique paragraphs untouched."""
    rows = [
        (0, "unique zero line with plenty of words here\nSHARED PROMO PARA"),
        (1, "SHARED PROMO PARA\nown one line with plenty of words here"),
        (2, "own two line with plenty of words here too"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(
        docs, boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(1, 5000), near_dup_threshold=None,
        paragraph_dedup=True,
    )
    texts = {r["id"]: r["text"] for r in out.collect()}
    assert "SHARED PROMO PARA" in texts[0]
    assert "SHARED PROMO PARA" not in texts[1]
    assert texts[2] == rows[2][1]


def test_curate_corpus_html_input(spark):
    docs = spark.createDataFrame(
        [(0, "<p>the quick brown fox jumps over the lazy dog and runs "
             "far away home</p><script>drop()</script>")],
        "doc_id long, text string",
    )
    out = curate_corpus(
        docs, html_input=True, boilerplate_min_doc_freq=None, lang=None,
        min_quality=None, max_repetition=1.0, token_bounds=(1, 5000),
        near_dup_threshold=None,
    ).collect()
    assert len(out) == 1
    assert "<p>" not in out[0]["text"] and "drop()" not in out[0]["text"]
    assert out[0]["text"].startswith("the quick brown fox")


def test_rag_search_document_pooling(spark):
    """rag_search pools chunk hits to documents by best chunk: a query
    made from doc 12's own chunk retrieves doc 12 at rank 1 with
    distance 0, each document appears at most once per query, and the
    duplicate-text doc (99 == doc 7's text) ties doc 7 exactly."""
    from fabstir_vectordb_spark.operators.ivf import IVFIndex
    from fabstir_vectordb_spark.pipelines import rag_ingest, rag_search

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}_{j}" for j in range(40)) + " shared tail words")
            for i in range(30)
        ]
        + [(99, " ".join(f"w7_{j}" for j in range(40)) + " shared tail words")],
        "doc_id long, text string",
    )
    ing = rag_ingest(docs, chunk_tokens=16, overlap_tokens=4,
                     embedding_dim=32).cache()
    idx = IVFIndex.fit(
        ing, n_clusters=4, seed=3, id_col="chunk_id", vector_col="embedding"
    )
    assigned = idx.assign(ing).cache()
    q = ing.filter(
        (F.col("doc_id").isin(12, 7)) & (F.col("chunk_idx") == 1)
    ).select(
        F.col("chunk_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    res = rag_search(idx, assigned, q, k_docs=5, k_chunks=16, n_probe=4)
    by_q = {}
    for r in res.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: (r["distance"], r["id"]))
        ids = [r["id"] for r in rows]
        assert len(ids) == len(set(ids)) == 5  # one row per document
    # self-retrieval: doc 12's chunk ranks doc 12 first at distance 0
    assert by_q["12#1"][0]["id"] == 12 and by_q["12#1"][0]["distance"] == 0.0
    # duplicate-text doc: 99 shares doc 7's text, so BOTH pool to
    # distance 0 for doc 7's own query — the tie is checked
    # unconditionally here
    d7 = {r["id"]: r["distance"] for r in by_q["7#1"]}
    assert d7[7] == 0.0 and d7[99] == 0.0


def test_funnel_normalize_nfc_dedups_byte_variants(spark):
    """Two documents identical modulo unicode composition and a stray
    control byte must collapse to ONE survivor when normalize_nfc is on
    (and stay two 'distinct' docs when it's off — the failure the stage
    exists to prevent)."""
    from fabstir_vectordb_spark.pipelines import curate_corpus

    body = "the quick brown fox jumps over the lazy dog caf"
    composed = body + "\u00e9"            # ...café, precomposed
    decomposed = body + "e\u0301\x01"     # ...cafe + combining + C0 byte
    docs = spark.createDataFrame(
        [(0, composed), (1, decomposed)], "doc_id long, text string"
    )
    kw = dict(
        boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(3, 5000), near_dup_threshold=None,
    )
    off = curate_corpus(docs, **kw)
    assert off.count() == 2               # byte-distinct without the stage
    on = curate_corpus(docs, normalize_nfc=True, **kw)
    rows = on.collect()
    assert [r["id"] for r in rows] == [0]  # keep-first min id survives


def test_gopher_gate_in_funnel_and_stream_parity(spark, tmp_path):
    """The gopher knob gates the batch funnel and the streaming gate
    identically: a bullet-list doc dies only when the knob is on, and
    curate_stream's verdicts equal the batch predicate doc-for-doc."""
    import json as _json

    from fabstir_vectordb_spark.pipelines import curate_corpus
    from fabstir_vectordb_spark.streaming import ingest as SI

    prose = (
        "the quick brown fox jumps over that lazy dog and it runs off "
        "with a bone to have some fun of its own be sure to watch it go"
    )
    bullets = "\n".join(["• the item of note " + str(i) for i in range(12)])
    docs = spark.createDataFrame(
        [(0, prose), (1, prose + "\n" + bullets)],
        "doc_id long, text string",
    )
    kw = dict(
        boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(1, 10_000),
        near_dup_threshold=None, cache_stages=False,
    )
    # relaxed thresholds so ONLY the bullet rule can kill doc 1
    g = {"min_words": 5, "min_required_hits": 1, "min_alpha_frac": 0.5}
    base = {r["id"] for r in curate_corpus(docs, **kw).select("id").collect()}
    gated = {
        r["id"]
        for r in curate_corpus(docs, gopher=g, **kw).select("id").collect()
    }
    assert base == {0, 1} and gated == {0}

    src = tmp_path / "gop_src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for i, text in ((0, prose), (1, prose + "\n" + bullets)):
            f.write(_json.dumps(
                {"id": str(i), "text": text,
                 "ts": f"2026-01-10T12:0{i}:00.000Z"}) + "\n")
    stream = spark.readStream.schema(
        "id string, text string, ts timestamp"
    ).json(str(src))
    q = (
        SI.curate_stream(
            stream, lang=None, min_quality=None, max_repetition=1.0,
            token_bounds=(1, 10_000), dedup_watermark=None, gopher=g,
        )
        .writeStream.format("memory").queryName("gop_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    verdicts = {
        r["id"]: (r["passed"], r["gopher"]["ok_bullet"])
        for r in spark.table("gop_stream").collect()
    }
    assert verdicts == {"0": (True, True), "1": (False, False)}


def test_gopher_repetition_gate(spark):
    """gopher_repetition drops the looping doc and keeps clean prose;
    threshold overrides work."""
    from fabstir_vectordb_spark.pipelines import curate_corpus

    clean = " ".join(f"w{i:03d}" for i in range(120))
    looping = "repeat me now " * 60
    docs = spark.createDataFrame(
        [(0, clean), (1, looping.strip())], "doc_id long, text string"
    )
    kw = dict(
        boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(1, 10_000),
        near_dup_threshold=None, cache_stages=False,
    )
    base = {r["id"] for r in curate_corpus(docs, **kw).select("id").collect()}
    gated = {
        r["id"]
        for r in curate_corpus(docs, gopher_repetition=True, **kw)
        .select("id").collect()
    }
    assert base == {0, 1} and gated == {0}
    # absurdly loose override keeps everything
    loose = {
        r["id"]
        for r in curate_corpus(
            docs,
            gopher_repetition={k: 1e9 for k in
                               __import__(
                                   "fabstir_vectordb_spark.operators.repetition",
                                   fromlist=["GOPHER_REPETITION_THRESHOLDS"],
                               ).GOPHER_REPETITION_THRESHOLDS},
            **kw,
        ).select("id").collect()
    }
    assert loose == {0, 1}


def test_c4_rules_funnel_stage(spark):
    """c4_rules drops flagged pages wholesale and line-filters the
    survivors before any later stage sees the text."""
    from fabstir_vectordb_spark.pipelines import curate_corpus

    good = (
        "This opening line has plenty of words and ends well.\n"
        "fragment without punctuation\n"
        "The second keeper line also ends with a period."
    )
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, "A fine sentence here. But lorem ipsum lurks below."),
            (2, "Code page with a brace { inside it."),
        ],
        "doc_id long, text string",
    )
    kw = dict(
        boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(1, 10_000),
        near_dup_threshold=None, cache_stages=False,
    )
    out = {
        r["id"]: r["text"]
        for r in curate_corpus(docs, c4_rules=True, **kw)
        .select("id", "text").collect()
    }
    assert set(out) == {0}
    assert out[0].split("\n") == [
        "This opening line has plenty of words and ends well.",
        "The second keeper line also ends with a period.",
    ]
