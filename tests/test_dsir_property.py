"""Property-based DSIR tests: for ANY small corpus over a tiny
alphabet and any (n, num_buckets, k) knobs, the distributed
fit/score/select pipeline must reproduce a pure-Python reference that
hashes n-grams with the same md5 arithmetic, fits the same smoothed
models, and ranks the same Gumbel keys."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fabstir_vectordb_spark.operators.dsir import (
    dsir_score,
    dsir_select,
    fit_dsir_ratios,
)


def _md5_int(value: str, salt: str) -> int:
    return int(hashlib.md5(f"{value}|{salt}".encode()).hexdigest()[:8], 16)


def _reference(texts, target_ids, n, B, k, temperature, k_keep):
    """Pure-Python DSIR over (doc_id -> text): returns
    {doc_id: (score | None, key | None, selected)}."""
    grams = {}
    for i, t in texts.items():
        ts = t.split()
        grams[i] = [
            " ".join(ts[p : p + n]) for p in range(len(ts) - n + 1)
        ]
    bucket = lambda g: _md5_int(g, "dsir") % B  # noqa: E731
    tc = [0] * B
    rc = [0] * B
    for i, gs in grams.items():
        for g in gs:
            rc[bucket(g)] += 1
            if i in target_ids:
                tc[bucket(g)] += 1
    tt, rt = sum(tc), sum(rc)
    lr = [
        math.log((tc[b] + k) / (tt + k * B))
        - math.log((rc[b] + k) / (rt + k * B))
        for b in range(B)
    ]
    out = {}
    for i, gs in grams.items():
        if not gs:
            out[i] = (None, None, False)
            continue
        s = sum(lr[bucket(g)] for g in gs) / len(gs)
        u = (_md5_int(str(i), "gum") % (1 << 24) + 0.5) / float(1 << 24)
        key = s / temperature + (-math.log(-math.log(u)))
        out[i] = (s, key, None)
    # HALF_UP like Spark's F.round (BigDecimal of Double.toString) —
    # Python's bankers' round() could flip a boundary tie the other way
    def _r6(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    ranked = sorted(
        (i for i in out if out[i][1] is not None),
        key=lambda i: (-_r6(out[i][1]), i),
    )
    chosen = set(ranked[:k_keep])
    return {
        i: (s, key, (i in chosen) if key is not None else False)
        for i, (s, key, _) in out.items()
    }


_word = st.text(alphabet="ab", min_size=1, max_size=2)
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_text, min_size=2, max_size=10),
    n=st.integers(min_value=1, max_value=3),
    B=st.sampled_from([8, 32]),
    k_keep=st.integers(min_value=0, max_value=6),
)
def test_dsir_matches_reference(spark, texts, n, B, k_keep):
    tmap = dict(enumerate(texts))
    target_ids = {i for i in tmap if i % 2 == 0}
    ref = _reference(tmap, target_ids, n, B, k=0.5, temperature=2.0,
                     k_keep=k_keep)

    docs = spark.createDataFrame(
        list(tmap.items()), "doc_id long, text string"
    )
    target = docs.filter("doc_id % 2 = 0")
    ratios = fit_dsir_ratios(target, docs, n=n, num_buckets=B, k=0.5)
    got = {
        r["id"]: (r["dsir_score"], r["dsir_key"], r["selected"])
        for r in dsir_select(
            dsir_score(docs, ratios, n=n, num_buckets=B),
            k_keep=k_keep, temperature=2.0,
        ).collect()
    }
    assert set(got) == set(ref)
    for i, (s, key, sel) in ref.items():
        gs, gk, gsel = got[i]
        if s is None:
            assert gs is None and gk is None and gsel is False, (i, texts[i])
        else:
            assert abs(gs - s) < 1e-9, (i, texts[i])
            assert abs(gk - key) < 1e-9, (i, texts[i])
            assert gsel == sel, (i, texts[i])
