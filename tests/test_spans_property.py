"""Property-based repeated-span tests: for ANY small corpus over a tiny
alphabet (so window collisions actually happen) and any window length,
the distributed operator must reproduce a pure-Python reference that
enumerates windows, counts occurrences, and merges overlaps — and the
trim variant must remove exactly the flagged token positions."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fabstir_vectordb_spark.operators.dedup import (
    duplicated_spans,
    remove_duplicated_spans,
)


def _reference(texts: list[str], L: int, min_occ: int = 2):
    toks = {i: t.split() for i, t in enumerate(texts)}
    counts = Counter()
    for ts in toks.values():
        for p in range(len(ts) - L + 1):
            counts[" ".join(ts[p : p + L])] += 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for p in range(len(ts) - L + 1):
            if counts[" ".join(ts[p : p + L])] >= min_occ:
                covered.update(range(p, p + L))
        spans = 0
        prev = -2
        for p in sorted(covered):
            if p != prev + 1:
                spans += 1
            prev = p
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (len(ts), len(covered), spans, " ".join(kept))
    return out


# single-space-joined words over a 2-letter alphabet: heavy collisions
_word = st.text(alphabet="ab", min_size=1, max_size=2)
_text = st.lists(_word, min_size=0, max_size=25).map(" ".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_text, min_size=1, max_size=12),
    L=st.integers(min_value=1, max_value=6),
)
def test_spans_match_reference(spark, texts, L):
    ref = _reference(texts, L)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_tokens"], r["dup_tokens"], r["n_dup_spans"])
        for r in duplicated_spans(docs, span_tokens=L).collect()
    }
    trimmed = {
        r["id"]: r["clean_text"]
        for r in remove_duplicated_spans(docs, span_tokens=L).collect()
    }
    for i, (n, dup, spans, kept) in ref.items():
        # note: ''.split() == [] but Spark's split('') == [''] — reference
        # uses .split() so skip the empty-text token-count comparison and
        # check the duplication outputs, which agree (the operator
        # explicitly emits no windows for whitespace-only docs)
        if texts[i].strip():
            assert got[i] == (n, dup, spans), (i, texts[i])
            assert trimmed[i] == kept, (i, texts[i])
        else:
            assert got[i][1] == 0 and got[i][2] == 0


def _para_reference(texts: list[str]):
    """Pure-Python keep-first paragraph dedup (normalized fingerprint =
    lowercase + whitespace-collapse + trim; empty paragraphs never
    fingerprinted)."""
    seen = set()
    out = {}
    for i, t in enumerate(texts):
        paras = t.split("\n")
        kept = []
        removed = 0
        for p in paras:
            norm = " ".join(p.lower().split())
            if norm == "":
                kept.append(p)
                continue
            if norm in seen:
                removed += 1
            else:
                seen.add(norm)
                kept.append(p)
        out[i] = ("\n".join(kept), len(kept), removed)
    return out


# mixed-case words plus whitespace-only paragraph candidates, so the
# property exercises BOTH the lowercase/collapse normalization and the
# whitespace-only-is-structure gate (a tab-only paragraph must never
# be fingerprinted or removed)
_pword = st.text(alphabet="abAB", min_size=1, max_size=2)
_para = st.one_of(
    st.just("\t"),
    st.just(" "),
    st.lists(_pword, min_size=0, max_size=4).map(" ".join),
)
_ptext = st.lists(_para, min_size=1, max_size=5).map("\n".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_ptext, min_size=1, max_size=8))
def test_paragraph_dedup_matches_reference(spark, texts):
    from fabstir_vectordb_spark.operators.dedup import dedup_paragraphs

    ref = _para_reference(texts)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["id"]: (r["clean_text"], r["kept_paras"], r["removed_paras"])
        for r in dedup_paragraphs(docs).collect()
    }
    assert got == ref
