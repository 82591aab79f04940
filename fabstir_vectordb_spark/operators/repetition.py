"""Gopher repetition signals (Rae et al. 2021, Appendix A1.2 — the
"repetitious text" filter family, also shipped by datatrove/NeMo-Curator
as the GopherRepetitionFilter): per-document duplicate-line and
duplicate-paragraph fractions, top-n-gram character fractions, and
duplicated-n-gram character fractions.

These complement the single ``repetition_ratio_from`` signal
(functions/text.py — distinct/total 3-grams): the A1.2 family measures
WHERE the repetition mass sits (lines vs paragraphs vs short vs long
n-grams), which is what the paper actually thresholds.

Definitions (documented variant — chosen to be exactly replayable in
SQL, which positional overlap-marking is not):

  dup_line_frac        lines whose exact text occurs >1x in the doc
                       / total lines
  dup_line_char_frac   characters of those lines / characters of all
                       lines
  dup_para_frac /      same over paragraphs (split on blank lines)
  dup_para_char_frac
  top_{n}gram_char_frac   occurrences(most frequent word n-gram) *
                       charlen(that gram) / len(text); ties on count
                       break lexicographically on the gram so every
                       engine picks the same winner
  dup_{n}gram_char_frac   sum over grams occurring >1x of
                       occurrences * charlen(gram) / len(text) —
                       OVERLAPPING char mass (may exceed 1 for
                       pathological docs); monotone in repetition, so
                       thresholding semantics are preserved

Paper thresholds for reference (drop when above): dup_line 0.30,
dup_para 0.30, dup_line_char 0.20, dup_para_char 0.20, top 2/3/4-gram
0.20/0.18/0.16, dup 5..10-gram 0.15/0.14/0.13/0.12/0.11/0.10.

Scale shape: ONE Arrow-batched mapInPandas pass, map-only — no shuffle,
no state; per-doc cost is O(tokens * |ns|) with a hash counter.  The
whole family is certified hash-exact in the text_stats driver row
(planted duplicated lines/paragraphs; DuckDB replays the counting with
unnest + GROUP BY — an independent implementation of the same
definitions).

Reference parity: none (no text surface in the reference);
extension-axis next to operators/dedup.py's corpus-level family.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "repetition_signals",
    "with_repetition_signals",
    "GOPHER_REPETITION_THRESHOLDS",
]

GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _dup_fracs(units: list[str]) -> tuple[float, float]:
    """(fraction of units whose value repeats, fraction of their chars)."""
    if not units:
        return 0.0, 0.0
    counts = Counter(units)
    dup_n = sum(c for c in counts.values() if c > 1)
    total_chars = sum(len(u) for u in units)
    dup_chars = sum(len(u) * c for u, c in counts.items() if c > 1)
    return (
        dup_n / len(units),
        (dup_chars / total_chars) if total_chars else 0.0,
    )


def _signal_names(
    top_ns: tuple[int, ...], dup_ns: tuple[int, ...]
) -> list[str]:
    names = ["dup_line_frac", "dup_line_char_frac",
             "dup_para_frac", "dup_para_char_frac"]
    names += [f"top_{n}gram_char_frac" for n in top_ns]
    names += [f"dup_{n}gram_char_frac" for n in dup_ns]
    return names


def _doc_signals(
    text: str | None,
    top_ns: tuple[int, ...],
    dup_ns: tuple[int, ...],
) -> list[float]:
    """All A1.2 signal values for one document, in _signal_names order."""
    text = text or ""
    # whitespace semantics are pinned to the DuckDB oracle's:
    # blank-unit filter = trim() (SPACES only, so a tab-only
    # line is a unit), splits = RE2 \s = [\t\n\f\r ] (ASCII —
    # \xa0 and other Unicode whitespace are word characters)
    lines = [l for l in text.split("\n") if l.strip(" ")]
    paras = [
        p for p in re.split(r"\n[\t\n\f\r ]*\n", text) if p.strip(" ")
    ]
    lf, lcf = _dup_fracs(lines)
    pf, pcf = _dup_fracs(paras)
    words = [w for w in re.split(r"[\t\n\f\r ]+", text) if w]
    L = len(text)
    rec = [lf, lcf, pf, pcf]
    for n in top_ns:
        grams = [
            " ".join(words[i:i + n]) for i in range(len(words) - n + 1)
        ]
        if grams and L:
            counts = Counter(grams)
            m = max(counts.values())
            # deterministic winner: max count, then max gram
            top = max(g for g, c in counts.items() if c == m)
            rec.append(m * len(top) / L)
        else:
            rec.append(0.0)
    for n in dup_ns:
        grams = [
            " ".join(words[i:i + n]) for i in range(len(words) - n + 1)
        ]
        if grams and L:
            counts = Counter(grams)
            mass = sum(len(g) * c for g, c in counts.items() if c > 1)
            rec.append(mass / L)
        else:
            rec.append(0.0)
    return rec


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """(id, <signal columns>) — one row per input document; column names
    match GOPHER_REPETITION_THRESHOLDS (for the default ns)."""
    id_type = df.schema[id_col].dataType
    names = _signal_names(top_ns, dup_ns)
    fields = [T.StructField("id", id_type, False)]
    fields += [T.StructField(c, T.DoubleType(), False) for c in names]
    schema = T.StructType(fields)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = [
                [did, *_doc_signals(text, top_ns, dup_ns)]
                for did, text in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(rows, columns=["id"] + names)

    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def with_repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """All input columns plus the A1.2 signal columns — the passthrough
    twin of :func:`repetition_signals` for pipelines that cannot join a
    signal table back (a STREAM cannot stream-stream join its own
    derivative; the batch funnel's join-back stage needs a barrier).
    Same kernel, same map-only plan shape, streaming-safe (stateless)."""
    names = _signal_names(top_ns, dup_ns)
    clash = set(names) & set(df.columns)
    if clash:
        raise ValueError(
            f"input already carries signal columns {sorted(clash)}"
        )
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(c, T.DoubleType(), False) for c in names]
    )

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            sig = pd.DataFrame(
                [_doc_signals(t, top_ns, dup_ns) for t in pdf[text_col]],
                columns=names,
                index=pdf.index,
            )
            yield pd.concat([pdf, sig], axis=1)

    return df.mapInPandas(kernel, schema)
