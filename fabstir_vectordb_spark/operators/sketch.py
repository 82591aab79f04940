"""Mergeable bounded-size summaries: a rank (quantile) sketch —
percentiles WITHOUT a declared grid — and a Misra-Gries frequent-items
summary — heavy hitters WITHOUT keeping the distinct-value set.

The OLAP summary algebra's ``approx_pXX`` (operators/olap.py) is
hash-exact and SQL-replayable, but it requires a FIXED grid declared
up front — out-of-range mass clamps silently to the edge buckets, so a
drifting distribution (latencies after a regression, token counts
after a tokenizer change) quietly degrades the estimate.  This module
is the no-declaration tier: a deterministic Munro-Paterson-style
buffer-collapse sketch (Manku, Rajagopalan & Lindsay, SIGMOD 1998 —
"Approximate Medians and other Quantiles in One Pass and with Limited
Memory") whose partials are small ``binary`` cells, merge is sketch
union + binary-counter collapse, and the rank error is bounded by the
collapse depth — independent of the VALUE RANGE, so drift costs
nothing.

Sketch structure: a list of weighted sorted buffers, each holding at
most ``k`` values; two buffers of equal weight COLLAPSE into one of
twice the weight by merging (2k sorted values) and keeping every
second element — the classic bound gives rank error <= L/(2k) of the
total mass, L = number of collapse levels ~ log2(n/k).  At k = 1024
and n = 10^12 that is ~1.9% of rank, any distribution, any drift.
The offset of the kept elements alternates DETERMINISTICALLY with the
collapse count (the randomized-offset variant flips a coin), so the
same input chunked the same way yields byte-identical sketches —
pinned by test, and the property suite certifies the rank bound on
adversarially drifting fixtures instead.

Spark shape — the 100 TB story:

1. :func:`sketch_partials` builds one sketch per (input batch x dims
   combo) with ``mapInPandas`` — a map-side combine written by hand,
   so the SHUFFLE CARRIES SKETCHES (k doubles each, ~8 KB), never
   rows.  This is the same partial-aggregation discipline as
   summarize()'s conditional-sum partials, with Python allowed here
   because the sketch is genuinely not expressible in Catalyst
   columns (Arrow-batched; the per-row-UDF ban stands).
2. :func:`merge_sketches` folds partials per dims combo with
   ``applyInPandas``; for extreme partial counts (10^5+ input splits
   at a tiny dims cardinality) ``fanout=`` adds one salted pre-merge
   level so no single task ever sees more than ~fanout partials.
3. :func:`sketch_quantiles` reads estimates off the merged one-row-
   per-group sketches — driver-scale data by then.

Incremental use: keep the merged sketch table per chunk, union the
binary cells, merge again — same algebra as summarize/merge_summaries.
Streaming: :func:`sketch_partials` is a STATELESS mapInPandas, so it
runs on a streaming frame as-is (append mode, no state, one cell per
micro-batch x dims combo); the merge and read-off stay batch over the
sink — the summarize_stream split, pinned stream≡batch in
tests/test_sketch.py.

The Misra-Gries tier (freq_partials / merge_freq / top_from_freq) is
the same algebra for FREQUENT ITEMS: at most k (value, weight)
counters per group per chunk, built from exact per-chunk counts by
the PODS 2012 mergeable-summaries construction (top-k, subtract the
(k+1)-th count), merged by adding shared counters and re-truncating.
Estimates never exceed true counts, the summary CARRIES its own
undercount bound ((N - kept mass)/(k+1)), and anything above the
bound is guaranteed present.  Pure Catalyst — no Python anywhere on
that path.  Chunk builds use a keyed window, so the streaming shape
is foreachBatch -> freq_partials per micro-batch -> merge_freq over
the sink (the summarize_stream split), not a direct stream transform.

Reference parity: none (the reference has no quantile or frequency
surface); extension-axis, closing VERDICT r10 "What's missing" #2.
"""

from __future__ import annotations

import re
import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "freq_partials",
    "merge_freq",
    "merge_sketches",
    "sketch_partials",
    "sketch_quantiles",
    "suggest_sketch_k",
    "top_from_freq",
]

_MAGIC = b"MP01"


# ------------------------------------------------------------------ #
# pure-numpy sketch kernel (driver- and executor-side)                #
# ------------------------------------------------------------------ #

def _sk_new(k: int) -> dict:
    return {"k": int(k), "n": 0, "collapses": 0, "bufs": []}
    # bufs: list of (weight int, np.ndarray sorted float64, len<=k)


def _sk_collapse(sk: dict) -> None:
    """Binary-counter collapse: while two FULL buffers (size == k)
    share a weight, merge-sort their 2k values and keep every second
    one, offset alternating with the collapse count (deterministic).

    Only full buffers collapse — this is the MASS INVARIANT: a
    collapse maps two (w, k) buffers (mass 2wk) to one (2w, k) buffer
    (mass 2wk), so the sketch's weighted mass equals n EXACTLY at all
    times (pinned by test).  The one undersized buffer that can exist
    is the trailing level-0 partial (maintained by _merge_weight1);
    collapsing it against a full buffer — the pre-r11 behavior — made
    odd-size collapses drift the total mass systematically above n,
    a one-sided bias on every read-off."""
    while True:
        by_w: dict[int, list[int]] = {}
        for i, (w, b) in enumerate(sk["bufs"]):
            if b.size == sk["k"]:
                by_w.setdefault(w, []).append(i)
        pair = next((ix for ix in by_w.values() if len(ix) >= 2), None)
        if pair is None:
            return
        i, j = pair[0], pair[1]
        w, a = sk["bufs"][i]
        _, b = sk["bufs"][j]
        merged = np.sort(np.concatenate([a, b]), kind="stable")
        off = sk["collapses"] & 1
        sk["collapses"] += 1
        kept = merged[off::2]
        # larger index first so the smaller stays valid
        for drop in sorted((i, j), reverse=True):
            del sk["bufs"][drop]
        sk["bufs"].append((2 * w, kept))


def _sk_update(sk: dict, values: np.ndarray) -> None:
    """Add a batch of finite float64 values (caller pre-filters
    NULL/NaN/inf)."""
    k = sk["k"]
    sk["n"] += int(values.size)
    for start in range(0, values.size, k):
        chunk = np.sort(values[start:start + k], kind="stable")
        # pad-free: an undersized level-0 buffer is allowed — it can
        # only grow by concatenation (_merge_weight1) and only FULL
        # buffers collapse (_sk_collapse), so it never distorts mass
        sk["bufs"].append((1, chunk))
        _merge_weight1(sk)
        _sk_collapse(sk)


def _merge_weight1(sk: dict) -> None:
    """Concatenate undersized weight-1 buffers so level 0 stays at
    most one partial buffer (keeps the buffer count bounded)."""
    ones = [i for i, (w, b) in enumerate(sk["bufs"])
            if w == 1 and b.size < sk["k"]]
    while len(ones) >= 2:
        i, j = ones[-2], ones[-1]
        cat = np.sort(
            np.concatenate([sk["bufs"][i][1], sk["bufs"][j][1]]),
            kind="stable",
        )
        for drop in sorted((i, j), reverse=True):
            del sk["bufs"][drop]
        if cat.size >= sk["k"]:
            sk["bufs"].append((1, cat[: sk["k"]]))
            if cat.size > sk["k"]:
                sk["bufs"].append((1, cat[sk["k"]:]))
        else:
            sk["bufs"].append((1, cat))
        ones = [i for i, (w, b) in enumerate(sk["bufs"])
                if w == 1 and b.size < sk["k"]]


def _sk_merge(a: dict, b: dict) -> dict:
    if a["k"] != b["k"]:
        raise ValueError(
            f"cannot merge sketches with different k: {a['k']} vs "
            f"{b['k']}"
        )
    out = {
        "k": a["k"],
        "n": a["n"] + b["n"],
        "collapses": a["collapses"] + b["collapses"],
        "bufs": [(w, v.copy()) for w, v in a["bufs"]]
        + [(w, v.copy()) for w, v in b["bufs"]],
    }
    _merge_weight1(out)
    _sk_collapse(out)
    return out


def _sk_quantile(sk: dict, q: float):
    """Nearest-rank read-off over the weighted union of all buffers.
    NULL (None) on an empty sketch."""
    if sk["n"] == 0 or not sk["bufs"]:
        return None
    vals = np.concatenate([b for _, b in sk["bufs"]])
    wts = np.concatenate(
        [np.full(b.size, w, dtype=np.int64) for w, b in sk["bufs"]]
    )
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    total = cum[-1]
    kr = max(1, int(np.ceil(q * total)))
    idx = int(np.searchsorted(cum, kr))
    return float(vals[min(idx, vals.size - 1)])


def _sk_dumps(sk: dict) -> bytes:
    """Compact self-describing binary: magic, k, n, collapses,
    buffer count, then (weight, length, float64 payload) per buffer.
    No pickle — the cell must be safe to persist and re-read."""
    parts = [
        _MAGIC,
        struct.pack("<qqqq", sk["k"], sk["n"], sk["collapses"],
                    len(sk["bufs"])),
    ]
    for w, b in sk["bufs"]:
        arr = np.ascontiguousarray(b, dtype="<f8")
        parts.append(struct.pack("<qq", w, arr.size))
        parts.append(arr.tobytes())
    return b"".join(parts)


def _sk_loads(raw: bytes) -> dict:
    if raw[:4] != _MAGIC:
        raise ValueError(
            "not a rank-sketch cell (bad magic); sketch columns are "
            "produced by sketch_partials/merge_sketches"
        )
    k, n, collapses, nb = struct.unpack_from("<qqqq", raw, 4)
    off = 4 + 32
    bufs = []
    for _ in range(nb):
        w, ln = struct.unpack_from("<qq", raw, off)
        off += 16
        arr = np.frombuffer(raw, dtype="<f8", count=ln, offset=off).copy()
        off += 8 * ln
        bufs.append((int(w), arr))
    return {"k": int(k), "n": int(n), "collapses": int(collapses),
            "bufs": bufs}


# ------------------------------------------------------------------ #
# Spark surface                                                       #
# ------------------------------------------------------------------ #

def _sketch_col(col: str) -> str:
    return f"__rsk_{col}"


def sketch_partials(
    df: DataFrame,
    dims: list[str],
    col: str,
    k: int = 1024,
) -> DataFrame:
    """One sketch cell per (Arrow batch x dims combo):
    (dims..., __rsk_<col> binary, __rsk_n long).  NULL, NaN and
    infinite values count nowhere (the histogram tier's rule).  The
    map-side combine means the downstream shuffle carries ~8 KB cells,
    never rows."""
    if int(k) < 16:
        raise ValueError(f"k must be >= 16; got {k}")
    if col in dims:
        raise ValueError(f"value column {col!r} cannot be a dim")
    for d in (*dims, col):
        if d not in df.columns:
            raise ValueError(f"unknown column {d!r}")
        if d.startswith("__"):
            raise ValueError(
                f"column {d!r}: the __ prefix is reserved for the "
                "sketch's internal columns"
            )
    kk = int(k)
    scol, ncol = _sketch_col(col), f"{_sketch_col(col)}_n"
    slim = df.select(*dims, F.col(col).cast("double").alias("__x"))
    fields = ", ".join(
        f"`{d}` {slim.schema[d].dataType.simpleString()}" for d in dims
    )
    out_schema = (
        (fields + ", " if fields else "")
        + f"{scol} binary, {ncol} long"
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = pdf["__x"].to_numpy(dtype="float64", na_value=np.nan)
            finite = np.isfinite(x)
            if dims:
                # group POSITIONS by the dims tuple (NaN-safe via the
                # pandas groupby dropna=False contract)
                grouped = pdf.assign(__pos=np.arange(len(pdf))).groupby(
                    list(dims), dropna=False, sort=False
                )["__pos"]
                for key, pos in grouped:
                    idx = pos.to_numpy()
                    vals = x[idx][finite[idx]]
                    sk = _sk_new(kk)
                    _sk_update(sk, vals)
                    row = {
                        d: [v]
                        for d, v in zip(
                            dims,
                            key if isinstance(key, tuple) else (key,),
                        )
                    }
                    row[scol] = [_sk_dumps(sk)]
                    row[ncol] = [sk["n"]]
                    yield pd.DataFrame(row)
            else:
                sk = _sk_new(kk)
                _sk_update(sk, x[finite])
                yield pd.DataFrame({scol: [_sk_dumps(sk)],
                                    ncol: [sk["n"]]})

    return slim.mapInPandas(kernel, out_schema)


def merge_sketches(
    partials: DataFrame,
    dims: list[str],
    col: str,
    fanout: int | None = None,
) -> DataFrame:
    """Fold partial cells to ONE sketch row per dims combo.  With
    ``fanout`` (recommended when a dims combo can hold 10^5+ partials
    — e.g. a grand-total group over a 100 TB scan), a salted pre-merge
    bounds every task's input to ~fanout cells, then the salt groups
    merge; two keyed exchanges total, both over sketch cells."""
    scol, ncol = _sketch_col(col), f"{_sketch_col(col)}_n"
    for c in (*dims, scol, ncol):
        if c not in partials.columns:
            raise ValueError(
                f"partials frame lacks column {c!r} — build it with "
                f"sketch_partials(df, {dims!r}, {col!r})"
            )

    def _merge_kernel(pdf):
        import pandas as pd

        # merge in cell-byte order: shuffle fetch order is not stable
        # across runs, sorting makes the merged sketch a pure function
        # of the partial SET (pinned by the determinism test)
        sk = None
        for raw in sorted(bytes(r) for r in pdf[scol]):
            s = _sk_loads(raw)
            sk = s if sk is None else _sk_merge(sk, s)
        head = {d: [pdf[d].iloc[0]] for d in dims}
        head[scol] = [_sk_dumps(sk)]
        head[ncol] = [sk["n"]]
        return pd.DataFrame(head)

    fields = ", ".join(
        f"`{d}` {partials.schema[d].dataType.simpleString()}"
        for d in dims
    )
    out_schema = (
        (fields + ", " if fields else "")
        + f"{scol} binary, {ncol} long"
    )
    src = partials
    if fanout is not None:
        if int(fanout) < 2:
            raise ValueError(f"fanout must be >= 2; got {fanout}")
        salt = F.abs(F.xxhash64(scol)) % int(fanout)
        src = (
            src.withColumn("__salt", salt)
            .groupBy(*dims, "__salt")
            .applyInPandas(_merge_kernel, out_schema)
        )
    if dims:
        return src.groupBy(*dims).applyInPandas(_merge_kernel, out_schema)
    return src.groupBy(F.lit(1).alias("__g")).applyInPandas(
        _merge_kernel, out_schema
    )


def sketch_quantiles(
    merged: DataFrame,
    dims: list[str],
    col: str,
    qs: dict[str, float],
) -> DataFrame:
    """Read estimates off merged sketch rows: (dims..., n, <name> per
    requested quantile).  Runs over one row per dims combo — report-
    scale data, Arrow-batched."""
    scol, ncol = _sketch_col(col), f"{_sketch_col(col)}_n"
    for c in (*dims, scol, ncol):
        if c not in merged.columns:
            raise ValueError(f"merged frame lacks column {c!r}")
    if "n" in dims:
        raise ValueError(
            "dim 'n' collides with the output total column — rename "
            "the dimension first"
        )
    if not qs:
        raise ValueError("qs must name at least one quantile")
    for name, q in qs.items():
        if not 0.0 < float(q) <= 1.0:
            raise ValueError(f"quantile {name!r}: need 0 < q <= 1; got {q}")
        if not re.fullmatch(r"[A-Za-z_]\w*", name):
            raise ValueError(
                f"quantile name {name!r}: simple identifier names only "
                "(it becomes an output column)"
            )
        if name == "n" or name in dims:
            raise ValueError(
                f"quantile name {name!r} collides with the output `n` "
                "column or a dim — pick another name"
            )
    names = list(qs)
    fields = ", ".join(
        f"`{d}` {merged.schema[d].dataType.simpleString()}" for d in dims
    )
    out_schema = (
        (fields + ", " if fields else "")
        + "n long, "
        + ", ".join(f"{n} double" for n in names)
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            # positional lists below must align with the Series —
            # normalize the index first
            pdf = pdf.reset_index(drop=True)
            rows = {d: pdf[d] for d in dims}
            rows["n"] = pdf[ncol]
            ests = {n: [] for n in names}
            for raw in pdf[scol]:
                sk = _sk_loads(bytes(raw))
                for n in names:
                    ests[n].append(_sk_quantile(sk, float(qs[n])))
            for n in names:
                rows[n] = pd.Series(ests[n], dtype="float64")
            yield pd.DataFrame(rows)

    return merged.mapInPandas(kernel, out_schema)


# ------------------------------------------------------------------ #
# Misra-Gries frequent items (mergeable, bounded summary)             #
# ------------------------------------------------------------------ #

def _mg_col(col: str, k: int) -> str:
    return f"__mg_{col}__k{k}"


def _mg_ncol(col: str, k: int) -> str:
    return f"{_mg_col(col, k)}_n"


def _mg_truncate(counts, dims, k: int):
    """Exact per-group counts -> a Misra-Gries summary of at most
    ``k`` counters: keep the top k by (count DESC, value ASC) and
    subtract the (k+1)-th count from each (Agarwal, Cormode et al.,
    "Mergeable Summaries", PODS 2012 §3.1 — computing MG(S) from
    exact counts; the subtraction is what makes the summary closed
    under merging).  Counters that reach zero drop."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*[F.col(d) for d in dims]).orderBy(
        F.col("__c").desc(), F.col("__v").asc()
    )
    ranked = counts.withColumn("__rn", F.row_number().over(w))
    kth1 = F.max(
        F.when(F.col("__rn") == k + 1, F.col("__c"))
    ).over(Window.partitionBy(*[F.col(d) for d in dims]))
    return (
        ranked.withColumn(
            "__w", F.col("__c") - F.coalesce(kth1, F.lit(0))
        )
        .filter((F.col("__rn") <= k) & (F.col("__w") > 0))
        .select(*dims, "__v", "__w")
    )


def freq_partials(
    chunk: DataFrame,
    dims: list[str],
    value_col: str,
    k: int = 256,
    fanout: int | None = None,
) -> DataFrame:
    """Mergeable FREQUENT-ITEMS summary per group (Misra-Gries): at
    most ``k`` (value, weight) counters + the group's exact row total,
    as ONE row per group — the bounded-size sibling of the exact
    ``top_values_from_summary`` tier, for UNBOUNDED value cardinality
    (frequent hostnames / tokens / URLs over 100 TB, where keeping
    every distinct value in the summary is the memory hazard the
    exact tier's docs warn about).

    Guarantees (classic MG, preserved under merging): estimates never
    exceed true counts; the undercount is at most (N - sum of kept
    weights) / (k + 1), a bound the summary itself carries; every
    value with true frequency above that bound is PRESENT.  NULL
    values count nowhere.

    Scale shape: one exact groupBy per CHUNK (partial-aggregated
    map-side), one keyed window over the chunk's distinct values,
    then <= k counters per group cross the summary boundary.  The
    window partitions by the dims, so ONE group's whole distinct set
    sorts in one task — with empty dims (a global summary) or a hot
    group at extreme cardinality, pass ``fanout``: values pre-truncate
    per (dims, hash(value) % fanout) first — each value's exact count
    stays whole inside its salt, per-salt summaries are MG summaries
    of disjoint sub-multisets, and the final truncate folds <= k x
    fanout counters, so no task ever sorts more than its salt's
    distinct values.  The carried undercount bound stays valid (it is
    computed from kept mass, and the PODS 2012 merge theorem covers
    any partition of the multiset).

    Output: (dims..., __mg_<col>__k<k> array<struct<v string,
    w bigint>>, __mg_<col>__k<k>_n bigint)."""
    if int(k) < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    for d in (*dims, value_col):
        if d not in chunk.columns:
            raise ValueError(f"unknown column {d!r}")
        if d.startswith("__"):
            raise ValueError(
                f"column {d!r}: the __ prefix is reserved"
            )
    if value_col in dims:
        raise ValueError(f"value column {value_col!r} cannot be a dim")
    kk = int(k)
    slim = chunk.filter(F.col(value_col).isNotNull()).select(
        *dims, F.col(value_col).cast("string").alias("__v")
    )
    counts = slim.groupBy(*dims, "__v").agg(
        F.count(F.lit(1)).alias("__c")
    )
    if fanout is not None:
        if int(fanout) < 2:
            raise ValueError(f"fanout must be >= 2; got {fanout}")
        # value-hash salt: each value's exact count stays whole in one
        # salt, so the per-salt truncation sees true counts
        salted = counts.withColumn(
            "__salt", F.abs(F.xxhash64("__v")) % int(fanout)
        )
        pre = _mg_truncate(
            salted, [*dims, "__salt"], kk
        ).withColumnRenamed("__w", "__c").drop("__salt")
        summary = _mg_truncate(pre, dims, kk)
    else:
        summary = _mg_truncate(counts, dims, kk)
    scol, ncol = _mg_col(value_col, kk), _mg_ncol(value_col, kk)
    arr = summary.groupBy(*dims).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("__v").alias("v"), F.col("__w").alias("w"))
            )
        ).alias(scol)
    )
    # totals derive from the ALREADY-aggregated counts frame (every
    # non-null row landed in exactly one (dims, __v) count), not from
    # a second scan of the raw chunk
    totals = counts.groupBy(*dims).agg(F.sum("__c").alias(ncol))
    return _ns_left_join(totals, arr, dims).withColumn(
        scol,
        F.coalesce(
            F.col(scol),
            F.array().cast("array<struct<v string, w bigint>>"),
        ),
    )


def _ns_left_join(left: DataFrame, right: DataFrame, dims: list[str]):
    """LEFT join on the dims with NULL-SAFE equality — a plain
    equality join silently drops groups whose key is NULL (NULL !=
    NULL), which groupBy happily produced one row for.  Empty dims =
    both sides are single global rows: cross join."""
    if not dims:
        return left.crossJoin(right)
    cond = None
    for d in dims:
        c = left[d].eqNullSafe(right[d])
        cond = c if cond is None else cond & c
    joined = left.join(right, cond, "left")
    return joined.select(
        *[left[d] for d in dims],
        *[left[c] for c in left.columns if c not in dims],
        *[right[c] for c in right.columns if c not in dims],
    )


def merge_freq(*partials: DataFrame) -> DataFrame:
    """Fold frequent-items partials to one summary row per group:
    shared values' weights ADD, then the union re-truncates to k
    counters with the same subtraction rule — exactly the PODS 2012
    MG merge, so the error bound (N - sum weights)/(k+1) holds over
    the union.  k is read from the partial column name; mixed-k
    inputs fail loudly."""
    if not partials:
        raise ValueError("merge_freq needs at least one partials frame")
    cols = set()
    for p in partials:
        cols.update(
            c for c in p.columns
            if c.startswith("__mg_") and not c.endswith("_n")
        )
    if len(cols) != 1:
        raise ValueError(
            f"expected exactly one __mg_<col>__k<k> partial column "
            f"across inputs; got {sorted(cols)}"
        )
    scol = cols.pop()
    ncol = f"{scol}_n"
    k = int(scol.rsplit("__k", 1)[1])
    u = partials[0]
    for p in partials[1:]:
        u = u.unionByName(p)
    dims = [c for c in u.columns if c not in (scol, ncol)]
    counts = (
        u.select(*dims, F.explode(scol).alias("__e"))
        .groupBy(*dims, F.col("__e.v").alias("__v"))
        .agg(F.sum("__e.w").alias("__c"))
    )
    merged = _mg_truncate(counts, dims, k)
    arr = merged.groupBy(*dims).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("__v").alias("v"), F.col("__w").alias("w"))
            )
        ).alias(scol)
    )
    totals = u.groupBy(*dims).agg(F.sum(ncol).alias(ncol))
    return _ns_left_join(totals, arr, dims).withColumn(
        scol,
        F.coalesce(
            F.col(scol),
            F.array().cast("array<struct<v string, w bigint>>"),
        ),
    )


def top_from_freq(merged: DataFrame, top: int = 10) -> DataFrame:
    """Read the heavy hitters off a merged summary: (dims..., value,
    est bigint, max_undercount bigint, rank) — ``est <= true count <=
    est + max_undercount`` (the MG guarantee), ranked by (est DESC,
    value ASC).  Values whose true frequency exceeds max_undercount
    are guaranteed present.  The COUNT BOUND is the contract, not the
    ordering: values whose true counts differ by less than the bound
    can rank-permute relative to their exact order (measured at the
    50M-row datum, PERFORMANCE.md §Round 11) — use the exact
    ``top_values_from_summary`` tier when near-tie order matters and
    the cardinality permits storing it."""
    if top < 1:
        raise ValueError(f"top must be >= 1; got {top}")
    from pyspark.sql.window import Window

    scol = next(
        (c for c in merged.columns
         if c.startswith("__mg_") and not c.endswith("_n")),
        None,
    )
    if scol is None:
        raise ValueError(
            "frame lacks a __mg_<col>__k<k> partial column — build it "
            "with freq_partials / merge_freq"
        )
    ncol = f"{scol}_n"
    k = int(scol.rsplit("__k", 1)[1])
    dims = [c for c in merged.columns if c not in (scol, ncol)]
    kept_mass = F.aggregate(
        F.col(scol), F.lit(0).cast("bigint"), lambda a, x: a + x["w"]
    )
    rows = merged.select(
        *dims,
        F.col(ncol).alias("__n"),
        F.floor(
            (F.col(ncol) - kept_mass).cast("double") / (k + 1)
        ).cast("bigint").alias("max_undercount"),
        F.explode(scol).alias("__e"),
    )
    flat = rows.select(
        *dims,
        F.col("__e.v").alias("value"),
        F.col("__e.w").alias("est"),
        "max_undercount",
    )
    rank = F.row_number().over(
        Window.partitionBy(*[F.col(d) for d in dims]).orderBy(
            F.col("est").desc(), F.col("value").asc()
        )
    )
    return flat.withColumn("rank", rank).filter(F.col("rank") <= top)


def suggest_sketch_k(
    target_rank_error: float = 0.01,
    n_estimate: float = 1e12,
) -> int:
    """One-call k sizing for :func:`sketch_partials` (the
    ``suggest_grid`` convention): smallest power-of-two buffer size
    whose heuristic bound L/(2k) — L = collapse levels ~ log2(n/k) —
    meets ``target_rank_error`` at ``n_estimate`` values.  The bound
    is the module docstring's planning heuristic, deliberately
    conservative next to the property-tested behavior (observed error
    runs well under it); cell size scales linearly with k (~8 bytes a
    slot), so doubling precision doubles the shuffle payload."""
    if not 0 < target_rank_error < 1:
        raise ValueError(
            f"target_rank_error must be in (0, 1); got {target_rank_error}"
        )
    if n_estimate < 1:
        raise ValueError(f"n_estimate must be >= 1; got {n_estimate}")
    import math

    k = 16
    while k < 2**26:
        levels = max(1.0, math.log2(max(2.0, n_estimate / k)))
        if levels / (2 * k) <= target_rank_error:
            return k
        k *= 2
    return k
