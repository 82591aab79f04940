"""Hierarchical corpus reporting: ROLLUP / CUBE / GROUPING SETS with a
two-phase plan that survives 100 TB.

``grouped_report`` is the standard "corpus report card" over a
training-data table — documents by (lang, source), tokens by
(source, quality band), with subtotals and a grand total — expressed
through Spark's native multi-dimensional aggregates.

**Why a wrapper exists at all: the Expand blow-up.** Spark implements
rollup/cube/grouping-sets with an ``Expand`` node that replicates
EVERY input row once per grouping set — a CUBE over d dimensions
replicates the full scan 2^d times BEFORE the shuffle's partial
aggregation sees it.  At 100 TB that is the difference between a
report and an outage.  The fix is classical two-phase aggregation:

  phase 1  ``groupBy(all dims)`` — ONE exact pass, partial-aggregated
           map-side; output is one row per distinct dimension combo
           (thousands), not per input row (billions).
  phase 2  rollup/cube/grouping-sets over the COMPACT phase-1 frame,
           re-aggregating the partials (sum of sums, sum of counts,
           min of mins, ...).  Expand now replicates thousands of
           rows, not the scan.

The rewrite is only sound for DECOMPOSABLE measures, so measures are
declared as (fn, column) specs — count/sum/min/max re-aggregate as
themselves and avg is derived as sum/count at the end — rather than
free-form aggregate expressions the wrapper could not legally split.
``pre_aggregate=False`` keeps the direct single-pass plan (fine when
the input is already small, e.g. an upstream aggregate).

Distinct counting, the corpus-report measure (distinct users per
cell, distinct source domains per language):

- ``count_distinct`` is EXACT but not decomposable — a phase-1 row
  per dim combo cannot re-derive cross-combo distinctness — so it is
  only legal with ``pre_aggregate=False`` (a clear error otherwise,
  naming the alternative).
- ``approx_distinct`` is the scale path: Apache DataSketches HLL
  (``hll_sketch_agg``/``hll_union_agg``, the standard mergeable
  sketch).  Phase 1 builds one sketch per dim combo, phase 2 UNIONS
  sketches — set-union semantics, so the estimate is a deterministic
  function of the underlying value SET, and the two-phase and direct
  plans return the IDENTICAL estimate (tested), not merely close
  ones.  Default ~1.6% relative error (lgConfigK=12).
- ``exact_distinct`` (round 10) is the mergeable EXACT middle path
  for bounded cardinalities: the partial is ``collect_set`` under a
  declared cap (opts ``{'cap': N}``, default 100k), merging is array
  union, and the plan ERRORS LOUDLY the moment any cell's set exceeds
  the cap (naming approx_distinct) rather than degrading silently —
  so low-cardinality dims (suppliers per cell, domains per language)
  get exact distinct counts in the incremental algebra.  In the
  direct plan it IS count_distinct (no set materializes).

Percentiles, the other non-decomposable report measure:

- ``p50/p90/p99`` are EXACT interpolated percentiles
  (percentile_cont) — direct-plan only, like count_distinct.
- ``approx_p50/p90/p99`` (round 10) are the mergeable path: the
  partial is a FIXED-GRID bucket-count histogram (opts ``{'lo', 'hi'
  [, 'buckets': 128]}`` — the grid must be declared, not data-derived,
  or chunks could not merge), an ``array<bigint>`` of per-bucket
  counts.  Counts are exact longs, so chunked summaries merge to the
  one-shot histogram BIT-IDENTICALLY and the estimate — nearest-rank
  bucket with in-bucket linear interpolation, a pure column fold —
  is IDENTICAL in the direct, two-phase, and incremental plans
  (driver-certified).  Accuracy: within one bucket width
  ``(hi-lo)/buckets`` of the exact nearest-rank percentile for
  in-range data (pinned by test); out-of-range values clamp to the
  edge buckets.  This is what makes latency/size percentiles
  REFRESHABLE like every other measure at 100 TB.  Cost note: the
  corpus pass evaluates one conditional sum per bucket per row, so
  phase-1 compute scales with ``buckets`` — measured ~6x a plain
  count at 128 buckets (10M rows x 2 histograms in 2.4 s on
  local[32]); at extreme scale prefer 64 buckets (the error bound
  loosens proportionally) over narrowing the grid.

Each dimension also emits ``g_<dim>`` = ``grouping(dim)`` (1 when the
row aggregates over that dimension, 0 when it holds a real value), the
only reliable way to tell a subtotal row from a genuine NULL dimension
value — the SQL-standard GROUPING() marker, same bit meaning as
DuckDB's.

**Incremental maintenance** (``summarize`` / ``merge_summaries`` /
``report_from_summary``): the phase-1 frame is itself a mergeable
artifact — a MATERIALIZED SUMMARY.  ``summarize`` builds it,
``merge_summaries`` folds a new chunk's summary into an existing one
(union + one re-aggregate over compact frames — each partial column
carries its own merge rule in its name), and ``report_from_summary``
is phase 2 alone.  The contract, pinned by test:

    report_from_summary(merge_summaries(summarize(A), summarize(B)))
        == grouped_report(A UNION B)

so a 100 TB corpus report refreshes by summarizing ONLY the newly
arrived partition and merging — the same incremental pattern as
sources/ledger.py's dedup ledger, for aggregates.  The algebra is
APPEND-ONLY: count/sum could retract, but min/max/HLL cannot, so
deletes mean re-summarizing the affected chunk (keep per-chunk
summaries and merge at report time when retraction matters).
Summation order differs between the incremental and one-shot paths,
so float sums agree only to ulp — exact types (counts, longs,
decimals) are bit-identical; round floats at the report edge.

Reference parity: none (the reference has no OLAP surface);
extension-axis with operators/stats.py's grouped statistics.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "grouped_report",
    "hist_partial",
    "hist_quantile",
    "merge_summaries",
    "report_from_summary",
    "suggest_grid",
    "summarize",
    "top_values",
    "top_values_from_summary",
]

_FNS = ("count", "sum", "min", "max", "avg", "count_distinct",
        "approx_distinct", "p50", "p90", "p99",
        "approx_p50", "approx_p90", "approx_p99", "exact_distinct")

# exact interpolated percentiles (SQL percentile_cont semantics) — the
# report-card latency/size measures.  Like count_distinct they are NOT
# decomposable (a phase-1 row per dim combo cannot re-derive the full
# value distribution), so they are direct-plan only; the refusal names
# the alternatives
_PCTL = {"p50": 0.5, "p90": 0.9, "p99": 0.99}

# MERGEABLE percentile estimates (round 10): a fixed-grid bucket-count
# histogram is the decomposable partial — counts are exact longs, so
# merging chunks reproduces the one-shot histogram BIT-IDENTICALLY and
# the estimate is a deterministic function of it: incremental ==
# two-phase == direct, exactly (pinned by test and driver part).  The
# estimate is the nearest-rank bucket read-off with in-bucket linear
# interpolation; for data inside [lo, hi) the error vs the exact
# nearest-rank percentile is < one bucket width (hi - lo) / buckets
# (pinned).  Values outside clamp to the edge buckets (the estimate
# then degrades toward lo/hi — widen the grid, it is a declared knob).
_APCTL = {"approx_p50": 0.5, "approx_p90": 0.9, "approx_p99": 0.99}

_EXACT_DISTINCT_DEFAULT_CAP = 100_000
_HIST_DEFAULT_BUCKETS = 128


def _norm_spec(name: str, spec) -> tuple[str, str | None, dict]:
    """Measure specs are (fn, col) or (fn, col, opts-dict)."""
    if len(spec) == 2:
        fn, col = spec
        opts: dict = {}
    elif len(spec) == 3:
        fn, col, opts = spec
        if not isinstance(opts, dict):
            raise ValueError(
                f"measure {name!r}: third spec element must be an "
                f"options dict; got {type(opts).__name__}"
            )
    else:
        raise ValueError(
            f"measure {name!r}: spec must be (fn, col) or (fn, col, opts)"
        )
    return fn, col, opts


def _f2s(x: float) -> str:
    """Float -> parquet-safe column-name token (reversible)."""
    return (
        repr(float(x)).replace("-", "m").replace("+", "")
        .replace(".", "p").replace("e", "E")
    )


def _hist_key(col: str, lo: float, hi: float, n: int) -> str:
    """Partial column name for a histogram; encoding the grid makes
    merge_summaries' schema-equality check catch grid mismatches."""
    return f"__hist_{col}__lo{_f2s(lo)}_hi{_f2s(hi)}_n{n}"


def _set_key(col: str, cap: int) -> str:
    return f"__set_{col}__cap{cap}"


def _hist_grid(name: str, opts: dict) -> tuple[float, float, int]:
    if "lo" not in opts or "hi" not in opts:
        raise ValueError(
            f"measure {name!r}: approx percentiles need a FIXED grid "
            "declared up front — opts {'lo': ..., 'hi': ...[, "
            "'buckets': ...]} — because mergeability requires every "
            "chunk to bucket identically (a data-derived grid would "
            "differ per chunk and the partials could not merge)"
        )
    lo, hi = float(opts["lo"]), float(opts["hi"])
    n = int(opts.get("buckets", _HIST_DEFAULT_BUCKETS))
    if not hi > lo:
        raise ValueError(f"measure {name!r}: need hi > lo; got [{lo}, {hi})")
    if n < 2:
        raise ValueError(f"measure {name!r}: need buckets >= 2; got {n}")
    return lo, hi, n


def _hist_partial(col: str, lo: float, hi: float, n: int):
    """The mergeable histogram partial: array<bigint> of per-bucket
    counts over the fixed grid.  One bucket expression per row, n
    conditional sums (pure codegen aggregates — partial aggregation
    compacts map-side, so the shuffle carries one n-slot array per
    group, never rows).  NULLs and NaNs count nowhere (NaN passes an
    IS NOT NULL filter and its bucket cast would land in bucket 0 in
    non-ANSI sessions — dragging the estimate DOWN while the exact
    percentile's sort order treats NaN as greatest — so NaN is
    excluded explicitly, same rule as NULL); out-of-range values
    clamp to the edge buckets.

    Built as ONE parsed SQL string rather than n Column objects:
    constructing 128 nested F.sum(F.when(...)) columns costs a py4j
    round-trip per node — measured ~4 s of Python-side DataFrame build
    per percentile report at n=128 x 2 measures — while one F.expr
    parses server-side in milliseconds.  Literal floats inline via
    repr (round-trip exact), matching the DuckDB oracle's text."""
    if not re.fullmatch(r"\w+", col):
        raise ValueError(
            f"approx percentile column {col!r}: simple identifier "
            "column names only (alias the expression first)"
        )
    w = (hi - lo) / n
    x = f"CAST(`{col}` AS DOUBLE)"
    b = (
        f"least(greatest(CAST(floor(({x} - {lo!r}) / {w!r}) AS BIGINT), "
        f"0), {n - 1})"
    )
    slots = ", ".join(
        f"CAST(sum(CASE WHEN {x} IS NOT NULL AND NOT isnan({x}) "
        f"AND {b} = {i} THEN 1 ELSE 0 END) AS BIGINT)"
        for i in range(n)
    )
    return F.expr(f"array({slots})")


def _hist_total(hcol):
    """Histogram mass (one O(n) fold) — hoisted into its OWN projection
    so the read-off fold below references it as a plain column.
    Inlining it into the fold's lambda would re-evaluate the full fold
    per element — O(n^2) interpreted HOF work per report row, measured
    as the dominant cost of a percentile report before the hoist."""
    return F.aggregate(hcol, F.lit(0).cast("bigint"), lambda a, x: a + x)


def _hist_estimate(hcol, total, q: float, lo: float, hi: float, n: int):
    """Percentile read-off from a histogram column (array<bigint>) and
    its pre-computed ``total`` column: nearest-rank bucket (first
    bucket whose cumulative count reaches ceil(q * N)) with in-bucket
    linear interpolation — a single O(n) fold, pure column
    expressions.  NULL when the histogram is empty (all values
    NULL)."""
    w = (hi - lo) / n
    kr = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil(F.lit(q) * total.cast("double")).cast("bigint"),
    )
    zipped = F.zip_with(
        hcol,
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda c, i: F.struct(c.alias("c"), i.cast("int").alias("i")),
    )
    st0 = F.struct(
        F.lit(0).cast("bigint").alias("cum"),
        F.lit(-1).cast("int").alias("idx"),
        F.lit(0).cast("bigint").alias("prev"),
    )

    def step(acc, x):
        c = acc["cum"] + x["c"]
        hit = (acc["idx"] < 0) & (c >= kr)
        return F.struct(
            c.alias("cum"),
            F.when(hit, x["i"]).otherwise(acc["idx"]).alias("idx"),
            F.when(hit, acc["cum"]).otherwise(acc["prev"]).alias("prev"),
        )

    res = F.aggregate(zipped, st0, step)
    cnt = F.element_at(hcol, res["idx"] + 1)
    frac = (kr - res["prev"]).cast("double") / cnt.cast("double")
    est = F.lit(float(lo)) + F.lit(w) * (res["idx"].cast("double") + frac)
    return F.when(total > 0, est)


def _set_guard(expr, cap: int, where: str):
    """Exact-distinct partials are capped: past ``cap`` distinct values
    the set itself is the memory hazard, so the plan fails loudly and
    names the mergeable alternative instead of degrading silently."""
    return F.when(
        F.size(expr) > cap,
        F.raise_error(
            F.concat(
                F.lit(
                    f"exact_distinct {where}: distinct-value set "
                    f"exceeded cap={cap} (got "
                ),
                F.size(expr).cast("string"),
                F.lit(
                    "); raise opts['cap'] if this cardinality is "
                    "intended, or use approx_distinct (mergeable HLL) "
                    "at unbounded cardinalities"
                ),
            )
        ),
    ).otherwise(expr)


def grouped_report(
    df: DataFrame,
    dims: list[str],
    measures: dict[str, tuple[str, str | None]],
    mode: str = "rollup",
    grouping_sets: list[list[str]] | None = None,
    pre_aggregate: bool = True,
) -> DataFrame:
    """Multi-dimensional report over ``dims``.

    ``measures``  output-name -> (fn, column); fn in count/sum/min/
                  max/avg/count_distinct/approx_distinct/p50/p90/p99,
                  column None only for count (count(*) — counts ROWS,
                  like SQL's).  count/sum of an all-NULL or empty cell
                  follow SQL semantics (count 0, sum NULL) in both
                  plans.  count_distinct and the exact interpolated
                  percentiles p50/p90/p99 (percentile_cont semantics)
                  are not decomposable and require
                  ``pre_aggregate=False``; approx_distinct (HLL
                  sketches) works in both plans and returns the
                  identical estimate either way.
    ``mode``      'rollup' (hierarchy: (a,b), (a), ()), 'cube' (all
                  2^d subsets), or 'grouping_sets' with the explicit
                  ``grouping_sets`` list (subsets of ``dims``; [] is
                  the grand total).
    ``pre_aggregate``  True (default): the two-phase plan — exact
                  groupBy over all dims first, Expand over the compact
                  frame.  False: Spark's direct single-pass plan.
                  Same answer either way (tested); the knob is purely
                  Expand-replication vs one extra (tiny) shuffle.

    Output: dims... (NULL when aggregated over), ``g_<dim>`` int
    grouping markers, measures... .  ``avg`` emits double; ``count``
    emits long; others keep/widen the input type per Spark's sum/min/
    max rules.
    """
    if mode not in ("rollup", "cube", "grouping_sets"):
        raise ValueError(
            f"mode must be 'rollup', 'cube', or 'grouping_sets'; got {mode!r}"
        )
    if (mode == "grouping_sets") != (grouping_sets is not None):
        raise ValueError(
            "grouping_sets list is required for (exactly) mode='grouping_sets'"
        )
    if grouping_sets is not None:
        stray = {c for s in grouping_sets for c in s} - set(dims)
        if stray:
            raise ValueError(
                f"grouping_sets reference non-dim column(s) {sorted(stray)}"
            )
    _validate_measures(measures, two_phase=pre_aggregate)
    clash = {f"g_{d}" for d in dims} & set(df.columns)
    if clash:
        raise ValueError(f"grouping marker column(s) {sorted(clash)} exist")
    # measure outputs live next to the dims and markers in one frame —
    # any name overlap yields duplicate columns that only fail later
    taken = set(dims) | {f"g_{d}" for d in dims}
    bad_names = {
        n for n in measures
        if n in taken or n.startswith("__")
    }
    if bad_names:
        raise ValueError(
            f"measure name(s) {sorted(bad_names)} collide with a dim, "
            "its g_ marker, or the reserved __ prefix"
        )

    def _grouped(frame):
        if mode == "rollup":
            return frame.rollup(*dims)
        if mode == "cube":
            return frame.cube(*dims)
        return frame.groupingSets(
            [[F.col(c) for c in s] for s in grouping_sets], *dims
        )

    markers = [F.grouping(d).cast("int").alias(f"g_{d}") for d in dims]

    if not pre_aggregate:
        final = []
        posts: dict = {}
        fin_emitted: set = set()
        for name, spec in measures.items():
            fn, col, opts = _norm_spec(name, spec)
            if fn == "count":
                e = F.count(F.lit(1)) if col is None else F.count(col)
            elif fn == "avg":
                # sum/count, not F.avg: the SAME formula the two-phase
                # plan derives, so the knob changes only float summation
                # order (~1e-15 relative), never the semantics
                e = F.sum(col) / F.count(col)
            elif fn in ("count_distinct", "exact_distinct"):
                # exact_distinct in direct mode IS count_distinct —
                # exact either way, so the plans agree by exactness
                # (no set materializes here, hence no cap guard)
                e = F.count_distinct(F.col(col))
            elif fn in _PCTL:
                # exact interpolated percentile (percentile_cont), the
                # same linear-interpolation rule DuckDB's quantile_cont
                # uses — certified cross-engine in olap_report li_pctl
                e = F.percentile(F.col(col), F.lit(_PCTL[fn]))
            elif fn == "approx_distinct":
                # through the sketch even in direct mode, so the two
                # plans return the IDENTICAL estimate (set-union
                # semantics), not two different approximations
                e = F.hll_sketch_estimate(F.hll_sketch_agg(col))
            elif fn in _APCTL:
                # the same histogram even in direct mode, for the same
                # reason as approx_distinct: identical estimate in the
                # direct, two-phase, and incremental plans, pinned
                lo, hi, n = _hist_grid(name, opts)
                alias = f"__fin{_hist_key(col, lo, hi, n)}"
                if alias not in fin_emitted:
                    fin_emitted.add(alias)
                    final.append(
                        _hist_partial(col, lo, hi, n).alias(alias)
                    )
                posts[name] = (
                    lambda a=alias, q=_APCTL[fn], lo=lo, hi=hi, n=n:
                    _hist_estimate(
                        F.col(a), F.col(f"__tot{a}"), q, lo, hi, n
                    )
                )
                posts.setdefault("__aux__", {})[f"__tot{alias}"] = (
                    lambda a=alias: _hist_total(F.col(a))
                )
                continue
            else:
                e = getattr(F, fn)(col)
            final.append(e.alias(name))
        return _finish(
            _grouped(df).agg(*markers, *final), dims, measures, posts
        )

    # phase 1: exact pass over all dims; phase 2: re-aggregate the
    # partials over the compact frame (shared with the incremental
    # summarize/merge/report surface below)
    base = df.groupBy(*dims).agg(
        *[e.alias(k) for k, e in _partials_spec(measures).items()]
    )
    final, posts = _final_measures(measures)
    return _finish(
        _grouped(base).agg(*markers, *final), dims, measures, posts
    )


def _validate_measures(measures, two_phase: bool) -> None:
    for name, spec in measures.items():
        fn, col, opts = _norm_spec(name, spec)
        if fn not in _FNS:
            raise ValueError(f"measure {name!r}: unknown fn {fn!r}")
        if col is None and fn != "count":
            raise ValueError(f"measure {name!r}: only count may omit a column")
        if fn in _APCTL:
            _hist_grid(name, opts)  # grid errors surface at plan time
        if fn == "exact_distinct" and int(
            opts.get("cap", _EXACT_DISTINCT_DEFAULT_CAP)
        ) < 1:
            raise ValueError(f"measure {name!r}: cap must be >= 1")
        if fn in _PCTL and two_phase:
            raise ValueError(
                f"measure {name!r}: exact percentiles are not "
                "decomposable — a phase-1 row per dim combo cannot "
                "re-derive the value distribution.  Use "
                "pre_aggregate=False (exact, Expand over the full "
                f"input), or fn='approx_{fn}' with a declared grid "
                "(opts {'lo', 'hi'[, 'buckets']}) — a mergeable "
                "fixed-grid histogram partial whose estimate is "
                "identical in the direct, two-phase, and incremental "
                "plans and within one bucket width of exact"
            )
        if fn == "count_distinct" and two_phase:
            raise ValueError(
                f"measure {name!r}: count_distinct is exact but not "
                "decomposable — a phase-1 row per dim combo cannot "
                "re-derive cross-combo distinctness.  Use "
                "pre_aggregate=False (exact, Expand over the full "
                "input), fn='exact_distinct' (mergeable capped-set "
                "partials — exact, errors loudly past opts['cap']), "
                "or fn='approx_distinct' (mergeable HLL sketches, "
                "identical estimate in both plans)"
            )


def _partials_spec(measures) -> dict:
    """Phase-1 partial-aggregate expressions, keyed by the reserved
    ``__<rule>_<col>`` names whose prefix encodes the merge rule."""
    partials: dict = {}
    for name, spec in measures.items():
        fn, col, opts = _norm_spec(name, spec)
        if fn == "count" and col is None:
            partials.setdefault("__cnt_*", F.count(F.lit(1)))
        elif fn in ("count", "avg"):
            partials.setdefault(f"__cnt_{col}", F.count(col))
        if fn in ("sum", "avg"):
            partials.setdefault(f"__sum_{col}", F.sum(col))
        if fn in ("min", "max"):
            partials.setdefault(f"__{fn}_{col}", getattr(F, fn)(col))
        if fn == "approx_distinct":
            partials.setdefault(f"__hll_{col}", F.hll_sketch_agg(col))
        if fn in _APCTL:
            lo, hi, n = _hist_grid(name, opts)
            partials.setdefault(
                _hist_key(col, lo, hi, n), _hist_partial(col, lo, hi, n)
            )
        if fn == "exact_distinct":
            cap = int(opts.get("cap", _EXACT_DISTINCT_DEFAULT_CAP))
            partials.setdefault(
                _set_key(col, cap),
                _set_guard(F.collect_set(col), cap, "partial"),
            )
    return partials


def _merge_rule(k: str):
    """The re-aggregation expression a partial column's name encodes:
    counts and sums add, min/max fold idempotently, HLL sketches
    set-union, histograms add per slot, capped sets union (re-guarded).
    This is what makes summaries mergeable by NAME — merge_summaries
    needs no measure spec."""
    if k.startswith("__min_"):
        return F.min(k)
    if k.startswith("__max_"):
        return F.max(k)
    if k.startswith("__hll_"):
        return F.hll_union_agg(k)
    if k.startswith("__hist_"):
        n = int(re.search(r"_n(\d+)$", k).group(1))
        # ONE fold expression (collect_list + elementwise zip_with sum)
        # rather than n per-slot F.sum's: every histogram re-aggregation
        # runs over COMPACT frames by construction (summaries, or the
        # phase-1 frame under Expand), where map-side compaction buys
        # nothing — while n separate aggregate expressions cost O(n)
        # Catalyst analysis PER REPORT (measured 7.6 s of driver-side
        # plan build at n=128 x 2 measures before this).  The corpus-
        # scale pass stays _hist_partial's codegen conditional sums.
        zeros = F.array_repeat(F.lit(0).cast("bigint"), n)
        return F.aggregate(
            F.collect_list(k),
            zeros,
            lambda acc, a: F.zip_with(acc, a, lambda x, y: x + y),
        )
    if k.startswith("__set_"):
        cap = int(re.search(r"__cap(\d+)$", k).group(1))
        merged = F.array_distinct(F.flatten(F.collect_list(k)))
        return _set_guard(merged, cap, "merge")
    return F.sum(k)


def _final_measures(measures) -> tuple[list, dict]:
    """Phase-2 expressions over the partial columns.  Returns
    ``(aggs, posts)``: ``aggs`` go inside the grouped ``agg(...)``;
    measures whose read-off is an expression OVER an aggregate result
    (histogram percentiles, set sizes) emit their merged partial under
    a ``__fin...`` temp alias there and finish in ``posts`` —
    {measure name: builder(post-agg frame) -> final column}."""
    final: list = []
    posts: dict = {}
    fin_emitted: set = set()

    def _fin(key):
        alias = f"__fin{key}"
        if alias not in fin_emitted:
            fin_emitted.add(alias)
            final.append(_merge_rule(key).alias(alias))
        return alias

    for name, spec in measures.items():
        fn, col, opts = _norm_spec(name, spec)
        if fn == "count":
            e = _merge_rule("__cnt_*" if col is None else f"__cnt_{col}")
        elif fn == "sum":
            e = _merge_rule(f"__sum_{col}")
        elif fn == "avg":
            e = _merge_rule(f"__sum_{col}") / _merge_rule(f"__cnt_{col}")
        elif fn == "approx_distinct":
            e = F.hll_sketch_estimate(_merge_rule(f"__hll_{col}"))
        elif fn in _APCTL:
            lo, hi, n = _hist_grid(name, opts)
            alias = _fin(_hist_key(col, lo, hi, n))
            q = _APCTL[fn]
            posts[name] = (
                lambda a=alias, q=q, lo=lo, hi=hi, n=n: _hist_estimate(
                    F.col(a), F.col(f"__tot{a}"), q, lo, hi, n
                )
            )
            posts.setdefault("__aux__", {})[f"__tot{alias}"] = (
                lambda a=alias: _hist_total(F.col(a))
            )
            continue
        elif fn == "exact_distinct":
            cap = int(opts.get("cap", _EXACT_DISTINCT_DEFAULT_CAP))
            alias = _fin(_set_key(col, cap))
            posts[name] = (
                lambda a=alias: F.size(F.col(a)).cast("long")
            )
            continue
        else:
            e = _merge_rule(f"__{fn}_{col}")
        final.append(e.alias(name))
    return final, posts


def _finish(res, dims, measures, posts):
    """Apply the post-aggregate read-offs and restore the documented
    output column order: dims, g_ markers, measures in spec order.
    Histogram totals project in an intermediate select (``__aux__``)
    so the percentile folds reference them as plain columns — see
    :func:`_hist_total`."""
    if not posts:
        return res
    aux = posts.get("__aux__", {})
    if aux:
        res = res.select("*", *[b().alias(a) for a, b in aux.items()])
    return res.select(
        *dims,
        *[f"g_{d}" for d in dims],
        *[
            posts[n]().alias(n) if n in posts and n != "__aux__" else F.col(n)
            for n in measures
        ],
    )


def summarize(
    df: DataFrame, dims: list[str], measures: dict
) -> DataFrame:
    """Build the MATERIALIZED SUMMARY of ``df``: one row per distinct
    ``dims`` combination carrying the decomposable partials every
    measure in ``measures`` needs (``__cnt_<col>``, ``__sum_<col>``,
    ``__min_/__max_<col>``, ``__hll_<col>`` HLL sketch buffers — the
    reserved ``__`` namespace, each name encoding its own merge rule).
    ONE exact groupBy; the output is small (distinct combos), persists
    as plain parquet (sketches are binary columns), and is the unit of
    incremental maintenance: summarize only the newly arrived chunk,
    :func:`merge_summaries` it into the stored summary, and
    :func:`report_from_summary` any rollup/cube without touching the
    corpus again.  Same measure validation as :func:`grouped_report`'s
    two-phase plan — ``count_distinct`` and exact ``pXX`` are refused
    (not mergeable); the mergeable forms are ``approx_distinct`` /
    ``exact_distinct`` (capped) and ``approx_pXX`` (fixed-grid
    histogram — partial columns ``__hist_<col>__lo..._hi..._n<k>``,
    also plain parquet)."""
    _validate_measures(measures, two_phase=True)
    bad = [d for d in dims if d.startswith("__")]
    if bad:
        raise ValueError(f"dim(s) {bad} use the reserved __ prefix")
    return df.groupBy(*dims).agg(
        *[e.alias(k) for k, e in _partials_spec(measures).items()]
    )


def merge_summaries(*summaries: DataFrame) -> DataFrame:
    """Fold summaries built by :func:`summarize` (over the SAME dims
    and measures) into one: union, then one re-aggregate in which each
    partial column applies the merge rule its name encodes — counts
    and sums add, min/max fold, HLL sketches set-union.  Needs no
    measure spec: the summary schema is self-describing.  Cost is one
    shuffle over COMPACT frames (distinct dim combos, never corpus
    rows).  Append-only, as the module docstring states: merging can
    only add mass; retract by re-summarizing the affected chunk."""
    if not summaries:
        raise ValueError("merge_summaries needs at least one summary")
    first = summaries[0]
    dims = [c for c in first.columns if not c.startswith("__")]
    parts = [c for c in first.columns if c.startswith("__")]
    if not parts:
        raise ValueError(
            "no __ partial columns found — was this frame built by "
            "summarize()?"
        )
    for s in summaries[1:]:
        if set(s.columns) != set(first.columns):
            raise ValueError(
                f"summary schemas differ: {sorted(first.columns)} vs "
                f"{sorted(s.columns)} — summaries must share dims and "
                "measures"
            )
    u = first
    for s in summaries[1:]:
        u = u.unionByName(s)
    return u.groupBy(*dims).agg(
        *[_merge_rule(k).alias(k) for k in parts]
    )


def report_from_summary(
    summary: DataFrame,
    dims: list[str],
    measures: dict,
    mode: str = "rollup",
    grouping_sets: list[list[str]] | None = None,
) -> DataFrame:
    """Phase 2 alone: rollup/cube/grouping-sets over a summary built
    by :func:`summarize` (possibly after :func:`merge_summaries`),
    producing exactly :func:`grouped_report`'s output shape — dims
    (NULL when aggregated over), ``g_<dim>`` markers, measures.
    Pinned contract: ``report_from_summary(merge_summaries(
    summarize(A), summarize(B)))`` equals ``grouped_report(A ∪ B)``
    (bit-identical for exact types; float sums to ulp — round at the
    report edge).  Expand replicates summary rows, never the corpus."""
    _validate_measures(measures, two_phase=True)
    # same output-name hygiene as grouped_report: measures, dims, and
    # g_ markers share one frame
    taken = set(dims) | {f"g_{d}" for d in dims}
    bad = {n for n in measures if n in taken or n.startswith("__")}
    if bad:
        raise ValueError(
            f"measure name(s) {sorted(bad)} collide with a dim, its "
            "g_ marker, or the reserved __ prefix"
        )
    missing = [
        k for k in _partials_spec(measures) if k not in summary.columns
    ]
    if missing:
        raise ValueError(
            f"summary lacks partial column(s) {missing} — it was built "
            "with a narrower measure set; re-run summarize() with the "
            "full spec"
        )
    if mode not in ("rollup", "cube", "grouping_sets"):
        raise ValueError(
            f"mode must be 'rollup', 'cube', or 'grouping_sets'; got {mode!r}"
        )
    if (mode == "grouping_sets") != (grouping_sets is not None):
        raise ValueError(
            "grouping_sets list is required for (exactly) mode='grouping_sets'"
        )
    if mode == "rollup":
        g = summary.rollup(*dims)
    elif mode == "cube":
        g = summary.cube(*dims)
    else:
        stray = {c for s in grouping_sets for c in s} - set(dims)
        if stray:
            raise ValueError(
                f"grouping_sets reference non-dim column(s) {sorted(stray)}"
            )
        g = summary.groupingSets(
            [[F.col(c) for c in s] for s in grouping_sets], *dims
        )
    markers = [F.grouping(d).cast("int").alias(f"g_{d}") for d in dims]
    final, posts = _final_measures(measures)
    return _finish(g.agg(*markers, *final), dims, measures, posts)


def top_values(
    df: DataFrame,
    dims: list[str],
    value_col: str,
    k: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """EXACT per-group heavy hitters: for each ``dims`` combination,
    the ``k`` most frequent values of ``value_col`` — "top 10 source
    domains per language", the corpus-profiling report next to
    :func:`grouped_report`'s totals.

    Output: dims..., ``value`` (the ``value_col`` value, NULLs form
    their own value as in GROUP BY), ``weight`` (its count, or the sum
    of ``weight_col`` — e.g. token counts — when given; groups whose
    weight is NULL rank last), ``rank`` (1..k, dense by (weight DESC,
    value ASC) — the value tie-break makes the cut DETERMINISTIC, so
    reruns and engines agree on boundary rows).

    Scale shape: ONE exact groupBy over (dims..., value) — partial
    aggregation map-side, so the shuffle carries distinct combos, not
    rows — then a per-dims window over that COMPACT frame.  The
    window's per-group state is the distinct-value count of the group,
    not its row count: hot groups compact before they rank, the same
    inversion as timeseries.resample.  For truly unbounded value
    domains (billions of distinct values per group) bound the frame
    first (hash-bucket the tail or pre-filter), or use
    ``approx_distinct``-style sketches for counts-only questions —
    stated here because this operator is exact by contract and will
    not thin silently.

    Incremental maintenance comes free from the summary algebra:
    counts are mergeable, so ``summarize(chunk, [*dims, value_col],
    {"w": ("count", None)})`` per chunk + :func:`merge_summaries` is
    exactly this operator's grouped frame maintained incrementally —
    rank the merged summary with the same window to refresh the top-k
    without rescanning the corpus.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    if value_col in dims:
        raise ValueError(f"value_col {value_col!r} is also a dim")
    taken = {"value", "weight", "rank"} & set(dims)
    if taken:
        raise ValueError(
            f"dim(s) {sorted(taken)} collide with the output "
            "value/weight/rank columns; rename them first"
        )
    from pyspark.sql.window import Window

    w = (
        F.count(F.lit(1)) if weight_col is None
        else F.sum(weight_col)
    )
    counts = df.groupBy(*dims, F.col(value_col).alias("value")).agg(
        w.alias("weight")
    )
    rank = F.row_number().over(
        Window.partitionBy(*dims).orderBy(
            F.col("weight").desc_nulls_last(), F.col("value").asc_nulls_last()
        )
    )
    return (
        counts.withColumn("rank", rank)
        .filter(F.col("rank") <= k)
    )


def hist_partial(
    col: str,
    lo: float,
    hi: float,
    buckets: int = _HIST_DEFAULT_BUCKETS,
) -> Column:
    """The mergeable fixed-grid histogram partial as a PUBLIC aggregate
    Column — ``array<bigint>`` of per-bucket counts, the same partial
    the ``approx_pXX`` measures build inside ``summarize`` (NULL/NaN
    count nowhere, out-of-range clamps to the edge buckets; counts are
    exact longs, so partials merge bit-identically by elementwise sum).

    Use it anywhere an aggregate Column is accepted — notably
    ``timeseries.resample(aggs={"h": hist_partial("value", lo, hi,
    n)})`` to compact each grid bucket's value distribution, then
    slide ``rolling_buckets``' ``hist_quantile`` frame aggregate over
    the buckets: trailing-window percentiles whose cost is bounded by
    n_buckets x grid slots, never by event rate.  The grid MUST match
    between the partial and every read-off (same contract as the
    summary algebra, where the ``__hist_`` column name encodes it)."""
    lo, hi, n = _hist_grid(col, {"lo": lo, "hi": hi, "buckets": buckets})
    return _hist_partial(col, lo, hi, n)


def hist_quantile(
    hist_col,
    q: float,
    lo: float,
    hi: float,
    buckets: int = _HIST_DEFAULT_BUCKETS,
) -> Column:
    """Percentile read-off from a histogram column built by
    :func:`hist_partial` (or a merged sum of such partials): the
    nearest-rank bucket with in-bucket linear interpolation — the
    identical deterministic formula the certified ``approx_pXX``
    report path computes, as a standalone Column for summary-store
    reads.  NULL when the histogram is empty."""
    if not 0.0 < float(q) <= 1.0:
        raise ValueError(f"need 0 < q <= 1; got {q}")
    lo, hi, n = _hist_grid("hist_quantile",
                           {"lo": lo, "hi": hi, "buckets": buckets})
    hcol = F.col(hist_col) if isinstance(hist_col, str) else hist_col
    return _hist_estimate(hcol, _hist_total(hcol), float(q), lo, hi, n)


def suggest_grid(
    df: DataFrame,
    col: str,
    buckets: int = _HIST_DEFAULT_BUCKETS,
    pad: float = 0.01,
) -> dict:
    """Derive the fixed grid an ``approx_pXX`` measure needs: one
    min/max aggregate over ``df`` (a single job — run it ONCE when
    first materializing a summary, then reuse the returned opts for
    every chunk and refresh FOREVER; a per-chunk grid would not
    merge, which is why the measure refuses to auto-derive).  The
    range is padded by ``pad`` on each side so later chunks that
    slightly exceed the observed extrema still bucket inside the grid
    rather than clamping to its edges.  Returns the opts dict —
    ``{"lo": ..., "hi": ..., "buckets": ...}`` — ready to splice into
    a measure spec: ``("approx_p99", col, suggest_grid(df, col))``.
    Ranges WIDE enough that whole numbers keep resolution (span >=
    buckets) snap outward to integers, so the grid is stable under
    re-derivation from supersets; narrow ranges (sub-integer latencies,
    ratios, probabilities) keep the padded float bounds — snapping
    them would collapse the whole distribution into one bucket."""
    import math

    row = df.agg(
        F.min(F.col(col).cast("double")).alias("mn"),
        F.max(F.col(col).cast("double")).alias("mx"),
    ).collect()[0]
    if row["mn"] is None:
        raise ValueError(
            f"suggest_grid: column {col!r} has no non-NULL values"
        )
    lo, hi = float(row["mn"]), float(row["mx"])
    span = (hi - lo) or abs(lo) or 1.0
    lo, hi = lo - span * pad, hi + span * pad
    if hi - lo >= buckets:
        lo, hi = float(math.floor(lo)), float(math.ceil(hi))
    if not hi > lo:
        hi = lo + 1.0
    return {"lo": lo, "hi": hi, "buckets": int(buckets)}


def top_values_from_summary(
    summary: DataFrame,
    dims: list[str],
    value_col: str,
    k: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """:func:`top_values` maintained INCREMENTALLY: rank a summary
    built by ``summarize(chunk, [*dims, value_col], {"w": ("count",
    None)})`` (or a weighted ``("sum", w)``) and merged across chunks —
    the recipe :func:`top_values`'s docstring describes, as a function.
    ``weight_col`` names the summary's partial: None reads the
    row-count partial ``__cnt_*``; a column name reads ``__sum_<col>``.
    Output and ranking rule are exactly :func:`top_values`'s
    (weight DESC, value ASC; pinned equal by test) — one window over
    the compact merged summary, never the corpus."""
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    from pyspark.sql.window import Window

    part = "__cnt_*" if weight_col is None else f"__sum_{weight_col}"
    if part not in summary.columns:
        raise ValueError(
            f"summary lacks partial column {part!r} — build it with "
            f"summarize(df, [*dims, value_col], "
            f"{{'w': ({'count' if weight_col is None else 'sum'!r}, "
            f"{weight_col!r})}})"
        )
    if value_col not in summary.columns:
        raise ValueError(f"summary lacks value column {value_col!r}")
    # Defensive re-aggregate: an UNMERGED union of chunk summaries has
    # several rows per (dims, value) and each chunk's weight would rank
    # independently — silently wrong ranks.  One groupBy makes the safe
    # form free: a no-op on merged input (already one row per group)
    # and correct on unmerged input (sum is the partials' merge rule
    # for both count and sum partials).
    counts = (
        summary.select(
            *dims,
            F.col(value_col).alias("value"),
            F.col(part).alias("weight"),
        )
        .groupBy(*dims, "value")
        .agg(F.sum("weight").alias("weight"))
    )
    rank = F.row_number().over(
        Window.partitionBy(*dims).orderBy(
            F.col("weight").desc_nulls_last(),
            F.col("value").asc_nulls_last(),
        )
    )
    return counts.withColumn("rank", rank).filter(F.col("rank") <= k)
