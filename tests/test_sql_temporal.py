"""SQL surface for the as-of join (plans/sql_temporal.py): the
canonical ASOF [LEFT] JOIN statement rewrites to asof_join's
single-exchange plan; non-ASOF statements delegate to spark.sql
verbatim; malformed ASOF raises (Spark cannot parse the keyword, so
there is no verbatim fallback)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.plans.sql_temporal import (
    AsofSyntaxError,
    asof_sql,
    explain_asof,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


@pytest.fixture(scope="module")
def views(spark):
    left = spark.createDataFrame(
        [
            (0, _ts(10), 7),
            (1, _ts(4), 7),
            (2, _ts(100), 8),
            (3, _ts(1), 9),  # no right rows for user 9
        ],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(4), 7, 1.0),
            (101, _ts(9), 7, 2.0),
            (102, _ts(11), 7, 3.0),  # future of every left row
            (103, _ts(50), 8, 4.0),
        ],
        "quote_id long, qts timestamp, uid long, value double",
    )
    left.createOrReplaceTempView("trades")
    right.createOrReplaceTempView("quotes")
    return left, right


ASOF_LEFT = """
SELECT l.event_id, l.ts, r.value AS quote_value, r.qts AS quote_ts
FROM trades l ASOF LEFT JOIN quotes r
  ON l.user_id = r.uid AND l.ts >= r.qts
"""

EXPECT = {
    0: (2.0, _ts(9)),
    1: (1.0, _ts(4)),  # inclusive boundary
    2: (4.0, _ts(50)),
    3: (None, None),
}


def test_asof_left_join_rewrites_and_matches(spark, views):
    assert explain_asof(ASOF_LEFT) == "asof"
    got = {
        r["event_id"]: (r["quote_value"], r["quote_ts"])
        for r in asof_sql(spark, ASOF_LEFT).collect()
    }
    assert got == EXPECT


def test_asof_inner_join_drops_unmatched(spark, views):
    inner = ASOF_LEFT.replace("ASOF LEFT JOIN", "ASOF JOIN")
    assert explain_asof(inner) == "asof"
    got = {
        r["event_id"]: (r["quote_value"], r["quote_ts"])
        for r in asof_sql(spark, inner).collect()
    }
    assert got == {k: v for k, v in EXPECT.items() if v[0] is not None}


def test_mirrored_on_clause_normalizes(spark, views):
    mirrored = """
    SELECT l.event_id, r.value AS quote_value
    FROM trades l ASOF LEFT JOIN quotes r
      ON r.uid = l.user_id AND r.qts <= l.ts
    """
    got = {
        r["event_id"]: r["quote_value"]
        for r in asof_sql(spark, mirrored).collect()
    }
    assert got == {k: v[0] for k, v in EXPECT.items()}


def test_right_key_column_in_select(spark, views):
    sql = """
    SELECT l.event_id, r.uid AS matched_uid, r.value AS v
    FROM trades l ASOF JOIN quotes r
      ON l.user_id = r.uid AND l.ts >= r.qts
    """
    got = {
        r["event_id"]: (r["matched_uid"], r["v"])
        for r in asof_sql(spark, sql).collect()
    }
    assert got == {0: (7, 2.0), 1: (7, 1.0), 2: (8, 4.0)}


def test_non_asof_statement_delegates(spark, views):
    sql = "SELECT count(*) AS n FROM trades"
    assert explain_asof(sql) == "delegate"
    assert asof_sql(spark, sql).first()["n"] == 4


def test_malformed_asof_raises_not_delegates(spark, views):
    # Spark cannot parse ASOF at all, so a shape miss must raise the
    # canonical-form error instead of delegating into a parse failure
    for bad in (
        "SELECT * FROM trades l ASOF LEFT JOIN quotes r ON l.user_id = r.uid",
        # strict comparators are not the canonical inclusive form
        """SELECT l.event_id FROM trades l ASOF JOIN quotes r
           ON l.user_id = r.uid AND l.ts > r.qts""",
        # inequality comparing one table to itself
        """SELECT l.event_id FROM trades l ASOF JOIN quotes r
           ON l.user_id = r.uid AND l.ts >= l.ts""",
        # expression select items are out of shape
        """SELECT l.event_id + 1 FROM trades l ASOF JOIN quotes r
           ON l.user_id = r.uid AND l.ts >= r.qts""",
    ):
        with pytest.raises(AsofSyntaxError):
            asof_sql(spark, bad)
    with pytest.raises(AsofSyntaxError):
        explain_asof(
            "SELECT l.a FROM t l ASOF JOIN u r ON l.k = x.k AND l.ts >= r.ts"
        )


def test_rewrite_matches_duckdb_semantics_on_fixture(spark, events):
    """Fixture-scale cross-check: the SQL-surface rewrite must equal
    the directly-called asof_join on the click->view shape that
    event_percentiles certifies against DuckDB's native ASOF JOIN."""
    from pyspark.sql.window import Window as _W

    from fabstir_vectordb_spark.operators.temporal import asof_join

    ev = events.limit(3000)
    views_df = (
        ev.filter(F.col("event_type") == "view")
        .withColumn(
            "__rn",
            F.row_number().over(
                _W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(
            F.col("user_id").alias("vuser"),
            F.col("ts").alias("vts"),
            F.col("event_id").alias("vid"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    clicks.createOrReplaceTempView("clicks_v")
    views_df.createOrReplaceTempView("views_v")
    got = asof_sql(
        spark,
        """SELECT l.event_id, r.vid AS matched, r.vts AS matched_ts
           FROM clicks_v l ASOF LEFT JOIN views_v r
             ON l.user_id = r.vuser AND l.ts >= r.vts""",
    )
    direct = asof_join(
        clicks,
        views_df.withColumnRenamed("vuser", "user_id"),
        on="user_id",
        right_ts_col="vts",
        value_cols=["vid"],
    ).select(
        "event_id",
        F.col("vid_r").alias("matched"),
        F.col("ts_r").alias("matched_ts"),
    )
    diff = (
        got.alias("g")
        .join(direct.alias("d"), "event_id", "full")
        .filter(
            ~(
                (F.col("g.matched").eqNullSafe(F.col("d.matched")))
                & (F.col("g.matched_ts").eqNullSafe(F.col("d.matched_ts")))
            )
        )
        .count()
    )
    assert diff == 0


RANGE_SQL = """
SELECT p.event_id, i.iv_id AS session, p.ts
FROM pts p JOIN ivs i
  ON p.user_id = i.uid AND p.ts BETWEEN i.s AND i.e
"""


@pytest.fixture(scope="module")
def range_views(spark):
    pts = spark.createDataFrame(
        [
            (0, _ts(5), 1), (1, _ts(3599), 1), (2, _ts(7200), 1),
            (3, _ts(50), 2), (4, _ts(150), 2),
        ],
        "event_id long, ts timestamp, user_id long",
    )
    ivs = spark.createDataFrame(
        [
            ("s1", _ts(0), _ts(4000), 1),
            ("s2", _ts(7000), _ts(8000), 1),
            ("s3", _ts(100), _ts(200), 2),
        ],
        "iv_id string, s timestamp, e timestamp, uid long",
    )
    pts.createOrReplaceTempView("pts")
    ivs.createOrReplaceTempView("ivs")
    return pts, ivs


def test_range_sql_rewrites_and_equals_verbatim(spark, range_views):
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_range,
        range_sql,
    )

    assert explain_range(spark, RANGE_SQL) == "range"
    got = sorted(
        (r["event_id"], r["session"]) for r in range_sql(spark, RANGE_SQL).collect()
    )
    verbatim = sorted(
        (r["event_id"], r["session"]) for r in spark.sql(RANGE_SQL).collect()
    )
    assert got == verbatim == [(0, "s1"), (1, "s1"), (2, "s2"), (4, "s3")]
    # bucket size must not change the answer
    tiny = sorted(
        (r["event_id"], r["session"])
        for r in range_sql(spark, RANGE_SQL, bucket_seconds=7).collect()
    )
    assert tiny == got


def test_range_sql_multikey_rewrites_and_equals_verbatim(spark, range_views):
    """Multiple key equalities (parity with the ASOF parser, VERDICT r8
    'Next round' #5): keyed (user, region) the rewrite must equal the
    verbatim statement — and a swapped-position equality (i.rg = p.region)
    must normalize the same way."""
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_range,
        range_sql,
    )

    spark.createDataFrame(
        [
            (0, _ts(5), 1, "eu"), (1, _ts(10), 1, "us"),
            (2, _ts(150), 2, "eu"),
        ],
        "event_id long, ts timestamp, user_id long, region string",
    ).createOrReplaceTempView("pts_mk")
    spark.createDataFrame(
        [
            ("s1", _ts(0), _ts(20), 1, "eu"),
            ("s2", _ts(0), _ts(20), 1, "us"),
            ("s3", _ts(100), _ts(200), 2, "eu"),
        ],
        "iv_id string, s timestamp, e timestamp, uid long, rg string",
    ).createOrReplaceTempView("ivs_mk")
    sql = """SELECT p.event_id, i.iv_id AS session FROM pts_mk p JOIN ivs_mk i
             ON p.user_id = i.uid AND p.region = i.rg
            AND p.ts BETWEEN i.s AND i.e"""
    assert explain_range(spark, sql) == "range"
    got = sorted(tuple(r) for r in range_sql(spark, sql).collect())
    verbatim = sorted(tuple(r) for r in spark.sql(sql).collect())
    assert got == verbatim == [(0, "s1"), (1, "s2"), (2, "s3")]
    swapped = """SELECT p.event_id, i.iv_id AS session
                 FROM pts_mk p JOIN ivs_mk i
                 ON i.uid = p.user_id AND p.ts BETWEEN i.s AND i.e
                AND i.rg = p.region"""
    assert explain_range(spark, swapped) == "range"
    assert sorted(tuple(r) for r in range_sql(spark, swapped).collect()) == got


def test_overlap_sql_multikey_rewrites_and_equals_verbatim(spark):
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_overlap,
        overlap_sql,
    )

    spark.createDataFrame(
        [
            ("a1", 1, "eu", _ts(0), _ts(10)),
            ("a2", 1, "us", _ts(0), _ts(10)),
            ("a3", 2, "eu", _ts(100), _ts(110)),
        ],
        "lid string, user_id long, region string, s timestamp, e timestamp",
    ).createOrReplaceTempView("ov_a_mk")
    spark.createDataFrame(
        [
            ("b1", 1, "eu", _ts(5), _ts(15)),
            ("b2", 1, "us", _ts(50), _ts(60)),
            ("b3", 2, "eu", _ts(105), _ts(106)),
        ],
        "rid string, uid long, rg string, rs timestamp, re timestamp",
    ).createOrReplaceTempView("ov_b_mk")
    sql = """SELECT a.lid, b.rid FROM ov_a_mk a JOIN ov_b_mk b
             ON a.user_id = b.uid AND a.region = b.rg
            AND a.s <= b.re AND b.rs <= a.e"""
    assert explain_overlap(spark, sql) == "overlap"
    got = sorted(tuple(r) for r in overlap_sql(spark, sql).collect())
    verbatim = sorted(tuple(r) for r in spark.sql(sql).collect())
    assert got == verbatim == [("a1", "b1"), ("a3", "b3")]


def test_range_sql_delegates_out_of_shape(spark, range_views):
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_range,
        range_sql,
    )

    # expression select item / plain aggregate — legal Spark SQL,
    # delegate verbatim and run
    for sql in (
        "SELECT p.event_id + 1 AS x FROM pts p JOIN ivs i "
        "ON p.user_id = i.uid AND p.ts BETWEEN i.s AND i.e",
        "SELECT count(*) AS n FROM pts",
    ):
        assert explain_range(spark, sql) == "delegate"
        range_sql(spark, sql).collect()  # runs via spark.sql

    # unknown view: delegates, and spark.sql raises its own
    # TABLE_OR_VIEW_NOT_FOUND — the same error the user's typo deserves
    from pyspark.errors import AnalysisException

    missing = (
        "SELECT p.event_id FROM nosuch p JOIN ivs i "
        "ON p.user_id = i.uid AND p.ts BETWEEN i.s AND i.e"
    )
    assert explain_range(spark, missing) == "delegate"
    with pytest.raises(AnalysisException):
        range_sql(spark, missing).collect()

    # shared non-key column name => unmappable after the join => delegate
    spark.createDataFrame(
        [("s1", _ts(0), _ts(10), 1, 9.9)],
        "iv_id string, s timestamp, e timestamp, uid long, ts double",
    ).createOrReplaceTempView("ivs_shared")
    sql = (
        "SELECT p.event_id FROM pts p JOIN ivs_shared i "
        "ON p.user_id = i.uid AND p.ts BETWEEN i.s AND i.e"
    )
    assert explain_range(spark, sql) == "delegate"


def test_range_sql_non_temporal_columns_delegate(spark, range_views):
    """Shape-matching statements over non-timestamp ts/start/end columns
    must DELEGATE: the bucketed plan's cast-to-timestamp could disagree
    with the verbatim BETWEEN on strings/ints (ADVICE r8 #2).  Verbatim
    answers stay authoritative — and identical — either way."""
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_range,
        range_sql,
    )

    # string intervals over string points: lexicographic BETWEEN, which
    # a timestamp cast would NOT reproduce on non-ISO strings
    spark.createDataFrame(
        [(0, "b", 1), (1, "x", 1)], "event_id long, ts string, user_id long"
    ).createOrReplaceTempView("pts_str")
    spark.createDataFrame(
        [("s1", "a", "c", 1)], "iv_id string, s string, e string, uid long"
    ).createOrReplaceTempView("ivs_str")
    sql = (
        "SELECT p.event_id, i.iv_id AS session FROM pts_str p JOIN ivs_str i "
        "ON p.user_id = i.uid AND p.ts BETWEEN i.s AND i.e"
    )
    assert explain_range(spark, sql) == "delegate"
    got = sorted(
        (r["event_id"], r["session"]) for r in range_sql(spark, sql).collect()
    )
    assert got == [(0, "s1")]  # 'x' is outside ['a','c'] lexicographically

    # MIXED temporal/integer bindings delegate (a cast would compare
    # different units across sides)
    spark.createDataFrame(
        [(0, 5, 1)], "event_id long, ts long, user_id long"
    ).createOrReplaceTempView("pts_int")
    mixed = (
        "SELECT p.event_id, i.iv_id AS session FROM pts_int p JOIN ivs i "
        "ON p.user_id = i.uid AND p.ts BETWEEN i.s AND i.e"
    )
    assert explain_range(spark, mixed) == "delegate"

    # genuinely temporal bindings still take the rewrite
    assert explain_range(
        spark,
        "SELECT p.event_id, i.iv_id AS session FROM pts p JOIN ivs i "
        "ON p.user_id = i.uid AND p.ts BETWEEN i.s AND i.e",
    ) == "range"


def test_range_sql_numeric_epoch_mode(spark, range_views):
    """ALL-integer ts/start/end take the NUMERIC-EPOCH rewrite
    (VERDICT r8 'Next round' #4): buckets on the raw integers — no
    cast, so floor-division groups exactly as the verbatim integer
    BETWEEN orders — at epoch-seconds AND epoch-micros scales, auto-
    tuned (raw 1-2-5 grid) or pinned."""
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_range,
        range_sql,
    )

    for unit, mul in (("sec", 1), ("us", 1_000_000)):
        spark.createDataFrame(
            [(0, 5 * mul, 1), (1, 3599 * mul, 1), (2, 7200 * mul, 1),
             (3, 50 * mul, 2), (4, 150 * mul, 2)],
            "event_id long, ts long, user_id long",
        ).createOrReplaceTempView(f"pts_{unit}")
        spark.createDataFrame(
            [("s1", 0, 4000 * mul, 1), ("s2", 7000 * mul, 8000 * mul, 1),
             ("s3", 100 * mul, 200 * mul, 2)],
            "iv_id string, s long, e long, uid long",
        ).createOrReplaceTempView(f"ivs_{unit}")
        sql = (
            f"SELECT p.event_id, i.iv_id AS session "
            f"FROM pts_{unit} p JOIN ivs_{unit} i "
            f"ON p.user_id = i.uid AND p.ts BETWEEN i.s AND i.e"
        )
        assert explain_range(spark, sql) == "range_int", unit
        got = sorted(tuple(r) for r in range_sql(spark, sql).collect())
        verbatim = sorted(tuple(r) for r in spark.sql(sql).collect())
        assert got == verbatim == [
            (0, "s1"), (1, "s1"), (2, "s2"), (4, "s3")
        ], unit
        pinned = sorted(
            tuple(r)
            for r in range_sql(spark, sql, bucket_seconds=7 * mul).collect()
        )
        assert pinned == got, unit


def test_overlap_sql_numeric_epoch_mode(spark):
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_overlap,
        overlap_sql,
    )

    mul = 1_000_000  # epoch micros
    spark.createDataFrame(
        [("a1", 1, 0, 10 * mul), ("a2", 2, 0, 10 * mul)],
        "lid string, user_id long, s long, e long",
    ).createOrReplaceTempView("ov_a_us")
    spark.createDataFrame(
        [("b1", 1, 5 * mul, 15 * mul), ("b2", 2, 50 * mul, 60 * mul)],
        "rid string, uid long, rs long, re long",
    ).createOrReplaceTempView("ov_b_us")
    sql = """SELECT a.lid, b.rid FROM ov_a_us a JOIN ov_b_us b
             ON a.user_id = b.uid AND a.s <= b.re AND b.rs <= a.e"""
    assert explain_overlap(spark, sql) == "overlap_int"
    got = sorted(tuple(r) for r in overlap_sql(spark, sql).collect())
    verbatim = sorted(tuple(r) for r in spark.sql(sql).collect())
    assert got == verbatim == [("a1", "b1")]


def test_nearest_asof_statement(spark, views):
    """The NEAREST modifier (VERDICT r8 'Next round' #9): the closer
    match in either direction wins, exact ties backward; the inequality
    then only names the two ts columns.  Parity vs the direct operator,
    with and without TOLERANCE (per-leg, pandas semantics)."""
    from fabstir_vectordb_spark.operators.temporal import asof_join

    left, right = views
    for tol_clause, tol in (("", None), (" TOLERANCE 5 SECONDS", 5)):
        sql = f"""
        SELECT l.event_id, r.value AS quote_value, r.qts AS quote_ts
        FROM trades l ASOF NEAREST LEFT JOIN quotes r
          ON l.user_id = r.uid AND l.ts >= r.qts{tol_clause}
        """
        assert explain_asof(sql) == "asof"
        got = {
            r["event_id"]: (r["quote_value"], r["quote_ts"])
            for r in asof_sql(spark, sql).collect()
        }
        direct = {
            r["event_id"]: (r["value_r"], r["ts_r"])
            for r in asof_join(
                left, right.withColumnRenamed("uid", "user_id"),
                on="user_id", ts_col="ts", right_ts_col="qts",
                value_cols=["value"], direction="nearest",
                tolerance_seconds=tol,
            ).collect()
        }
        assert got == direct, tol_clause
    # without tolerance: event 0 at ts 10 picks ts 9 (lag 1) over ts 11
    # (lag 1 too — exact tie resolves BACKWARD), event 2 picks ts 50
    assert_no_tol = {
        r["event_id"]: r["quote_ts"]
        for r in asof_sql(
            spark,
            """SELECT l.event_id, r.qts AS quote_ts
               FROM trades l ASOF NEAREST LEFT JOIN quotes r
                 ON l.user_id = r.uid AND l.ts >= r.qts""",
        ).collect()
    }
    assert assert_no_tol == {
        0: _ts(9), 1: _ts(4), 2: _ts(50), 3: None
    }
    # inner NEAREST drops the unmatched row
    inner = {
        r["event_id"]
        for r in asof_sql(
            spark,
            """SELECT l.event_id FROM trades l ASOF NEAREST JOIN quotes r
                 ON l.user_id = r.uid AND l.ts >= r.qts""",
        ).collect()
    }
    assert inner == {0, 1, 2}


@pytest.fixture(scope="module")
def mk_views(spark):
    left = spark.createDataFrame(
        [
            (0, _ts(10), 7, "eu"),
            (1, _ts(10), 7, "us"),   # same user, other region
            (2, _ts(100), 8, "eu"),
            (3, _ts(30), 7, "eu"),
        ],
        "event_id long, ts timestamp, user_id long, region string",
    )
    right = spark.createDataFrame(
        [
            (7, "eu", _ts(4), 1.0),
            (7, "us", _ts(9), 2.0),
            (7, "eu", _ts(25), 3.0),
            (8, "us", _ts(50), 4.0),  # wrong region for event 2
        ],
        "uid long, region string, qts timestamp, value double",
    )
    left.createOrReplaceTempView("mk_trades")
    right.createOrReplaceTempView("mk_quotes")
    return left, right


def test_multi_key_asof_sql_matches_operator(spark, mk_views):
    """Multi-key equality (DuckDB's multi-condition ASOF): the match
    must honor EVERY key — and the rewrite must equal the direct
    asof_join(on=[k1, k2]) operator."""
    from fabstir_vectordb_spark.operators.temporal import asof_join

    left, right = mk_views
    sql = """
    SELECT l.event_id, r.value AS v, r.qts AS matched_ts
    FROM mk_trades l ASOF LEFT JOIN mk_quotes r
      ON l.user_id = r.uid AND l.region = r.region AND l.ts >= r.qts
    """
    assert explain_asof(sql) == "asof"
    got = {
        r["event_id"]: (r["v"], r["matched_ts"])
        for r in asof_sql(spark, sql).collect()
    }
    assert got == {
        0: (1.0, _ts(4)),    # eu: latest eu quote <= 10 is ts 4
        1: (2.0, _ts(9)),    # us: the region key separates the streams
        2: (None, None),     # user 8 has only a us quote
        3: (3.0, _ts(25)),
    }
    for chunk in (None, 7):  # plain AND the hot-key chunked escape hatch
        direct = {
            r["event_id"]: (r["value_r"], r["ts_r"])
            for r in asof_join(
                left,
                right.withColumnRenamed("uid", "user_id"),
                on=["user_id", "region"],
                ts_col="ts", right_ts_col="qts", value_cols=["value"],
                chunk_seconds=chunk,
            ).collect()
        }
        assert direct == got, f"chunk={chunk}"


def test_asof_sql_tolerance_clause(spark, mk_views):
    """TOLERANCE <n> SECONDS maps to asof_join's tolerance_seconds:
    matches older than n seconds surface NULL under ASOF LEFT JOIN and
    drop under inner ASOF JOIN."""
    base = """
    SELECT l.event_id, r.value AS v
    FROM mk_trades l ASOF {J} JOIN mk_quotes r
      ON l.user_id = r.uid AND l.region = r.region AND l.ts >= r.qts
    TOLERANCE 6 SECONDS
    """
    outer = base.format(J="LEFT")
    assert explain_asof(outer) == "asof"
    got = {
        r["event_id"]: r["v"] for r in asof_sql(spark, outer).collect()
    }
    # event 0 matched ts 4 at lag 6 (inclusive), event 1 ts 9 lag 1,
    # event 3's best match ts 25 is lag 5
    assert got == {0: 1.0, 1: 2.0, 2: None, 3: 3.0}

    tight = outer.replace("TOLERANCE 6 SECONDS", "TOLERANCE 2 SECONDS")
    got_t = {
        r["event_id"]: r["v"] for r in asof_sql(spark, tight).collect()
    }
    assert got_t == {0: None, 1: 2.0, 2: None, 3: None}

    inner_t = base.format(J="").replace(
        "TOLERANCE 6 SECONDS", "TOLERANCE 2 SECONDS"
    )
    got_i = {
        r["event_id"]: r["v"] for r in asof_sql(spark, inner_t).collect()
    }
    assert got_i == {1: 2.0}


def test_asof_sql_true_permutation_of_right_names(spark, mk_views):
    """The genuinely adversarial case: the right view's key columns are
    NAMED exactly the left key names but SWAPPED — r.user_id holds the
    region string, r.region holds the uid.  Sequential renames would
    produce duplicate columns; the two-pass rename must align both."""
    left, right = mk_views
    right.select(
        F.col("region").alias("user_id"),    # string under the uid name
        F.col("uid").alias("region"),        # uid under the region name
        "qts", "value",
    ).createOrReplaceTempView("mk_quotes_swapnames")
    sql = """
    SELECT l.event_id, r.value AS v
    FROM mk_trades l ASOF LEFT JOIN mk_quotes_swapnames r
      ON l.user_id = r.region AND l.region = r.user_id AND l.ts >= r.qts
    """
    got = {r["event_id"]: r["v"] for r in asof_sql(spark, sql).collect()}
    assert got == {0: 1.0, 1: 2.0, 2: None, 3: 3.0}


def test_asof_sql_key_collision_raises_cleanly(spark, mk_views):
    """A right payload column named like a left key (but not joined on)
    would silently duplicate after alignment; asof_sql must raise
    AsofSyntaxError naming the clash instead of the downstream
    ambiguous-column error (VERDICT r8 'What's wrong' #3)."""
    left, right = mk_views
    right.withColumn("user_id", F.lit("payload")).createOrReplaceTempView(
        "mk_quotes_clash"
    )
    with pytest.raises(AsofSyntaxError, match="user_id.*collides|collides.*user_id"):
        asof_sql(
            spark,
            """SELECT l.event_id, r.value AS v
               FROM mk_trades l ASOF JOIN mk_quotes_clash r
                 ON l.user_id = r.uid AND l.ts >= r.qts""",
        )


def test_asof_sql_duplicate_key_columns_raise(spark, mk_views):
    with pytest.raises(AsofSyntaxError, match="duplicate key column"):
        asof_sql(
            spark,
            """SELECT l.event_id FROM mk_trades l ASOF JOIN mk_quotes r
               ON l.user_id = r.uid AND l.event_id = r.uid
              AND l.ts >= r.qts""",
        )


def test_asof_sql_two_inequalities_raise(spark, mk_views):
    with pytest.raises(AsofSyntaxError):
        asof_sql(
            spark,
            """SELECT l.event_id FROM mk_trades l ASOF JOIN mk_quotes r
               ON l.ts >= r.qts AND l.ts <= r.qts""",
        )


def test_forward_asof_statement(spark, views):
    """The <= comparator selects the FORWARD as-of (earliest right
    at-or-after, DuckDB's comparator-direction rule) — both in the
    l-first form and the mirrored r-first form."""
    for on_clause in (
        "l.user_id = r.uid AND l.ts <= r.qts",
        "l.user_id = r.uid AND r.qts >= l.ts",   # mirror, same meaning
    ):
        sql = f"""
        SELECT l.event_id, r.value AS quote_value, r.qts AS quote_ts
        FROM trades l ASOF LEFT JOIN quotes r ON {on_clause}
        """
        assert explain_asof(sql) == "asof"
        got = {
            r["event_id"]: (r["quote_value"], r["quote_ts"])
            for r in asof_sql(spark, sql).collect()
        }
        assert got == {
            0: (3.0, _ts(11)),   # earliest quote at-or-after ts 10
            1: (1.0, _ts(4)),    # inclusive boundary
            2: (None, None),     # u8 has no quote at-or-after ts 100
            3: (None, None),     # u9 has no quotes at all
        }, on_clause


@pytest.fixture(scope="module")
def overlap_views(spark):
    a = spark.createDataFrame(
        [
            ("a1", 1, _ts(0), _ts(100)),
            ("a2", 1, _ts(200), _ts(300)),
            ("a3", 2, _ts(0), _ts(100)),
        ],
        "lid string, user_id long, s timestamp, e timestamp",
    )
    b = spark.createDataFrame(
        [
            ("b1", 1, _ts(50), _ts(150)),
            ("b2", 1, _ts(100), _ts(250)),   # touches a1; overlaps a2
            ("b3", 1, _ts(301), _ts(350)),   # disjoint
            ("b4", 2, _ts(90), _ts(600)),
        ],
        "rid string, uid long, rs timestamp, re timestamp",
    )
    a.createOrReplaceTempView("ov_a")
    b.createOrReplaceTempView("ov_b")
    return a, b


OVERLAP_SQL = """
SELECT a.lid, b.rid
FROM ov_a a JOIN ov_b b
  ON a.user_id = b.uid AND a.s <= b.re AND b.rs <= a.e
"""


def test_overlap_sql_rewrites_and_equals_verbatim(spark, overlap_views):
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_overlap,
        overlap_sql,
    )

    assert explain_overlap(spark, OVERLAP_SQL) == "overlap"
    got = sorted(
        (r["lid"], r["rid"]) for r in overlap_sql(spark, OVERLAP_SQL).collect()
    )
    verbatim = sorted(
        (r["lid"], r["rid"]) for r in spark.sql(OVERLAP_SQL).collect()
    )
    assert got == verbatim == sorted(
        [("a1", "b1"), ("a1", "b2"), ("a2", "b2"), ("a3", "b4")]
    )
    # explicit bucket must not change the answer; >= mirrors and swapped
    # conjunct order are the same statement
    tiny = sorted(
        (r["lid"], r["rid"])
        for r in overlap_sql(spark, OVERLAP_SQL, bucket_seconds=7).collect()
    )
    assert tiny == got
    mirrored = """
    SELECT a.lid, b.rid
    FROM ov_a a JOIN ov_b b
      ON b.rs <= a.e AND b.re >= a.s AND a.user_id = b.uid
    """
    assert explain_overlap(spark, mirrored) == "overlap"
    assert sorted(
        (r["lid"], r["rid"]) for r in overlap_sql(spark, mirrored).collect()
    ) == got


def test_overlap_sql_inverted_intervals_delegate_to_verbatim(spark):
    """ADVICE r8 (medium): an INVERTED interval (end < start) CAN
    satisfy the two-inequality overlap predicate — l=(10,5) vs
    r=(3,12): 10<=12 AND 3<=5 — while interval_join drops such rows by
    contract.  The resolver's plan-time inverted-row probe must
    delegate the statement so rewrite == verbatim holds literally even
    on malformed data."""
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_overlap,
        overlap_sql,
    )

    spark.createDataFrame(
        [("inv", 1, _ts(10), _ts(5)), ("ok", 1, _ts(0), _ts(4))],
        "lid string, user_id long, s timestamp, e timestamp",
    ).createOrReplaceTempView("ov_a_inv")
    spark.createDataFrame(
        [("b", 1, _ts(3), _ts(12))],
        "rid string, uid long, rs timestamp, re timestamp",
    ).createOrReplaceTempView("ov_b_inv")
    sql = """SELECT a.lid, b.rid FROM ov_a_inv a JOIN ov_b_inv b
             ON a.user_id = b.uid AND a.s <= b.re AND b.rs <= a.e"""
    assert explain_overlap(spark, sql) == "delegate"
    got = sorted(tuple(r) for r in overlap_sql(spark, sql).collect())
    verbatim = sorted(tuple(r) for r in spark.sql(sql).collect())
    # the verbatim predicate keeps the inverted pair AND the clean one
    assert got == verbatim == [("inv", "b"), ("ok", "b")]

    # clean data on the SAME statement shape still takes the rewrite
    spark.createDataFrame(
        [("ok", 1, _ts(0), _ts(4))],
        "lid string, user_id long, s timestamp, e timestamp",
    ).createOrReplaceTempView("ov_a_inv")
    assert explain_overlap(spark, sql) == "overlap"


def test_overlap_sql_delegates_out_of_shape(spark, overlap_views):
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_overlap,
        overlap_sql,
    )

    for sql in (
        # one-sided inequalities (both lhs from the same table): not the
        # overlap shape, still legal SQL
        """SELECT a.lid FROM ov_a a JOIN ov_b b
           ON a.user_id = b.uid AND a.s <= b.re AND a.e <= b.rs""",
        # range (BETWEEN) statements belong to range_sql
        """SELECT a.lid FROM ov_a a JOIN ov_b b
           ON a.user_id = b.uid AND a.s BETWEEN b.rs AND b.re""",
        # expression select item
        """SELECT a.lid, b.rid, a.s + INTERVAL 1 HOUR AS x
           FROM ov_a a JOIN ov_b b
           ON a.user_id = b.uid AND a.s <= b.re AND b.rs <= a.e""",
        "SELECT count(*) AS n FROM ov_a",
    ):
        assert explain_overlap(spark, sql) == "delegate"
        overlap_sql(spark, sql).collect()  # runs via spark.sql

    # all-integer interval columns now take the NUMERIC-EPOCH rewrite
    # (raw-integer buckets; see test_overlap_sql_numeric_epoch_mode);
    # MIXED integer/timestamp bindings still delegate
    spark.createDataFrame(
        [("x", 1, 0, 10)], "lid string, user_id long, s long, e long"
    ).createOrReplaceTempView("ov_a_int")
    spark.createDataFrame(
        [("y", 1, 5, 15)], "rid string, uid long, rs long, re long"
    ).createOrReplaceTempView("ov_b_int")
    sql_int = """SELECT a.lid, b.rid FROM ov_a_int a JOIN ov_b_int b
                 ON a.user_id = b.uid AND a.s <= b.re AND b.rs <= a.e"""
    assert explain_overlap(spark, sql_int) == "overlap_int"
    assert [tuple(r) for r in overlap_sql(spark, sql_int).collect()] == [
        ("x", "y")
    ]
    mixed = """SELECT a.lid, b.rid FROM ov_a_int a JOIN ov_b b
               ON a.user_id = b.uid AND a.s <= b.re AND b.rs <= a.e"""
    assert explain_overlap(spark, mixed) == "delegate"


def test_asof_sql_right_ts_as_key_raises(spark, mk_views):
    """The right ts column doubling as an ON equality key aligned to a
    DIFFERENT left name would be renamed out from under asof_join
    (unresolved-column failure deep in Spark); asof_sql must diagnose
    the clash up front (r9 review)."""
    with pytest.raises(AsofSyntaxError, match="both roles"):
        asof_sql(
            spark,
            """SELECT l.event_id FROM mk_trades l ASOF JOIN mk_quotes r
               ON l.event_id = r.qts AND l.ts >= r.qts""",
        )


def test_range_sql_key_as_bound_column_delegates(spark, range_views):
    """A key equality that names a time-bound column (ON p.ts = i.s
    AND p.ts BETWEEN i.s AND i.e) cannot survive the key-alignment
    rename — the resolver must DELEGATE the (valid) statement, not
    escape with a KeyError (r9 review)."""
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_range,
        range_sql,
    )

    sql = """
    SELECT p.event_id, i.iv_id AS session
    FROM pts p JOIN ivs i
      ON p.ts = i.s AND p.ts BETWEEN i.s AND i.e
    """
    assert explain_range(spark, sql) == "delegate"
    got = sorted(
        (r["event_id"], r["session"]) for r in range_sql(spark, sql).collect()
    )
    verbatim = sorted(
        (r["event_id"], r["session"]) for r in spark.sql(sql).collect()
    )
    assert got == verbatim


def test_overlap_sql_key_as_bound_column_delegates(spark, overlap_views):
    """Same contract for the overlap resolver: a key that doubles as an
    interval bound delegates instead of crashing (r9 review)."""
    from fabstir_vectordb_spark.plans.sql_temporal import (
        explain_overlap,
        overlap_sql,
    )

    sql = """
    SELECT a.lid, b.rid
    FROM ov_a a JOIN ov_b b
      ON a.s = b.rs AND a.s <= b.re AND b.rs <= a.e
    """
    assert explain_overlap(spark, sql) == "delegate"
    got = sorted(
        (r["lid"], r["rid"]) for r in overlap_sql(spark, sql).collect()
    )
    verbatim = sorted(
        (r["lid"], r["rid"]) for r in spark.sql(sql).collect()
    )
    assert got == verbatim
