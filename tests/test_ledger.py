"""Cross-batch fingerprint ledger (sources/ledger.py): keep-first
semantics across batches, at-least-once commit safety, membership
probe, and compaction."""

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.sources.ledger import FingerprintLedger


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_batch_keep_first(spark, tmp_path):
    led = FingerprintLedger(spark, str(tmp_path / "led"))

    b1 = _docs(spark, [
        (0, "alpha content"),
        (1, "beta content"),
        (2, "ALPHA   content"),   # in-batch dup of 0 (normalized)
    ])
    f1 = led.filter_new(b1)
    ids1 = sorted(r["doc_id"] for r in f1.collect())
    assert ids1 == [0, 1]         # in-batch dup dropped, min id kept
    led.commit(f1)

    b2 = _docs(spark, [
        (10, "beta content"),     # seen in batch 1 -> dropped
        (11, "gamma content"),    # new
    ])
    f2 = led.filter_new(b2)
    assert sorted(r["doc_id"] for r in f2.collect()) == [11]
    led.commit(f2)
    assert led.size() == 3

    # third batch: everything already known
    b3 = _docs(spark, [(20, "alpha content"), (21, "gamma content")])
    assert led.filter_new(b3).count() == 0


def test_commit_is_at_least_once_safe(spark, tmp_path):
    led = FingerprintLedger(spark, str(tmp_path / "led2"))
    b = _docs(spark, [(0, "only doc")])
    kept = led.filter_new(b)
    led.commit(kept)
    led.commit(kept)              # crash-retry double commit
    assert led.size() == 1        # set semantics: size counts DISTINCT
    assert led.filter_new(b).count() == 0
    led.compact()                 # reclaims the duplicate rows
    assert led.size() == 1
    raw = spark.read.parquet(str(tmp_path / "led2"))
    assert raw.count() == 1       # physically one row after compaction


def test_contains_probe_and_empty_ledger(spark, tmp_path):
    led = FingerprintLedger(spark, str(tmp_path / "led3"))
    b = _docs(spark, [(0, "x one"), (1, "y two")])
    # empty ledger: nothing seen
    assert {r["seen"] for r in led.contains(b).collect()} == {False}
    led.commit(led.filter_new(b))
    probe = _docs(spark, [(5, "x one"), (6, "z three")])
    got = {r["doc_id"]: r["seen"] for r in led.contains(probe).collect()}
    assert got == {5: True, 6: False}
    # input columns pass through unchanged
    assert set(led.contains(probe).columns) == {"doc_id", "text", "seen"}


def test_curate_incremental_two_batches(spark, tmp_path):
    """The incremental loop: batch 2 re-delivers batch-1 content (plus
    a doc batch 1's gates REJECTED) — none of it is re-curated; only
    the genuinely new document flows through the funnel."""
    from fabstir_vectordb_spark.pipelines import curate_incremental

    led = FingerprintLedger(spark, str(tmp_path / "cled"))
    kw = dict(
        boilerplate_min_doc_freq=None, lang=None, min_quality=None,
        max_repetition=1.0, token_bounds=(3, 5000), near_dup_threshold=None,
    )
    b1 = _docs(spark, [
        (0, "the first document with several words"),
        (1, "no"),                                    # rejected: too short
    ])
    out1 = curate_incremental(led, b1, **kw)
    assert {r["id"] for r in out1.collect()} == {0}
    assert led.size() == 2                            # PROCESSED, not kept

    b2 = _docs(spark, [
        (10, "the first document with several words"),  # re-crawl of 0
        (11, "no"),                                      # re-crawl of rejected 1
        (12, "a genuinely new document arrives here"),
    ])
    out2 = curate_incremental(led, b2, **kw)
    assert {r["id"] for r in out2.collect()} == {12}
    assert led.size() == 3


def test_null_text_documents_are_remembered(spark, tmp_path):
    """NULL text folds to the empty fingerprint (normalized_text's
    null-safety): the first null/empty-text doc is recorded and every
    later one — null OR empty — is recognized as seen.  Pre-fix, NULL
    fingerprints never matched in the anti-join and such docs escaped
    the ledger forever."""
    led = FingerprintLedger(spark, str(tmp_path / "lednull"))
    b1 = spark.createDataFrame(
        [(0, None), (1, "real content here")], "doc_id long, text string"
    )
    f1 = led.filter_new(b1)
    assert {r["doc_id"] for r in f1.collect()} == {0, 1}
    led.commit(f1)

    b2 = spark.createDataFrame(
        [(10, None), (11, ""), (12, "   ")], "doc_id long, text string"
    )
    # all three normalize to the already-recorded empty fingerprint
    assert led.filter_new(b2).count() == 0


def test_corrupt_ledger_raises_instead_of_reading_empty(spark, tmp_path):
    """Only path-not-found means 'no commits yet' — a corrupt ledger
    must raise, never silently read as empty history (which would pass
    the whole batch as new and flood the corpus with duplicates)."""
    import pytest

    path = tmp_path / "ledbad"
    path.mkdir()
    (path / "part-00000.parquet").write_bytes(b"this is not parquet")
    led = FingerprintLedger(spark, str(path))
    b = _docs(spark, [(0, "content")])
    with pytest.raises(Exception):
        led.filter_new(b).collect()


def test_interrupted_compact_swap_raises_not_empty(spark, tmp_path):
    """A crash between compact()'s two renames leaves the history at
    '__old-*' and nothing at the live path.  _read() must refuse to
    treat that as an empty ledger — the '__old' copy IS the complete
    dedup history — and must name the recovery step."""
    import os

    import pytest

    led = FingerprintLedger(spark, str(tmp_path / "ledswap"))
    b = _docs(spark, [(0, "swap content")])
    led.commit(led.filter_new(b))
    # simulate the crash window: live dir renamed aside, new not yet in
    os.rename(str(tmp_path / "ledswap"), str(tmp_path / "ledswap__old-cafe1234"))
    with pytest.raises(RuntimeError, match="compact.*interrupted|interrupted"):
        led.filter_new(b).collect()
    # operator recovery: rename the old copy back -> ledger works again
    os.rename(str(tmp_path / "ledswap__old-cafe1234"), str(tmp_path / "ledswap"))
    assert led.filter_new(b).count() == 0


def test_compact_sweeps_stale_leftovers(spark, tmp_path):
    """Stale '__compact-*' temp dirs from an interrupted run (live
    ledger intact) are swept by the next compact(), and the swap leaves
    exactly the live directory behind."""
    import os

    led = FingerprintLedger(spark, str(tmp_path / "ledsweep"))
    b = _docs(spark, [(0, "sweep one"), (1, "sweep two")])
    kept = led.filter_new(b)
    led.commit(kept)
    led.commit(kept)  # duplicate rows to reclaim
    stale = tmp_path / "ledsweep__compact-deadbeef"
    stale.mkdir()
    (stale / "junk").write_text("partial write from a crashed run")
    led.compact()
    names = sorted(os.listdir(tmp_path))
    assert names == ["ledsweep"]  # no __old-*, no __compact-* remain
    assert led.size() == 2
    assert spark.read.parquet(str(tmp_path / "ledsweep")).count() == 2


def test_commit_refuses_to_replace_interrupted_swap(spark, tmp_path):
    """A bare commit() while the live path is missing but swap leftovers
    exist must raise — otherwise the append CREATES a fresh one-batch
    ledger and the next compact()'s sweep deletes the '__old-*' copy
    holding the complete history."""
    import os

    import pytest

    led = FingerprintLedger(spark, str(tmp_path / "ledguard"))
    b = _docs(spark, [(0, "guard content")])
    led.commit(led.filter_new(b))
    os.rename(
        str(tmp_path / "ledguard"), str(tmp_path / "ledguard__old-feed1234")
    )
    with pytest.raises(RuntimeError, match="leftovers"):
        led.commit(b)
    # history still recoverable: nothing was written at the live path
    assert not os.path.exists(str(tmp_path / "ledguard"))
    os.rename(
        str(tmp_path / "ledguard__old-feed1234"), str(tmp_path / "ledguard")
    )
    assert led.filter_new(b).count() == 0


def test_swap_guard_survives_glob_metachars_in_path(spark, tmp_path):
    """A '[3]' in the ledger path must not disable the interrupted-swap
    detection (glob would read it as a character class)."""
    import os

    import pytest

    base = tmp_path / "run[3]"
    base.mkdir()
    led = FingerprintLedger(spark, str(base / "led"))
    b = _docs(spark, [(0, "meta content")])
    led.commit(led.filter_new(b))
    os.rename(str(base / "led"), str(base / "led__old-abcd1234"))
    with pytest.raises(RuntimeError):
        led.filter_new(b).collect()


def test_compact_refuses_non_local_path(spark):
    """compact()'s two-rename swap relies on POSIX directory-rename
    atomicity; an object-store ledger path must fail UP FRONT (before
    the leftover sweep), not mid-swap."""
    led = FingerprintLedger(spark, "s3://bucket/ledger")
    with pytest.raises(ValueError, match="local filesystem"):
        led.compact()


def test_generational_compact_rename_less(spark, tmp_path, monkeypatch):
    """compact_generational is the object-store protocol: write a new
    generation + repoint a single-file manifest, NO Python-side
    directory rename (asserted by poisoning os.rename/os.replace) —
    history survives, duplicates reclaim, reads and commits resolve
    through the manifest afterwards."""
    import os
    import shutil

    led = FingerprintLedger(spark, str(tmp_path / "gled"))
    b1 = led.filter_new(_docs(spark, [(0, "alpha"), (1, "beta")]))
    led.commit(b1)
    led.commit(b1)  # at-least-once duplicate rows
    assert led.size() == 2

    def boom(*a, **k):  # the rename-less store simulation
        raise AssertionError("directory rename used on a rename-less store")

    monkeypatch.setattr(os, "rename", boom)
    monkeypatch.setattr(os, "replace", boom)
    monkeypatch.setattr(shutil, "move", boom)
    led.compact_generational()
    assert led.size() == 2
    # the live table now sits in a generation dir behind the manifest
    assert (tmp_path / "gled__manifest.json").exists()
    gen1 = led._data_path()
    assert "__gen-" in gen1
    # membership still works, commits land in the generation
    b2 = led.filter_new(_docs(spark, [(2, "alpha"), (3, "gamma")]))
    assert sorted(r["doc_id"] for r in b2.collect()) == [3]
    led.commit(b2)
    assert led.size() == 3

    # a second compaction rotates generations and deletes the old one
    led.compact_generational()
    gen2 = led._data_path()
    assert gen2 != gen1 and "__gen-" in gen2
    assert not os.path.exists(gen1)
    assert led.size() == 3

    # compact() on the generational layout delegates (still no rename)
    led.commit(led.filter_new(_docs(spark, [(4, "delta")])))
    led.compact()
    assert led.size() == 4
    assert led._data_path() not in (gen1, gen2)


def test_generational_compact_interrupted_run_is_recoverable(
    spark, tmp_path
):
    """Crash before the manifest PUT: the freshly-written generation is
    an unreferenced leftover; the old layout stays live, reads are
    unaffected, and the next compaction sweeps the orphan."""
    import os

    led = FingerprintLedger(spark, str(tmp_path / "iled"))
    led.commit(led.filter_new(_docs(spark, [(0, "one"), (1, "two")])))

    # simulate the interrupted run: a complete generation exists but
    # the manifest was never written
    orphan = str(tmp_path / "iled__gen-deadbeef")
    spark.read.parquet(str(tmp_path / "iled")).write.partitionBy(
        "fp_prefix"
    ).parquet(orphan)
    assert led._data_path() == str(tmp_path / "iled")  # legacy still live
    assert led.size() == 2

    led.compact_generational()
    assert led.size() == 2
    assert not os.path.exists(orphan)          # orphan swept
    assert "__gen-" in led._data_path()
    assert not os.path.exists(str(tmp_path / "iled"))  # base dir retired


def test_manifest_pointing_at_missing_generation_raises(spark, tmp_path):
    """A manifest whose generation directory was deleted out-of-band is
    corruption, not a fresh start: reads and commits must raise instead
    of silently rebuilding history from one batch."""
    import shutil

    led = FingerprintLedger(spark, str(tmp_path / "mled"))
    led.commit(led.filter_new(_docs(spark, [(0, "alpha"), (1, "beta")])))
    led.compact_generational()
    gen = led._data_path()
    shutil.rmtree(gen)

    with pytest.raises(RuntimeError, match="missing generation"):
        led.size()
    with pytest.raises(RuntimeError, match="missing generation"):
        led.commit(_docs(spark, [(2, "gamma")]))
