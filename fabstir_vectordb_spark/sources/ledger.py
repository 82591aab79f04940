"""Cross-batch incremental dedup: a fingerprint ledger.

The scenario every continuously-crawled training corpus hits: each new
batch must be deduplicated against EVERYTHING ever kept, not just
against itself (operators/dedup.exact_dedup) or a watermark horizon
(streaming dropDuplicatesWithinWatermark — bounded state by design).
The ledger is the unbounded-history complement: an append-only parquet
table holding one row per RECORDED document — its 16-byte content
fingerprint (functions/text.fingerprint: md5 of lowercased,
whitespace-collapsed text; NULL text folds to '') — giving keep-first
semantics ACROSS batches, the same contract dedup_paragraphs keeps
within a corpus.  What "recorded" means is the caller's policy: commit
survivors for kept-only history, or every processed doc so rejected
content is never re-curated (pipelines.curate_incremental does the
latter).

100 TB shape:
- the ledger stores fingerprints only (16 bytes + partition column per
  kept doc — ~1.6 TB of ledger per 100 billion documents, trivially
  parquet-compressed), never text;
- the batch-vs-history check is one left-anti join keyed on the
  fingerprint: Spark broadcasts a small ledger automatically and
  sort-merge-joins a big one.  The BATCH's rows ride that one exchange
  (the in-batch keep-first window partitions on the same key, so the
  planner reuses it); the HISTORY side moves fingerprints only — the
  accumulated corpus never re-materializes text.  The ledger is
  WRITTEN partitioned by a 1-hex-char fingerprint prefix (16
  partitions) so a filtered lookup can prune, and AQE handles skew
  (md5 is uniform, so there is none);
- commits are append-only parquet writes — no compaction, no rewrite
  of history on the hot path.  A crash between filter and commit
  re-ingests the batch (at-least-once on the ledger); duplicate
  fingerprint ROWS in the ledger are harmless for dedup semantics
  (set membership) and reclaimable with compact().

Reference parity: none (the reference has no text surface); this is
extension-axis, the batch-boundary sibling of streaming/ingest.py's
watermarked dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fabstir_vectordb_spark.functions.text import fingerprint

__all__ = ["FingerprintLedger"]


class FingerprintLedger:
    """Append-only fingerprint history for cross-batch exact dedup.

    Typical loop (processed-not-kept policy, what curate_incremental
    uses — committing only gate-survivors is equally valid when
    rejected content SHOULD be re-examined on a future crawl)::

        ledger = FingerprintLedger(spark, path)
        fresh = ledger.filter_new(batch)       # in-batch + vs-history
        ...gates / curation over fresh...
        ledger.commit(fresh)                   # processed docs join history
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- internals -----------------------------------------------------

    def _manifest_path(self) -> str:
        return f"{self.path}__manifest.json"

    def _hfs(self, path_str: str):
        """(Hadoop FileSystem, Path, jvm) for a path string — the
        store-agnostic file API (works for file://, s3a://, ...)."""
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path_str)
        return p.getFileSystem(self.spark._jsc.hadoopConfiguration()), p, jvm

    def _read_manifest(self) -> dict | None:
        import json

        try:
            fs, p, jvm = self._hfs(self._manifest_path())
            exists = fs.exists(p)
        except Exception:
            # the store has no FileSystem binding in THIS session (e.g.
            # an s3:// path without the connector): behave as the legacy
            # layout — every downstream parquet touch of the same path
            # will fail with the store's own loud error, so nothing is
            # silently misread
            return None
        if not exists:
            return None
        stream = fs.open(p)
        try:
            data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        return json.loads(data.decode("utf-8"))

    def _write_manifest(self, m: dict) -> None:
        """Single-object PUT — atomic on object stores and local FS
        alike (Hadoop create(overwrite) for the former; readers see the
        old or the new manifest, never a torn one at parquet-file
        granularity since the payload is one small JSON object)."""
        import json

        fs, p, _ = self._hfs(self._manifest_path())
        out = fs.create(p, True)
        try:
            out.write(bytearray(json.dumps(m).encode("utf-8")))
        finally:
            out.close()

    def _data_path(self) -> str:
        """Where the live fingerprint table lives: the manifest's
        current generation when one exists (generational layout,
        compact_generational), else the base path (legacy layout)."""
        m = self._read_manifest()
        return m["data"] if m else self.path

    def _read(self) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.parquet(self._data_path())
        except AnalysisException as e:
            # ONLY path-not-found means "no commits yet" — any other
            # failure (permissions, corrupt footer, transient store
            # error) must raise, or a 10M-fingerprint history would
            # silently read as empty and the whole batch would pass as
            # new
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                if self._read_manifest() is not None:
                    # a manifest pointing at missing data is CORRUPTION
                    # (someone deleted the live generation), never a
                    # fresh start — reading empty here would silently
                    # pass every future batch as new
                    raise RuntimeError(
                        f"ledger manifest {self._manifest_path()} points "
                        f"at a missing generation ({self._data_path()}): "
                        "the live data was deleted out-of-band. Restore "
                        "the generation directory or remove the manifest "
                        "EXPLICITLY to start an empty ledger."
                    ) from e
                leftovers = self._swap_leftovers()
                if leftovers:
                    raise RuntimeError(
                        f"ledger missing at {self.path} but compaction "
                        f"leftovers exist ({leftovers}): a compact() swap "
                        "was interrupted. Rename the newest leftover back "
                        "to the ledger path (its '__old-*' copy is the "
                        "complete pre-compaction history; '__compact-*' "
                        "may be partial) instead of starting empty."
                    ) from e
                return None
            raise

    def _swap_leftovers(self) -> list[str]:
        import glob

        esc = glob.escape(self.path)  # a '[3]' in the path is not a charclass
        return sorted(
            glob.glob(esc + "__old-*") + glob.glob(esc + "__compact-*")
        )

    def _guard_interrupted_swap(self) -> None:
        """Refuse to write a fresh ledger over an interrupted compact():
        if nothing lives at the path but swap leftovers exist, an append
        would CREATE a new live directory holding only this batch — and
        the next compact()'s leftover sweep would then delete the
        '__old-*' copy that holds the complete history.  Same recovery
        contract as _read()."""
        import os

        if self._read_manifest() is not None:
            # generational layout: no rename window exists, but the
            # manifest must point at LIVE data — appending into a
            # missing generation would rebuild history from one batch
            fs, p, _ = self._hfs(self._data_path())
            if not fs.exists(p):
                raise RuntimeError(
                    f"ledger manifest {self._manifest_path()} points at "
                    f"a missing generation ({self._data_path()}): "
                    "restore it or remove the manifest explicitly "
                    "before committing."
                )
            return
        if not os.path.exists(self.path):
            leftovers = self._swap_leftovers()
            if leftovers:
                raise RuntimeError(
                    f"ledger missing at {self.path} but compaction "
                    f"leftovers exist ({leftovers}): recover the "
                    "'__old-*' copy (rename it back) before committing, "
                    "or the history would be silently replaced by this "
                    "batch."
                )

    @staticmethod
    def _fp(docs: DataFrame, text_col: str) -> DataFrame:
        return docs.withColumn("__fp", fingerprint(text_col))

    # -- API -----------------------------------------------------------

    def filter_new(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Documents not seen before: first drop in-batch duplicates
        via operators/dedup.drop_exact_duplicates (keep min id — the
        ONE canonical rule, shared so in-corpus and cross-batch dedup
        cannot diverge), then anti-join the batch's fingerprints
        against the ledger (no distinct on the history side: anti-join
        is set-membership already).  Returns the input columns
        unchanged; keep-first is deterministic."""
        from fabstir_vectordb_spark.operators.dedup import (
            drop_exact_duplicates,
        )

        batch = self._fp(
            drop_exact_duplicates(docs, text_col=text_col, id_col=id_col),
            text_col,
        )
        led = self._read()
        if led is not None:
            batch = batch.join(
                led.select(F.col("fp").alias("__fp")), "__fp", "left_anti"
            )
        return batch.drop("__fp")

    def commit(
        self,
        kept: DataFrame,
        text_col: str = "text",
    ) -> None:
        """Append the kept documents' fingerprints to the ledger —
        partitioned by a 1-hex-char prefix for pruned lookups.  Append
        is the only write mode: history is immutable on the hot path."""
        self._guard_interrupted_swap()
        rows = self._fp(kept, text_col).select(
            F.col("__fp").alias("fp"),
            F.substring("__fp", 1, 1).alias("fp_prefix"),
        )
        rows.write.mode("append").partitionBy("fp_prefix").parquet(
            self._data_path()
        )

    def contains(self, docs: DataFrame, text_col: str = "text") -> DataFrame:
        """(input columns..., seen boolean) — membership probe without
        filtering, for audit flows."""
        led = self._read()
        batch = self._fp(docs, text_col)
        if led is None:
            return batch.withColumn("seen", F.lit(False)).drop("__fp")
        marks = (
            led.select(F.col("fp").alias("__fp")).distinct()
            .withColumn("__seen", F.lit(True))
        )
        return (
            batch.join(marks, "__fp", "left")
            .withColumn("seen", F.coalesce("__seen", F.lit(False)))
            .drop("__fp", "__seen")
        )

    def size(self) -> int:
        """Distinct fingerprints on record."""
        led = self._read()
        return 0 if led is None else led.select("fp").distinct().count()

    def compact(self) -> None:
        """Rewrite the ledger to distinct fingerprints — reclaims the
        duplicate rows an at-least-once crash loop may have appended.

        Crash safety: write-to-temp, then TWO atomic renames (live
        aside, temp in), then delete the aside copy.  A complete copy of
        the history therefore exists on disk at every instant; the only
        crash window with nothing AT the live path is between the two
        renames, and _read() refuses to treat that state as an empty
        ledger — it sees the '__old-*' leftover and raises with the
        recovery step instead of silently passing every future batch as
        new.  Stale leftovers from an interrupted run are swept first
        (safe: the live ledger is intact whenever they coexist with
        it).

        LOCAL FILESYSTEM ONLY: the swap relies on POSIX directory
        rename atomicity (and the leftover sweep on local glob), which
        object stores (s3://...) and cross-device mounts do not
        provide.  Checked UP FRONT so a non-local ledger path fails
        before the sweep runs, not mid-swap.  commit()/filter_new()/
        contains() remain plain Spark parquet I/O and work on any
        Hadoop filesystem — only this maintenance rewrite is
        local-bound (an object-store variant would write-new +
        repoint a manifest instead of renaming)."""
        import os
        import shutil
        import uuid

        if self._read_manifest() is not None:
            # already on the generational layout: the manifest swap IS
            # the compaction protocol there, on any store
            return self.compact_generational()
        if "://" in self.path and not self.path.startswith("file://"):
            raise ValueError(
                f"compact() requires a local filesystem ledger path "
                f"(atomic directory rename); got {self.path!r}. "
                "Use compact_generational() — the manifest-pointer "
                "protocol that needs no directory rename — or leave "
                "duplicate rows in place; they are harmless for dedup "
                "semantics."
            )

        led = self._read()
        if led is None:
            return
        for stale in self._swap_leftovers():
            shutil.rmtree(stale)
        tag = uuid.uuid4().hex[:8]
        tmp = f"{self.path}__compact-{tag}"
        led.select("fp", "fp_prefix").distinct().write.mode(
            "overwrite"
        ).partitionBy("fp_prefix").parquet(tmp)
        old = f"{self.path}__old-{tag}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)

    def _gen_dirs(self):
        """[(basename, Hadoop Path)] of generation directories on the
        store, referenced or not.  Basenames are the comparison unit —
        the store may qualify paths with a scheme the manifest string
        doesn't carry (file:/ vs a bare local path)."""
        fs, _, jvm = self._hfs(self.path)
        pattern = jvm.org.apache.hadoop.fs.Path(f"{self.path}__gen-*")
        return sorted(
            (str(st.getPath().getName()), st.getPath())
            for st in (fs.globStatus(pattern) or [])
        )

    def compact_generational(self) -> None:
        """Object-store-safe compaction: the write-new-generation +
        manifest-pointer protocol — NO directory rename anywhere, so it
        works on rename-less stores (S3 and friends) where compact()'s
        two-rename swap cannot.

        Protocol: write the distinct history to a fresh
        ``{path}__gen-<tag>`` directory, atomically repoint the
        single-file ``{path}__manifest.json`` at it (one small-object
        PUT), then best-effort delete the previous live directory (the
        prior generation, or the legacy base directory on the first
        generational run).  Every crash window leaves a readable
        ledger: before the PUT the old pointer/base dir is live and the
        new generation is an unreferenced leftover (swept by the next
        run); after the PUT the new generation is live.  Unlike the
        rename swap there is never an instant with nothing at the live
        location.

        After the first run the ledger is permanently on the
        generational layout: reads and commits resolve through the
        manifest, and compact() delegates here.  The parquet writes
        themselves go through whatever output committer the session is
        configured with — on object stores, use a store-appropriate
        committer as for any Spark job."""
        import uuid

        led = self._read()
        if led is None:
            return
        current = self._data_path()
        cur_name = current.rstrip("/").rsplit("/", 1)[-1]
        fs, _, jvm = self._hfs(self.path)
        # sweep unreferenced generations from interrupted runs (safe:
        # `current` is live and complete whenever leftovers coexist)
        for name, jpath in self._gen_dirs():
            if name != cur_name:
                fs.delete(jpath, True)
        gen = f"{self.path}__gen-{uuid.uuid4().hex[:8]}"
        led.select("fp", "fp_prefix").distinct().write.mode(
            "overwrite"
        ).partitionBy("fp_prefix").parquet(gen)
        self._write_manifest({"data": gen})
        if current != gen:
            fs.delete(jvm.org.apache.hadoop.fs.Path(current), True)
