"""Storage decorators for sidecar artifacts — the reference's storage
trait + decorator stack (SURVEY §2 rows 63/72/73: src/storage decorators
for compression / encryption / caching / integrity), mapped to where it
still means something on Spark.

The BULK data plane needs none of this: parquet already owns compression
(codec knob on every writer here), caching is the Spark block manager,
and encryption-at-rest for table data belongs to the filesystem layer
(HDFS TDE, S3 SSE/KMS, or parquet modular encryption with a real KMS) —
wrapping parquet bytes in application crypto would break the scan path
(pushdown, pruning, column projection).

What DOES remain application-level is the small-artifact plane: manifest
/ schema / index sidecars and backup metadata.  This module gives those
the reference's decorator chain:

    store = ChecksumStore(CompressedStore(FileStore(root)))
    store.put("manifest.json", data)      # zlib + .sha256 sidecar
    store.get("manifest.json")            # verified, decompressed

plus directory-level integrity for a whole save
(``write_checksums``/``verify_checksums``) that session saves can adopt
without changing their format.  ``EncryptedStore`` is gated behind the
optional ``cryptography`` package (same honest-stub policy as the former
PIL decode branch): the chain and key handling are real, the cipher is
only available when the library is installed.
"""

from __future__ import annotations

import hashlib
import json
import os
import zlib
from collections import OrderedDict


class StorageError(IOError):
    pass


class FileStore:
    """Base store: opaque byte objects under a root directory
    (the storage trait, src/storage/mod.rs)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _p(self, key: str) -> str:
        root = os.path.normpath(self.root)
        p = os.path.normpath(os.path.join(root, key))
        # a bare prefix check would accept sibling dirs ('/data/store2'
        # starts with '/data/store'); require root itself or root + sep
        if p != root and not p.startswith(root + os.sep):
            raise StorageError(f"key escapes store root: {key!r}")
        return p

    def put(self, key: str, data: bytes) -> None:
        p = self._p(key)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)

    def get(self, key: str) -> bytes:
        try:
            with open(self._p(key), "rb") as f:
                return f.read()
        except FileNotFoundError as e:
            raise StorageError(str(e)) from e

    def exists(self, key: str) -> bool:
        return os.path.exists(self._p(key))


class _Decorator:
    def __init__(self, inner):
        self.inner = inner

    def exists(self, key: str) -> bool:
        return self.inner.exists(key)


class CompressedStore(_Decorator):
    """zlib round-trip (the reference compresses sidecars with zstd;
    zlib is the stdlib equivalent — parquet data keeps its own codec)."""

    def __init__(self, inner, level: int = 6):
        super().__init__(inner)
        self.level = level

    def put(self, key: str, data: bytes) -> None:
        self.inner.put(key, zlib.compress(data, self.level))

    def get(self, key: str) -> bytes:
        return zlib.decompress(self.inner.get(key))


class ChecksumStore(_Decorator):
    """sha256 sidecar per object, verified on every get (integrity
    decorator; tamper/corruption surfaces as StorageError, not garbage)."""

    def put(self, key: str, data: bytes) -> None:
        self.inner.put(key, data)
        self.inner.put(
            key + ".sha256", hashlib.sha256(data).hexdigest().encode()
        )

    def get(self, key: str) -> bytes:
        data = self.inner.get(key)
        want = self.inner.get(key + ".sha256").decode()
        got = hashlib.sha256(data).hexdigest()
        if got != want:
            raise StorageError(
                f"checksum mismatch for {key!r}: {got[:12]}... != {want[:12]}..."
            )
        return data


class CachingStore(_Decorator):
    """Small LRU over get (the reference's chunk-cache decorator; bulk
    reads use the Spark block cache instead)."""

    def __init__(self, inner, max_entries: int = 64):
        super().__init__(inner)
        self.max_entries = max_entries
        self._cache: OrderedDict[str, bytes] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def put(self, key: str, data: bytes) -> None:
        self.inner.put(key, data)
        self.put_cache_only(key, data)

    def get(self, key: str) -> bytes:
        if key in self._cache:
            self.hits += 1
            self._cache.move_to_end(key)
            return self._cache[key]
        self.misses += 1
        data = self.inner.get(key)
        self.put_cache_only(key, data)
        return data

    def put_cache_only(self, key: str, data: bytes) -> None:
        self._cache[key] = data
        self._cache.move_to_end(key)
        while len(self._cache) > self.max_entries:
            self._cache.popitem(last=False)


class EncryptedStore(_Decorator):
    """AES-GCM (Fernet) encryption for sidecar artifacts, gated behind
    the optional ``cryptography`` package — the decorator chain and key
    discipline are real; without the library, construction raises with
    the FS-level-encryption guidance instead of silently no-opping."""

    def __init__(self, inner, key: bytes):
        super().__init__(inner)
        try:
            from cryptography.fernet import Fernet  # type: ignore
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "EncryptedStore needs the optional 'cryptography' package; "
                "for table data prefer filesystem-level encryption "
                "(HDFS TDE / S3 SSE / parquet modular encryption)"
            ) from e
        self._f = Fernet(key)

    def put(self, key: str, data: bytes) -> None:
        self.inner.put(key, self._f.encrypt(data))

    def get(self, key: str) -> bytes:
        return self._f.decrypt(self.inner.get(key))


# ---------------------------------------------------------------------------
# directory-level integrity for whole saves
# ---------------------------------------------------------------------------

CHECKSUM_FILE = "checksums.json"


def _iter_files(root: str):
    for dirpath, _, files in os.walk(root):
        for name in files:
            if name == CHECKSUM_FILE or name.startswith("."):
                continue
            full = os.path.join(dirpath, name)
            yield os.path.relpath(full, root), full


def write_checksums(root: str) -> dict:
    """sha256 every file under ``root`` into checksums.json — call after
    a save; verify_checksums (or session verify_integrity) checks it."""
    sums = {}
    for rel, full in _iter_files(root):
        h = hashlib.sha256()
        with open(full, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        sums[rel] = h.hexdigest()
    with open(os.path.join(root, CHECKSUM_FILE), "w") as f:
        json.dump({"algorithm": "sha256", "files": sums}, f)
    return sums


def verify_checksums(root: str) -> dict:
    """{ok, checked, missing, modified, extra} vs checksums.json.
    ``extra`` lists files present but unrecorded (informational — a
    rewritten save should refresh its checksums)."""
    path = os.path.join(root, CHECKSUM_FILE)
    if not os.path.exists(path):
        return {"ok": False, "error": "no checksum manifest", "checked": 0,
                "missing": [], "modified": [], "extra": []}
    with open(path) as f:
        recorded = json.load(f)["files"]
    current = dict(_iter_files(root))
    missing, modified = [], []
    for rel, want in recorded.items():
        full = current.pop(rel, None)
        if full is None:
            missing.append(rel)
            continue
        h = hashlib.sha256()
        with open(full, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != want:
            modified.append(rel)
    extra = sorted(current)
    return {
        "ok": not missing and not modified,
        "checked": len(recorded),
        "missing": sorted(missing),
        "modified": sorted(modified),
        "extra": extra,
    }
