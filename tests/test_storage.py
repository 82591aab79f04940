"""Storage decorator chain + directory-level integrity
(SURVEY §2 rows 63/70/72/73)."""

import pytest

from fabstir_vectordb_spark.sources.storage import (
    CachingStore,
    ChecksumStore,
    CompressedStore,
    EncryptedStore,
    FileStore,
    StorageError,
    verify_checksums,
    write_checksums,
)


def test_decorator_chain_roundtrip(tmp_path):
    store = ChecksumStore(CompressedStore(FileStore(str(tmp_path / "s"))))
    payload = b'{"version": 3}' * 100
    store.put("manifest.json", payload)
    assert store.get("manifest.json") == payload
    # compressed on disk: raw bytes differ and are shorter
    raw = FileStore(str(tmp_path / "s")).get("manifest.json")
    assert raw != payload and len(raw) < len(payload)


def test_checksum_detects_tamper(tmp_path):
    base = FileStore(str(tmp_path / "s"))
    store = ChecksumStore(base)
    store.put("schema.json", b"original")
    base.put("schema.json", b"tampered")
    with pytest.raises(StorageError, match="checksum mismatch"):
        store.get("schema.json")


def test_missing_key_and_path_escape(tmp_path):
    base = FileStore(str(tmp_path / "s"))
    with pytest.raises(StorageError):
        base.get("absent.json")
    with pytest.raises(StorageError, match="escapes"):
        base.put("../../evil", b"x")


def test_caching_store_counters(tmp_path):
    store = CachingStore(FileStore(str(tmp_path / "s")), max_entries=2)
    store.put("a", b"1")
    store.put("b", b"2")
    store.put("c", b"3")  # evicts a
    assert store.get("b") == b"2" and store.hits == 1
    assert store.get("a") == b"1" and store.misses == 1  # re-read from disk


def test_encrypted_store_gated(tmp_path):
    try:
        import cryptography  # noqa: F401

        has_crypto = True
    except ImportError:
        has_crypto = False
    if has_crypto:
        from cryptography.fernet import Fernet

        key = Fernet.generate_key()
        store = EncryptedStore(FileStore(str(tmp_path / "s")), key)
        store.put("secret.json", b"payload")
        assert store.get("secret.json") == b"payload"
        assert FileStore(str(tmp_path / "s")).get("secret.json") != b"payload"
    else:
        with pytest.raises(NotImplementedError, match="cryptography"):
            EncryptedStore(FileStore(str(tmp_path / "s")), b"k")


def test_dir_checksums_roundtrip_and_tamper(tmp_path):
    root = str(tmp_path / "save")
    base = FileStore(root)
    base.put("manifest.json", b"m")
    base.put("vectors/part-0.parquet", b"data0")
    sums = write_checksums(root)
    assert set(sums) == {"manifest.json", "vectors/part-0.parquet"}
    assert verify_checksums(root)["ok"]
    base.put("vectors/part-0.parquet", b"corrupted")
    res = verify_checksums(root)
    assert not res["ok"] and res["modified"] == ["vectors/part-0.parquet"]


def test_session_save_with_checksums(spark, tmp_path):
    from fabstir_vectordb_spark.session import VectorDbSession, verify_integrity

    s = VectorDbSession(spark)
    s.add_vectors([{"id": f"c{i}", "vector": [float(i), 0.0]} for i in range(5)])
    path = str(tmp_path / "sess")
    s.save(path, checksums=True)
    res = verify_integrity(spark, path)
    assert res["ok"] and res["checksums"]["ok"]
    # corrupt one data file -> verify_integrity flags it
    import glob

    victim = glob.glob(f"{path}/vectors/**/*.parquet", recursive=True)[0]
    with open(victim, "ab") as f:
        f.write(b"junk")
    res2 = verify_integrity(spark, path)
    assert not res2["ok"] and res2["checksums"]["modified"]


def test_filestore_rejects_sibling_root_prefix(tmp_path):
    """A key resolving to a SIBLING directory sharing the root as a
    string prefix (root='.../store', target='.../store2/x') must be
    rejected — the pre-fix prefix check accepted it."""
    import pytest

    from fabstir_vectordb_spark.sources.storage import FileStore, StorageError

    root = tmp_path / "store"
    store = FileStore(str(root))
    with pytest.raises(StorageError):
        store.put("../store2/x.bin", b"escape")
    assert not (tmp_path / "store2").exists()
    # the root itself and nested keys still work
    store.put("a.bin", b"ok")
    store.put("deep/b.bin", b"ok2")
    assert store.get("deep/b.bin") == b"ok2"
