"""Memory store + snapshot tests (store behaviour surface, atomic batch
insert, closed semantics, checksum verification; mirrors
test/vector_store_compat_test.exs and the ETS snapshot paths)."""

import hashlib
import threading

import numpy as np
import pytest

from vettore_tpu import errors
from vettore_tpu.embedding import Embedding
from vettore_tpu.store.memory import MemoryStore
from vettore_tpu.store.snapshot import MAGIC, load_snapshot, save_snapshot


def record(id, vec=None, **kw):
    return Embedding(id=id, value=kw.get("value", id), vector=vec or [1.0, 0.0], **{
        k: v for k, v in kw.items() if k != "value"
    })


class TestCrud:
    def test_put_get_delete_all_count_fold(self):
        store = MemoryStore({"metric": "l2"})
        store.put(record("a"))
        store.put_many([record("b"), record("c")])
        assert store.get("a").id == "a"
        assert store.count() == 3
        assert sorted(e.id for e in store.all()) == ["a", "b", "c"]
        assert store.fold(lambda e, acc: acc + 1, 0) == 3
        store.delete("b")
        assert store.count() == 2
        with pytest.raises(errors.NotFound):
            store.get("b")
        store.delete("missing")  # idempotent

    def test_batch_insert_is_atomic_on_duplicates(self):
        store = MemoryStore()
        store.put(record("a"))
        with pytest.raises(errors.DuplicateId):
            store.put_many([record("b"), record("a")])
        with pytest.raises(errors.DuplicateId):
            store.put_many([record("x"), record("x")])
        assert store.count() == 1

    def test_configure(self):
        store = MemoryStore({"metric": "l2"})
        store.configure({"metric": "cosine"})
        assert store.config()["metric"] == "cosine"

    def test_closed(self):
        store = MemoryStore()
        store.put(record("a"))
        store.close()
        store.close()  # idempotent
        assert not store.alive()
        for op in [
            lambda: store.get("a"),
            lambda: store.put(record("b")),
            lambda: store.all(),
            lambda: store.delete("a"),
            lambda: store.count(),
            lambda: store.snapshot("/tmp/never.snap"),
        ]:
            with pytest.raises(errors.Closed):
                op()

    def test_concurrent_readers_during_writes(self):
        store = MemoryStore()
        store.put_many([record(f"{i:03d}") for i in range(64)])
        stop = threading.Event()
        failures = []

        def reader():
            while not stop.is_set():
                try:
                    rows = store.all()
                    assert len(rows) >= 64
                    store.get("000")
                except Exception as exc:  # pragma: no cover
                    failures.append(exc)
                    return

        threads = [threading.Thread(target=reader) for _ in range(8)]
        for t in threads:
            t.start()
        for i in range(64, 256):
            store.put(record(f"{i:03d}"))
        stop.set()
        for t in threads:
            t.join()
        assert not failures
        assert store.count() == 256


class TestSnapshot:
    def test_round_trip(self, tmp_path):
        path = str(tmp_path / "sub" / "store.snap")
        store = MemoryStore({"metric": "cosine", "dimensions": 2})
        store.put_many(
            [
                Embedding(id="a", value="va", vector=[1.0, 0.0], binary_vector=[1],
                          metadata={"k": 1}),
                Embedding(id="b", value="vb", vector=[0.0, 1.0], binary_vector=[2],
                          vectors=[[0.0, 1.0], [1.0, 1.0]]),
            ]
        )
        store.snapshot(path)
        loaded, config = MemoryStore.load_snapshot(path)
        assert config == {"metric": "cosine", "dimensions": 2}
        a, b = loaded.get("a"), loaded.get("b")
        assert a.value == "va" and a.metadata == {"k": 1}
        # loaded vectors are ndarray row views (no per-element Python floats)
        assert np.array_equal(np.asarray(a.vector), [1.0, 0.0])
        assert np.array_equal(np.asarray(a.binary_vector, dtype=np.uint64), [1])
        assert np.array_equal(np.asarray(b.vectors), [[0.0, 1.0], [1.0, 1.0]])

    def test_empty_round_trip(self, tmp_path):
        path = str(tmp_path / "empty.snap")
        store = MemoryStore({"x": 1})
        store.snapshot(path)
        loaded, config = MemoryStore.load_snapshot(path)
        assert config == {"x": 1}
        assert loaded.count() == 0

    def test_checksum_corruption_rejected(self, tmp_path):
        path = str(tmp_path / "c.snap")
        store = MemoryStore({})
        store.put(record("a"))
        store.snapshot(path)
        blob = bytearray(open(path, "rb").read())
        blob[-1] ^= 0xFF
        open(path, "wb").write(bytes(blob))
        with pytest.raises(errors.InvalidSnapshot):
            MemoryStore.load_snapshot(path)

    def test_bad_magic_and_missing_file(self, tmp_path):
        path = str(tmp_path / "bad.snap")
        open(path, "wb").write(b"not a snapshot")
        with pytest.raises(errors.InvalidSnapshot):
            load_snapshot(path)
        with pytest.raises(errors.InvalidSnapshot):
            load_snapshot(str(tmp_path / "missing.snap"))

    def test_tampered_count_rejected(self, tmp_path):
        # rewrite payload with a valid checksum but inconsistent object count
        path = str(tmp_path / "t.snap")
        save_snapshot(path, {}, [record("a")])
        blob = open(path, "rb").read()
        payload = blob[len(MAGIC) + 16 :]
        import io

        import numpy as np

        archive = dict(np.load(io.BytesIO(payload), allow_pickle=False))
        archive["object_count"] = np.int64(5)
        buf = io.BytesIO()
        np.savez(buf, **archive)
        tampered = buf.getvalue()
        with open(path, "wb") as f:
            f.write(MAGIC)
            f.write(hashlib.md5(tampered).digest())
            f.write(tampered)
        with pytest.raises(errors.InvalidSnapshot):
            load_snapshot(path)

    def test_unserializable_metadata_rejected(self, tmp_path):
        store = MemoryStore({})
        store.put(Embedding(id="a", value=object(), vector=[1.0]))
        with pytest.raises(errors.InvalidSnapshot):
            store.snapshot(str(tmp_path / "x.snap"))
