"""Legacy DB-style compat API tests (mirrors vector_store_compat_test.exs and
the doctests in /root/reference/lib/vettore.ex:317-642)."""

import pytest

import vettore_tpu as vt
from vettore_tpu import errors


@pytest.fixture
def db():
    handle = vt.DB()
    yield handle
    handle.close()


class TestCompatLifecycle:
    def test_create_insert_search(self, db):
        assert db.create_collection("legacy", 2, "cosine") == "legacy"
        assert db.insert("legacy", {"value": "a", "vector": [1.0, 0.0]}) == "a"
        results = db.similarity_search("legacy", [1.0, 0.0], limit=1)
        assert results[0][0] == "a"
        assert results[0][1] == 1.0  # compat score defaults to similarity mode

    def test_duplicate_collection(self, db):
        db.create_collection("docs", 2)
        with pytest.raises(errors.VettoreError) as info:
            db.create_collection("docs", 2)
        assert info.value.reason == "collection_already_exists"

    def test_delete_collection(self, db):
        db.create_collection("docs", 2)
        assert db.delete_collection("docs") == "docs"
        with pytest.raises(errors.VettoreError) as info:
            db.similarity_search("docs", [1.0, 0.0])
        assert info.value.reason == "collection_not_found"
        with pytest.raises(errors.VettoreError):
            db.delete_collection("docs")

    def test_metric_aliases(self, db):
        db.create_collection("ham", 2, "binary")
        assert db.collection("ham").metric == "hamming"
        db.create_collection("ann", 2, "hnsw")
        col = db.collection("ann")
        assert col.metric == "l2"
        assert col.index_kind == "hnsw"
        db.create_collection("euc", 2, "euclidean")
        assert db.collection("euc").metric == "l2"

    def test_batch_get_all_delete(self, db):
        db.create_collection("docs", 2, "l2")
        ids = db.batch("docs", [
            {"id": "a", "vector": [0.0, 0.0], "metadata": {"kind": "origin"}},
            {"id": "b", "vector": [1.0, 1.0]},
        ])
        assert ids == ["a", "b"]
        records = db.get_all("docs")
        assert ("a", [0.0, 0.0], {"kind": "origin"}) in records
        assert db.delete("docs", "a") == "a"
        assert len(db.get_all("docs")) == 1

    def test_get_by_value_and_vector(self, db):
        db.create_collection("docs", 2, "cosine")
        db.insert("docs", {"id": "a", "vector": [1.0, 0.0]})
        assert db.get_by_value("docs", "a").id == "a"
        with pytest.raises(errors.NotFound):
            db.get_by_value("docs", "missing")
        assert db.get_by_vector("docs", [1.0, 0.0]).id == "a"
        with pytest.raises(errors.NotFound):
            db.get_by_vector("docs", [0.0, 1.0])

    def test_rerank(self, db):
        db.create_collection("docs", 2, "cosine")
        db.insert("docs", {"id": "a", "vector": [1.0, 0.0]})
        db.insert("docs", {"id": "b", "vector": [0.0, 1.0]})
        assert db.rerank("docs", [("a", 0.9), ("b", 0.8)], limit=1) == [("a", 0.9)]

    def test_closed_db(self):
        db = vt.DB()
        db.create_collection("docs", 2)
        db.close()
        db.close()  # idempotent
        with pytest.raises(errors.Closed):
            db.create_collection("other", 2)
        with pytest.raises(errors.Closed):
            db.similarity_search("docs", [1.0, 0.0])
