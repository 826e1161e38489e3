"""Domain blob-store tests: sorted multi-row-group layout, pruned point
lookups (hit / miss / out-of-range), content round-trip, and the
has() probe (FaviconGrpcService / ScreenshotService shapes)."""

import hashlib
import os

import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines import blobstore


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    import ray.data

    # 1000 domains -> 4 row groups at 256 rows/group: lookups must
    # cross group boundaries correctly
    doms = [f"dom{i:05d}.example" for i in range(1000)]
    docs = ray.data.from_arrow(
        pa.table({"source": pa.array(doms * 2, pa.string())})  # dups
    )
    path = str(tmp_path_factory.mktemp("blob") / "favicons.parquet")
    n = blobstore.build_favicon_store(docs, path)
    assert n == 1000  # distinct domains only
    return blobstore.DomainBlobStore(path)


def test_multi_row_group_layout(store):
    assert store._file.metadata.num_row_groups >= 4
    assert len(store) == 1000


def test_point_lookup_roundtrip(store):
    for d in ["dom00000.example", "dom00255.example", "dom00256.example",
              "dom00999.example", "dom00500.example"]:
        ct, data = store.get(d)
        assert ct == blobstore.FAVICON_CONTENT_TYPE
        assert data == hashlib.sha256(d.encode()).digest()


def test_misses(store):
    assert store.get("aaa.before-range") is None  # before group 0
    assert store.get("zzz.after-range") is None  # after the last max
    assert store.get("dom00500.exampl") is None  # inside a group, absent
    assert store.has("dom00042.example") is True
    assert store.has("nosuch.example") is False


def test_empty_store(tmp_path, ray_session):
    import ray.data

    docs = ray.data.from_arrow(
        pa.table({"source": pa.array([], pa.string())})
    )
    path = str(tmp_path / "empty.parquet")
    assert blobstore.build_favicon_store(docs, path) == 0
    empty = blobstore.DomainBlobStore(path)  # stats-less group
    assert len(empty) == 0
    assert empty.get("anything") is None
    assert empty.has("anything") is False


def test_pruned_read_touches_one_group(store, monkeypatch):
    calls = []
    orig = store._file.read_row_group

    def spy(g, **kw):
        calls.append(g)
        return orig(g, **kw)

    monkeypatch.setattr(store._file, "read_row_group", spy)
    store.get("dom00777.example")
    assert len(calls) == 1  # exactly one row group decoded
