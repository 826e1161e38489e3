"""DomainLinksDB — the link-graph partition service's serving-side
store (DomainLinks.java:10-36 / FileDomainLinks): loaded-once sorted
views, searchsorted range lookups, switchInput swap-and-delete."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marginaliasearch_ray.pipelines.linkdb import DomainLinksDB

EDGES = [
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "c", 2),
    ("d", "a", 5),
    ("d", "c", 4),
]


def _write(path, rows):
    pq.write_table(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.string()),
                "dst": pa.array([r[1] for r in rows], pa.string()),
                "weight": pa.array([r[2] for r in rows], pa.int64()),
            }
        ),
        path,
    )


@pytest.fixture()
def db(tmp_path):
    p = str(tmp_path / "edges.parquet")
    _write(p, EDGES)
    return DomainLinksDB(p)


def test_destinations_and_sources(db):
    t = db.find_destinations("a")
    assert t["other"].to_pylist() == ["b", "c"]
    assert t["weight"].to_pylist() == [3, 1]
    assert db.count_destinations("a") == 2
    assert db.count_destinations("zzz") == 0
    t = db.find_sources("c")
    assert t["other"].to_pylist() == ["a", "b", "d"]
    assert t["weight"].to_pylist() == [1, 2, 4]
    assert db.count_sources("c") == 3
    assert db.find_sources("zzz").num_rows == 0


def test_for_each_is_src_major(db):
    pairs = list(db.for_each())
    assert pairs == sorted(pairs)
    assert len(pairs) == len(db) == len(EDGES)


def test_switch_input_swaps_and_deletes(db, tmp_path):
    newfile = str(tmp_path / "edges2.parquet")
    _write(newfile, [("x", "y", 1)])
    db.switch_input(newfile)
    assert not os.path.exists(newfile), "switchInput must delete its input"
    assert db.count_destinations("a") == 0
    assert db.find_destinations("x")["other"].to_pylist() == ["y"]
    assert len(db) == 1
