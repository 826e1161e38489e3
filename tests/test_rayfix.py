"""Regression for the Ray 2.49 hash-shuffle schema-broadcast race
(marginaliasearch_ray._rayfix): a join whose input sequence leads with an
empty block — routine for aggregate outputs and parallel parquet reads of
small inputs — must not finalize empty partitions as zero-column tables
(Acero 'No match ... FieldRef' abort).  words_tfidf over a tiny
checkpointed corpus hits exactly this shape."""

import pyarrow as pa
import pyarrow.parquet as pq

import marginaliasearch_ray  # noqa: F401  (package import applies _rayfix)


def test_join_with_empty_leading_blocks(ray_session, tmp_path):
    import ray.data as rd
    from ray.data.aggregate import Count

    t = pa.table(
        {
            "doc_id": pa.array([1, 1, 2], pa.int64()),
            "term": pa.array(["a", "b", "a"]),
            "tf": pa.array([2, 1, 3], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "x.parquet"))
    # a tiny parquet read fans out into mostly-empty blocks; the groupby
    # output adds empty partition blocks on the right side
    for _ in range(3):
        tf = rd.read_parquet(str(tmp_path))
        left = tf.map_batches(
            lambda b: pa.table(
                {"doc_id": b["doc_id"], "part": b["term"], "tf": b["tf"]}
            ),
            batch_format="pyarrow",
        )
        right = (
            tf.groupby("term")
            .aggregate(Count(alias_name="df"))
            .rename_columns({"term": "part"})
        )
        j = left.join(
            right, join_type="left_outer", num_partitions=8, on=("part",)
        ).to_pandas()
        assert len(j) == 3
        # left rows (1,a),(1,b),(2,a) joined with df(a)=2, df(b)=1
        assert sorted(j["df"]) == [1, 2, 2]


def test_rayfix_idempotent():
    from ray.data._internal.execution.operators.hash_shuffle import (
        HashShufflingOperatorBase,
    )

    from marginaliasearch_ray import _rayfix

    before = HashShufflingOperatorBase._do_add_input_inner
    _rayfix.apply()
    assert HashShufflingOperatorBase._do_add_input_inner is before
    assert HashShufflingOperatorBase._msray_broadcast_fix
