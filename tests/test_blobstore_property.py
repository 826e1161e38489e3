"""Property test for the blob-store pruned reader: random sorted key
sets and probe mixes must behave exactly like a dict, whatever the
row-group geometry (no Ray needed — the store file is written
directly)."""

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from marginaliasearch_ray.pipelines import blobstore

_DOM = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789.-",
    min_size=1,
    max_size=24,
)


@settings(max_examples=60, deadline=None)
@given(
    st.sets(_DOM, min_size=1, max_size=120),
    st.lists(_DOM, max_size=30),
    st.integers(min_value=1, max_value=37),
)
def test_reader_matches_dict(domain_set, probes, group_rows):
    domains = sorted(domain_set)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/store.parquet"
        pairs = [blobstore.synth_favicon(d) for d in domains]
        pq.write_table(
            pa.table(
                {
                    "domain": pa.array(domains, pa.string()),
                    "content_type": pa.array(
                        [c for c, _b in pairs], pa.string()
                    ),
                    "data": pa.array([b for _c, b in pairs], pa.binary()),
                }
            ),
            path,
            row_group_size=group_rows,
        )
        store = blobstore.DomainBlobStore(path)
        truth = dict(zip(domains, pairs))
        for d in list(probes) + domains[:5] + ["", "\x7f~after"]:
            got = store.get(d)
            want = truth.get(d)
            assert got == want, (d, group_rows)
            if want is not None:
                assert got[1] == hashlib.sha256(d.encode()).digest()
