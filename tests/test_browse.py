"""Domain-browse tests: seeded-shuffle determinism and filters for
random browse, stored-relatedness ordering + screenshot-require +
blacklist-while-filling for similar browse — against independent
scalar twins (DbBrowseDomainsRandom / DbBrowseDomainsSimilarCosine)."""

import hashlib

import pyarrow as pa

from marginaliasearch_ray.pipelines import browse


DOMS = [f"d{i:02d}.org" for i in range(30)]


def test_random_browse_deterministic_shuffle():
    t1 = browse.random_browse(DOMS, 10, seed=7)
    t2 = browse.random_browse(list(reversed(DOMS)), 10, seed=7)
    # input order is irrelevant; the seed fixes the pick AND its order
    assert t1["domain"].to_pylist() == t2["domain"].to_pylist()
    # independent twin: sort ALL domains by the sha key, take 10
    want = sorted(
        DOMS, key=lambda d: hashlib.sha256(f"7:{d}".encode()).hexdigest()
    )[:10]
    assert t1["domain"].to_pylist() == want
    # a different seed picks a different sample
    t3 = browse.random_browse(DOMS, 10, seed=8)
    assert t3["domain"].to_pylist() != t1["domain"].to_pylist()


def test_random_browse_exclude_and_indexed():
    base = browse.random_browse(DOMS, 5, seed=7)
    first = base["domain"][0].as_py()
    t = browse.random_browse(
        DOMS, 5, seed=7, exclude=(first,), indexed={DOMS[0], DOMS[1]}
    )
    got = t["domain"].to_pylist()
    assert first not in got  # blacklist dropped while filling...
    assert len(got) == 5  # ...without shrinking the page
    for d, ix in zip(got, t["indexed"].to_pylist()):
        assert ix == (d in {DOMS[0], DOMS[1]})


def _nbr_table():
    # subject 'hub' with 4 stored neighbors at distinct relatedness
    rows = [
        ("hub", "n-a", 0.91),
        ("hub", "n-b", 0.72),
        ("n-c", "hub", 0.55),  # reverse-direction row still adjacent
        ("hub", "n-d", 0.33),
        ("n-a", "n-b", 0.99),  # unrelated pair: not hub-adjacent
    ]
    return pa.table(
        {
            "domain": pa.array([r[0] for r in rows], pa.string()),
            "neighbor": pa.array([r[1] for r in rows], pa.string()),
            "relatedness": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def test_similar_browse_order_and_values():
    t = browse.similar_browse(_nbr_table(), "hub", 10)
    assert t["neighbor"].to_pylist() == ["n-a", "n-b", "n-c", "n-d"]
    # stored service value: Math.round(100 * val)
    assert t["relatedness"].to_pylist() == [91.0, 72.0, 55.0, 33.0]


def test_similar_browse_screenshot_and_blacklist():
    has = lambda d: d != "n-b"  # noqa: E731 — screenshot INNER JOIN
    t = browse.similar_browse(
        _nbr_table(), "hub", 2, has=has, exclude=("n-a",)
    )
    # n-a blacklisted, n-b lacks a screenshot; the page still fills
    # to k=2 from the remaining candidates in relatedness order
    assert t["neighbor"].to_pylist() == ["n-c", "n-d"]


def test_similar_browse_unknown_subject():
    t = browse.similar_browse(_nbr_table(), "nosuch", 5)
    assert len(t) == 0
