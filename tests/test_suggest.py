"""Typeahead suggestions: loadSuggestions cleaning, the prefix-index
contract against a brute-force twin (short / long / >16 filtered / t:
term paths), and the service gates."""

import random
import string

import pyarrow as pa

from marginaliasearch_ray.pipelines import suggest


def test_clean_suggestion_rules():
    c = suggest.clean_suggestion
    assert c("word", 1) is None  # cnt > 1 gate
    assert c("word", 2) == "word"
    assert c('"quoted word"', 5) == "quoted word"
    assert c("trailing..", 5) == "trailing"
    assert c("abc", 9) is None  # length > 3 (strict)
    assert c("abcd", 9) == "abcd"
    assert c("ab..", 9) is None  # length checked after strips
    assert c("click here now", 9) is None
    assert c("share this", 9) is None
    assert c("open in new window", 9) is None
    assert c("press click to go", 9) is None


def _brute(pairs, query, k=10):
    """The module-docstring contract, naively."""
    p = query.lower().lstrip(" ")
    if len(p) < suggest.MIN_SUGGEST_LENGTH:  # gate INCLUDES "t:"
        return []
    term_mode = p.startswith("t:") and len(p) > 2
    if term_mode:
        p = p[2:]
    if term_mode:
        matches = [
            (w, s)
            for w, s in pairs
            if " " in w and any(t.startswith(p) for t in w.split())
        ]
    else:
        matches = [(w, s) for w, s in pairs if w.startswith(p)]
    matches.sort(key=lambda r: (-r[1], r[0]))
    return matches[:k]


def _index_from(pairs, cap=suggest.TOP_K_CAP):
    t = pa.table(
        {
            "word": pa.array([w for w, _ in pairs], pa.string()),
            "score": pa.array([s for _, s in pairs], pa.int64()),
        }
    )
    return suggest.SuggestIndex.build(t, top_k_cap=cap)


def test_matches_brute_force_random(ray_session):
    rng = random.Random(23)
    vocab = set()
    while len(vocab) < 70:
        n_terms = rng.choice([1, 1, 1, 2, 3])
        terms = [
            "".join(
                rng.choice(string.ascii_lowercase[:5])
                for _ in range(rng.randrange(2, 12))
            )
            for _ in range(n_terms)
        ]
        w = " ".join(terms)
        if len(w) > 3:
            vocab.add(w)
    pairs = sorted((w, rng.randrange(2, 60)) for w in vocab)
    idx = _index_from(pairs, cap=10)

    probes = []
    for _ in range(120):
        ln = rng.choice([3, 4, 5, 9, 12, 17, 19])
        base = rng.choice(pairs)[0]
        p = (base + base)[:ln] if len(base) < ln else base[:ln]
        if rng.random() < 0.3:
            p = "t:" + p[: rng.randrange(3, 8)]
        probes.append(p)
    probes += ["zzz", "t:zzz", "ab", "t:ab", " " + pairs[0][0][:4]]

    for p in probes:
        got = idx.suggest(p, k=10)
        want = _brute(pairs, p, k=10)
        assert got == want, (p, got, want)


def test_long_prefix_filtered_path(ray_session):
    # word longer than MAX_INDEXED_PREFIX_LENGTH: a >16-char query
    # probes the 16-char bucket and filters by the full prefix
    pairs = [
        ("abcdefghijklmnopqrstu", 5),
        ("abcdefghijklmnopzzzzz", 9),
        ("abcdefghijklmnop", 7),
    ]
    idx = _index_from(pairs)
    assert idx.suggest("abcdefghijklmnopqrst") == [
        ("abcdefghijklmnopqrstu", 5)
    ]
    # exactly 16 chars: direct long-bucket probe, all three share it
    assert idx.suggest("abcdefghijklmnop") == [
        ("abcdefghijklmnopzzzzz", 9),
        ("abcdefghijklmnop", 7),
        ("abcdefghijklmnopqrstu", 5),
    ]


def test_term_search_multi_word_only(ray_session):
    pairs = [("merge sort", 8), ("mergesort", 20), ("fast merge", 3)]
    idx = _index_from(pairs)
    # t: matches terms of multi-word entries only; single-word
    # "mergesort" is absent despite its higher score
    assert idx.suggest("t:merge") == [("merge sort", 8), ("fast merge", 3)]
    assert idx.suggest("t:sort") == [("merge sort", 8)]
    # normal prefix search still sees the single word
    assert idx.suggest("merge") == [
        ("mergesort", 20),
        ("merge sort", 8),
    ]


def test_service_gates(ray_session):
    idx = _index_from([("word here", 5)])
    assert idx.suggest("wo") == []  # MIN_SUGGEST_LENGTH
    assert idx.suggest("  WORD") == [("word here", 5)]  # lstrip+lower
    # the length gate counts the "t:" marker (Suggestions.java:95-110):
    # "t:he" is a valid 2-char term search, "t:" alone is too short
    assert idx.suggest("t:he") == [("word here", 5)]
    assert idx.suggest("t:") == []


def test_empty_dictionary(ray_session):
    idx = _index_from([])
    assert idx.suggest("anything") == []


def test_save_load_roundtrip(ray_session, tmp_path):
    pairs = [("table scan", 4), ("tablet", 11)]
    idx = _index_from(pairs)
    idx.save(str(tmp_path / "sg"))
    idx2 = suggest.SuggestIndex.load(str(tmp_path / "sg"))
    assert idx2.suggest("tabl") == idx.suggest("tabl") == [
        ("tablet", 11),
        ("table scan", 4),
    ]


def test_dictionary_unigrams_and_bigrams(ray_session):
    import ray.data

    docs = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(
                    [
                        "fast table scan",
                        "fast table merge",
                        "abc fast table",
                    ],
                    pa.string(),
                )
            }
        )
    )
    rows = {
        r["word"]: r["score"]
        for r in suggest.suggest_dictionary(docs).take_all()
    }
    # unigrams: cnt>1 and len>3 survive ("abc" too short, "scan"
    # and "merge" appear once)
    # bigrams: "fast table" x3 and "table scan"/"table merge" x1 each
    assert rows == {"fast": 3, "table": 3, "fast table": 3}
