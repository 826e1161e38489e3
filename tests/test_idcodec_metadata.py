import numpy as np

from marginaliasearch_ray.functions import idcodec, metadata


def test_encode_decode_roundtrip():
    d = np.array([0, 1, 12345, (1 << 31) - 1], dtype=np.int64)
    o = np.array([0, 1, 99, (1 << 26) - 1], dtype=np.int64)
    ids = idcodec.encode_id(d, o)
    assert idcodec.get_domain_id(ids).tolist() == d.tolist()
    assert idcodec.get_ordinal(ids).tolist() == o.tolist()
    assert idcodec.get_rank(ids).tolist() == [0, 0, 0, 0]

    ranked = idcodec.encode_id_with_rank(np.array([0, 1, 33, 63]), d, o)
    assert idcodec.get_rank(ranked).tolist() == [0, 1, 33, 63]
    assert idcodec.get_domain_id(ranked).tolist() == d.tolist()
    assert idcodec.remove_rank(ranked).tolist() == ids.tolist()


def test_add_rank_float_quantization():
    # UrlIdCodec.addRank:64-71 — quantize to [0,63]
    base = idcodec.encode_id(np.array([5]), np.array([7]))
    assert idcodec.get_rank(idcodec.add_rank_float(np.array([0.0]), base)).tolist() == [0]
    assert idcodec.get_rank(idcodec.add_rank_float(np.array([1.0]), base)).tolist() == [63]
    assert idcodec.get_rank(idcodec.add_rank_float(np.array([0.5]), base)).tolist() == [32]
    assert idcodec.get_rank(idcodec.add_rank_float(np.array([-1.0]), base)).tolist() == [0]


def test_rank_major_sort_order():
    # sorting by combined id sorts by (rank, domain, ordinal) — UrlIdCodec.java:3-7
    a = int(idcodec.encode_id_with_rank(1, 0, 0))
    b = int(idcodec.encode_id_with_rank(0, (1 << 31) - 1, (1 << 26) - 1))
    assert b < a
    c = int(idcodec.encode_id_with_rank(2, 3, 0))
    d = int(idcodec.encode_id_with_rank(2, 2, (1 << 26) - 1))
    assert d < c


def test_domain_id_range():
    lo, hi = idcodec.domain_id_range(3, 77)
    inside = int(idcodec.encode_id_with_rank(3, 77, 12345))
    assert lo <= inside < hi
    outside = int(idcodec.encode_id_with_rank(3, 78, 0))
    assert outside >= hi


def test_document_meta_pack_unpack():
    m = metadata.encode_document_meta(
        avg_sent_length=2, rank=17, enc_domain_size=9, topology=4,
        year=30, sets=3, quality=5, flags=0b1010,
    )
    assert int(metadata.decode_quality(m)) == 5
    assert int(metadata.decode_topology(m)) == 4
    assert int(metadata.decode_year_byte(m)) == 30
    assert int(metadata.decode_rank(m)) == 17
    assert int(metadata.decode_size(m)) == 45
    assert int(m) & 0xFF == 0b1010


def test_document_meta_clamping():
    m = metadata.encode_document_meta(quality=99, rank=300, year=-5)
    assert int(metadata.decode_quality(m)) == 15
    assert int(metadata.decode_rank(m)) == 255
    assert int(metadata.decode_year_byte(m)) == 0


def test_position_bitmask():
    # DocumentKeywordsBuilder.calculatePositionMask:144-159
    # pos 1: bit (1/256)%56=0 and smear (129/256)%56=0 -> bit 8
    assert metadata.position_bitmask(np.array([1])) == 1 << 8
    # pos 200: main bit 0, smear bit (328/256)=1 -> bits 8 and 9
    assert metadata.position_bitmask(np.array([200])) == (1 << 8) | (1 << 9)
    # window wraps mod 56
    pos = np.array([56 * 256 + 1])
    assert metadata.position_bitmask(pos) & (1 << 8)
    assert metadata.position_bitmask(np.array([], dtype=np.int64)) == 0


def test_make_term_meta():
    tm = metadata.make_term_meta(int(metadata.WordFlags.TITLE | metadata.WordFlags.URL_PATH),
                                 np.array([1, 300]))
    assert tm & 0xFF == 0b1000001
    assert tm & (1 << 8)  # pos 1 window
    assert tm & (1 << 9)  # pos 300 window


def test_name_like_flag_set_and_prio_listed():
    """NAMES_WORDS fires for capitalized occurrences (NameLikeKeywords
    analog) and flags the posting into the prio index path."""
    import numpy as np
    import pyarrow as pa

    from marginaliasearch_ray.functions.metadata import WordFlags
    from marginaliasearch_ray.functions.murmur import hash_nearly_ascii
    from marginaliasearch_ray.functions.wordpattern import name_like_tokens
    from marginaliasearch_ray.stages.docids import DomainRegistry
    from marginaliasearch_ray.stages.tokenize import TokenizeStage

    assert name_like_tokens("foo Bar baz QuickSort x") == {"bar", "quicksort"}

    reg = DomainRegistry(["org/r"], num_parts=1)
    stage = TokenizeStage(reg)
    batch = pa.table(
        {
            "repo": pa.array(["org/r"]),
            "path": pa.array(["src/a.py"]),
            "commit": pa.array(["c" * 40]),
            "lang": pa.array(["py"]),
            "content": pa.array(["plain words then QuickSort appears here"]),
            "ordinal": pa.array([0], pa.int32()),
        }
    )
    out = stage(batch)
    tids = out["term_ids"][0].as_py()
    metas = out["term_meta"][0].as_py()
    flag_of = dict(zip(tids, metas))
    qs = hash_nearly_ascii("quicksort")
    plain = hash_nearly_ascii("plain")
    assert flag_of[qs] & int(WordFlags.NAMES_WORDS)
    assert not (flag_of[plain] & int(WordFlags.NAMES_WORDS))

    # flagged postings reach the prio explode
    from marginaliasearch_ray.stages.prio import explode_flagged

    rows = explode_flagged(out, num_buckets=4)
    assert qs in rows["term_id"].to_pylist()


def test_subjects_tfidf_gate_reference_semantics(tmp_path):
    """The Subjects flag = head-span candidate AND the tf-idf admission
    (SubjectLikeKeywords.java:48-60): plain terms gate on their own
    getTermValue; '_' terms integer-average the parts' own in-document
    values (absent part -> 0, SubjectLikeKeywords.getTermTfIdf:71-88)."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marginaliasearch_ray.functions.metadata import WordFlags
    from marginaliasearch_ray.functions.murmur import (
        KeywordHashCache,
        hash_nearly_ascii,
    )
    from marginaliasearch_ray.functions.wordpattern import tokenize
    from marginaliasearch_ray.stages.docids import DomainRegistry
    from marginaliasearch_ray.stages.tokenize import TokenizeStage

    # synthetic dict: df over a nominal 1000-doc corpus
    dict_df = {
        "rare": 1,          # very rare -> high idf
        "pair": 2,
        "common": 900,      # ln(900/1000) ~ 0 -> never gates
        "filler": 800,
        "rare_pair": 1,
        "ghost_rare": 1,    # 'ghost' absent from dict -> freq clamps to 1
        "ghost": 3,
    }
    n_dict = 1000
    terms = list(dict_df)
    tbl = pa.table(
        {
            "term_id": pa.array(
                [hash_nearly_ascii(t) for t in terms], pa.int64()
            ),
            "body_df": pa.array([dict_df[t] for t in terms], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "stats.parquet")

    # doc: rare and pair appear standalone AND joined; common repeats to
    # set maxtf; everything of interest sits inside the first 16 tokens
    content = (
        "rare_pair rare rare pair ghost_rare common common common common "
        "filler filler ghost_rare rare"
    )
    reg = DomainRegistry(["org/r"], num_parts=1)
    stage = TokenizeStage(reg, str(tmp_path / "stats.parquet"), n_dict)
    batch = pa.table(
        {
            "repo": pa.array(["org/r"]),
            "path": pa.array(["src/a.py"]),
            "commit": pa.array(["c" * 40]),
            "lang": pa.array(["py"]),
            "content": pa.array([content]),
            "ordinal": pa.array([0], pa.int32()),
        }
    )
    out = stage(batch)
    flag_of = dict(zip(out["term_ids"][0].as_py(), out["term_meta"][0].as_py()))

    toks = tokenize(content)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    maxv = max(counts.values())

    def vmap(term):  # WordsTfIdfCounts.getTermValue
        parts = [p for p in term.split("_") if p]
        v = sum(
            (0.1 + 0.9 * counts[term] / maxv)
            * math.log(max(dict_df.get(p, 0), 1) / n_dict)
            for p in parts
        ) / len(parts)
        return int(-v * 75)

    def gate(term):  # SubjectLikeKeywords.getTermTfIdf
        if "_" in term:
            parts = [p for p in term.split("_") if p]
            s = sum(vmap(p) if p in counts else 0 for p in parts)
            return (s // len(parts)) >= 100
        return vmap(term) >= 100

    subj = int(WordFlags.SUBJECTS)
    cache = KeywordHashCache()
    for term in counts:
        got = bool(flag_of[int(cache.hash_many([term])[0])] & subj)
        first = toks.index(term) + 1
        want = first <= 16 and gate(term)
        assert got == want, (term, got, want, vmap(term))

    # sanity: the fixture exercises both gate outcomes, including both
    # '_' terms (part-averaged, one with a dict-absent 'ghost' part)
    assert gate("rare") and gate("rare_pair") and gate("ghost_rare")
    assert not gate("common") and not gate("filler")

    # the SubjectLikeKeywords divergence from plain getTermValue: a '_'
    # term whose parts are NOT in the document averages part values of 0
    # and fails the gate, even though its own tf-idf value is huge
    batch2 = batch.set_column(
        batch.schema.get_field_index("content"),
        "content",
        pa.array(["rare_pair alone here common common"]),
    )
    out2 = stage(batch2)
    flag2 = dict(zip(out2["term_ids"][0].as_py(), out2["term_meta"][0].as_py()))
    rp = int(cache.hash_many(["rare_pair"])[0])
    assert not (flag2[rp] & subj)
    # its own map value would have cleared 100 (idf of the rare parts)
    assert int(
        -(0.1 + 0.9 / 2) * math.log(1 / n_dict) * 75 / 1
    ) >= 100  # w=0.55, both parts freq 1
