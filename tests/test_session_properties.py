"""Hypothesis property tests for the round-5 scalar kernels: the
filter-spec render/parse round trip, flagsPenalty vs an independent
scalar transcription, and the braille punch-card codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from marginaliasearch_ray.functions.bbpc import print_bits
from marginaliasearch_ray.functions.metadata import (
    DocumentFlags,
    HtmlFeature,
    flags_penalty,
)
from marginaliasearch_ray.pipelines import profiles as pf

_word = st.from_regex(r"[a-z][a-z0-9:._-]{0,15}", fullmatch=True)
_limit = st.one_of(
    st.none(),
    st.tuples(st.sampled_from(["=", "<", ">"]), st.integers(0, 4000)),
)


@st.composite
def _specs(draw):
    return pf.SearchFilterSpec(
        identifier=draw(st.from_regex(r"[a-z]{1,8}", fullmatch=True)),
        terms_require=draw(st.lists(_word, max_size=6, unique=True)),
        terms_exclude=draw(st.lists(_word, max_size=6, unique=True)),
        terms_promote=draw(
            st.lists(
                st.tuples(_word, st.sampled_from([1.0, 2.0, 0.5])),
                max_size=6,
                unique_by=lambda t: t[0],
            )
        ),
        domains_exclude=draw(
            st.lists(_word.map(lambda w: f"org/{w}"), max_size=4,
                     unique=True)
        ),
        domains_promote=draw(
            st.lists(
                st.tuples(_word.map(lambda w: f"org/{w}"),
                          st.sampled_from([1.0, 2.0])),
                max_size=6,
                unique_by=lambda t: t[0],
            )
        ),
        year=draw(_limit),
        size=draw(
            st.one_of(
                st.none(),
                st.tuples(st.sampled_from(["<", ">"]), st.integers(0, 4000)),
            )
        ),
        quality=draw(_limit),
        rank=draw(_limit),
        temporal_bias=draw(st.sampled_from(["NONE", "OLD", "RECENT"])),
        query_strategy=draw(
            st.sampled_from(["AUTO", "REQUIRE_FIELD_TITLE", "SENTENCE"])
        ),
    )


@given(_specs())
@settings(max_examples=60, deadline=None)
def test_filter_spec_roundtrip(spec):
    back = pf.parse_filter(pf.render_to_xml(spec),
                           identifier=spec.identifier)
    assert back == spec


def _penalty_scalar(features: int, doc_flags: int, size: float) -> float:
    """Independent straight-line transcription of flagsPenalty
    (IndexResultRankingService.java:633-683)."""
    if features == 0:
        return 0.0
    gen = doc_flags & int(
        DocumentFlags.GENERATOR_DOCS
        | DocumentFlags.GENERATOR_FORUM
        | DocumentFlags.GENERATOR_WIKI
    )
    penalty = 0.0
    factor = 1.0
    if not gen and size > 400:
        if features & int(HtmlFeature.KEBAB_CASE_URL):
            penalty += 5.0
        elif features & int(HtmlFeature.LONG_URL):
            penalty += 5.0
        factor = 2.0
    for bit, w in (
        (HtmlFeature.ADVERTISEMENT, 7.5),
        (HtmlFeature.CONSENT, 2.5),
        (HtmlFeature.POPOVER, 2.5),
        (HtmlFeature.TRACKING_ADTECH, 5.0),
        (HtmlFeature.AFFILIATE_LINK, 5.0),
        (HtmlFeature.COOKIES, 2.5),
        (HtmlFeature.TRACKING, 2.5),
        (HtmlFeature.SHORT_DOCUMENT, 5.0),
    ):
        if features & int(bit):
            penalty += w * factor
    return float(int(-penalty))  # the Java (int) cast


@given(
    st.integers(0, (1 << 19) - 1),
    st.integers(0, 127),
    st.floats(0, 2000, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_flags_penalty_matches_scalar_twin(features, doc_flags, size):
    got = float(
        flags_penalty(
            np.array([features], dtype=np.int64),
            np.array([doc_flags], dtype=np.int64),
            np.array([size], dtype=np.float64),
        )[0]
    )
    assert got == _penalty_scalar(features, doc_flags, size)


@given(st.integers(0, (1 << 64) - 1))
@settings(max_examples=200, deadline=None)
def test_print_bits_properties(mask):
    s = print_bits(mask, 64)
    assert len(s) == 8
    assert all(0x2800 <= ord(c) <= 0x28FF for c in s)
    # dot count preserved, byte locality preserved (per-char dots ==
    # per-byte bits)
    for i, c in enumerate(s):
        byte = (mask >> (8 * i)) & 0xFF
        assert bin(ord(c) - 0x2800).count("1") == bin(byte).count("1")
