"""Document-processor plugin registry (SURVEY §2.10:
AbstractDocumentProcessorPlugin with Html/PlainText/Pdf implementations
-> per-lang processor seam in the tokenize stage).  Defaults are
byte-identical to the pre-registry engine; mapping a lang swaps its
tokenize/span semantics end-to-end."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.stages.tokenize import (
    DOC_PROCESSORS,
    SPAN_COMMENT,
    markdown_with_spans,
    plaintext_with_spans,
    register_processor,
    tokenize_with_spans,
)

DOC = "# heading words\nbody line one\n// slashes are prose in text\n"


def test_processor_semantics():
    # code: both '#' and '//' lines are comments
    _t, codes, spans = tokenize_with_spans(DOC)
    assert SPAN_COMMENT in codes
    code_pairs = spans[codes.index(SPAN_COMMENT)]
    # plaintext: no comment spans at all, same token stream
    t2, codes2, _ = plaintext_with_spans(DOC)
    assert SPAN_COMMENT not in codes2
    assert t2 == tokenize_with_spans(DOC)[0]
    # markdown: ONLY the '#' heading line is a span
    _t3, codes3, spans3 = markdown_with_spans(DOC)
    md_pairs = spans3[codes3.index(SPAN_COMMENT)]
    assert len(md_pairs) == 2 and len(code_pairs) == 4


def test_registry_is_extensible():
    def upper_proc(content):
        toks, codes, spans = tokenize_with_spans(content)
        return [t.upper() for t in toks], codes, spans

    register_processor("upper-test", upper_proc)
    try:
        assert DOC_PROCESSORS["upper-test"]("a b")[0] == ["A", "B"]
    finally:
        DOC_PROCESSORS.pop("upper-test")


def test_per_lang_processor_end_to_end(ray_session, tmp_path):
    import ray.data

    rows = {
        "repo": ["org/r1"] * 2,
        "path": ["a.py", "b.md"],
        "commit": ["0" * 40] * 2,
        "lang": ["py", "md"],
        "content": [DOC, DOC],
        "ordinal": [0, 1],
    }
    corpus = pa.table(rows)
    out = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(corpus),
        out,
        BuildConfig(num_parts=1, num_buckets=2,
                    doc_processors={"md": "markdown"}),
    )
    j = pq.read_table(
        f"{out}/journal", columns=["path", "span_codes", "spans"]
    )
    by_path = {
        p: (c, s)
        for p, c, s in zip(
            j["path"].to_pylist(),
            j["span_codes"].to_pylist(),
            j["spans"].to_pylist(),
        )
    }
    # py doc (code processor): '#' AND '//' lines in the comment span
    py_codes, py_spans = by_path["a.py"]
    assert len(py_spans[py_codes.index(SPAN_COMMENT)]) == 4
    # md doc (markdown processor): only the heading line
    md_codes, md_spans = by_path["b.md"]
    assert len(md_spans[md_codes.index(SPAN_COMMENT)]) == 2
