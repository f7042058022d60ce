"""Property-based robustness: the pure pipeline helpers must be total —
no input of any shape may raise — and must uphold their structural
invariants. (The reference ships no property tests; hypothesis closes that
gap for the executor-side code where one poison byte string would
otherwise kill a task.)"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_api_spark.functions.encodings import transcode_csv_utf8
from docling_api_spark.functions.formats import FORMATS, classify_format
from docling_api_spark.functions.markdown_images import (
    IMAGE_PLACEHOLDER,
    DocElement,
    splice_images,
)
from docling_api_spark.pipeline.convert import LightweightConverter

filenames = st.one_of(
    st.none(),
    st.text(max_size=40),
    st.from_regex(r"[A-Za-z0-9._\-]{0,20}(\.[A-Za-z0-9]{1,6})?", fullmatch=True),
)


@given(content=st.binary(max_size=2048), filename=filenames)
@settings(max_examples=300, deadline=None)
def test_classify_format_is_total(content, filename):
    fmt = classify_format(content, filename)
    assert fmt is None or fmt in FORMATS


@given(content=st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_csv_transcode_never_raises_and_roundtrips_utf8(content):
    out, err = transcode_csv_utf8(content)
    if err is None:
        out.decode("utf-8")  # must be valid utf-8 by contract
    else:
        assert out == content  # original bytes returned on failure


@given(content=st.binary(max_size=4096), filename=filenames)
@settings(max_examples=150, deadline=None)
def test_converter_upholds_result_contract(content, filename):
    result = LightweightConverter().convert(filename or "unnamed", content)
    assert set(result) == {"filename", "markdown", "images", "error"}
    # exactly one of markdown/error set (reference schema contract)
    assert (result["markdown"] is None) != (result["error"] is None)
    assert isinstance(result["images"], list)


elements = st.lists(
    st.builds(
        DocElement,
        kind=st.sampled_from(["table", "picture"]),
        image=st.one_of(st.none(), st.binary(min_size=1, max_size=16)),
        table_markdown=st.one_of(st.none(), st.text(max_size=30)),
    ),
    max_size=8,
)


@given(markdown=st.text(max_size=200), els=elements)
@settings(max_examples=300, deadline=None)
def test_splice_invariants(markdown, els):
    out, images = splice_images(markdown, els)
    # every element WITH an image is emitted, in order, with per-type counters
    with_images = [e for e in els if e.image is not None]
    assert len(images) == len(with_images)
    counters = {"table": 0, "picture": 0}
    for el, img in zip(with_images, images):
        counters[el.kind] += 1
        assert img["type"] == el.kind
        assert img["filename"] == f"{el.kind}-{counters[el.kind]}.png"
        assert img["image"] == el.image
    # imageless elements never contribute a name
    names_in_out = [i["filename"] for i in images]
    assert len(set(names_in_out)) == len(names_in_out)


@given(n=st.integers(min_value=0, max_value=6))
@settings(max_examples=20, deadline=None)
def test_splice_replaces_placeholders_in_order(n):
    markdown = "\n\n".join([IMAGE_PLACEHOLDER] * n)
    els = [DocElement("picture", image=b"x") for _ in range(n)]
    out, images = splice_images(markdown, els)
    assert IMAGE_PLACEHOLDER not in out
    for i in range(1, n + 1):
        assert f"picture-{i}.png" in out
