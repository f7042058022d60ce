"""DoclingConverter selection + call contract, pinned WITHOUT docling.

The heavy path is import-gated in this container, so these tests inject a
fake `docling` package into sys.modules and assert the seam behaves like
the reference (`document_converter/service.py:133-158`):

- `converter_for("auto")` picks DoclingConverter iff the import succeeds;
- `.convert` calls the backend with `raises_on_error=False` (a bad
  document must become an error ROW, never an exception);
- CSV files go through the UTF-8 pre-shim BEFORE reaching the backend
  (service.py:145-148), and an undecodable CSV short-circuits to an error
  result without invoking docling at all;
- backend-reported errors surface as `{filename: stem, error: message}`.

This keeps the gated path from rotting: if the seam's imports or call
shape drift, these fail in CI even though real docling never runs here.
"""

from __future__ import annotations

import io
import sys
import types

import pytest


@pytest.fixture()
def fake_docling(monkeypatch):
    """Install a minimal fake docling package and return its call log."""
    calls = {"convert": [], "built_options": []}

    class FakeError:
        def __init__(self, msg):
            self.error_message = msg

    class FakeDocument:
        def export_to_markdown(self, **kwargs):
            return "# fake doc"

        def iterate_items(self, with_groups=True):
            return iter([])

    class FakeResult:
        def __init__(self, errors=None):
            self.errors = errors or []
            self.document = FakeDocument()

    class DocumentConverter:
        def __init__(self, format_options=None):
            self.format_options = format_options

        def convert(self, stream, raises_on_error=True):
            calls["convert"].append(
                {
                    "name": stream.name,
                    "payload": stream.stream.getvalue(),
                    "raises_on_error": raises_on_error,
                }
            )
            if b"BROKEN" in stream.stream.getvalue():
                return FakeResult(errors=[FakeError("layout analysis failed")])
            return FakeResult()

    class PdfFormatOption:
        def __init__(self, pipeline_options=None):
            self.pipeline_options = pipeline_options

    class PdfPipelineOptions:
        def __init__(self):
            calls["built_options"].append(self)
            self.generate_page_images = None
            self.generate_picture_images = None
            self.images_scale = None
            self.generate_table_images = None

    class DocumentStream:
        def __init__(self, name, stream):
            self.name = name
            self.stream = stream

    class InputFormat:
        PDF = "pdf"

    root = types.ModuleType("docling")
    dc = types.ModuleType("docling.document_converter")
    dc.DocumentConverter = DocumentConverter
    dc.PdfFormatOption = PdfFormatOption
    dm = types.ModuleType("docling.datamodel")
    bm = types.ModuleType("docling.datamodel.base_models")
    bm.InputFormat = InputFormat
    bm.DocumentStream = DocumentStream
    po = types.ModuleType("docling.datamodel.pipeline_options")
    po.PdfPipelineOptions = PdfPipelineOptions
    root.document_converter = dc
    dm.base_models = bm
    dm.pipeline_options = po
    root.datamodel = dm
    for name, mod in {
        "docling": root,
        "docling.document_converter": dc,
        "docling.datamodel": dm,
        "docling.datamodel.base_models": bm,
        "docling.datamodel.pipeline_options": po,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return calls


def test_auto_selects_docling_when_importable(fake_docling):
    from docling_api_spark.pipeline.convert import DoclingConverter, converter_for

    assert isinstance(converter_for("auto"), DoclingConverter)


def test_auto_falls_back_to_lightweight_without_docling():
    # no fake installed: the real import fails in this container
    assert "docling" not in sys.modules or not hasattr(
        sys.modules.get("docling"), "document_converter"
    )
    from docling_api_spark.pipeline.convert import LightweightConverter, converter_for

    assert isinstance(converter_for("auto"), LightweightConverter)


def test_convert_passes_raises_on_error_false(fake_docling):
    from docling_api_spark.pipeline.convert import DoclingConverter

    out = DoclingConverter().convert("report.pdf", b"%PDF-1.4 ok")
    assert out["error"] is None and out["markdown"] == "# fake doc"
    assert out["filename"] == "report"
    (call,) = fake_docling["convert"]
    assert call["raises_on_error"] is False  # service.py:150


def test_backend_errors_become_error_rows_with_stem(fake_docling):
    from docling_api_spark.pipeline.convert import DoclingConverter

    out = DoclingConverter().convert("bad/paper.pdf", b"BROKEN bytes")
    assert out["markdown"] is None
    assert out["error"] == "layout analysis failed"
    assert out["filename"] == "paper"  # stem, not path (service.py:152-155)


def test_csv_preshim_transcodes_before_backend(fake_docling):
    from docling_api_spark.pipeline.convert import DoclingConverter

    latin1 = "name,café\n1,naïve\n".encode("latin-1")
    out = DoclingConverter().convert("table.csv", latin1)
    assert out["error"] is None
    (call,) = fake_docling["convert"]
    # the backend must receive VALID UTF-8 (service.py:145-148)
    assert call["payload"].decode("utf-8") == "name,café\n1,naïve\n"


def test_csv_preshim_rejects_undecodable_without_calling_backend(
    fake_docling, monkeypatch
):
    # the default chain ends in latin-1 (accepts any bytes, like the
    # reference), so force the error leg to pin the short-circuit: a decode
    # failure must return an error row and never reach the backend.
    import docling_api_spark.pipeline.convert as convert_mod
    from docling_api_spark.pipeline.convert import DoclingConverter

    monkeypatch.setattr(
        convert_mod,
        "transcode_csv_utf8",
        lambda content: (content, "Could not decode CSV file."),
    )
    out = DoclingConverter().convert("junk.csv", b"whatever")
    assert out["error"] == "Could not decode CSV file."
    assert out["markdown"] is None
    assert fake_docling["convert"] == []  # docling never invoked


def test_option_isolation_per_call(fake_docling):
    """T3: two convert calls with different options must build two distinct
    pipeline-option objects (cached per pair, never mutated across calls)."""
    from docling_api_spark.pipeline.convert import DoclingConverter

    conv = DoclingConverter()
    conv.convert("a.pdf", b"one", extract_tables=False, image_resolution_scale=2)
    conv.convert("b.pdf", b"two", extract_tables=True, image_resolution_scale=4)
    conv.convert("c.pdf", b"three", extract_tables=False, image_resolution_scale=2)
    opts = fake_docling["built_options"]
    assert len(opts) == 2  # one per distinct (tables, scale) pair — cached
    assert opts[0].images_scale == 2 and opts[0].generate_table_images is False
    assert opts[1].images_scale == 4 and opts[1].generate_table_images is True
