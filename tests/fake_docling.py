"""A fake `docling` package for exercising the DoclingConverter adapter
glue without the real dependency (VERDICT r12 Next #7).

The adapter (`pipeline/convert.py:DoclingConverter`) is import-gated on
four names; this module provides behavior-checking stand-ins for each and
an `install()` helper that registers the module tree in sys.modules (use
pytest's monkeypatch.setitem so teardown restores the real state). The
fakes RECORD what the adapter hands them — pipeline options, format
options, DocumentStream payloads — so tests can pin the contract:
option building + per-option converter caching, the CSV pre-shim,
`raises_on_error=False`, error mapping, and the
`extract_document_images` splice handoff.
"""

from __future__ import annotations

import sys
import types


class FakePdfPipelineOptions:
    """`PdfPipelineOptions()` stand-in: plain attribute bag."""

    def __init__(self) -> None:
        self.generate_page_images = "<unset>"
        self.generate_picture_images = "<unset>"
        self.images_scale = "<unset>"
        self.generate_table_images = "<unset>"


class FakePdfFormatOption:
    def __init__(self, pipeline_options=None) -> None:
        self.pipeline_options = pipeline_options


class FakeDocumentStream:
    def __init__(self, name, stream) -> None:
        self.name = name
        self.stream = stream


class _FakeConversionError:
    def __init__(self, message: str) -> None:
        self.error_message = message


class _FakeConversionResult:
    def __init__(self, document=None, errors=()) -> None:
        self.document = document
        self.errors = list(errors)


class FakeDocumentConverter:
    """Records construction + convert() calls.

    Behavior knobs (class attributes, reset by install()):
    - ``document_factory``: zero-arg callable building the fake document a
      successful convert() returns. Default: a one-line markdown document
      with no images (enough for the e2e smoke).
    - payloads equal to ``FAIL_PAYLOAD`` produce an errors=[...] result,
      exercising the adapter's error mapping.
    """

    FAIL_PAYLOAD = b"%PDF-FAKE-BROKEN"
    # infra failure: convert() raises instead of returning a result
    # (model not loaded, worker OOM — the class of failure docling does
    # NOT wrap in a ConversionResult even with raises_on_error=False)
    RAISE_PAYLOAD = b"%PDF-FAKE-INFRA-DOWN"
    # per-document failure status with an EMPTY errors list and no
    # document (docling's ConversionStatus.FAILURE shape)
    NO_DOCUMENT_PAYLOAD = b"%PDF-FAKE-NO-DOCUMENT"
    instances: list["FakeDocumentConverter"] = []

    document_factory = staticmethod(
        lambda: SimpleMarkdownDoc("Golden fixture heavy-path test")
    )

    def __init__(self, format_options=None) -> None:
        self.format_options = format_options
        self.calls: list[FakeDocumentStream] = []
        FakeDocumentConverter.instances.append(self)

    def convert(self, stream, raises_on_error=True):
        assert raises_on_error is False, (
            "adapter must pass raises_on_error=False (error-as-column)"
        )
        self.calls.append(stream)
        payload = stream.stream.read()
        stream.payload = payload  # keep it inspectable after the read
        if payload == self.RAISE_PAYLOAD:
            raise RuntimeError("fake backend: model runtime unavailable")
        if payload == self.NO_DOCUMENT_PAYLOAD:
            return _FakeConversionResult(document=None, errors=[])
        if payload == self.FAIL_PAYLOAD:
            return _FakeConversionResult(
                errors=[
                    _FakeConversionError("fake backend: unreadable input"),
                    _FakeConversionError("fake backend: secondary error"),
                ]
            )
        return _FakeConversionResult(document=self.document_factory())


class SimpleMarkdownDoc:
    """Minimal document for extract_document_images: fixed markdown, no
    table/picture items (the golden splice walk is pinned separately by
    tests/test_golden_convres.py on the recorded fixture)."""

    def __init__(self, markdown: str) -> None:
        self._markdown = markdown

    def export_to_markdown(self, **kw) -> str:
        return self._markdown

    def iterate_items(self, with_groups: bool = False):
        assert with_groups
        return []


def build_module_tree() -> dict[str, types.ModuleType]:
    """The sys.modules entries a `from docling...` import needs."""
    root = types.ModuleType("docling")
    dc = types.ModuleType("docling.document_converter")
    dm = types.ModuleType("docling.datamodel")
    bm = types.ModuleType("docling.datamodel.base_models")
    po = types.ModuleType("docling.datamodel.pipeline_options")
    dc.DocumentConverter = FakeDocumentConverter
    dc.PdfFormatOption = FakePdfFormatOption
    bm.InputFormat = types.SimpleNamespace(PDF="pdf")
    bm.DocumentStream = FakeDocumentStream
    po.PdfPipelineOptions = FakePdfPipelineOptions
    root.document_converter = dc
    root.datamodel = dm
    dm.base_models = bm
    dm.pipeline_options = po
    return {
        "docling": root,
        "docling.document_converter": dc,
        "docling.datamodel": dm,
        "docling.datamodel.base_models": bm,
        "docling.datamodel.pipeline_options": po,
    }


def install(monkeypatch) -> None:
    """Register the fake tree via monkeypatch (auto-undone at teardown)
    and reset the recording state."""
    for name, mod in build_module_tree().items():
        monkeypatch.setitem(sys.modules, name, mod)
    FakeDocumentConverter.instances.clear()
    FakeDocumentConverter.document_factory = staticmethod(
        lambda: SimpleMarkdownDoc("Golden fixture heavy-path test")
    )
