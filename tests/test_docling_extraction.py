"""Pin the docling image-extraction walk (`extract_document_images`) with a
mock document, so the heavy path's splice wiring is tested even though
docling itself is absent here (mirrors reference
tests/test_document_images.py:45-91 — same scenarios, no docling dep)."""

from __future__ import annotations

import io

from docling_api_spark.functions.markdown_images import IMAGE_PLACEHOLDER
from docling_api_spark.pipeline.convert import extract_document_images

PNG = b"\x89PNG-fake"


class _PilImage:
    def __init__(self, payload: bytes) -> None:
        self._payload = payload

    def save(self, buf: io.BytesIO, format: str) -> None:  # noqa: A002
        assert format == "PNG"
        buf.write(self._payload)


class _ImageRef:
    def __init__(self, payload: bytes) -> None:
        self.pil_image = _PilImage(payload)

    def __bool__(self) -> bool:  # reference checks `if not element.image`
        return True


class TableItem:  # detection is by type NAME, like isinstance in the reference
    def __init__(self, image=None) -> None:
        self.image = image


class PictureItem:
    def __init__(self, image=None) -> None:
        self.image = image


class _GroupItem:
    """A non-table non-picture item (heading/group) the walk must skip."""


class MockDoc:
    """Duck-typed docling document: full markdown + per-element exports."""

    def __init__(self, items: list, full_md: str, per_element_md: dict[int, str]):
        self._items = items
        self._full = full_md
        self._per = per_element_md

    def export_to_markdown(self, from_element=None, to_element=None, **kw):
        assert kw.get("image_placeholder") == IMAGE_PLACEHOLDER
        if from_element is None:
            return self._full
        return self._per[from_element]

    def iterate_items(self, with_groups: bool = False):
        assert with_groups
        return [(it, 0) for it in self._items]


TBL1 = "| First_heading |\n|---|\n| First |"
TBL2 = "| Second heading |\n|---|\n| Second |"


def test_table_and_picture_references_follow_document_order():
    doc = MockDoc(
        items=[
            _GroupItem(),
            TableItem(image=_ImageRef(b"red")),
            PictureItem(image=_ImageRef(b"blue")),
            TableItem(image=_ImageRef(b"green")),
            PictureItem(image=_ImageRef(b"yellow")),
        ],
        full_md=f"{TBL1}\n\n{IMAGE_PLACEHOLDER}\n\n{TBL2}\n\n{IMAGE_PLACEHOLDER}",
        per_element_md={1: TBL1, 3: TBL2},
    )
    markdown, images = extract_document_images(doc)
    assert markdown == (
        f"{TBL1}\n\ntable-1.png\n\npicture-1.png\n\n{TBL2}\n\ntable-2.png\n\npicture-2.png"
    )
    assert [(i["type"], i["filename"]) for i in images] == [
        ("table", "table-1.png"),
        ("picture", "picture-1.png"),
        ("table", "table-2.png"),
        ("picture", "picture-2.png"),
    ]
    assert images[0]["image"] == b"red" and images[3]["image"] == b"yellow"


def test_picture_without_image_does_not_consume_a_later_reference():
    doc = MockDoc(
        items=[PictureItem(image=None), PictureItem(image=_ImageRef(b"blue"))],
        full_md=f"{IMAGE_PLACEHOLDER}\n\n{IMAGE_PLACEHOLDER}",
        per_element_md={},
    )
    markdown, images = extract_document_images(doc)
    assert markdown == f"{IMAGE_PLACEHOLDER}\n\npicture-1.png"
    assert [i["filename"] for i in images] == ["picture-1.png"]


def test_table_without_image_advances_cursor_only():
    doc = MockDoc(
        items=[TableItem(image=None), PictureItem(image=_ImageRef(b"b"))],
        full_md=f"{TBL1}\n\n{IMAGE_PLACEHOLDER}",
        per_element_md={0: TBL1},
    )
    markdown, images = extract_document_images(doc)
    assert markdown == f"{TBL1}\n\npicture-1.png"
    assert [i["type"] for i in images] == ["picture"]
