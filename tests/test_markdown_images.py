"""Image-splice golden semantics (ports the reference test family
tests/test_document_images.py:45-91 onto our splice helper)."""

from __future__ import annotations

from docling_api_spark.functions.markdown_images import (
    IMAGE_PLACEHOLDER,
    DocElement,
    splice_images,
)

PNG = b"\x89PNG\r\n\x1a\nfake"


def test_interleaved_tables_and_pictures_follow_document_order():
    t1 = "| First_heading |\n|---|\n| First |"
    t2 = "| Second heading |\n|---|\n| Second |"
    markdown = f"{t1}\n\n{IMAGE_PLACEHOLDER}\n\n{t2}\n\n{IMAGE_PLACEHOLDER}"
    elements = [
        DocElement("table", image=PNG + b"red", table_markdown=t1),
        DocElement("picture", image=PNG + b"blue"),
        DocElement("table", image=PNG + b"green", table_markdown=t2),
        DocElement("picture", image=PNG + b"yellow"),
    ]
    out, images = splice_images(markdown, elements)
    assert out == (
        f"{t1}\n\ntable-1.png\n\npicture-1.png\n\n{t2}\n\ntable-2.png\n\npicture-2.png"
    )
    assert [(i["type"], i["filename"]) for i in images] == [
        ("table", "table-1.png"),
        ("picture", "picture-1.png"),
        ("table", "table-2.png"),
        ("picture", "picture-2.png"),
    ]


def test_imageless_picture_does_not_consume_later_reference():
    markdown = f"{IMAGE_PLACEHOLDER}\n\n{IMAGE_PLACEHOLDER}"
    elements = [
        DocElement("picture", image=None),
        DocElement("picture", image=PNG),
    ]
    out, images = splice_images(markdown, elements)
    assert out == f"{IMAGE_PLACEHOLDER}\n\npicture-1.png"
    assert [i["filename"] for i in images] == ["picture-1.png"]


def test_imageless_table_advances_cursor_without_emitting():
    t1 = "| A |\n|---|\n| 1 |"
    markdown = f"{t1}\n\n{IMAGE_PLACEHOLDER}"
    elements = [
        DocElement("table", image=None, table_markdown=t1),
        DocElement("picture", image=PNG),
    ]
    out, images = splice_images(markdown, elements)
    assert out == f"{t1}\n\npicture-1.png"
    assert [i["filename"] for i in images] == ["picture-1.png"]


def test_counters_only_count_elements_with_images():
    markdown = "\n\n".join([IMAGE_PLACEHOLDER] * 3)
    elements = [
        DocElement("picture", image=None),
        DocElement("picture", image=PNG),
        DocElement("picture", image=PNG),
    ]
    out, images = splice_images(markdown, elements)
    assert [i["filename"] for i in images] == ["picture-1.png", "picture-2.png"]
    assert out == f"{IMAGE_PLACEHOLDER}\n\npicture-1.png\n\npicture-2.png"
