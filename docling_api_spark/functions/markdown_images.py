"""Markdown image-reference splicing (the reference's T5 operator).

Given a document's markdown (with `<!-- image -->` placeholders) and its
ordered table/picture elements, name each element's image
(`table-N.png` / `picture-N.png`), splice the name into the markdown at the
matching reference, and collect the image payloads.

Semantics pinned by the reference's golden tests
(`tests/test_document_images.py:45-91`, logic `service.py:72-131`):
- Elements are processed in document order with a forward-moving cursor.
- A table's reference is its own markdown rendering; the image name is
  appended after it (`\\n\\n<name>`). A picture's reference is the
  placeholder, which is replaced by the name.
- An element WITHOUT an image advances the cursor past its reference (if
  found) but does not consume a later element's reference and emits nothing.
- Counters are per-type and only incremented for elements with images.

This is per-document sequential string work — it runs inside the conversion
UDF (one doc per call), never as a distributed op.
"""

from __future__ import annotations

from dataclasses import dataclass

IMAGE_PLACEHOLDER = "<!-- image -->"


@dataclass
class DocElement:
    """One table/picture element in document order."""

    kind: str  # "table" | "picture"
    image: bytes | None = None  # PNG payload, None if the element has no image
    table_markdown: str | None = None  # the table's own markdown (tables only)


def splice_images(
    markdown: str,
    elements: list[DocElement],
    placeholder: str = IMAGE_PLACEHOLDER,
) -> tuple[str, list[dict]]:
    """Return (spliced_markdown, images) where images are dicts of
    {type, filename, image} in document order.

    ``placeholder`` is the picture-reference string to search for —
    IMAGE_PLACEHOLDER by default (the reference's golden semantics);
    callers whose DOCUMENT TEXT could itself contain that literal pass a
    private sentinel instead so in-text occurrences cannot hijack the
    cursor (pipeline/convert.py's ooxml path)."""
    images: list[dict] = []
    counters = {"table": 0, "picture": 0}
    cursor = 0

    for el in elements:
        if el.kind == "table":
            reference = el.table_markdown or ""
        else:
            reference = placeholder
        ref_index = markdown.find(reference, cursor) if reference else -1

        if el.image is None:
            if ref_index >= 0:
                cursor = ref_index + len(reference)
            continue

        counters[el.kind] += 1
        image_name = f"{el.kind}-{counters[el.kind]}.png"

        if ref_index >= 0:
            if el.kind == "table":
                replacement = f"{reference}\n\n{image_name}"
            else:
                replacement = image_name
            markdown = (
                markdown[:ref_index] + replacement + markdown[ref_index + len(reference):]
            )
            cursor = ref_index + len(replacement)

        images.append({"type": el.kind, "filename": image_name, "image": el.image})

    return markdown, images
