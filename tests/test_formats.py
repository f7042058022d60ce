"""Format-detection semantics (ports the reference test family
tests/test_file_format_detection.py — same cases, fresh assertions)."""

from __future__ import annotations

import io
import zipfile

import pytest

from docling_api_spark.functions.encodings import (
    DECODE_ERROR,
    decode_csv_bytes,
    transcode_csv_utf8,
)
from docling_api_spark.functions.formats import (
    EXTENSION_TO_FORMAT,
    classify_format,
    detect_html_xhtml,
    is_format_supported,
    sniff_magic,
)


def _ooxml(kind: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr(f"{kind}/document.xml", "<doc/>")
    return buf.getvalue()


def test_csv_detected_by_filename_case_insensitive():
    for filename in ("records.csv", "RECORDS.CSV"):
        assert classify_format(b"name,value\nexample,1", filename) == "csv"
        assert is_format_supported(b"name,value\nexample,1", filename)


def test_html_and_xhtml_detected_from_content():
    samples = (
        b"<!-- leading comment --><!doctype html><html><body></body></html>",
        b'<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml"></html>',
    )
    for content in samples:
        assert classify_format(content, "document.unknown") == "html"


def test_markdown_and_asciidoc_extension_fallback():
    samples = (
        ("README.md", "md"),
        ("guide.adoc", "asciidoc"),
        ("guide.asciidoc", "asciidoc"),
        ("guide.asc", "asciidoc"),
    )
    for filename, expected in samples:
        assert classify_format(b"A plain-text document", filename) == expected


def test_unknown_binary_not_supported():
    assert classify_format(b"unrecognized file content", "document.unknown") is None
    assert not is_format_supported(b"unrecognized file content", "document.unknown")


def test_dotfiles_and_extensionless_have_no_extension_fallback():
    assert classify_format(b"text", ".md") is None  # dotfile: no ext parse
    assert classify_format(b"text", "README") is None


@pytest.mark.parametrize(
    ("content", "expected"),
    [
        (b"%PDF-1.7 ...", "pdf"),
        (b"\x89PNG\r\n\x1a\n....", "image"),
        (b"\xff\xd8\xff\xe0....", "image"),
        (b"BM....", "image"),
        (b"II*\x00....", "image"),
        (b"GIF89a....", "image"),
        (b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image"),
        (b"\x00\x00\x00\x18ftypheic....", "image"),
        (b"\x00\x00\x00\x18ftypmif1....", "image"),
        (b"\x00\x00\x00\x18ftypavif....", "image"),
        # full ISO-BMFF image-brand set (round-3 advice): stills, image
        # sequences (msf1/avis), and the HEVC-coded variants
        (b"\x00\x00\x00\x18ftypheix....", "image"),
        (b"\x00\x00\x00\x18ftypheim....", "image"),
        (b"\x00\x00\x00\x18ftypheis....", "image"),
        (b"\x00\x00\x00\x18ftyphevc....", "image"),
        (b"\x00\x00\x00\x18ftyphevx....", "image"),
        (b"\x00\x00\x00\x18ftypmsf1....", "image"),
        (b"\x00\x00\x00\x18ftypavis....", "image"),
    ],
)
def test_magic_bytes(content, expected):
    assert sniff_magic(content) == expected


def test_ftyp_non_image_brands_fall_through():
    # mp4/quicktime major brands share the ftyp box but are NOT images
    assert sniff_magic(b"\x00\x00\x00\x18ftypisom....") is None
    assert sniff_magic(b"\x00\x00\x00\x18ftypmp42....") is None
    assert sniff_magic(b"\x00\x00\x00\x18ftypqt  ....") is None


def test_riff_without_webp_tag_is_not_an_image():
    assert sniff_magic(b"RIFF\x10\x00\x00\x00WAVEfmt ") is None  # .wav audio
    assert sniff_magic(b"XXXX\x10\x00\x00\x00WEBPVP8 ") is None  # WEBP w/o RIFF


def test_ooxml_containers_distinguished():
    assert sniff_magic(_ooxml("word")) == "docx"
    assert sniff_magic(_ooxml("ppt")) == "pptx"
    assert classify_format(_ooxml("word"), "upload.bin") == "docx"


def test_html_comment_stripping_required_for_sniff():
    assert detect_html_xhtml(b"<!-- c1 --><!-- c2 --> <html>") == "html"
    assert detect_html_xhtml(b"just text mentioning <html> later") is None


def test_extension_expr_agrees_with_python_classifier(spark):
    # the Catalyst-only fast path must agree with classify_format wherever
    # an extension decides the format (content sniffing aside)
    from docling_api_spark.functions.formats import format_extension_expr

    names = [
        "a.md", "b.csv", "B.CSV", "c.html", "d.htm", "e.xhtml", "f.adoc",
        "g.asciidoc", "h.asc", "i.pdf", "j.png", "k.jpg", "l.docx", "m.pptx",
        "n.txt", "README", ".md", "dir/x.md",
    ]
    df = spark.createDataFrame([(n,) for n in names], "path string")
    got = {
        r["path"]: r["fmt"]
        for r in df.select("path", format_extension_expr("path").alias("fmt")).collect()
    }
    for n in names:
        base = n.rsplit("/", 1)[-1]
        expected = (
            classify_format(b"", base)
            if base.rsplit(".", 1)[-1].lower()
            in ("md", "csv", "html", "htm", "xhtml", "adoc", "asciidoc", "asc")
            and "." in base
            and not base.startswith(".")
            else EXTENSION_TO_FORMAT.get(
                base.rsplit(".", 1)[-1].lower() if "." in base and not base.startswith(".") else ""
            )
        )
        assert got[n] == expected, (n, got[n], expected)


def test_csv_transcoding_to_utf8():
    samples = (
        ("name\nCafé\n", "utf-8"),
        ("name\nCafé\n", "latin1"),
        ("quote\n“Hello”\n", "cp1252"),
    )
    for text, encoding in samples:
        out, error = transcode_csv_utf8(text.encode(encoding))
        assert error is None
        assert out.decode("utf-8") == text


def test_csv_decode_error_when_chain_restricted():
    # latin1 accepts any byte string, so exercise the error leg with a
    # restricted chain (same message the reference surfaces, utils.py:120)
    text, error = decode_csv_bytes(b"\xff\xfe\x00A", encodings=("utf-8",))
    assert text is None
    assert error == DECODE_ERROR
