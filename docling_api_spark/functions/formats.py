"""Format classification: magic-byte sniffing, HTML/XHTML content detection,
extension fallback, CSV-by-name override.

Re-implements (fresh, Spark-shaped) the classification semantics of the
reference's `document_converter/utils.py:66-136` — same taxonomy, same
precedence: CSV filename short-circuit → magic bytes → extension fallback →
HTML/XHTML content sniff → text/plain (unsupported). The sniffer here is
self-contained (no `filetype` dependency): a small magic table plus zip
container inspection for OOXML (docx/pptx).

Two call paths:
- `classify_format(content, filename)` — pure Python, for the vectorized
  pandas UDF in the conversion pipeline (`classify_format_udf`).
- `format_extension_expr(...)` — pure Catalyst column expression covering
  the extension-driven subset (no bytes needed); used where the plan should
  stay fully JVM-side and by the SQL oracle.
"""

from __future__ import annotations

import io
import re
import zipfile

FORMATS = ("docx", "pptx", "html", "image", "pdf", "asciidoc", "md", "csv")

EXTENSION_TO_FORMAT = {
    "docx": "docx", "dotx": "docx", "docm": "docx", "dotm": "docx",
    "pptx": "pptx", "potx": "pptx", "ppsx": "pptx", "pptm": "pptx",
    "potm": "pptx", "ppsm": "pptx",
    "pdf": "pdf",
    "md": "md",
    "html": "html", "htm": "html", "xhtml": "html",
    "jpg": "image", "jpeg": "image", "png": "image",
    "tif": "image", "tiff": "image", "bmp": "image",
    "gif": "image", "webp": "image", "heic": "image", "heif": "image",
    "avif": "image",
    "adoc": "asciidoc", "asciidoc": "asciidoc", "asc": "asciidoc",
    "csv": "csv",
}

# extensions whose fallback the reference honors when magic bytes fail
# (reference utils.py:123-132: asciidoc, html, md, csv only)
_FALLBACK_EXTENSIONS = {
    ext: fmt
    for ext, fmt in EXTENSION_TO_FORMAT.items()
    if fmt in ("asciidoc", "html", "md", "csv")
}

_MAGIC_PREFIXES: tuple[tuple[bytes, str], ...] = (
    (b"%PDF-", "pdf"),
    (b"\x89PNG\r\n\x1a\n", "image"),
    (b"\xff\xd8\xff", "image"),
    (b"GIF87a", "image"),
    (b"GIF89a", "image"),
    (b"BM", "image"),
    (b"II*\x00", "image"),
    (b"MM\x00*", "image"),
)

# Container formats matched by (offset, needle) instead of a prefix —
# the modern-image coverage `filetype.guess_mime` has (reference
# utils.py:97) that a prefix table alone misses.
_MAGIC_AT_OFFSET: tuple[tuple[int, bytes, str], ...] = (
    (8, b"WEBP", "image"),  # RIFF....WEBP
)

# ISO-BMFF 'ftyp' major brands that are HEIF/AVIF still images or image
# sequences — matched generically (ftyp box at offset 4, brand at 8) so
# compatible brands (heim/heis/hevx, msf1/avis sequences) don't fall
# through a fixed needle list.
_FTYP_IMAGE_BRANDS = {
    b"heic", b"heix", b"heim", b"heis",
    b"hevc", b"hevx",
    b"mif1", b"msf1",
    b"avif", b"avis",
}

_HTML_COMMENT_RE = re.compile(r"<!--(.*?)-->", re.DOTALL)
_XML_DECL_RE = re.compile(r"<\?xml")
_HTML_START_RE = re.compile(r"<!doctype\s+html|<html|<head|<body")


def sniff_magic(content: bytes) -> str | None:
    """Magic-byte format detection (plus OOXML container inspection)."""
    for prefix, fmt in _MAGIC_PREFIXES:
        if content.startswith(prefix):
            return fmt
    for offset, needle, fmt in _MAGIC_AT_OFFSET:
        if content[offset : offset + len(needle)] == needle:
            if needle == b"WEBP" and not content.startswith(b"RIFF"):
                continue
            return fmt
    if content[4:8] == b"ftyp" and content[8:12] in _FTYP_IMAGE_BRANDS:
        return "image"
    if content.startswith(b"PK\x03\x04"):
        try:
            with zipfile.ZipFile(io.BytesIO(content)) as zf:
                names = zf.namelist()
        except Exception:
            return None
        if any(n.startswith("word/") for n in names):
            return "docx"
        if any(n.startswith("ppt/") for n in names):
            return "pptx"
    return None


def detect_html_xhtml(content: bytes) -> str | None:
    """HTML/XHTML content sniff on the comment-stripped ASCII prefix.

    Same decision tree as reference utils.py:66-79: XML declaration with
    "xhtml" in the first 1000 chars → xhtml; doctype/html/head/body start
    → html.
    """
    text = content.decode("ascii", errors="ignore").lower()
    text = _HTML_COMMENT_RE.sub("", text).lstrip()
    if _XML_DECL_RE.match(text) and "xhtml" in text[:1000]:
        return "html"
    if _HTML_START_RE.match(text):
        return "html"
    return None


def extension_of(filename: str | None) -> str:
    """Extension parse mirroring reference utils.py:99-100: dotfiles and
    extensionless names yield ''."""
    if filename and "." in filename and not filename.startswith("."):
        return filename.rsplit(".", 1)[-1].lower()
    return ""


def is_csv_filename(filename: str | None) -> bool:
    return bool(filename) and filename.lower().endswith(".csv")


def classify_format(content: bytes, filename: str | None = None) -> str | None:
    """Full classification: returns one of FORMATS or None (unsupported).

    Precedence (reference utils.py:87-104): CSV filename → magic bytes →
    extension fallback (adoc/html/md/csv only) → HTML content sniff → None.
    """
    if is_csv_filename(filename):
        return "csv"
    fmt = sniff_magic(content)
    if fmt is None:
        fmt = _FALLBACK_EXTENSIONS.get(extension_of(filename))
    if fmt is None:
        fmt = detect_html_xhtml(content)
    return fmt


def is_format_supported(content: bytes, filename: str | None = None) -> bool:
    return classify_format(content, filename) in FORMATS


def classify_format_udf():
    """Vectorized pandas UDF: (filename, content) -> format string or null."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _classify(filename, content):
        return pd.Series(
            [
                classify_format(c if c is not None else b"", f)
                for f, c in zip(filename, content)
            ],
            dtype="object",
        )

    _classify.__annotations__ = {
        "filename": pd.Series,
        "content": pd.Series,
        "return": pd.Series,
    }
    return F.pandas_udf(_classify, "string")


def format_extension_expr(path_col: str = "path"):
    """Catalyst-only classification by extension (the no-content fast path).

    Keeps the common case (named files) in whole-stage codegen; content
    sniffing is only needed for extensionless/unknown names.
    """
    from pyspark.sql import functions as F

    ext = F.lower(F.regexp_extract(F.col(path_col), r"([^/.])\.([^./]+)$", 2))
    expr = F.lit(None).cast("string")
    # build CASE chain from the flat map (csv-by-name first, mirroring the
    # reference's short-circuit)
    chain = F.when(F.lower(F.col(path_col)).endswith(".csv"), F.lit("csv"))
    for e, fmt in sorted(EXTENSION_TO_FORMAT.items()):
        chain = chain.when(ext == e, F.lit(fmt))
    return chain.otherwise(expr)
