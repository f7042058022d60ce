"""CSV encoding chain: decode-or-error, never raise (error-as-column).

Mirrors reference `document_converter/utils.py:107-120`: try utf-8, cp1252,
latin1, iso-8859-1 in order; first success is transcoded to UTF-8; if all
fail, return the original bytes plus an error message. (latin1 accepts any
byte string, so the error leg exists for API parity and for callers that
restrict the chain.)
"""

from __future__ import annotations

SUPPORTED_CSV_ENCODINGS: tuple[str, ...] = ("utf-8", "cp1252", "latin1", "iso-8859-1")

DECODE_ERROR = (
    "Could not decode CSV file. Supported encodings: "
    + ", ".join(SUPPORTED_CSV_ENCODINGS)
)


def decode_csv_bytes(
    content: bytes, encodings: tuple[str, ...] = SUPPORTED_CSV_ENCODINGS
) -> tuple[str | None, str | None]:
    """Return (decoded_text, None) on success or (None, error_message)."""
    for encoding in encodings:
        try:
            return content.decode(encoding), None
        except UnicodeDecodeError:
            continue
    return None, DECODE_ERROR


def transcode_csv_utf8(
    content: bytes, encodings: tuple[str, ...] = SUPPORTED_CSV_ENCODINGS
) -> tuple[bytes, str | None]:
    """UTF-8 re-encoded bytes, or the original bytes plus an error message."""
    text, error = decode_csv_bytes(content, encodings)
    if error is not None:
        return content, error
    return text.encode("utf-8"), None
