"""JBIG2 generic-region decoder tests (VERDICT r14 Next #4): MQ-coder
round-trip fuzz against an independently-written T.88 Annex E *encoder*
(written from the published flowcharts, not from the decoder), segment
syntax, page composition, MMR routing, and the PDF integration surface
(pdf_extract_images + the undecodable-codec breadcrumb).

Interop caveat, stated for the record: the context-template bit layout
(template pixels sorted by (row, column), MSB first, AT pixels merged
at their coordinates) is the layout real-world implementations use; the
round-trip tests here share it between encoder and decoder, so they pin
the MQ coder, the TPGDON machinery, and the segment/page layers — the
layout itself is an assumption documented in pipeline/jbig2.py."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_api_spark.pipeline.jbig2 import (
    _FIXED_TEMPLATE,
    _QE,
    _SLTP_CX,
    _MQDecoder,
    jbig2_decode,
    jbig2_headers_supported,
)
from tests.test_ccittg4 import g4_encode
from tests.test_textextract import (
    TEXT_OBJ,
    decode_png,
    make_image_obj,
    make_pdf_objs,
)

_NOMINAL_AT = (
    [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    [(3, -1)],
    [(2, -1)],
    [(2, -1)],
)


# ---------------------------------------------------------------------------
# independent MQ encoder (test oracle) — T.88 Annex E figures E.5-E.11:
# CODEMPS/CODELPS with conditional exchange, RENORME, BYTEOUT with 0xFF
# stuffing and carry propagation, SETBITS+FLUSH termination.
# ---------------------------------------------------------------------------
class MQEncoder:
    def __init__(self) -> None:
        self.a, self.c, self.ct = 0x8000, 0, 12
        self.out = bytearray([0])  # dummy byte at BPST-1; dropped at flush
        self.icx: dict[int, int] = {}
        self.mcx: dict[int, int] = {}

    def encode(self, cx: int, d: int) -> None:
        i = self.icx.get(cx, 0)
        mps = self.mcx.get(cx, 0)
        qe, nmps, nlps, switch = _QE[i]
        if d == mps:
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            self.icx[cx] = nmps
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mcx[cx] = 1 - mps
            self.icx[cx] = nlps
        while True:  # RENORME
            if self.ct == 0:
                self._byteout()
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
            return
        if self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
            return
        self.out[-1] += 1
        if self.out[-1] == 0xFF:
            self.c &= 0x7FFFFFF
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8

    def flush(self) -> bytes:
        # SETBITS (E.2.9): the decoder feeds 1-bits past the end of
        # data, so the terminal code value must have its low 16 bits
        # MAXIMIZED while staying inside [C, C+A) — set them all, and
        # if that overshoots the interval end, back off 0x8000
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        data = bytes(self.out[1:])
        while data.endswith(b"\xff"):  # optional per E.2.9
            data = data[:-1]
        return data


def _mq_decode_bits(data: bytes, contexts: list[int], size: int) -> list[int]:
    icx, mcx = bytearray(size), bytearray(size)
    mq = _MQDecoder(data)
    return [mq.decode(icx, mcx, cx) for cx in contexts]


def test_qe_table_shape_and_transitions_in_range():
    assert len(_QE) == 47
    for qe, nmps, nlps, switch in _QE:
        assert 0 < qe <= 0x5601
        assert 0 <= nmps < 47 and 0 <= nlps < 47
        assert switch in (0, 1)
    # the documented SWITCH rows (E.1): only states 0, 6, 14
    assert [i for i, row in enumerate(_QE) if row[3]] == [0, 6, 14]


def test_mq_round_trip_known_patterns():
    for bits in (
        [0] * 50, [1] * 50, [0, 1] * 40, [1, 1, 0] * 30,
        [0] * 30 + [1] * 30, [1] + [0] * 64,
    ):
        enc = MQEncoder()
        for b in bits:
            enc.encode(0, b)
        assert _mq_decode_bits(enc.flush(), [0] * len(bits), 1) == bits


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 1)),
                min_size=1, max_size=400))
def test_mq_round_trip_fuzz_multi_context(seq):
    """Arbitrary bit sequences across 16 interleaved contexts round-trip
    exactly — the coder's full state machine (conditional exchange,
    stuffing, carry) under adversarial schedules."""
    enc = MQEncoder()
    for cx, b in seq:
        enc.encode(cx, b)
    got = _mq_decode_bits(enc.flush(), [cx for cx, _ in seq], 16)
    assert got == [b for _, b in seq]


def test_mq_decoder_is_total_on_garbage():
    for data in (b"", b"\x00", b"\xff" * 8, bytes(range(256)), b"\xac\xf3"):
        icx, mcx = bytearray(16), bytearray(16)
        mq = _MQDecoder(data)
        out = [mq.decode(icx, mcx, i % 16) for i in range(2000)]
        assert set(out) <= {0, 1}


# ---------------------------------------------------------------------------
# generic-region encoder (test oracle): same template layout as the
# decoder (see module caveat), TPGDON emitted when a row repeats.
# ---------------------------------------------------------------------------
def generic_encode(rows_px, template=0, at=None, tpgdon=False) -> bytes:
    at = _NOMINAL_AT[template] if at is None else at
    offs = sorted(tuple(_FIXED_TEMPLATE[template]) + tuple(at),
                  key=lambda o: (o[1], o[0]))
    h, w = len(rows_px), len(rows_px[0])
    enc = MQEncoder()
    ltp = 0
    for y in range(h):
        if tpgdon:
            want = rows_px[y] == (rows_px[y - 1] if y else [0] * w)
            enc.encode(_SLTP_CX[template], ltp ^ int(want))
            ltp = int(want)
            if ltp:
                continue
        for x in range(w):
            cx = 0
            for dx, dy in offs:
                cx <<= 1
                xx, yy = x + dx, y + dy
                if 0 <= xx < w and 0 <= yy:
                    cx |= rows_px[yy][xx]
            enc.encode(cx, rows_px[y][x])
    return enc.flush()


def seg_header(number: int, type_: int, page: int, data_len: int) -> bytes:
    return (
        struct.pack(">IB", number, type_)
        + b"\x00"  # 0 referred-to segments
        + bytes([page])
        + struct.pack(">I", data_len)
    )


def page_info_seg(number: int, w: int, h: int, default: int = 0) -> bytes:
    data = (
        struct.pack(">IIII", w, h, 0, 0)
        + bytes([default << 2])
        + struct.pack(">H", 0)
    )
    return seg_header(number, 48, 1, len(data)) + data


def generic_region_seg(
    number: int, w: int, h: int, x: int, y: int, coded: bytes,
    template: int = 0, at=None, comb: int = 0, mmr: bool = False,
    tpgdon: bool = False,
) -> bytes:
    info = struct.pack(">IIII", w, h, x, y) + bytes([comb])
    flags = int(mmr) | (template << 1) | (8 if tpgdon else 0)
    data = info + bytes([flags])
    if not mmr:
        for ax, ay in _NOMINAL_AT[template] if at is None else at:
            data += struct.pack(">bb", ax, ay)
    data += coded
    return seg_header(number, 38, 1, len(data)) + data


CHECKER = [[(x + y) % 2 for x in range(16)] for y in range(8)]
GLYPH = [
    [0, 0, 1, 1, 1, 1, 0, 0],
    [0, 1, 0, 0, 0, 0, 1, 0],
    [1, 0, 0, 1, 1, 0, 0, 1],
    [1, 0, 0, 1, 1, 0, 0, 1],
    [0, 1, 0, 0, 0, 0, 1, 0],
    [0, 0, 1, 1, 1, 1, 0, 0],
]


def _unpack(decoded: bytes, w: int, h: int) -> list[list[int]]:
    """packed PDF-polarity rows (0 = black) -> 1-is-black pixel rows."""
    rb = (w + 7) // 8
    return [
        [0 if decoded[y * rb + (x >> 3)] & (0x80 >> (x & 7)) else 1
         for x in range(w)]
        for y in range(h)
    ]


def test_generic_region_round_trips_all_templates():
    for template in (0, 1, 2, 3):
        stream = page_info_seg(1, 16, 8) + generic_region_seg(
            2, 16, 8, 0, 0, generic_encode(CHECKER, template),
            template=template,
        )
        decoded = jbig2_decode(stream)
        assert decoded is not None, f"template {template}"
        assert _unpack(decoded, 16, 8) == CHECKER, f"template {template}"


def test_generic_region_tpgdon_round_trips():
    rows = [GLYPH[0]] * 3 + GLYPH + [GLYPH[-1]] * 2  # repeated rows: LTP
    stream = page_info_seg(1, 8, len(rows)) + generic_region_seg(
        2, 8, len(rows), 0, 0, generic_encode(rows, 0, tpgdon=True),
        tpgdon=True,
    )
    decoded = jbig2_decode(stream)
    assert decoded is not None
    assert _unpack(decoded, 8, len(rows)) == rows


def test_generic_region_custom_at_pixels():
    at = [(1, -1), (-1, -1), (1, -2), (-1, -2)]
    stream = page_info_seg(1, 16, 8) + generic_region_seg(
        2, 16, 8, 0, 0, generic_encode(CHECKER, 0, at=at), at=at,
    )
    decoded = jbig2_decode(stream)
    assert decoded is not None
    assert _unpack(decoded, 16, 8) == CHECKER


def test_mmr_generic_region_routes_through_t6():
    stream = page_info_seg(1, 8, 6) + generic_region_seg(
        2, 8, 6, 0, 0, g4_encode(GLYPH, 8), mmr=True,
    )
    decoded = jbig2_decode(stream)
    assert decoded is not None
    assert _unpack(decoded, 8, 6) == GLYPH


def test_region_composition_offset_and_or():
    """A region placed at (4, 2) on a larger default-white page lands at
    the right offset; pixels outside stay white."""
    stream = page_info_seg(1, 16, 10) + generic_region_seg(
        2, 8, 6, 4, 2, generic_encode(GLYPH), comb=0,
    )
    decoded = jbig2_decode(stream)
    assert decoded is not None
    px = _unpack(decoded, 16, 10)
    for y in range(10):
        for x in range(16):
            want = GLYPH[y - 2][x - 4] if 2 <= y < 8 and 4 <= x < 12 else 0
            assert px[y][x] == want


def test_two_regions_compose_with_xor():
    full = generic_encode([[1] * 8] * 4)
    stream = (
        page_info_seg(1, 8, 4)
        + generic_region_seg(2, 8, 4, 0, 0, full, comb=0)
        + generic_region_seg(3, 8, 4, 0, 0, full, comb=2)  # XOR erases
    )
    decoded = jbig2_decode(stream)
    assert decoded is not None
    assert _unpack(decoded, 8, 4) == [[0] * 8] * 4


def test_unknown_page_height_uses_pdf_dims():
    stream = (
        page_info_seg(1, 8, 0xFFFFFFFF)
        + generic_region_seg(2, 8, 6, 0, 0, generic_encode(GLYPH))
    )
    decoded = jbig2_decode(stream, width=8, height=6)
    assert decoded is not None
    assert _unpack(decoded, 8, 6) == GLYPH


def test_symbol_and_text_segments_stay_undecodable():
    generic = generic_region_seg(3, 8, 6, 0, 0, generic_encode(GLYPH))
    for seg_type in (0, 4, 6, 7, 16, 20, 23, 40, 43):
        stream = (
            page_info_seg(1, 8, 6)
            + seg_header(2, seg_type, 1, 4) + b"\x00\x00\x00\x00"
            + generic
        )
        assert jbig2_decode(stream) is None, seg_type
        assert not jbig2_headers_supported(stream), seg_type
    # ignorable types pass both
    stream = (
        page_info_seg(1, 8, 6) + generic
        + seg_header(4, 49, 1, 0)  # end of page
        + seg_header(5, 62, 1, 2) + b"\x00\x00"  # extension
    )
    assert jbig2_headers_supported(stream)
    assert jbig2_decode(stream) is not None


def test_malformed_streams_return_none_never_raise():
    good = page_info_seg(1, 8, 6) + generic_region_seg(
        2, 8, 6, 0, 0, generic_encode(GLYPH)
    )
    for bad in (
        b"", b"\x00" * 5, good[:-1], good[:13],
        good[:11] + b"\xff\xff\xff\xff" + good[15:],  # forged data length
        seg_header(1, 38, 1, 4) + b"\x00\x00\x00\x00",  # truncated region
    ):
        assert jbig2_decode(bad) is None
        jbig2_headers_supported(bad)  # total, bool either way


def test_forged_geometry_is_capped():
    info = struct.pack(">IIII", 1 << 24, 1 << 24, 0, 0) + b"\x00\x00"
    seg = seg_header(2, 38, 1, len(info) + 8) + info + b"\x00" * 8
    assert jbig2_decode(page_info_seg(1, 1 << 24, 1 << 24) + seg) is None
    # region outside the declared page: forged
    stream = page_info_seg(1, 8, 4) + generic_region_seg(
        2, 8, 6, 4, 2, generic_encode(GLYPH)
    )
    assert jbig2_decode(stream) is None


# -- PDF integration ---------------------------------------------------------
def _jbig2_image_obj(rows_px, w, extra=b""):
    stream = page_info_seg(1, w, len(rows_px)) + generic_region_seg(
        2, w, len(rows_px), 0, 0, generic_encode(rows_px)
    )
    return make_image_obj(
        stream, width=w, height=len(rows_px),
        colorspace=b"/DeviceGray", bpc=1, filt=b"/JBIG2Decode", extra=extra,
    )


def test_pdf_jbig2_image_round_trips_to_exact_pixels():
    """r15 done-condition: a generic-region JBIG2 fixture decodes to
    exact pixels via pdf_extract_images, and the breadcrumb counter
    stops naming it."""
    from docling_api_spark.pipeline.textextract import (
        pdf_extract_images,
        pdf_undecodable_image_streams,
    )

    doc = make_pdf_objs([TEXT_OBJ, _jbig2_image_obj(GLYPH, 8)])
    assert pdf_undecodable_image_streams(doc) == {}
    (png,) = pdf_extract_images(doc)
    w, h, ch, raw = decode_png(png)
    assert (w, h, ch) == (8, 6, 1)
    expected = bytes(0 if p else 255 for row in GLYPH for p in row)
    assert raw == expected


def test_pdf_jbig2_globals_resolve_through_object_scan():
    """/JBIG2Globals N G R: the globals stream resolves (honouring its
    own filter chain) and its segments prepend the image stream's."""
    import zlib

    from docling_api_spark.pipeline.textextract import (
        pdf_extract_images,
        pdf_undecodable_image_streams,
    )

    glob_payload = zlib.compress(page_info_seg(1, 8, 6))
    glob_obj = (
        b"7 0 obj <</Filter /FlateDecode /Length %d>>\nstream\n"
        % len(glob_payload) + glob_payload + b"\nendstream endobj"
    )
    region = generic_region_seg(2, 8, 6, 0, 0, generic_encode(GLYPH))
    img = make_image_obj(
        region, width=8, height=6, colorspace=b"/DeviceGray", bpc=1,
        filt=b"/JBIG2Decode",
        extra=b" /DecodeParms <</JBIG2Globals 7 0 R>>",
    )
    doc = make_pdf_objs([TEXT_OBJ, img, glob_obj])
    assert pdf_undecodable_image_streams(doc) == {}
    (png,) = pdf_extract_images(doc)
    w, h, ch, raw = decode_png(png)
    assert (w, h, ch) == (8, 6, 1)
    assert raw == bytes(0 if p else 255 for row in GLYPH for p in row)


def test_pdf_jbig2_symbol_coded_stream_keeps_breadcrumb():
    """A symbol-dictionary segment (the common scanner text path, out of
    scope) keeps the stream counted undecodable — byte-precise: the
    counter separates it from decodable generic streams."""
    from docling_api_spark.pipeline.textextract import (
        pdf_extract_images,
        pdf_undecodable_image_streams,
    )

    stream = (
        page_info_seg(1, 8, 6)
        + seg_header(2, 0, 1, 4) + b"\x00\x00\x00\x00"  # symbol dict
        + generic_region_seg(3, 8, 6, 0, 0, generic_encode(GLYPH))
    )
    img = make_image_obj(
        stream, width=8, height=6, colorspace=b"/DeviceGray", bpc=1,
        filt=b"/JBIG2Decode",
    )
    doc = make_pdf_objs([TEXT_OBJ, img])
    assert pdf_undecodable_image_streams(doc) == {"JBIG2Decode": 1}
    assert pdf_extract_images(doc) == []


def test_pdf_jbig2_unresolvable_globals_keep_breadcrumb():
    from docling_api_spark.pipeline.textextract import (
        pdf_extract_images,
        pdf_undecodable_image_streams,
    )

    doc = make_pdf_objs([
        TEXT_OBJ,
        _jbig2_image_obj(
            GLYPH, 8, extra=b" /DecodeParms <</JBIG2Globals 42 0 R>>"
        ),
    ])
    assert pdf_undecodable_image_streams(doc) == {"JBIG2Decode": 1}
    assert pdf_extract_images(doc) == []


@settings(max_examples=40, deadline=None)
@given(
    st.integers(0, 3),
    st.lists(
        st.lists(st.integers(0, 1), min_size=12, max_size=12),
        min_size=6, max_size=6,
    ),
    st.booleans(),
)
def test_generic_region_round_trip_fuzz(template, rows, tpgdon):
    stream = page_info_seg(1, 12, 6) + generic_region_seg(
        2, 12, 6, 0, 0,
        generic_encode(rows, template, tpgdon=tpgdon),
        template=template, tpgdon=tpgdon,
    )
    decoded = jbig2_decode(stream)
    assert decoded is not None
    assert _unpack(decoded, 12, 6) == rows
