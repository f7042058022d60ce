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
def generic_encode_into(
    enc, rows_px, template=0, at=None, tpgdon=False, ns="gb"
) -> None:
    """Encode one bitmap's generic-region bits onto a SHARED MQ encoder
    (symbol dictionaries reuse one arithmetic stream + one GB context
    space across all symbols — contexts namespaced by `ns`)."""
    at = _NOMINAL_AT[template] if at is None else at
    offs = sorted(tuple(_FIXED_TEMPLATE[template]) + tuple(at),
                  key=lambda o: (o[1], o[0]))
    h, w = len(rows_px), len(rows_px[0])
    ltp = 0
    for y in range(h):
        if tpgdon:
            want = rows_px[y] == (rows_px[y - 1] if y else [0] * w)
            enc.encode((ns, _SLTP_CX[template]), ltp ^ int(want))
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
            enc.encode((ns, cx), rows_px[y][x])


def generic_encode(rows_px, template=0, at=None, tpgdon=False) -> bytes:
    enc = MQEncoder()
    generic_encode_into(enc, rows_px, template, at, tpgdon)
    return enc.flush()


OOB = object()


def encode_int(enc, ns: str, v) -> None:
    """Annex A inverse: sign + magnitude-class prefix + value bits with
    the same PREV context chaining the decoder uses."""
    prev = 1

    def put(b: int) -> None:
        nonlocal prev
        enc.encode((ns, prev), b)
        prev = (
            ((prev << 1) | b)
            if prev < 256
            else ((((prev << 1) | b) & 511) | 256)
        )

    def puts(val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            put((val >> i) & 1)

    if v is OOB:
        put(1)
        put(0)
        puts(0, 2)
        return
    s, m = (1, -v) if v < 0 else (0, v)
    put(s)
    if m < 4:
        put(0)
        puts(m, 2)
    elif m < 20:
        put(1), put(0), puts(m - 4, 4)
    elif m < 84:
        put(1), put(1), put(0), puts(m - 20, 6)
    elif m < 340:
        put(1), put(1), put(1), put(0), puts(m - 84, 8)
    elif m < 4436:
        put(1), put(1), put(1), put(1), put(0), puts(m - 340, 12)
    else:
        put(1), put(1), put(1), put(1), put(1), puts(m - 4436, 32)


def encode_iaid(enc, ns: str, sym_id: int, symcodelen: int) -> None:
    prev = 1
    v = sym_id + (1 << symcodelen)
    for i in range(symcodelen - 1, -1, -1):
        b = (v >> i) & 1
        enc.encode((ns, prev), b)
        prev = (prev << 1) | b


def symbol_dict_encode(symbols, template=0, n_input=0) -> bytes:
    """Symbol-dictionary segment DATA (§7.4.3): height classes ascending
    (symbols must be pre-sorted by height), every symbol exported —
    including `n_input` imported symbols from referred dictionaries."""
    heights = [len(s) for s in symbols]
    assert heights == sorted(heights), "pre-sort fixture symbols by height"
    enc = MQEncoder()
    hc = 0
    i = 0
    while i < len(symbols):
        height = heights[i]
        encode_int(enc, "iadh", height - hc)
        hc = height
        symw = 0
        while i < len(symbols) and heights[i] == height:
            w = len(symbols[i][0])
            encode_int(enc, "iadw", w - symw)
            symw = w
            generic_encode_into(enc, symbols[i], template)
            i += 1
        encode_int(enc, "iadw", OOB)
    encode_int(enc, "iaex", 0)  # first run: not exported (length 0)
    encode_int(enc, "iaex", n_input + len(symbols))  # export everything
    coded = enc.flush()
    head = struct.pack(">H", template << 10)
    for ax, ay in _NOMINAL_AT[template][: 4 if template == 0 else 1]:
        head += struct.pack(">bb", ax, ay)
    head += struct.pack(">II", n_input + len(symbols), len(symbols))
    return head + coded


def text_region_encode(
    w, h, instances, nsyms, sym_widths, sym_heights=None, comb=0,
    ref_corner=1, transposed=0,
) -> bytes:
    """Text-region segment DATA (§7.4.4): SBSTRIPS=1, OR composition.
    `instances` = [(sym_id, s, t)] where (s, t) is always the TOP-LEFT
    of the desired placement — the encoder converts to the reference
    corner's (S, T) coordinates and mirrors the decoder's S-advances,
    so one fixture exercises every REFCORNER x TRANSPOSED combination."""
    if sym_heights is None:
        sym_heights = [0] * len(sym_widths)
    symcodelen = max(1, (nsyms - 1).bit_length())
    # (T_emit, S_emit, sym_id): the decoder's strip axis is T — the y
    # axis normally, the x axis when transposed
    items = []
    for sym_id, s, t in instances:
        sw_, sh_ = sym_widths[sym_id], sym_heights[sym_id]
        if not transposed:
            t_emit = t if ref_corner in (1, 3) else t + sh_ - 1
            items.append((t_emit, s, sym_id))
        else:
            t_emit = s if ref_corner in (0, 1) else s + sw_ - 1
            items.append((t_emit, t, sym_id))
    enc = MQEncoder()
    encode_int(enc, "iadt", 0)  # STRIPT = 0
    strip_t = 0
    first_s = 0
    by_t: dict[int, list] = {}
    for t_emit, s_emit, sym_id in items:
        by_t.setdefault(t_emit, []).append((s_emit, sym_id))
    for t_emit in sorted(by_t):
        encode_int(enc, "iadt", t_emit - strip_t)
        strip_t = t_emit
        cur_s = None
        for s_emit, sym_id in sorted(by_t[t_emit]):
            if cur_s is None:
                encode_int(enc, "iafs", s_emit - first_s)
                first_s = s_emit
                cur_s = s_emit
            else:
                encode_int(enc, "iads", s_emit - cur_s)  # SBDSOFFSET = 0
                cur_s = s_emit
            encode_iaid(enc, "iaid", sym_id, symcodelen)
            # decoder's total S-advance per instance: to the far edge
            adv = sym_heights[sym_id] if transposed else sym_widths[sym_id]
            cur_s += adv - 1
        encode_int(enc, "iads", OOB)
    coded = enc.flush()
    info = struct.pack(">IIII", w, h, 0, 0) + bytes([comb])
    flags = (ref_corner << 4) | (transposed << 6)
    return (
        info + struct.pack(">H", flags)
        + struct.pack(">I", len(instances)) + coded
    )


def seg_header(
    number: int, type_: int, page: int, data_len: int, refs=()
) -> bytes:
    assert len(refs) <= 4 and number <= 256
    return (
        struct.pack(">IB", number, type_)
        + bytes([len(refs) << 5])
        + bytes(refs)  # 1-byte referred numbers (number <= 256)
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


def test_out_of_scope_segments_stay_undecodable():
    """Intermediate regions, pattern/halftone/refinement coding, and the
    Huffman-coded symbol/text variants stay breadcrumbed (r15 scope:
    arithmetic non-refinement symbol/text + generic only)."""
    generic = generic_region_seg(3, 8, 6, 0, 0, generic_encode(GLYPH))
    for seg_type in (4, 16, 20, 23, 36, 40, 43):
        stream = (
            page_info_seg(1, 8, 6)
            + seg_header(2, seg_type, 1, 4) + b"\x00\x00\x00\x00"
            + generic
        )
        assert jbig2_decode(stream) is None, seg_type
        assert not jbig2_headers_supported(stream), seg_type
    # SDHUFF / SDREFAGG / imported-contexts symbol dicts: flagged out
    for flags in (0x0001, 0x0002, 0x0100):
        sd = struct.pack(">H", flags) + b"\x00" * 16
        stream = (
            page_info_seg(1, 8, 6)
            + seg_header(2, 0, 1, len(sd)) + sd + generic
        )
        assert jbig2_decode(stream) is None, hex(flags)
        assert not jbig2_headers_supported(stream), hex(flags)
    # SBHUFF text region: flagged out
    tr = struct.pack(">IIII", 8, 6, 0, 0) + b"\x00" + struct.pack(">H", 1) \
        + struct.pack(">I", 0)
    stream = (
        page_info_seg(1, 8, 6)
        + seg_header(2, 6, 1, len(tr)) + tr + generic
    )
    assert jbig2_decode(stream) is None
    assert not jbig2_headers_supported(stream)
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


def test_pdf_jbig2_huffman_symbol_stream_keeps_breadcrumb():
    """A Huffman-coded symbol dictionary (out of the arithmetic subset)
    keeps the stream counted undecodable — byte-precise: the counter
    separates it from decodable symbol/generic streams."""
    from docling_api_spark.pipeline.textextract import (
        pdf_extract_images,
        pdf_undecodable_image_streams,
    )

    sd = struct.pack(">H", 0x0001) + b"\x00" * 16  # SDHUFF = 1
    stream = (
        page_info_seg(1, 8, 6)
        + seg_header(2, 0, 1, len(sd)) + sd
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


# ---------------------------------------------------------------------------
# r15b: symbol dictionary + text region (arithmetic subset)
# ---------------------------------------------------------------------------
GLYPH_A = [
    [0, 1, 1, 0],
    [1, 0, 0, 1],
    [1, 1, 1, 1],
    [1, 0, 0, 1],
]
GLYPH_B = [
    [1, 1, 1, 0],
    [1, 0, 0, 1],
    [1, 1, 1, 0],
    [1, 0, 0, 1],
    [1, 1, 1, 0],
]
GLYPH_DOT = [[1, 1], [1, 1]]


def _render(w, h, placements):
    """reference rendering: OR each (glyph, s, t) onto a white page."""
    page = [[0] * w for _ in range(h)]
    for glyph, s, t in placements:
        for j, grow in enumerate(glyph):
            for i, v in enumerate(grow):
                if v and 0 <= t + j < h and 0 <= s + i < w:
                    page[t + j][s + i] = 1
    return page


def _sym_text_stream(w, h, symbols, instances, one_segment_page=True):
    """page info + symbol dict (number 2) + text region referring to it."""
    sd = symbol_dict_encode(symbols)
    widths = [len(s[0]) for s in symbols]
    tr = text_region_encode(w, h, instances, len(symbols), widths)
    return (
        page_info_seg(1, w, h)
        + seg_header(2, 0, 1, len(sd)) + sd
        + seg_header(3, 6, 1, len(tr), refs=[2]) + tr
    )


def test_symbol_dict_plus_text_region_round_trips():
    """r15b done-condition: a symbol-coded page (the jbig2enc shape —
    dictionary + text region placements) decodes to exact pixels."""
    symbols = [GLYPH_DOT, GLYPH_A, GLYPH_B]  # heights 2, 4, 5 ascending
    instances = [(1, 1, 1), (2, 7, 1), (0, 13, 2), (1, 2, 8), (1, 8, 8)]
    stream = _sym_text_stream(18, 14, symbols, instances)
    decoded = jbig2_decode(stream)
    assert decoded is not None
    want = _render(18, 14, [
        (symbols[i], s, t) for i, s, t in instances
    ])
    assert _unpack(decoded, 18, 14) == want
    assert jbig2_headers_supported(stream)


def test_symbol_dict_multiple_height_classes_and_width_deltas():
    """Height classes advance by IADH deltas; widths inside a class move
    by signed IADW deltas (B then a NARROWER same-height glyph)."""
    wide = [[1, 0, 1, 0, 1, 0]] * 3
    narrow = [[1, 1]] * 3
    tall = [[1], [0], [1], [0], [1], [0], [1]]
    symbols = [wide, narrow, tall]  # heights 3, 3, 7
    instances = [(0, 0, 0), (1, 8, 0), (2, 12, 0), (0, 2, 9)]
    stream = _sym_text_stream(16, 16, symbols, instances)
    decoded = jbig2_decode(stream)
    assert decoded is not None
    want = _render(16, 16, [(symbols[i], s, t) for i, s, t in instances])
    assert _unpack(decoded, 16, 16) == want


def test_symbol_dict_import_chain():
    """A dictionary can import another dictionary's exports; the text
    region sees imported symbols first, then the new ones (§6.5.5)."""
    sd_a = symbol_dict_encode([GLYPH_DOT])
    sd_b = symbol_dict_encode([GLYPH_A], n_input=1)  # exports DOT + A
    widths = [2, 4]  # DOT (imported, id 0), A (new, id 1)
    instances = [(0, 1, 1), (1, 6, 1), (0, 12, 3)]
    tr = text_region_encode(16, 8, instances, 2, widths)
    stream = (
        page_info_seg(1, 16, 8)
        + seg_header(2, 0, 1, len(sd_a)) + sd_a
        + seg_header(3, 0, 1, len(sd_b), refs=[2]) + sd_b
        + seg_header(4, 6, 1, len(tr), refs=[3]) + tr
    )
    decoded = jbig2_decode(stream)
    assert decoded is not None
    syms = [GLYPH_DOT, GLYPH_A]
    want = _render(16, 8, [(syms[i], s, t) for i, s, t in instances])
    assert _unpack(decoded, 16, 8) == want


def test_text_region_corrupt_symbol_id_is_rejected():
    """Truncating the coded data makes the arithmetic decode drift; the
    region decoder must return None (bad IDs / counts), never raise."""
    symbols = [GLYPH_DOT, GLYPH_A]
    instances = [(0, 1, 1), (1, 6, 1)]
    stream = _sym_text_stream(16, 8, symbols, instances)
    for cut in (1, 3, 7, 11):
        out = jbig2_decode(stream[: len(stream) - cut])
        # totality is the contract (None or a well-formed raster, never
        # a raise); exactness is pinned by the round-trip tests above
        assert out is None or isinstance(out, bytes)


def test_pdf_jbig2_symbol_text_page_round_trips():
    """The realistic jbig2enc layout: symbol dictionary in the
    /JBIG2Globals stream, text region in the image stream."""
    from docling_api_spark.pipeline.textextract import (
        pdf_extract_images,
        pdf_undecodable_image_streams,
    )

    symbols = [GLYPH_DOT, GLYPH_A]
    sd = symbol_dict_encode(symbols)
    glob = page_info_seg(1, 12, 8) + seg_header(2, 0, 1, len(sd)) + sd
    instances = [(1, 1, 1), (0, 7, 2), (1, 7, 5)]
    tr = text_region_encode(12, 8, instances, 2, [2, 4])
    body = seg_header(3, 6, 1, len(tr), refs=[2]) + tr
    glob_obj = (
        b"7 0 obj <</Length %d>>\nstream\n" % len(glob)
        + glob + b"\nendstream endobj"
    )
    img = make_image_obj(
        body, width=12, height=8, colorspace=b"/DeviceGray", bpc=1,
        filt=b"/JBIG2Decode",
        extra=b" /DecodeParms <</JBIG2Globals 7 0 R>>",
    )
    doc = make_pdf_objs([TEXT_OBJ, img, glob_obj])
    assert pdf_undecodable_image_streams(doc) == {}
    (png,) = pdf_extract_images(doc)
    w, h, ch, raw = decode_png(png)
    assert (w, h, ch) == (12, 8, 1)
    syms = [GLYPH_DOT, GLYPH_A]
    want = _render(12, 8, [(syms[i], s, t) for i, s, t in instances])
    assert raw == bytes(
        0 if p else 255 for row in want for p in row
    )


import pytest


@pytest.mark.parametrize("transposed", [0, 1])
@pytest.mark.parametrize("ref_corner", [0, 1, 2, 3])
def test_text_region_every_refcorner_and_transposition(
    ref_corner, transposed
):
    """One placement fixture through all 8 REFCORNER x TRANSPOSED
    combinations: the encoder emits corner-relative (S, T) coordinates
    and the decoder must land every glyph on the same absolute
    top-left pixels."""
    symbols = [GLYPH_DOT, GLYPH_A, GLYPH_B]
    widths = [2, 4, 4]
    heights = [2, 4, 5]
    instances = [(1, 1, 1), (0, 7, 2), (2, 11, 1), (1, 3, 8)]
    sd = symbol_dict_encode(symbols)
    tr = text_region_encode(
        16, 14, instances, 3, widths, heights,
        ref_corner=ref_corner, transposed=transposed,
    )
    stream = (
        page_info_seg(1, 16, 14)
        + seg_header(2, 0, 1, len(sd)) + sd
        + seg_header(3, 6, 1, len(tr), refs=[2]) + tr
    )
    decoded = jbig2_decode(stream)
    assert decoded is not None
    want = _render(16, 14, [(symbols[i], s, t) for i, s, t in instances])
    assert _unpack(decoded, 16, 14) == want
