"""Pure-python JBIG2 generic-region decoder for PDF ``JBIG2Decode``
image streams (ITU-T T.88): the MQ arithmetic decoder (T.88 Annex E —
the same coder as JPEG 2000), generic region decoding with templates
0-3, TPGDON typical-prediction, custom AT pixels, and MMR-coded generic
regions routed through the existing T.6 decoder (``ccittg4``, since MMR
*is* T.6). The embedded-stream organization PDF uses (no file header,
sequential segments — T.88 Annex D.3 / ISO 32000-1 §7.4.7) is parsed
segment-by-segment; page-information segments drive composition.

JBIG2 is the next-most-common scanned-document codec after CCITT
(VERDICT r14 Next #4); the reference converts scanned PDFs through
docling's OCR pipeline (document_converter/service.py:133-158), which
this container lacks — decoding the raster at least recovers the scan
image itself, exactly as r14 did for the CCITT family. Everything here
is public knowledge: ITU-T Recommendation T.88 (segment syntax §7,
generic region decoding §6.2, MQ coder Annex E).

SCOPE — generic regions, symbol dictionaries (§6.5), and text regions
(§6.4) in their arithmetic non-refinement forms, which covers both
fax-style whole-page masks AND jbig2enc-style symbol-coded textual
scans. Correct-by-omission elsewhere: Huffman-coded variants,
refinement/aggregate coding, halftone/pattern segments, and
intermediate regions return ``None`` (the undecodable-codec breadcrumb
stays for them, with byte-level precision: ``jbig2_headers_supported``
lets the breadcrumb counter separate a decodable stream from an
out-of-subset one without running the arithmetic decoder).

Output convention follows the PDF filter contract (ISO 32000-1
§7.4.7): 1 bit per pixel, rows padded to byte boundaries, MSB first,
**0 = black** — T.88's internal 1-is-black polarity is inverted at the
packing step so the payload is plain 1-bit DeviceGray, consumed
unchanged by the shared raster pipeline (same convention as
``ccitt_g4_decode``).

Total-function discipline (same contract as ``ccittg4``): malformed
input returns ``None``, never raises; declared geometry is capped
(1 MiB width, 64 Mpixel page/region) so no input drives an unbounded
allocation; every segment read is bounds-checked.

Throughput: the MQ decoder is per-pixel python; the sliding-window
context path (nominal template layouts) measures ~1.2-1.5s per 10^6
pixels — a full 1728x2200 fax page in ~4-5s. Slower than the
run-length CCITT path but bounded by the geometry caps; documents
parallelize across mapInPandas rows so a scanned corpus scales the
same way the rest of the conversion stage does.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# MQ arithmetic decoder — T.88 Annex E (software conventions). The Qe
# state-transition table is Table E.1: (Qe, NMPS, NLPS, SWITCH).
# tests/test_jbig2.py pins table invariants and round-trips the decoder
# against an independently-written Annex E *encoder*.
# ---------------------------------------------------------------------------

_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class _MQDecoder:
    """T.88 E.3 decoder, software conventions: 32-bit C register whose
    high half is compared against Qe; BYTEIN feeds all-1 bits past the
    end of data (there are no 0xFF90+ markers inside JBIG2 MQ data, so
    running off the end decodes deterministically instead of raising —
    total-function contract)."""

    __slots__ = ("data", "bp", "c", "a", "ct", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.n = len(data)
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp, n = self.data, self.bp, self.n
        b = data[bp] if bp < n else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < n else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[bp + 1] if bp + 1 < n else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, icx: bytearray, mcx: bytearray, cx: int) -> int:
        """One bit for context ``cx``; (icx[cx], mcx[cx]) is the
        (state-index, MPS) pair, updated in place."""
        i = icx[cx]
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS subinterval selected: conditional exchange (E.3.2)
            if self.a < qe:
                d = mcx[cx]
                icx[cx] = nmps
            else:
                d = 1 - mcx[cx]
                if switch:
                    mcx[cx] = 1 - mcx[cx]
                icx[cx] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mcx[cx]
            if self.a < qe:
                d = 1 - mcx[cx]
                if switch:
                    mcx[cx] = 1 - mcx[cx]
                icx[cx] = nlps
            else:
                d = mcx[cx]
                icx[cx] = nmps
        # RENORMD
        a, c, ct = self.a, self.c, self.ct
        while True:
            if ct == 0:
                self.c, self.ct = c, 0
                self._bytein()
                c, ct = self.c, self.ct
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
            if a == 0:  # defensive: cannot renormalize a zero interval
                break
        self.a, self.c, self.ct = a, c, ct
        return d


# ---------------------------------------------------------------------------
# Generic region decoding — T.88 §6.2. Context = template pixels sorted
# by (dy, dx), MSB-first (fixed pixels per Figures 4-7 plus the
# segment's AT pixels). The TPGDON pseudo-pixel contexts are the
# constants T.88 gives per template.
# ---------------------------------------------------------------------------

_FIXED_TEMPLATE = (
    # template 0: 12 fixed pixels + AT1..AT4
    ((-1, -2), (0, -2), (1, -2),
     (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
     (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
    # template 1: 12 fixed + AT1
    ((-1, -2), (0, -2), (1, -2), (2, -2),
     (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
     (-3, 0), (-2, 0), (-1, 0)),
    # template 2: 9 fixed + AT1
    ((-1, -2), (0, -2), (1, -2),
     (-2, -1), (-1, -1), (0, -1), (1, -1),
     (-2, 0), (-1, 0)),
    # template 3 (single reference line): 9 fixed + AT1
    ((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
     (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
)
_SLTP_CX = (0x9B25, 0x0795, 0x00E5, 0x0195)
_MAX_PIXELS = 1 << 26  # 64 Mpixel cap: forged geometry, not a scan
_MAX_WIDTH = 1 << 20


def _contiguous_spans(offs):
    """(dy, dx_lo, length, shift) per template row when every row's dx
    set is a contiguous run (all nominal layouts are) — enables the
    sliding-window context update. None otherwise (duplicate or gapped
    custom AT layouts fall back to the per-pixel path). `shift` is the
    number of context bits to the right of this row's span (offs are
    MSB-first in (dy, dx) order)."""
    groups: list[list] = []
    for dx, dy in offs:
        if groups and groups[-1][0] == dy:
            groups[-1][1].append(dx)
        else:
            groups.append([dy, [dx]])
    rows = []
    for dy, dxs in groups:
        if dxs != list(range(dxs[0], dxs[0] + len(dxs))):
            return None
        rows.append((dy, dxs[0], len(dxs)))
    total = sum(r[2] for r in rows)
    out, used = [], 0
    for dy, lo, ln in rows:
        used += ln
        out.append((dy, lo, ln, total - used))
    return out


def _generic_context_size(template: int, at) -> int | None:
    """Context-array size for a generic template + AT set, or None when
    the layout is invalid (AT in the undecoded half-plane, oversized)."""
    offs = tuple(_FIXED_TEMPLATE[template]) + tuple(at)
    if any(dy > 0 or (dy == 0 and dx >= 0) for dx, dy in offs):
        return None
    if len(offs) > 20:
        return None
    return 1 << len(offs)


def _decode_generic_mq(
    data: bytes,
    w: int,
    h: int,
    template: int,
    at: list[tuple[int, int]],
    tpgdon: bool,
) -> list[bytearray] | None:
    """MQ-coded generic region -> rows of 0/1 bytes (1 = black), or
    None on bad geometry — standalone form: fresh MQ decoder + fresh
    context arrays for one region segment."""
    size = _generic_context_size(template, at)
    if size is None:
        return None
    return _decode_generic_into(
        _MQDecoder(data), bytearray(size), bytearray(size),
        w, h, template, at, tpgdon,
    )


def _decode_generic_into(
    mq: "_MQDecoder",
    icx: bytearray,
    mcx: bytearray,
    w: int,
    h: int,
    template: int,
    at,
    tpgdon: bool,
) -> list[bytearray] | None:
    """Core generic-region procedure (T.88 §6.2.5.7) over a CALLER-OWNED
    MQ decoder and context arrays — symbol dictionaries decode every
    symbol bitmap from one shared arithmetic stream and one shared
    generic-context array (§6.5.5), so the state must persist across
    calls. The arithmetic decode itself is total: any byte stream
    decodes to SOME bitmap (that is the nature of the coder), so
    corruption detection lives at the segment/page layer."""
    if w <= 0 or h <= 0 or w > _MAX_WIDTH or w * h > _MAX_PIXELS:
        return None
    offs = sorted(tuple(_FIXED_TEMPLATE[template]) + tuple(at),
                  key=lambda o: (o[1], o[0]))
    if any(dy > 0 or (dy == 0 and dx >= 0) for dx, dy in offs):
        return None  # AT pixel in the not-yet-decoded half-plane
    spans = _contiguous_spans(offs)
    bitmap: list[bytearray] = [bytearray(w) for _ in range(h)]
    zero = bytes(w)
    sltp_cx = _SLTP_CX[template]
    ltp = 0
    decode = mq.decode
    for y in range(h):
        if tpgdon:
            ltp ^= decode(icx, mcx, sltp_cx)
            if ltp:
                bitmap[y][:] = bitmap[y - 1] if y else zero
                continue
        row = bitmap[y]
        if spans is not None:
            # sliding-window fast path: every template row is a
            # contiguous dx span (true for all nominal layouts), so the
            # per-row window slides one bit per pixel instead of
            # re-fetching every template pixel (~3x fewer lookups)
            wins = []
            for dy, dx_lo, length, shift in spans:
                yy = y + dy
                src = bitmap[yy] if 0 <= yy else None
                v = 0
                for dx in range(dx_lo, dx_lo + length):
                    v <<= 1
                    if src is not None and 0 <= dx < w:
                        v |= src[dx]
                wins.append([src, v, dx_lo + length, (1 << length) - 1,
                             shift])
            for x in range(w):
                cx = 0
                for win in wins:
                    cx |= win[1] << win[4]
                row[x] = decode(icx, mcx, cx)
                nx = x + 1
                for win in wins:
                    src = win[0]
                    lead = nx + win[2] - 1  # incoming pixel column
                    bit = (
                        src[lead]
                        if src is not None and 0 <= lead < w
                        else 0
                    )
                    win[1] = ((win[1] << 1) | bit) & win[3]
            continue
        # general path (non-contiguous custom AT layouts)
        srcs = []
        for dx, dy in offs:
            yy = y + dy
            srcs.append((dx, bitmap[yy] if 0 <= yy < h else None))
        for x in range(w):
            cx = 0
            for dx, src in srcs:
                cx <<= 1
                xx = x + dx
                if src is not None and 0 <= xx < w:
                    cx |= src[xx]
            row[x] = decode(icx, mcx, cx)
    return bitmap


def _decode_generic_mmr(
    data: bytes, w: int, h: int
) -> list[bytearray] | None:
    """MMR-coded generic region: T.88 §6.2.6 says the coding is exactly
    T.6 — route through the existing G4 decoder (black_is_1 so set bits
    mean black, matching JBIG2's internal polarity) and unpack."""
    from docling_api_spark.pipeline.ccittg4 import ccitt_g4_decode

    if w <= 0 or h <= 0 or w > _MAX_WIDTH or w * h > _MAX_PIXELS:
        return None
    packed = ccitt_g4_decode(data, w, rows=h, black_is_1=True)
    if packed is None:
        return None
    row_bytes = (w + 7) // 8
    out: list[bytearray] = []
    for y in range(h):
        row = bytearray(w)
        base = y * row_bytes
        for x in range(w):
            if packed[base + (x >> 3)] & (0x80 >> (x & 7)):
                row[x] = 1
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# Arithmetic integer decoding — T.88 Annex A. Each IAx procedure owns a
# 512-context state pair on the segment's shared MQ stream; the PREV
# context chains through the decoded bits (capped at 9 bits, A.2).
# ---------------------------------------------------------------------------

_OOB = object()  # the IADS/IADW out-of-band terminator (A.2: S=1, V=0)


class _IntCtx:
    __slots__ = ("icx", "mcx")

    def __init__(self) -> None:
        self.icx = bytearray(512)
        self.mcx = bytearray(512)


def _decode_int(mq: _MQDecoder, ctx: _IntCtx):
    """A.2: sign bit, magnitude-class prefix, then 2/4/6/8/12/32 value
    bits — PREV context chaining throughout. Returns int, or _OOB for
    the negative-zero out-of-band marker."""
    icx, mcx = ctx.icx, ctx.mcx
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = mq.decode(icx, mcx, prev)
        prev = (
            ((prev << 1) | b)
            if prev < 256
            else ((((prev << 1) | b) & 511) | 256)
        )
        return b

    def read(n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | bit()
        return v

    s = bit()
    if not bit():
        v = read(2)
    elif not bit():
        v = read(4) + 4
    elif not bit():
        v = read(6) + 20
    elif not bit():
        v = read(8) + 84
    elif not bit():
        v = read(12) + 340
    else:
        v = read(32) + 4436
    if s and v == 0:
        return _OOB
    return -v if s else v


def _decode_iaid(
    mq: _MQDecoder, icx: bytearray, mcx: bytearray, symcodelen: int
) -> int:
    """A.3: SYMCODELEN bits down a context tree; arrays sized
    1 << (symcodelen + 1) by the caller."""
    prev = 1
    for _ in range(symcodelen):
        prev = (prev << 1) | mq.decode(icx, mcx, prev)
    return prev - (1 << symcodelen)


# ---------------------------------------------------------------------------
# Symbol dictionary — T.88 §6.5 / §7.4.3 (segment type 0), arithmetic
# non-refinement subset: SDHUFF=0, SDREFAGG=0, no imported coding
# contexts. Height classes of IADH deltas; symbol bitmaps share ONE MQ
# stream + ONE generic-context array across the whole segment.
# ---------------------------------------------------------------------------

_MAX_SYMBOLS = 1 << 16  # a dictionary bigger than this is forged


def _decode_symbol_dict(
    seg_data: bytes, input_syms: list[list[bytearray]]
) -> list[list[bytearray]] | None:
    if len(seg_data) < 2:
        return None
    flags = struct.unpack_from(">H", seg_data, 0)[0]
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    ctx_used = (flags >> 8) & 1
    template = (flags >> 10) & 3
    if sdhuff or sdrefagg or ctx_used:
        return None  # Huffman / refinement-aggregate / imported contexts
    pos = 2
    at: list[tuple[int, int]] = []
    n_at = 4 if template == 0 else 1
    if pos + 2 * n_at + 8 > len(seg_data):
        return None
    for _ in range(n_at):
        at.append(struct.unpack_from(">bb", seg_data, pos))
        pos += 2
    num_ex, num_new = struct.unpack_from(">II", seg_data, pos)
    pos += 8
    if num_new > _MAX_SYMBOLS or num_ex > _MAX_SYMBOLS:
        return None
    size = _generic_context_size(template, at)
    if size is None:
        return None
    mq = _MQDecoder(seg_data[pos:])
    gb_icx, gb_mcx = bytearray(size), bytearray(size)
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    new_syms: list[list[bytearray]] = []
    hc_height = 0
    budget = _MAX_PIXELS  # total decoded symbol area cap
    while len(new_syms) < num_new:
        dh = _decode_int(mq, iadh)
        if dh is _OOB:
            return None
        hc_height += dh
        if hc_height <= 0 or hc_height > _MAX_WIDTH:
            return None
        sym_width = 0
        while True:
            dw = _decode_int(mq, iadw)
            if dw is _OOB:
                break  # end of this height class
            if len(new_syms) >= num_new:
                return None  # more symbols than declared: forged
            sym_width += dw
            if sym_width <= 0 or sym_width > _MAX_WIDTH:
                return None
            budget -= sym_width * hc_height
            if budget < 0:
                return None
            rows = _decode_generic_into(
                mq, gb_icx, gb_mcx, sym_width, hc_height,
                template, at, False,
            )
            if rows is None:
                return None
            new_syms.append(rows)
    # export flags (§6.5.10): alternating IAEX run lengths over
    # input symbols ++ new symbols, starting with "not exported"
    all_syms = list(input_syms) + new_syms
    exported: list[list[bytearray]] = []
    idx, cur_ex = 0, 0
    while idx < len(all_syms):
        run = _decode_int(mq, iaex)
        if run is _OOB or run < 0 or idx + run > len(all_syms):
            return None
        if cur_ex:
            exported.extend(all_syms[idx : idx + run])
        idx += run
        cur_ex ^= 1
    if len(exported) != num_ex:
        return None
    return exported


# ---------------------------------------------------------------------------
# Text region — T.88 §6.4 / §7.4.4 (segment types 4-7; the immediate
# forms 6/7 decode here), arithmetic subset: SBHUFF=0 and every
# refinement flag RI = 0.
# ---------------------------------------------------------------------------


def _decode_text_region(
    seg_data: bytes, syms: list[list[bytearray]]
):
    """-> (w, h, x, y, comb_op, rows) like _parse_generic_region, or
    None when out of the supported subset / malformed."""
    if len(seg_data) < 23 or not syms:
        return None
    w, h, x, y = struct.unpack_from(">IIII", seg_data, 0)
    comb_op = seg_data[16] & 0x07
    flags = struct.unpack_from(">H", seg_data, 17)[0]
    sbhuff = flags & 1
    refine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    ref_corner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    sb_comb = (flags >> 7) & 3
    def_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32
    rtemplate = (flags >> 15) & 1
    if sbhuff:
        return None
    pos = 19
    if refine and rtemplate == 0:
        pos += 4  # refinement AT pixels (unused: every RI must be 0)
    if pos + 4 > len(seg_data):
        return None
    (num_instances,) = struct.unpack_from(">I", seg_data, pos)
    pos += 4
    if w <= 0 or h <= 0 or w > _MAX_WIDTH or w * h > _MAX_PIXELS:
        return None
    if num_instances > _MAX_PIXELS:
        return None
    strips = 1 << log_strips
    symcodelen = max(1, (len(syms) - 1).bit_length())
    mq = _MQDecoder(seg_data[pos:])
    iadt, iafs, iads, iait = _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx()
    iari = _IntCtx()
    id_size = 1 << (symcodelen + 1)
    iaid_icx, iaid_mcx = bytearray(id_size), bytearray(id_size)
    fill = 1 if def_pixel else 0
    region = [bytearray([fill]) * w for _ in range(h)]

    def draw(sym: list[bytearray], x0: int, y0: int) -> None:
        sh, sw = len(sym), len(sym[0]) if sym else 0
        for j in range(sh):
            yy = y0 + j
            if not 0 <= yy < h:
                continue
            rrow, srow = region[yy], sym[j]
            for i in range(sw):
                xx = x0 + i
                if not 0 <= xx < w:
                    continue
                if sb_comb == 0:  # OR
                    if srow[i]:
                        rrow[xx] = 1
                elif sb_comb == 1:  # AND
                    if not srow[i]:
                        rrow[xx] = 0
                elif sb_comb == 2:  # XOR
                    rrow[xx] ^= srow[i]
                else:  # XNOR
                    rrow[xx] = 1 - (rrow[xx] ^ srow[i])

    dt0 = _decode_int(mq, iadt)
    if dt0 is _OOB:
        return None
    strip_t = -dt0 * strips
    first_s = 0
    n_inst = 0
    guard = 0
    while n_inst < num_instances:
        guard += 1
        if guard > num_instances + _MAX_SYMBOLS:
            return None  # runaway strip loop on corrupt data
        dt = _decode_int(mq, iadt)
        if dt is _OOB:
            return None
        strip_t += dt * strips
        first = True
        cur_s = 0
        while n_inst < num_instances:
            if first:
                dfs = _decode_int(mq, iafs)
                if dfs is _OOB:
                    return None
                first_s += dfs
                cur_s = first_s
                first = False
            else:
                ids = _decode_int(mq, iads)
                if ids is _OOB:
                    break  # end of strip
                cur_s += ids + ds_offset
            cur_t = 0 if strips == 1 else _decode_int(mq, iait)
            if cur_t is _OOB:
                return None
            t_i = strip_t + cur_t
            sym_id = _decode_iaid(mq, iaid_icx, iaid_mcx, symcodelen)
            if not 0 <= sym_id < len(syms):
                return None
            if refine:
                ri = _decode_int(mq, iari)
                if ri is _OOB or ri:
                    return None  # refined instance: out of scope
            sym = syms[sym_id]
            sh, sw = len(sym), len(sym[0]) if sym else 0
            if transposed:
                # S runs vertically, T horizontally (§6.4.5 (v)/(ix):
                # BOTTOM* corners advance S BEFORE drawing — S tracks
                # the bottom edge — TOP* corners after). REFCORNER:
                # 0 BL, 1 TL, 2 BR, 3 TR.
                if ref_corner in (0, 2):
                    cur_s += sh - 1
                x0 = t_i if ref_corner in (0, 1) else t_i - sw + 1
                y0 = cur_s - (sh - 1) if ref_corner in (0, 2) else cur_s
                draw(sym, x0, y0)
                if ref_corner in (1, 3):
                    cur_s += sh - 1
            else:
                if ref_corner in (2, 3):  # *RIGHT: advance S first
                    cur_s += sw - 1
                x0 = cur_s - (sw - 1) if ref_corner in (2, 3) else cur_s
                y0 = t_i if ref_corner in (1, 3) else t_i - sh + 1
                draw(sym, x0, y0)
                if ref_corner in (0, 1):  # *LEFT: advance S after
                    cur_s += sw - 1
            n_inst += 1
    return (w, h, x, y, comb_op, region)


# ---------------------------------------------------------------------------
# Embedded-organization segment stream — T.88 §7.2 (headers), §7.4
# (segment payloads PDF-relevant here: page info 48, symbol dict 0,
# text region 6/7, generic region 38/39, end-of-* 49-51, extension 62).
# ---------------------------------------------------------------------------

#: segment types that cannot affect a generic-regions-only page and are
#: safely ignored: end of page/stripe/file, profiles, code tables
#: (referenced only by text/symbol segments we reject anyway), colour
#: palette, extensions (spec: "decoders may ignore").
_IGNORABLE_TYPES = frozenset({49, 50, 51, 52, 53, 62})
_GENERIC_TYPES = frozenset({38, 39})
_TEXT_TYPES = frozenset({6, 7})
_SYMBOL_DICT = 0
_PAGE_INFO = 48


class _Segment:
    __slots__ = ("number", "type", "page", "data", "refs")

    def __init__(self, number: int, type_: int, page: int, data: bytes,
                 refs: tuple[int, ...] = ()):
        self.number = number
        self.type = type_
        self.page = page
        self.data = data
        self.refs = refs


def _parse_segments(buf: bytes) -> list[_Segment] | None:
    """Sequential embedded-organization segment headers (§7.2.2-7.2.7).
    None on any malformation (truncated header, unknown data length)."""
    segs: list[_Segment] = []
    pos, n = 0, len(buf)
    while pos < n:
        if pos + 11 > n:
            return None  # truncated header (min size 11 bytes)
        number, flags = struct.unpack_from(">IB", buf, pos)
        pos += 5
        seg_type = flags & 0x3F
        page_assoc_4 = bool(flags & 0x40)
        rts = buf[pos]
        count = rts >> 5
        if count == 7:
            if pos + 4 > n:
                return None
            count = struct.unpack_from(">I", buf, pos)[0] & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8  # 4-byte count + retain bits
        else:
            pos += 1
        ref_size = 1 if number <= 256 else 2 if number <= 65536 else 4
        if pos + count * ref_size > n:
            return None
        refs = tuple(
            int.from_bytes(buf[pos + i * ref_size : pos + (i + 1) * ref_size],
                           "big")
            for i in range(count)
        )
        pos += count * ref_size
        if page_assoc_4:
            if pos + 4 > n:
                return None
            page = struct.unpack_from(">I", buf, pos)[0]
            pos += 4
        else:
            if pos >= n:
                return None
            page = buf[pos]
            pos += 1
        if pos + 4 > n:
            return None
        (length,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        if length == 0xFFFFFFFF:
            return None  # unknown-length segment (7.2.7): don't guess
        if pos + length > n:
            return None
        segs.append(
            _Segment(number, seg_type, page, buf[pos : pos + length], refs)
        )
        pos += length
    return segs


def _parse_generic_region(seg_data: bytes):
    """Generic region segment payload (§7.4.6): region info (17 bytes)
    + generic flags + AT pixels + coded data. Returns
    (w, h, x, y, comb_op, rows) or None."""
    if len(seg_data) < 18:
        return None
    w, h, x, y = struct.unpack_from(">IIII", seg_data, 0)
    comb_op = seg_data[16] & 0x07
    flags = seg_data[17]
    mmr = flags & 1
    template = (flags >> 1) & 3
    tpgdon = bool(flags & 8)
    pos = 18
    at: list[tuple[int, int]] = []
    if not mmr:
        n_at = 4 if template == 0 else 1
        if pos + 2 * n_at > len(seg_data):
            return None
        for _ in range(n_at):
            ax = struct.unpack_from(">b", seg_data, pos)[0]
            ay = struct.unpack_from(">b", seg_data, pos + 1)[0]
            at.append((ax, ay))
            pos += 2
    coded = seg_data[pos:]
    if mmr:
        rows = _decode_generic_mmr(coded, w, h)
    else:
        rows = _decode_generic_mq(coded, w, h, template, at, tpgdon)
    if rows is None:
        return None
    return (w, h, x, y, comb_op, rows)


def jbig2_headers_supported(data: bytes, globals_data: bytes | None = None
                            ) -> bool:
    """Cheap decodability pre-check for the undecodable-codec counter:
    parse segment HEADERS only (no arithmetic decoding) and report
    whether every segment is one this module decodes — generic regions
    (immediate, known length), page info, and ignorable types. A
    symbol-dictionary or text-region segment anywhere (stream or
    globals) means the stream keeps its breadcrumb."""
    for src in (globals_data, data):
        if src is None:
            continue
        segs = _parse_segments(src)
        if segs is None:
            return False
        for seg in segs:
            if seg.type in _GENERIC_TYPES or seg.type == _PAGE_INFO:
                continue
            if seg.type in _IGNORABLE_TYPES:
                continue
            if seg.type == _SYMBOL_DICT:
                # flag-level check (2 bytes): arithmetic,
                # non-refinement, no imported contexts (r15 subset)
                if len(seg.data) < 2:
                    return False
                flags = struct.unpack_from(">H", seg.data, 0)[0]
                if flags & 0b1_0000_0011:  # SDHUFF|SDREFAGG|ctx-used
                    return False
                continue
            if seg.type in _TEXT_TYPES:
                if len(seg.data) < 23:
                    return False
                if struct.unpack_from(">H", seg.data, 17)[0] & 1:
                    return False  # SBHUFF
                continue
            return False
    return True


def jbig2_decode(
    data: bytes,
    globals_data: bytes | None = None,
    width: int | None = None,
    height: int | None = None,
) -> bytes | None:
    """Decode a PDF-embedded JBIG2 stream -> packed 1-bpp rows
    (MSB-first, byte-aligned rows, 0 = black — the PDF JBIG2Decode
    output convention), or None when the stream uses anything beyond
    the generic-region subset, carries forged geometry, or is
    malformed. ``width``/``height`` are the PDF image dict's values,
    used when the page-information segment is absent or declares
    unknown height (0xFFFFFFFF, striped pages)."""
    segs: list[_Segment] = []
    for src in (globals_data, data):
        if src is None:
            continue
        parsed = _parse_segments(src)
        if parsed is None:
            return None
        segs.extend(parsed)
    page_w = page_h = None
    page_default = 0
    regions = []
    sym_dicts: dict[int, list] = {}  # segment number -> exported symbols
    for seg in segs:
        if seg.type == _PAGE_INFO:
            if len(seg.data) < 17:
                return None
            pw, ph = struct.unpack_from(">II", seg.data, 0)
            page_flags = seg.data[16]
            page_w = pw
            page_h = None if ph == 0xFFFFFFFF else ph
            page_default = (page_flags >> 2) & 1
        elif seg.type in _GENERIC_TYPES:
            region = _parse_generic_region(seg.data)
            if region is None:
                return None
            regions.append(region)
        elif seg.type == _SYMBOL_DICT:
            # input symbols: exported sets of the referred-to dicts,
            # in reference order (§6.5.5)
            input_syms: list = []
            for r in seg.refs:
                input_syms.extend(sym_dicts.get(r, ()))
            exported = _decode_symbol_dict(seg.data, input_syms)
            if exported is None:
                return None
            sym_dicts[seg.number] = exported
        elif seg.type in _TEXT_TYPES:
            syms: list = []
            for r in seg.refs:
                syms.extend(sym_dicts.get(r, ()))
            region = _decode_text_region(seg.data, syms)
            if region is None:
                return None
            regions.append(region)
        elif seg.type in _IGNORABLE_TYPES:
            continue
        else:
            # intermediate regions (4, 36), pattern dict (16),
            # halftone (20-23), refinement (40-43), ...: out of scope
            return None
    if not regions:
        return None
    # page geometry: page-info wins; the PDF dict fills the unknowns;
    # last resort is the regions' bounding box
    w = page_w if page_w else width
    h = page_h if page_h else height
    if not w:
        w = max(r[0] + r[2] for r in regions)
    if not h:
        h = max(r[1] + r[3] for r in regions)
    if w <= 0 or h <= 0 or w > _MAX_WIDTH or w * h > _MAX_PIXELS:
        return None
    fill = 1 if page_default else 0
    page = [bytearray([fill]) * w for _ in range(h)]
    for rw, rh, rx, ry, comb_op, rows in regions:
        if rx + rw > w or ry + rh > h:
            return None  # region outside the declared page: forged
        for j in range(rh):
            prow = page[ry + j]
            rrow = rows[j]
            if comb_op == 0:  # OR
                for i in range(rw):
                    if rrow[i]:
                        prow[rx + i] = 1
            elif comb_op == 1:  # AND
                for i in range(rw):
                    if not rrow[i]:
                        prow[rx + i] = 0
            elif comb_op == 2:  # XOR
                for i in range(rw):
                    prow[rx + i] ^= rrow[i]
            elif comb_op == 3:  # XNOR
                for i in range(rw):
                    prow[rx + i] = 1 - (prow[rx + i] ^ rrow[i])
            else:  # 4 = REPLACE
                prow[rx : rx + rw] = rrow
    # pack to the PDF polarity: internal 1 = black -> output bit 0
    row_bytes = (w + 7) // 8
    out = bytearray(row_bytes * h)
    for y in range(h):
        prow = page[y]
        base = y * row_bytes
        for x in range(w):
            if not prow[x]:  # white -> 1 bit (0 = black)
                out[base + (x >> 3)] |= 0x80 >> (x & 7)
    return bytes(out)
