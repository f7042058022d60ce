"""Encrypted-PDF decryption tests (pipeline/pdfcrypt.py): published
known-answer vectors for the ciphers (FIPS-197 Appendix C, the classic
RC4 "Key"/"Plaintext" vector), then an independently-written ENCRYPTION
side (ISO 32000 Algorithms 2/3/4/5 and 2.A/2.B, implemented from the
spec text in this file) building real encrypted PDFs that the product
decrypts back to working documents — through pdf_decrypt directly and
through the whole converter."""

from __future__ import annotations

import hashlib
import re
import struct

from docling_api_spark.pipeline.convert import LightweightConverter
from docling_api_spark.pipeline.pdfcrypt import (
    _SBOX,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    pdf_decrypt,
    rc4,
)
from docling_api_spark.pipeline.textextract import (
    pdf_is_encrypted,
    pdf_to_markdown,
)

PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


# ---------------------------------------------------------------------------
# cipher known-answer vectors (external ground truth, not round-trips)
# ---------------------------------------------------------------------------
def test_aes_sbox_spot_values():
    # FIPS-197 §5.1.1 published table entries
    assert _SBOX[0x00] == 0x63
    assert _SBOX[0x53] == 0xED
    assert _SBOX[0xFF] == 0x16


def test_aes_fips197_known_answers():
    from docling_api_spark.pipeline.pdfcrypt import (
        _aes_decrypt_block,
        _aes_encrypt_block,
        _expand_key,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for key, ct_hex in (
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ):
        w = _expand_key(key)
        ct = _aes_encrypt_block(w, pt)
        assert ct.hex() == ct_hex
        assert _aes_decrypt_block(w, ct) == pt


def test_rc4_classic_vector():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Key", rc4(b"Key", b"any data")) == b"any data"


def test_aes_cbc_round_trip_and_bad_input():
    key, iv = bytes(range(16)), b"\x01" * 16
    data = bytes(range(64))
    assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, data)) == data
    assert aes_cbc_decrypt(key, iv, b"short") is None
    assert aes_cbc_decrypt(key, iv, b"") is None


# ---------------------------------------------------------------------------
# independent encryption side (ISO 32000-1 §7.6.3 algorithms, spec text)
# ---------------------------------------------------------------------------
def _md5x(r: int, data: bytes, n: int) -> bytes:
    d = hashlib.md5(data).digest()
    if r >= 3:
        for _ in range(50):
            d = hashlib.md5(d[:n]).digest()
    return d[:n]


def _compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    # Algorithm 3
    padded_owner = (owner_pw + PAD)[:32]
    key = _md5x(r, padded_owner, n)
    o = rc4(key, (user_pw + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def _file_key(r: int, n: int, o: bytes, p: int, id0: bytes) -> bytes:
    # Algorithm 2 (empty user password)
    key = hashlib.md5(
        PAD + o + struct.pack("<i", p) + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _compute_u(r: int, key: bytes, id0: bytes) -> bytes:
    if r == 2:  # Algorithm 4
        return rc4(key, PAD)
    # Algorithm 5
    x = hashlib.md5(PAD + id0).digest()
    for i in range(20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16  # 16 bytes of arbitrary padding


def _obj_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    return hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        + (b"sAlT" if aes else b"")
    ).digest()[: min(len(key) + 5, 16)]


TEXT = "encrypted but openable"
_ID0 = b"\x12\x34\x56\x78" * 4


def _content_stream_plain() -> bytes:
    return b"BT <" + TEXT.encode().hex().encode() + b"> Tj ET"


def _build_pdf(enc_dict: bytes, payload: bytes) -> bytes:
    return (
        b"%PDF-1.6\n"
        b"1 0 obj <</Type /Page /Contents 2 0 R>> endobj\n"
        b"2 0 obj <</Length " + str(len(payload)).encode() + b">>\nstream\n"
        + payload + b"\nendstream endobj\n"
        b"9 0 obj " + enc_dict + b" endobj\n"
        b"trailer <</Root 1 0 R /Encrypt 9 0 R /ID [<"
        + _ID0.hex().encode() + b"> <" + _ID0.hex().encode() + b">]>>\n"
        b"%%EOF\n"
    )


def _rc4_pdf(r: int, v: int, length_bits: int, p: int = -44) -> bytes:
    n = length_bits // 8
    o = _compute_o(b"owner-secret", b"", r, n)
    key = _file_key(r, n, o, p, _ID0)
    u = _compute_u(r, key, _ID0)
    payload = rc4(_obj_key(key, 2, 0, False), _content_stream_plain())
    enc = (
        b"<</Filter /Standard /V " + str(v).encode()
        + b" /R " + str(r).encode()
        + b" /Length " + str(length_bits).encode()
        + b" /P " + str(p).encode()
        + b" /O <" + o.hex().encode() + b">"
        + b" /U <" + u.hex().encode() + b">>>"
    )
    return _build_pdf(enc, payload)


def _aesv2_pdf(p: int = -44) -> bytes:
    n = 16
    o = _compute_o(b"owner-secret", b"", 4, n)
    key = _file_key(4, n, o, p, _ID0)
    u = _compute_u(4, key, _ID0)
    plain = _content_stream_plain()
    padlen = 16 - len(plain) % 16
    iv = b"\xab" * 16
    payload = iv + aes_cbc_encrypt(
        _obj_key(key, 2, 0, True), iv, plain + bytes([padlen]) * padlen
    )
    enc = (
        b"<</Filter /Standard /V 4 /R 4 /Length 128 /P " + str(p).encode()
        + b" /CF <</StdCF <</CFM /AESV2 /AuthEvent /DocOpen>>>>"
        + b" /StmF /StdCF /StrF /StdCF"
        + b" /O <" + o.hex().encode() + b">"
        + b" /U <" + u.hex().encode() + b">>>"
    )
    return _build_pdf(enc, payload)


def _hash_r6(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    # Algorithm 2.B, independently per ISO 32000-2 text
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _r6_pdf(p: int = -44) -> bytes:
    file_key = bytes(range(32))
    vsalt, ksalt = b"VALSALT!", b"KEYSALT!"
    u = _hash_r6(b"", vsalt) + vsalt + ksalt
    ue = aes_cbc_encrypt(_hash_r6(b"", ksalt), b"\x00" * 16, file_key)
    plain = _content_stream_plain()
    padlen = 16 - len(plain) % 16
    iv = b"\xcd" * 16
    payload = iv + aes_cbc_encrypt(
        file_key, iv, plain + bytes([padlen]) * padlen
    )
    enc = (
        b"<</Filter /Standard /V 5 /R 6 /Length 256 /P " + str(p).encode()
        + b" /CF <</StdCF <</CFM /AESV3>>>> /StmF /StdCF /StrF /StdCF"
        + b" /O <" + (b"\x00" * 48).hex().encode() + b">"
        + b" /OE <" + (b"\x00" * 32).hex().encode() + b">"
        + b" /U <" + u.hex().encode() + b">"
        + b" /UE <" + ue.hex().encode() + b">>>"
    )
    return _build_pdf(enc, payload)


# ---------------------------------------------------------------------------
# decryption end-to-end
# ---------------------------------------------------------------------------
def _assert_decrypts(doc: bytes):
    assert pdf_is_encrypted(doc)
    dec = pdf_decrypt(doc)
    assert dec is not None
    assert not pdf_is_encrypted(dec)  # /Encrypt ref blanked
    assert pdf_to_markdown(dec).strip() == TEXT


def test_rc4_r2_40bit_decrypts():
    _assert_decrypts(_rc4_pdf(r=2, v=1, length_bits=40))


def test_rc4_r3_128bit_decrypts():
    _assert_decrypts(_rc4_pdf(r=3, v=2, length_bits=128))


def test_rc4_r4_v2_filter_decrypts():
    n = 16
    o = _compute_o(b"owner-secret", b"", 4, n)
    key = _file_key(4, n, o, -44, _ID0)
    u = _compute_u(4, key, _ID0)
    payload = rc4(_obj_key(key, 2, 0, False), _content_stream_plain())
    enc = (
        b"<</Filter /Standard /V 4 /R 4 /Length 128 /P -44"
        b" /CF <</StdCF <</CFM /V2>>>> /StmF /StdCF /StrF /StdCF"
        b" /O <" + o.hex().encode() + b">"
        b" /U <" + u.hex().encode() + b">>>"
    )
    _assert_decrypts(_build_pdf(enc, payload))


def test_aesv2_128_decrypts():
    _assert_decrypts(_aesv2_pdf())


def test_aes256_r6_decrypts():
    _assert_decrypts(_r6_pdf())


def test_converter_opens_restrictions_only_pdf():
    """The user-visible contract: an empty-user-password encrypted PDF
    converts to real markdown instead of the encrypted-PDF error row —
    for the RC4, AES-128 and AES-256 handler generations."""
    conv = LightweightConverter()
    for doc in (_rc4_pdf(r=3, v=2, length_bits=128), _aesv2_pdf(),
                _r6_pdf()):
        out = conv.convert("locked.pdf", doc)
        assert out["error"] is None, out["error"]
        assert out["markdown"].strip() == TEXT


def test_real_user_password_keeps_error_contract():
    """A PDF whose USER password is non-empty must not decrypt (we hold
    no password) — pdf_decrypt None, converter emits the encrypted-PDF
    error row."""
    n = 16
    o = _compute_o(b"owner-secret", b"user-secret", 3, n)
    # file key derived from the REAL user password, so /U will not
    # validate against the empty-password derivation
    padded_user = (b"user-secret" + PAD)[:32]
    key = hashlib.md5(
        padded_user + o + struct.pack("<i", -44) + _ID0
    ).digest()
    for _ in range(50):
        key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    u = _compute_u(3, key, _ID0)
    payload = rc4(_obj_key(key, 2, 0, False), _content_stream_plain())
    enc = (
        b"<</Filter /Standard /V 2 /R 3 /Length 128 /P -44"
        b" /O <" + o.hex().encode() + b">"
        b" /U <" + u.hex().encode() + b">>>"
    )
    doc = _build_pdf(enc, payload)
    assert pdf_decrypt(doc) is None
    out = LightweightConverter().convert("locked.pdf", doc)
    assert out["error"] is not None
    assert "Encrypted" in out["error"]


def test_unsupported_handlers_return_none():
    good = _rc4_pdf(r=3, v=2, length_bits=128)
    for mutate in (
        lambda d: d.replace(b"/Filter /Standard", b"/Filter /Custom"),
        lambda d: d.replace(b"/V 2", b"/V 3"),
        lambda d: d.replace(b"/Filter /Standard",
                            b"/Filter /Standard /SubFilter /x"),
    ):
        assert pdf_decrypt(mutate(good)) is None
    assert pdf_decrypt(b"%PDF-1.4\nno encryption\n%%EOF") is None


def test_malformed_inputs_never_raise():
    good = _rc4_pdf(r=3, v=2, length_bits=128)
    for bad in (
        good[:-40], good[: len(good) // 2], b"", b"\x00" * 64,
        good.replace(b"/U <", b"/U <00"),  # corrupted U
        good.replace(b"stream\n", b"stream\n\xff\xff"),  # corrupt payload
    ):
        out = pdf_decrypt(bad)
        assert out is None or isinstance(out, bytes)


def test_xref_stream_and_encrypt_object_stay_untouched():
    """XRef streams and the encryption dictionary's own stream (if any)
    are never encrypted (§7.5.8.2) — the rewriter must pass them through
    verbatim."""
    n = 16
    o = _compute_o(b"owner-secret", b"", 3, n)
    key = _file_key(3, n, o, -44, _ID0)
    u = _compute_u(3, key, _ID0)
    payload = rc4(_obj_key(key, 2, 0, False), _content_stream_plain())
    xref_payload = b"\x01\x02\x03\x04"
    doc = (
        b"%PDF-1.6\n"
        b"1 0 obj <</Type /Page /Contents 2 0 R>> endobj\n"
        b"2 0 obj <</Length " + str(len(payload)).encode()
        + b">>\nstream\n" + payload + b"\nendstream endobj\n"
        b"3 0 obj <</Type /XRef /Length 4>>\nstream\n"
        + xref_payload + b"\nendstream endobj\n"
        b"9 0 obj <</Filter /Standard /V 2 /R 3 /Length 128 /P -44"
        b" /O <" + o.hex().encode() + b"> /U <" + u.hex().encode()
        + b">>> endobj\n"
        b"trailer <</Root 1 0 R /Encrypt 9 0 R /ID [<"
        + _ID0.hex().encode() + b"> <" + _ID0.hex().encode() + b">]>>\n"
        b"%%EOF\n"
    )
    dec = pdf_decrypt(doc)
    assert dec is not None
    assert xref_payload in dec  # untouched
    assert pdf_to_markdown(dec).strip() == TEXT
