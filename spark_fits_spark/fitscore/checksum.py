"""FITS CHECKSUM/DATASUM (FITS 4.0 standard §4.4.2.7 + Appendix J).

The reference connector neither writes nor verifies checksums; this is a
beyond-reference integrity layer for the writer/scanner pair. Everything
here implements the *public* FITS standard algorithm: the 32-bit ones'-
complement sum over big-endian words, and the ASCII encoding whose 16
characters, substituted into the ``CHECKSUM= 'xxxxxxxxxxxxxxxx'`` card,
drive the whole-HDU sum to all ones (the ones'-complement "negative
zero").

Why ones'-complement: addition is associative/commutative mod 2³²−1, so
the sum can be computed per block, in any order, and incrementally — the
same property our int64-quantized aggregations exploit Spark-side.
"""

from __future__ import annotations

import numpy as np

from spark_fits_spark.fitscore.constants import FITS_BLOCK_SIZE, FITS_CARD_SIZE

#: ASCII codes the encoding must avoid (non-alphanumerics between '0'
#: and 'z'): ``:;<=>?@[\]^_``` — standard Appendix J exclusion list.
_EXCLUDE = (0x3A, 0x3B, 0x3C, 0x3D, 0x3E, 0x3F, 0x40,
            0x5B, 0x5C, 0x5D, 0x5E, 0x5F, 0x60)

_ALL_ONES = 0xFFFFFFFF


def sum32(buf: bytes | bytearray | memoryview, start: int = 0) -> int:
    """Ones'-complement 32-bit sum of ``buf`` read as big-endian u32
    words (end-around carry folded). ``start`` chains partial sums, so
    block-sized pieces can be summed in sequence (or any order)."""
    mv = memoryview(buf)
    tail = len(mv) % 4
    if tail:  # FITS data is 2880-padded, but be safe for partial use
        mv = memoryview(bytes(mv) + b"\x00" * (4 - tail))
    arr = np.frombuffer(mv, dtype=">u4")
    total = int(arr.sum(dtype=np.uint64)) + start
    while total >> 32:
        total = (total & _ALL_ONES) + (total >> 32)
    return total


def encode_checksum(value: int) -> str:
    """Appendix-J ASCII encoding of a 32-bit value into 16 alphanumeric
    characters: each byte becomes 4 chars summing to ``byte + 4·'0'``
    (so substituting the 4 ASCII zeros of the placeholder adds exactly
    ``byte`` to that byte lane), excluded punctuation is dodged with
    balanced ±1 pairs, and the result is rotated right one place to
    line the lanes up with the card's value offset (byte 11)."""
    asc = [0] * 16
    for i in range(4):
        byte = (value >> (24 - 8 * i)) & 0xFF
        quotient = byte // 4 + 0x30
        remainder = byte % 4
        ch = [quotient] * 4
        ch[0] += remainder
        check = True
        while check:
            check = False
            for k in _EXCLUDE:
                for j in (0, 2):
                    if ch[j] == k or ch[j + 1] == k:
                        ch[j] += 1
                        ch[j + 1] -= 1
                        check = True
        for j in range(4):
            asc[4 * j + i] = ch[j]
    asc = asc[-1:] + asc[:-1]  # rotate right 1
    return "".join(chr(c) for c in asc)


def _header_len(hdu: bytes) -> int:
    for off in range(0, len(hdu), FITS_CARD_SIZE):
        if hdu[off:off + 8] == b"END     ":
            end = off + FITS_CARD_SIZE
            return ((end + FITS_BLOCK_SIZE - 1)
                    // FITS_BLOCK_SIZE) * FITS_BLOCK_SIZE
    raise ValueError("no END card found")


def _find_card(header: bytes | bytearray, keyword: bytes) -> int:
    kw = keyword.ljust(8)
    for off in range(0, len(header), FITS_CARD_SIZE):
        if bytes(header[off:off + 8]) == kw:
            return off
    return -1


def _set_string_card(header: bytearray, off: int, keyword: str,
                     value: str, comment: str) -> None:
    body = f"{keyword:<8}= '{value:<8}'"
    if comment:
        body += f" / {comment}"
    card = body.encode("ascii")[:FITS_CARD_SIZE].ljust(FITS_CARD_SIZE)
    header[off:off + FITS_CARD_SIZE] = card


def apply_checksums(hdu: bytes) -> bytes:
    """Fill in the DATASUM and CHECKSUM placeholder cards of a fully
    assembled HDU (header must already carry both keywords so the
    layout never shifts). DATASUM = decimal ones'-complement sum of the
    padded data; CHECKSUM = Appendix-J encoding of the complement of
    the whole-HDU sum computed with the value set to ASCII zeros."""
    hlen = _header_len(hdu)
    header = bytearray(hdu[:hlen])
    data = hdu[hlen:]
    ds_off = _find_card(header, b"DATASUM")
    ck_off = _find_card(header, b"CHECKSUM")
    if ds_off < 0 or ck_off < 0:
        raise ValueError("header lacks DATASUM/CHECKSUM placeholder cards")
    _set_string_card(header, ds_off, "DATASUM", str(sum32(data)),
                     "data unit checksum")
    _set_string_card(header, ck_off, "CHECKSUM", "0" * 16,
                     "HDU checksum")
    s = sum32(bytes(header) + data)
    _set_string_card(header, ck_off, "CHECKSUM",
                     encode_checksum(_ALL_ONES - s), "HDU checksum")
    return bytes(header) + data


def verify_hdu(hdu: bytes) -> tuple[bool | None, bool | None]:
    """Return ``(datasum_ok, checksum_ok)`` for one assembled HDU;
    ``None`` where the corresponding keyword is absent.

    ``checksum_ok`` is the standard test: the ones'-complement sum of
    the entire HDU (with CHECKSUM in place) equals all ones."""
    hlen = _header_len(hdu)
    header, data = hdu[:hlen], hdu[hlen:]
    ds_off = _find_card(header, b"DATASUM")
    ck_off = _find_card(header, b"CHECKSUM")
    datasum_ok: bool | None = None
    checksum_ok: bool | None = None
    if ds_off >= 0:
        raw = header[ds_off + 10:ds_off + FITS_CARD_SIZE].decode(
            "ascii", "replace")
        stored = raw.split("/")[0].strip().strip("'").strip()
        try:
            datasum_ok = int(stored) == sum32(data)
        except ValueError:
            datasum_ok = False
    if ck_off >= 0:
        checksum_ok = sum32(hdu) == _ALL_ONES
    return datasum_ok, checksum_ok
