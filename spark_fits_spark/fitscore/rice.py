"""RICE_1 tile codec (the `fpack` default for integer images).

Implements the Rice coding variant specified by the FITS Tiled Image
Compression convention (Pence, Seaman & White 2009, §5.1; the algorithm
CFITSIO's ricecomp.c implements — public spec, independent
implementation):

- The first pixel value is stored raw, big-endian, in ``bytepix×8``
  bits; every pixel (including the first, whose difference is 0) is
  then coded as a difference from the running previous pixel.
- Differences are zigzag-mapped to unsigned (``d ≥ 0 → 2d``,
  ``d < 0 → 2|d|−1``).
- Pixels are processed in blocks of ``blocksize`` (default 32). Per
  block a Golomb-Rice parameter ``fs`` is chosen from the block's mean
  mapped difference; the block is then stored as one of
  - ``fs`` code 0: every difference in the block is zero (no payload);
  - ``fs`` code ``fsmax+1``: raw ``bytepix×8``-bit differences
    (incompressible block);
  - otherwise code ``fs+1``: each value as unary ``⌊v/2^fs⌋`` (that
    many 0 bits then a 1) followed by the low ``fs`` bits of ``v``.
- Bitstream is MSB-first. Parameter table (per the convention):
  bytepix 1 → fsbits 3, fsmax 6; bytepix 2 → fsbits 4, fsmax 14;
  bytepix 4 → fsbits 5, fsmax 25.

Arithmetic wraps modulo ``2^(bytepix×8)`` like the C reference, so
extreme-valued differences round-trip.

The per-pixel decode loop is Python — fine for the tile sizes this
convention uses (a row to a few rows per tile) and embarrassingly
parallel across tiles/tasks, but GZIP_2 is the fast path when you
control the writer.
"""

from __future__ import annotations

import numpy as np

_PARAMS = {1: (3, 6), 2: (4, 14), 4: (5, 25)}


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n <= 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, n_zeros: int) -> None:
        # n 0-bits then a terminating 1
        while n_zeros >= 32:
            self.write(0, 32)
            n_zeros -= 32
        self.write(1, n_zeros + 1)

    def getvalue(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("RICE_1 bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def read_unary(self) -> int:
        n = 0
        while True:
            if self.read(1):
                return n
            n += 1


def rice_encode(values: np.ndarray, bytepix: int = 4,
                blocksize: int = 32) -> bytes:
    """Encode a 1-D integer array (any byte order) as a RICE_1 stream."""
    if bytepix not in _PARAMS:
        raise ValueError(f"RICE_1 bytepix must be 1, 2 or 4, got {bytepix}")
    fsbits, fsmax = _PARAMS[bytepix]
    bbits = bytepix * 8
    wrap = 1 << bbits
    half = wrap >> 1
    a = np.asarray(values).astype(np.int64) % wrap  # unsigned view
    w = _BitWriter()
    if a.size == 0:
        return w.getvalue()
    w.write(int(a[0]), bbits)
    last = int(a[0])
    n = a.size
    for b0 in range(0, n, blocksize):
        block = a[b0:b0 + blocksize]
        mapped = []
        for x in block:
            d = (int(x) - last) % wrap
            if d >= half:
                d -= wrap            # signed difference, wrapped
            mapped.append(2 * d if d >= 0 else -2 * d - 1)
            last = int(x)
        psum = sum(mapped)
        if psum == 0:
            w.write(0, fsbits)       # fs code 0: all-zero block
            continue
        this = len(mapped)
        dpsum = (psum - this / 2 - 1) / this
        if dpsum < 0:
            dpsum = 0.0
        v = int(dpsum) >> 1
        fs = 0
        while v > 0:
            v >>= 1
            fs += 1
        if fs >= fsmax:
            w.write(fsmax + 1, fsbits)
            for m in mapped:
                w.write(m, bbits)
        else:
            w.write(fs + 1, fsbits)
            for m in mapped:
                w.write_unary(m >> fs)
                if fs:
                    w.write(m, fs)
    return w.getvalue()


def rice_decode(payload: bytes, n_pix: int, bytepix: int = 4,
                blocksize: int = 32) -> np.ndarray:
    """Decode ``n_pix`` values from a RICE_1 stream → int64 array
    (signed, per the ``bytepix`` width)."""
    if bytepix not in _PARAMS:
        raise ValueError(f"RICE_1 bytepix must be 1, 2 or 4, got {bytepix}")
    fsbits, fsmax = _PARAMS[bytepix]
    bbits = bytepix * 8
    wrap = 1 << bbits
    half = wrap >> 1
    out = np.empty(n_pix, dtype=np.int64)
    if n_pix == 0:
        return out
    r = _BitReader(payload)
    last = r.read(bbits)
    i = 0
    while i < n_pix:
        this = min(blocksize, n_pix - i)
        code = r.read(fsbits)
        fs = code - 1
        if fs < 0:
            for _ in range(this):
                out[i] = last
                i += 1
            continue
        if fs == fsmax:
            for _ in range(this):
                u = r.read(bbits)
                last = _apply_diff(last, u, wrap, half)
                out[i] = last
                i += 1
            continue
        for _ in range(this):
            top = r.read_unary()
            u = (top << fs) | (r.read(fs) if fs else 0)
            last = _apply_diff(last, u, wrap, half)
            out[i] = last
            i += 1
    # reinterpret the unsigned accumulator as signed bytepix-width ints
    signed = out % wrap
    signed[signed >= half] -= wrap
    return signed


def _apply_diff(last: int, u: int, wrap: int, half: int) -> int:
    d = (u >> 1) if (u & 1) == 0 else ~(u >> 1)
    return (last + d) % wrap
