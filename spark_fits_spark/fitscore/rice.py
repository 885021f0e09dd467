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

Implementation (r5, was a per-pixel Python loop — the one
row-at-a-time pattern flagged by the r4 plan audit): both directions
are numpy-vectorized.

- ENCODE: diffs/zigzag/block-sums/fs selection are whole-array ops;
  every value's bit length is known up front, so all bit positions come
  from prefix sums and the stream is materialized by setting bits in a
  0/1 array (≤ ``bbits`` vectorized passes per field) + ``packbits``.
- DECODE: the only sequential state is the bit POSITION (the pixel
  values themselves decouple: decode all zigzag diffs, then one cumsum
  reconstructs the pixels). Per tile the payload is unpacked once to a
  bit array; unary terminators are walked through the precomputed
  sorted 1-bit positions (a few Python int ops per value — no
  bit-by-bit reads), and the ``fs``-bit remainders / raw blocks are
  gathered in one batched windowed read per block (5 byte-gathers for
  any ≤32-bit field at arbitrary bit offsets).

``rice_encode_scalar`` / ``rice_decode_scalar`` keep the original
bit-at-a-time implementations as the differential-test oracle
(`tests/test_tilecomp.py` asserts vectorized == scalar on randomized
corpora).
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


def _check_bytepix(bytepix: int) -> tuple[int, int]:
    if bytepix not in _PARAMS:
        raise ValueError(f"RICE_1 bytepix must be 1, 2 or 4, got {bytepix}")
    return _PARAMS[bytepix]


def _mapped_diffs(values: np.ndarray, wrap: int, half: int) -> np.ndarray:
    """Zigzag-mapped wrapped differences (pixel 0's difference is 0 —
    its raw value is carried separately at the head of the stream)."""
    a = np.asarray(values).astype(np.int64) % wrap  # unsigned view
    d = (a - np.concatenate([a[:1], a[:-1]])) % wrap
    np.subtract(d, wrap, out=d, where=d >= half)    # signed, wrapped
    return np.where(d >= 0, 2 * d, -2 * d - 1)


def rice_encode(values: np.ndarray, bytepix: int = 4,
                blocksize: int = 32) -> bytes:
    """Encode a 1-D integer array (any byte order) as a RICE_1 stream.

    Vectorized: identical bitstream to :func:`rice_encode_scalar`."""
    fsbits, fsmax = _check_bytepix(bytepix)
    bbits = bytepix * 8
    wrap = 1 << bbits
    half = wrap >> 1
    a = np.asarray(values).astype(np.int64) % wrap
    n = a.size
    if n == 0:
        return b""
    m = _mapped_diffs(a, wrap, half)

    nb = -(-n // blocksize)
    pad = nb * blocksize - n
    M = np.concatenate([m, np.zeros(pad, dtype=np.int64)]).reshape(
        nb, blocksize)
    this = np.full(nb, blocksize, dtype=np.int64)
    if pad:
        this[-1] = blocksize - pad
    psum = M.sum(axis=1)
    # fs selection, matching the scalar loop bit-for-bit: clamp the
    # adjusted mean at 0, halve, count bits. Values stay ≤ 2^37 so
    # float64 is exact here.
    dpsum = (psum - this / 2.0 - 1.0) / this
    v = np.maximum(dpsum, 0.0).astype(np.int64) >> 1
    fs = np.zeros(nb, dtype=np.int64)
    nz = v > 0
    fs[nz] = np.frexp(v[nz].astype(np.float64))[1]  # == bit_length(v)

    is_zero = psum == 0
    is_raw = ~is_zero & (fs >= fsmax)
    is_coded = ~is_zero & ~is_raw

    # per-value bit lengths → every bit position via prefix sums
    valid = np.arange(blocksize) < this[:, None]
    Lv = np.zeros((nb, blocksize), dtype=np.int64)
    if is_coded.any():
        fs_c = fs[:, None]
        Lv = np.where(is_coded[:, None] & valid, (M >> fs_c) + 1 + fs_c, Lv)
    Lv = np.where(is_raw[:, None] & valid, bbits, Lv)
    block_bits = fsbits + Lv.sum(axis=1)
    block_start = bbits + np.concatenate(
        [[0], np.cumsum(block_bits)[:-1]])
    val_start = (block_start[:, None] + fsbits
                 + np.cumsum(Lv, axis=1) - Lv)
    total_bits = int(bbits + block_bits.sum())

    bits = np.zeros(total_bits, dtype=np.uint8)

    def _set_field(starts: np.ndarray, vals: np.ndarray, width: int) -> None:
        for b in range(width):
            bits[starts + b] = (vals >> (width - 1 - b)) & 1

    _set_field(np.zeros(1, dtype=np.int64),
               np.array([a[0]], dtype=np.int64), bbits)
    codes = np.where(is_zero, 0, np.where(is_raw, fsmax + 1, fs + 1))
    _set_field(block_start, codes, fsbits)
    if is_raw.any():
        sel = is_raw[:, None] & valid
        _set_field(val_start[sel], M[sel], bbits)
    if is_coded.any():
        sel = is_coded[:, None] & valid
        starts = val_start[sel]
        vals = M[sel]
        fs_v = np.broadcast_to(fs[:, None], M.shape)[sel]
        tops = vals >> fs_v
        bits[starts + tops] = 1                      # unary terminators
        for f in np.unique(fs_v):
            f = int(f)
            if f == 0:
                continue
            fsel = fs_v == f
            _set_field(starts[fsel] + tops[fsel] + 1, vals[fsel], f)
    return np.packbits(bits).tobytes()


def rice_decode(payload: bytes, n_pix: int, bytepix: int = 4,
                blocksize: int = 32) -> np.ndarray:
    """Decode ``n_pix`` values from a RICE_1 stream → int64 array
    (signed, per the ``bytepix`` width).

    Vectorized scan path: one ``unpackbits`` per tile, unary runs
    walked over the precomputed 1-bit position list, remainders and raw
    blocks gathered in one batched read per block, then a single cumsum
    reconstructs the pixels from the zigzag diffs."""
    fsbits, fsmax = _check_bytepix(bytepix)
    bbits = bytepix * 8
    wrap = 1 << bbits
    half = wrap >> 1
    if n_pix == 0:
        return np.empty(0, dtype=np.int64)
    data = bytes(payload)
    nbits = len(data) * 8
    # padded byte view: any ≤32-bit field at bit offset p reads from a
    # 40-bit window of 5 gathered bytes (truncation is caught by the
    # explicit position checks below, never by the padding)
    pb = np.frombuffer(data + b"\0" * 8, dtype=np.uint8).astype(np.int64)

    def _read_batch(pos: np.ndarray, width: int) -> np.ndarray:
        byte = pos >> 3
        sh = pos & 7
        w = ((pb[byte] << 32) | (pb[byte + 1] << 24) | (pb[byte + 2] << 16)
             | (pb[byte + 3] << 8) | pb[byte + 4])
        return (w >> (40 - sh - width)) & ((1 << width) - 1)

    def _read1(pos: int, width: int) -> int:
        if pos + width > nbits:
            raise ValueError("RICE_1 bitstream truncated")
        b0 = pos >> 3
        w = int.from_bytes(data[b0:b0 + 6].ljust(6, b"\0"), "big")
        return (w >> (48 - (pos & 7) - width)) & ((1 << width) - 1)

    # Pass 1 (sequential, pure Python ints — the bit POSITION is the
    # only sequential state): walk block headers and unary terminators,
    # accumulating flat lists. All numpy work is deferred to one
    # batched pass per field so its per-call overhead amortizes over
    # the whole tile, not per 32-value block.
    first = _read1(0, bbits)
    p = bbits
    i = 0
    all_terms: list[int] = []          # terminator bit positions
    coded_blocks: list[tuple] = []     # (i0, this, fs, p_start)
    raw_blocks: list[tuple] = []       # (i0, this, p_start)
    while i < n_pix:
        this = min(blocksize, n_pix - i)
        code = _read1(p, fsbits)
        p += fsbits
        fs = code - 1
        if fs < 0:
            i += this            # all-zero block: diffs stay 0
            continue
        if fs == fsmax:          # raw block: bbits-wide mapped diffs
            if p + this * bbits > nbits:
                raise ValueError("RICE_1 bitstream truncated")
            raw_blocks.append((i, this, p))
            p += this * bbits
            i += this
            continue
        # fs-coded block: walk the unary terminators — each value
        # consumes (top+1) unary bits then fs remainder bits, so the
        # next terminator is the first 1-bit at ≥ the position past
        # the previous value's remainder. Byte-level scan: Rice picks
        # fs so the mean unary run is ~2 bits, so the terminator is
        # almost always in the current byte — mask off the already-
        # consumed low-position bits, then `bit_length` locates the
        # MSB-first 1; zero bytes (long runs) are skipped whole.
        coded_blocks.append((i, this, fs, p))
        step = 1 + fs
        s = p
        app = all_terms.append
        try:
            for _ in range(this):
                y = s >> 3
                b = data[y] & (255 >> (s & 7))
                while not b:
                    y += 1
                    b = data[y]
                t = (y << 3) + 8 - b.bit_length()
                app(t)
                s = t + step
        except IndexError:
            raise ValueError("RICE_1 bitstream truncated") from None
        p = s
        i += this
    if p > nbits:
        raise ValueError("RICE_1 bitstream truncated")

    # Pass 2 (vectorized over the whole tile)
    mapped = np.zeros(n_pix, dtype=np.int64)
    if coded_blocks:
        i0 = np.array([b[0] for b in coded_blocks], dtype=np.int64)
        cnt = np.array([b[1] for b in coded_blocks], dtype=np.int64)
        bfs = np.array([b[2] for b in coded_blocks], dtype=np.int64)
        bp0 = np.array([b[3] for b in coded_blocks], dtype=np.int64)
        total = int(cnt.sum())
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.cumsum(cnt) - cnt, cnt))
        vidx = np.repeat(i0, cnt) + within
        fs_v = np.repeat(bfs, cnt)
        step_v = fs_v + 1
        ta = np.array(all_terms, dtype=np.int64)
        starts = np.empty(total, dtype=np.int64)
        starts[0] = bp0[0]
        starts[1:] = ta[:-1] + step_v[:-1]
        firsts = np.cumsum(cnt) - cnt           # block-first value slots
        starts[firsts] = bp0
        u = (ta - starts) << fs_v
        for f in np.unique(bfs):
            f = int(f)
            if f == 0:
                continue
            m = fs_v == f
            u[m] |= _read_batch(ta[m] + 1, f)
        mapped[vidx] = u
    if raw_blocks:
        i0 = np.array([b[0] for b in raw_blocks], dtype=np.int64)
        cnt = np.array([b[1] for b in raw_blocks], dtype=np.int64)
        bp0 = np.array([b[2] for b in raw_blocks], dtype=np.int64)
        within = (np.arange(int(cnt.sum()), dtype=np.int64)
                  - np.repeat(np.cumsum(cnt) - cnt, cnt))
        mapped[np.repeat(i0, cnt) + within] = _read_batch(
            np.repeat(bp0, cnt) + within * bbits, bbits)
    # zigzag-unmap, integrate, reinterpret as signed bytepix-width ints
    d = np.where(mapped & 1 == 0, mapped >> 1, -((mapped >> 1) + 1))
    out = (first + np.cumsum(d)) % wrap
    out[out >= half] -= wrap
    return out


def rice_encode_scalar(values: np.ndarray, bytepix: int = 4,
                       blocksize: int = 32) -> bytes:
    """Bit-at-a-time reference encoder (the pre-r5 implementation);
    kept as the differential-test oracle for :func:`rice_encode`."""
    fsbits, fsmax = _check_bytepix(bytepix)
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


def rice_decode_scalar(payload: bytes, n_pix: int, bytepix: int = 4,
                       blocksize: int = 32) -> np.ndarray:
    """Bit-at-a-time reference decoder (the pre-r5 implementation);
    kept as the differential-test oracle for :func:`rice_decode`."""
    fsbits, fsmax = _check_bytepix(bytepix)
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
