"""FITS tiled-image compression (the `fpack` convention): read and
write compressed image HDUs with GZIP_1 / GZIP_2 tile codecs.

A tile-compressed image (FITS 4.0 §10 / the registered Tiled Image
Compression convention; what ``fpack`` and CFITSIO's imcomp produce) is
PHYSICALLY a BINTABLE whose rows are compressed tiles:

- ``ZIMAGE = T`` marks the table as a compressed image; ``ZBITPIX`` /
  ``ZNAXIS`` / ``ZNAXISn`` describe the LOGICAL image; ``ZTILEn`` the
  tile grid (default: row-by-row — ``ZTILE1 = ZNAXIS1``, others 1);
  ``ZCMPTYPE`` names the codec.
- Each table row holds one tile's compressed bytes in a variable-length
  ``COMPRESSED_DATA`` column (``1PB(...)`` descriptors into the heap).

The reference connector has no compression support at all; this module
is beyond-reference but interops with standard tools for the gzip
codecs, because the payloads are plain RFC-1952 gzip streams:

- ``GZIP_1``: the tile's big-endian pixel bytes, gzipped.
- ``GZIP_2``: the tile's bytes shuffled so each byte plane is stored
  contiguously (all MSBs, then the next byte, ...), then gzipped —
  usually compresses better on smooth integer data.
- ``RICE_1``: the fpack default for integer images — independent
  implementation of the published Rice spec in ``fitscore/rice.py``
  (BLOCKSIZE/BYTEPIX honored from ``ZNAMEn``/``ZVALn``). Float images
  use fpack's quantized layout: integer tiles plus per-tile
  ``ZSCALE``/``ZZERO`` columns, for ``ZQUANTIZ=NO_DITHER`` and (r5)
  ``SUBTRACTIVE_DITHER_1`` — the fpack float DEFAULT — whose per-pixel
  offsets both sides regenerate from the convention's portable RNG
  (``dither_randoms``; the published 1043618065 seed self-check is
  asserted) seeded by the ``ZDITHER0`` card, and (r5)
  ``SUBTRACTIVE_DITHER_2`` — identical except pixels that are exactly
  0.0 ride the reserved ``ZERO_SENTINEL`` integer and restore to
  exactly 0.0 (the offset stream still advances past them, keeping
  every other pixel bit-identical to DITHER_1). Undefined pixels ride the
  ``ZBLANK`` sentinel (header card or per-tile column) and surface as
  NaN.
- ``PLIO_1`` / ``HCOMPRESS_1`` are recognized and rejected with a
  clear error (no codec implementation in this environment).

Scan model: tiles ARE the unit of distribution — a scan partition
covers a contiguous range of table rows (tiles), decompresses each from
its heap window, and emits the logical image rows with the same
``(Image, ImgIndex)`` schema as an uncompressed image HDU, so
``spark.read.format("fits")`` is compression-transparent exactly like
CFITSIO. Tiles never span z-planes (``ZTILEn = 1`` for n ≥ 3 is
required, matching the row-tile layouts fpack writes by default).
"""

from __future__ import annotations

import gzip
from typing import Callable

import numpy as np
import pyarrow as pa

SUPPORTED_CODECS = ("GZIP_1", "GZIP_2", "RICE_1")
_KNOWN_UNSUPPORTED = ("RICE_ONE", "PLIO_1", "HCOMPRESS_1", "NOCOMPRESS")

# ---------------------------------------------------------------------
# Subtractive dithering (the convention's §"Preserving undefined pixels
# / Dithering" — what fpack does to floats BY DEFAULT). Quantization
# adds a per-pixel pseudo-random offset r ∈ [0,1) before rounding and
# the reader subtracts the SAME offset, so quantization error
# decorrelates from the signal (no banding on smooth backgrounds) while
# staying exactly reproducible: both sides regenerate the offsets from
# the published portable RNG and the ZDITHER0 seed card.
# ---------------------------------------------------------------------

N_RANDOM = 10000
_DITHER_CHECK_SEED = 1043618065   # published self-check after 10000 steps
# SUBTRACTIVE_DITHER_2's exact-zero sentinel: pixels whose float value
# is exactly 0.0 store this integer instead of a dithered quantum and
# restore to exactly 0.0 (the convention reserves it one above the
# undefined-pixel NULL sentinel -2147483647)
ZERO_SENTINEL = -2147483646
_dither_cache: np.ndarray | None = None


def dither_randoms() -> np.ndarray:
    """The convention's portable random sequence: Park–Miller minimal
    standard LCG, x_{n+1} = 16807·x_n mod (2³¹−1), x_0 = 1, emitting
    exactly 10000 values x_n / (2³¹−1) ∈ (0,1). The convention
    publishes a self-check — the seed after 10000 iterations must be
    1043618065 — which this implementation asserts, pinning the
    generator against the spec rather than against itself. (Double
    arithmetic is exact here: 16807·x < 2^45.)"""
    global _dither_cache
    if _dither_cache is None:
        m = 2147483647.0
        seed = 1.0
        vals = np.empty(N_RANDOM, dtype=np.float64)
        for i in range(N_RANDOM):
            temp = 16807.0 * seed
            seed = temp - m * int(temp / m)
            vals[i] = seed / m
        if int(seed) != _DITHER_CHECK_SEED:
            raise AssertionError(
                "dither RNG self-check failed: seed after 10000 steps is "
                f"{int(seed)}, convention requires {_DITHER_CHECK_SEED}")
        _dither_cache = vals
    return _dither_cache


def dither_offsets(tile_num: int, zdither0: int, n_pix: int) -> np.ndarray:
    """Per-pixel dither offsets for tile ``tile_num`` (1-based, global
    across the image) under seed ``zdither0`` (the ZDITHER0 card,
    1..10000). Indexing follows CFITSIO's quantize loop: the tile's
    effective row R = tile_num + zdither0 − 1 picks iseed = (R−1) mod
    10000, the walk starts at int(rand[iseed]·500), and on reaching the
    end of the sequence iseed advances and the start is re-derived the
    same way. Built from contiguous slices — no per-pixel Python."""
    rv = dither_randoms()
    iseed = (tile_num + zdither0 - 2) % N_RANDOM
    nextrand = int(rv[iseed] * 500.0)
    out = np.empty(n_pix, dtype=np.float64)
    filled = 0
    while filled < n_pix:
        take = min(N_RANDOM - nextrand, n_pix - filled)
        out[filled:filled + take] = rv[nextrand:nextrand + take]
        filled += take
        nextrand += take
        if nextrand == N_RANDOM:
            iseed = (iseed + 1) % N_RANDOM
            nextrand = int(rv[iseed] * 500.0)
    return out


def nint(x: np.ndarray) -> np.ndarray:
    """C-style NINT (round half away from zero) — numpy's round is
    banker's rounding, which would diverge from the convention's
    arithmetic on exact .5 ties."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


_BITPIX_NP = {16: ">i2", 32: ">i4", 64: ">i8", -32: ">f4", -64: ">f8"}


def _np_dtype(bitpix: int) -> np.dtype:
    try:
        return np.dtype(_BITPIX_NP[int(bitpix)])
    except KeyError:
        raise NotImplementedError(
            f"ZBITPIX={bitpix} is not supported for compressed images "
            f"(supported: {sorted(_BITPIX_NP)})")


def shuffle_bytes(raw: bytes, itemsize: int) -> bytes:
    """GZIP_2 byte shuffle: (npix, itemsize) → transpose → each byte
    plane contiguous."""
    if itemsize == 1:
        return raw
    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, itemsize)
    return np.ascontiguousarray(a.T).tobytes()


def unshuffle_bytes(raw: bytes, itemsize: int) -> bytes:
    if itemsize == 1:
        return raw
    a = np.frombuffer(raw, dtype=np.uint8).reshape(itemsize, -1)
    return np.ascontiguousarray(a.T).tobytes()


def compress_tile(pixels: np.ndarray, cmptype: str, *,
                  bytepix: int = 0, blocksize: int = 32) -> bytes:
    """Compress one tile's pixels (any shape; stored big-endian for the
    gzip codecs; difference-coded for RICE_1)."""
    if cmptype == "RICE_1":
        if pixels.dtype.kind != "i":
            raise NotImplementedError(
                "RICE_1 compresses integer pixels only (float images "
                "require quantization, which is not implemented)")
        from spark_fits_spark.fitscore.rice import rice_encode

        return rice_encode(pixels.reshape(-1),
                           bytepix=bytepix or pixels.dtype.itemsize,
                           blocksize=blocksize)
    raw = np.ascontiguousarray(
        pixels.astype(pixels.dtype.newbyteorder(">"), copy=False)).tobytes()
    if cmptype == "GZIP_1":
        return gzip.compress(raw, mtime=0)
    if cmptype == "GZIP_2":
        return gzip.compress(shuffle_bytes(raw, pixels.dtype.itemsize),
                             mtime=0)
    raise _codec_error(cmptype)


def decompress_tile(payload: bytes, cmptype: str, dtype: np.dtype,
                    n_pix: int, *, bytepix: int = 0,
                    blocksize: int = 32) -> np.ndarray:
    if cmptype == "RICE_1":
        if dtype.kind != "i":
            raise NotImplementedError(
                "RICE_1 tiles hold integer pixels; quantized-float "
                "reconstruction is not implemented")
        from spark_fits_spark.fitscore.rice import rice_decode

        vals = rice_decode(bytes(payload), n_pix,
                           bytepix=bytepix or dtype.itemsize,
                           blocksize=blocksize)
        return vals.astype(dtype.newbyteorder("="))
    raw = gzip.decompress(bytes(payload))
    if cmptype == "GZIP_2":
        raw = unshuffle_bytes(raw, dtype.itemsize)
    got = len(raw) // dtype.itemsize
    if got != n_pix:
        raise ValueError(
            f"tile decompressed to {got} pixels, expected {n_pix}")
    return np.frombuffer(raw, dtype=dtype)


def _codec_error(cmptype: str) -> Exception:
    if cmptype in _KNOWN_UNSUPPORTED:
        return NotImplementedError(
            f"ZCMPTYPE {cmptype!r} is recognized but not implemented "
            f"(supported: {', '.join(SUPPORTED_CODECS)})")
    return ValueError(f"unknown ZCMPTYPE {cmptype!r}")


def tile_layout(z_naxis: tuple[int, ...],
                z_tile: tuple[int, ...]) -> tuple[int, int, int]:
    """Validate the tile grid and return ``(tile_rows, tiles_per_plane,
    n_planes)``. Only full-row tiles that never span z-planes are
    supported (fpack's default layouts)."""
    if not z_naxis:
        return (0, 0, 0)
    if z_tile and z_tile[0] != z_naxis[0]:
        raise NotImplementedError(
            f"ZTILE1={z_tile[0]} != ZNAXIS1={z_naxis[0]}: only full-row "
            "tiles are supported")
    if any(t != 1 for t in z_tile[2:]):
        raise NotImplementedError(
            f"ZTILEn={z_tile} spans z-planes; only ZTILEn=1 for n>=3 is "
            "supported")
    tile_rows = z_tile[1] if len(z_tile) >= 2 else 1
    plane_rows = z_naxis[1] if len(z_naxis) >= 2 else 1
    tiles_per_plane = -(-plane_rows // max(tile_rows, 1))
    n_planes = 1
    for n in z_naxis[2:]:
        n_planes *= n
    return (tile_rows, tiles_per_plane, n_planes)


def decode_compressed_image(
    buf: bytes | memoryview,
    hdu,                       # HduInfo with z_* fields populated
    tile_offset: int,
    arrow_schema: pa.Schema,
    heap_read: Callable[[int, int], bytes],
    scaling: bool = False,
    trim: tuple[int, int] | None = None,
) -> pa.RecordBatch:
    """Decode a run of compressed-tile table rows starting at global
    tile index ``tile_offset`` into image rows ``(Image, ImgIndex)`` —
    the same logical output as :func:`decode_image` on the uncompressed
    image (including BSCALE/BZERO/BLANK physical-value scaling when
    ``scaling`` is on — compression stays transparent either way). One
    heap window is read per batch (min..max over the batch's
    descriptors), mirroring the plain VLA decode path."""
    if hdu.z_cmptype not in SUPPORTED_CODECS:
        raise _codec_error(hdu.z_cmptype)
    dtype = _np_dtype(hdu.z_bitpix)
    # quantized-float RICE (fpack's float layout): integer tiles plus
    # per-tile ZSCALE/ZZERO columns; value = zzero + zscale·q. Only the
    # deterministic NO_DITHER mode is supported (subtractive dithering
    # needs the convention's specific RNG stream).
    quantized = (hdu.z_cmptype == "RICE_1" and hdu.z_bitpix < 0)
    dithered = False
    if quantized:
        if hdu.z_quantiz not in ("", "NO_DITHER", "SUBTRACTIVE_DITHER_1",
                                 "SUBTRACTIVE_DITHER_2"):
            raise NotImplementedError(
                f"ZQUANTIZ={hdu.z_quantiz!r} is not supported (NO_DITHER, "
                "SUBTRACTIVE_DITHER_1 and SUBTRACTIVE_DITHER_2 "
                "quantization only)")
        dithered = hdu.z_quantiz in ("SUBTRACTIVE_DITHER_1",
                                     "SUBTRACTIVE_DITHER_2")
        dither2 = hdu.z_quantiz == "SUBTRACTIVE_DITHER_2"
        if dithered and not 1 <= hdu.z_dither0 <= N_RANDOM:
            raise ValueError(
                f"{hdu.z_quantiz} requires a ZDITHER0 card in "
                f"1..{N_RANDOM}, got {hdu.z_dither0}")
        if not {"ZSCALE", "ZZERO"} <= set(hdu.col_names):
            raise ValueError(
                "RICE_1 float image lacks per-tile ZSCALE/ZZERO columns")
    width = hdu.z_naxis[0] if hdu.z_naxis else 0
    tile_rows, tiles_per_plane, _ = tile_layout(hdu.z_naxis, hdu.z_tile)
    plane_rows = hdu.z_naxis[1] if len(hdu.z_naxis) >= 2 else 1

    n_tiles = len(buf) // hdu.row_bytes if hdu.row_bytes else 0
    col = hdu.col_names.index(hdu.z_data_col)
    col_off = hdu.split_locations[col]
    tform = hdu.col_tforms[col].lstrip("1")
    if tform.startswith("P"):
        desc_t, desc_w = ">i4", 4
    elif tform.startswith("Q"):
        desc_t, desc_w = ">i8", 8   # 64-bit heap descriptors (>2 GiB heaps)
    else:
        raise ValueError(
            f"compressed-data column {hdu.z_data_col!r} has TFORM "
            f"{hdu.col_tforms[col]!r}; expected a P or Q array descriptor")
    bbuf = bytes(buf)
    desc = np.ndarray(
        (n_tiles, 2), dtype=desc_t, buffer=bbuf,
        offset=col_off, strides=(hdu.row_bytes, desc_w),
    ).astype(np.int64)
    if quantized:
        def _dcol(name: str, dt: str = ">f8") -> np.ndarray:
            ci = hdu.col_names.index(name)
            return np.ndarray(
                (n_tiles,), dtype=dt, buffer=bbuf,
                offset=hdu.split_locations[ci], strides=(hdu.row_bytes,),
            ).astype(np.float64 if dt == ">f8" else np.int64)

        zscale, zzero = _dcol("ZSCALE"), _dcol("ZZERO")
        # Undefined-pixel sentinel (ZBLANK): quantized integers equal
        # to it reconstruct to NaN, not zzero+zscale·sentinel. Both
        # convention forms: the per-tile ZBLANK column (1J) wins over
        # the header card; absent both, no pixel is undefined.
        if "ZBLANK" in hdu.col_names:
            ci = hdu.col_names.index("ZBLANK")
            zw = hdu.split_locations[ci + 1] - hdu.split_locations[ci]
            zblank_col = _dcol("ZBLANK", {4: ">i4", 8: ">i8", 2: ">i2"}
                               .get(zw, ">i4"))
        else:
            zblank_col = None

    if n_tiles and desc.size:
        lo = int(min(desc[i, 1] for i in range(n_tiles)))
        hi = int(max(desc[i, 1] + desc[i, 0] for i in range(n_tiles)))
        window = heap_read(lo, hi - lo)
    else:
        lo, window = 0, b""

    # phase A: per-tile geometry + payload slices (trim skips resolved
    # BEFORE any decode is paid); phase B below decodes — all RICE
    # tiles of the batch in ONE rice_decode_batch call (run-jumping +
    # shared bit infra amortized across the partition's tiles)
    jobs: list[tuple] = []
    for i in range(n_tiles):
        t = tile_offset + i
        nbytes, off = int(desc[i, 0]), int(desc[i, 1])
        payload = window[off - lo:off - lo + nbytes]
        plane = t // max(tiles_per_plane, 1)
        start_row = (t % max(tiles_per_plane, 1)) * tile_rows
        n_rows = min(tile_rows, plane_rows - start_row)
        # rowrange cutout (`trim` = logical [a, b) over plane-major
        # global rows): slice boundary tiles to the requested rows,
        # skip non-overlapping tiles before paying their decode
        k0, k1 = 0, n_rows
        if trim is not None:
            g0 = plane * plane_rows + start_row
            k0 = max(0, trim[0] - g0)
            k1 = min(n_rows, trim[1] - g0)
            if k1 <= k0:
                continue
        jobs.append((t, i, payload, n_rows, k0, k1, plane))

    rice_vals: list[np.ndarray] | None = None
    if hdu.z_cmptype == "RICE_1" and len(jobs) > 1:
        from spark_fits_spark.fitscore.rice import rice_decode_batch

        tile_dtype = np.dtype(">i4") if quantized else dtype
        rice_vals = rice_decode_batch(
            [j[2] for j in jobs], [j[3] * width for j in jobs],
            bytepix=hdu.z_bytepix or tile_dtype.itemsize,
            blocksize=hdu.z_blocksize)

    rows_vals: list[np.ndarray] = []
    idx: list[int] = []
    for jn, (t, i, payload, n_rows, k0, k1, plane) in enumerate(jobs):
        if quantized:
            if rice_vals is not None:
                q = rice_vals[jn].astype(np.dtype("=i4"))
            else:
                q = decompress_tile(
                    payload, hdu.z_cmptype, np.dtype(">i4"),
                    n_rows * width,
                    bytepix=hdu.z_bytepix, blocksize=hdu.z_blocksize)
            if dithered:
                # v = (q − r + ½)·zscale + zzero, r regenerated from the
                # same RNG walk the writer used (tile numbers are GLOBAL,
                # so a partition-split scan reproduces identical offsets)
                r = dither_offsets(t + 1, hdu.z_dither0, q.size)
                pix = ((q.astype(np.float64) - r + 0.5) * zscale[i]
                       + zzero[i]).astype(dtype.newbyteorder("="))
            else:
                pix = (zzero[i] + zscale[i] * q.astype(np.float64)).astype(
                    dtype.newbyteorder("="))
            if dither2:
                # exact-zero pixels bypassed quantization at write time
                # (the RNG walk still advanced past them, so `r` above
                # stays aligned for every other pixel)
                pix[q == ZERO_SENTINEL] = 0.0
            sentinel = (int(zblank_col[i]) if zblank_col is not None
                        else hdu.z_blank)
            if sentinel is not None:
                pix[q == sentinel] = np.nan
        else:
            if rice_vals is not None:
                pix = rice_vals[jn].astype(dtype.newbyteorder("="))
            else:
                pix = decompress_tile(
                    payload, hdu.z_cmptype, dtype, n_rows * width,
                    bytepix=hdu.z_bytepix, blocksize=hdu.z_blocksize)
        if (k0, k1) != (0, n_rows):
            pix = pix.reshape(n_rows, width)[k0:k1].reshape(-1)
        rows_vals.append(pix)
        idx.extend([plane] * (k1 - k0))

    flat = (np.concatenate(rows_vals) if rows_vals
            else np.empty(0, dtype=dtype))
    flat = flat.astype(flat.dtype.newbyteorder("="), copy=False)
    if scaling and hdu.col_tscal:
        from spark_fits_spark.fitscore.decode import _scaled_flat_array

        values = _scaled_flat_array(
            flat, hdu.image_tform, hdu.col_tscal[0], hdu.col_tzero[0],
            hdu.col_tnull[0] if hdu.col_tnull else None)
    else:
        values = pa.array(flat)
    total_rows = len(idx)
    offsets = np.arange(0, (total_rows + 1) * width, width, dtype=np.int32)
    image = pa.ListArray.from_arrays(pa.array(offsets), values)
    arrays = [image, pa.array(np.asarray(idx, dtype=np.int64))]
    out = []
    for pos, arr in enumerate(arrays):
        field = arrow_schema.field(pos)
        if arr.type != field.type:
            arr = arr.cast(field.type)
        out.append(arr)
    return pa.RecordBatch.from_arrays(out, schema=arrow_schema)
