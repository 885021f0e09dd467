"""FITS tiled TABLE compression (the fpack convention for bintables).

A tile-compressed binary table (the registered Tiled Table Convention;
what ``fpack`` produces for catalogs) is PHYSICALLY a BINTABLE whose
rows are tiles of the LOGICAL table:

- ``ZTABLE = T`` marks it; ``ZTILELEN`` is the number of logical rows
  per tile; ``ZNAXIS1``/``ZNAXIS2`` carry the logical table's row
  bytes / row count.
- The compressed table keeps the logical ``TTYPEn`` names but its
  ``TFORMn`` become variable-length byte columns (``1PB(...)``): cell
  ``(tile, column)`` holds the COMPRESSED bytes of that column's
  values for the tile's rows — column-major within the tile, which is
  the whole point (per-column codecs + much better ratios than
  row-major).
- ``ZFORMn`` records each column's original TFORM and ``ZCTYPn`` its
  codec (``GZIP_1`` / ``GZIP_2`` / ``RICE_1`` here; anything else is
  rejected loud).

The reference connector has no table-compression support. Scan model
mirrors ``tilecomp``: tiles are the unit of distribution, the logical
``(col_names, ZFORMn)`` schema is what Spark sees, and — because every
column lives in its own heap cells — source-side column pruning skips
the pruned columns' BYTES entirely, not just their decode.

Decode reuses ``fitscore.decode``'s per-column converters
(``_column_to_arrow`` / ``_scaled_column_to_arrow``), so string trim /
boolean / scaling semantics are identical to the uncompressed path by
construction. Variable-length (P/Q) logical columns are not supported
inside compressed tables (rejected loud at write and read).
"""

from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa

from spark_fits_spark.fitscore.tilecomp import (
    _codec_error, shuffle_bytes, unshuffle_bytes,
)
from spark_fits_spark.fitscore.types import TFormInfo, parse_tform

SUPPORTED_TABLE_CODECS = ("GZIP_1", "GZIP_2", "RICE_1")
_RICE_OK = {"B": 1, "I": 2, "J": 4}   # bytepix per int letter


def elem_width(info: TFormInfo) -> int:
    """Byte width of ONE element of the column (the GZIP_2 shuffle
    stride): 1 for A/L/X/B, the scalar width otherwise."""
    if info.letter in ("A", "L", "X", "B"):
        return 1
    return info.byte_width // max(info.repeat, 1)


def check_table_codec(ctype: str, info: TFormInfo) -> None:
    """Loud validation of a (codec, column-type) pair."""
    if ctype not in SUPPORTED_TABLE_CODECS:
        raise _codec_error(ctype)
    if ctype == "RICE_1" and info.letter not in _RICE_OK:
        raise NotImplementedError(
            f"ZCTYP RICE_1 applies to B/I/J integer columns only, not "
            f"TFORM {info.tform!r} (use GZIP_1/GZIP_2)")


def compress_column_tile(raw: bytes, ctype: str, info: TFormInfo,
                         n_values: int) -> bytes:
    """Compress one (tile, column) cell: ``raw`` is the column's
    big-endian bytes for the tile's rows."""
    check_table_codec(ctype, info)
    if ctype == "GZIP_1":
        return gzip.compress(raw, mtime=0)
    if ctype == "GZIP_2":
        return gzip.compress(shuffle_bytes(raw, elem_width(info)), mtime=0)
    from spark_fits_spark.fitscore.rice import rice_encode

    w = _RICE_OK[info.letter]
    vals = np.frombuffer(raw, dtype=f">i{w}" if w > 1 else "i1")
    return rice_encode(vals, bytepix=w)


def decompress_column_tile(payload: bytes, ctype: str, info: TFormInfo,
                           n_values: int) -> bytes:
    """Inverse of :func:`compress_column_tile` → the column's big-endian
    bytes for the tile (length ``n_values·elem_width``)."""
    check_table_codec(ctype, info)
    expect = n_values * elem_width(info)
    if ctype in ("GZIP_1", "GZIP_2"):
        raw = gzip.decompress(bytes(payload))
        if ctype == "GZIP_2":
            raw = unshuffle_bytes(raw, elem_width(info))
    else:
        from spark_fits_spark.fitscore.rice import rice_decode

        w = _RICE_OK[info.letter]
        vals = rice_decode(bytes(payload), n_values, bytepix=w)
        raw = vals.astype(f">i{w}" if w > 1 else "i1").tobytes()
    if len(raw) != expect:
        raise ValueError(
            f"column tile decompressed to {len(raw)} bytes, expected "
            f"{expect}")
    return raw


def decode_compressed_table(
    buf: bytes | memoryview,
    hdu,                      # HduInfo with zt_* fields populated
    tile_offset: int,
    arrow_schema: pa.Schema,
    col_indices: list[int],
    heap_read,
    scaling: bool = False,
) -> pa.RecordBatch:
    """Decode a run of compressed-table rows (tiles) starting at global
    tile index ``tile_offset`` into logical rows with exactly the
    columns in ``col_indices``. One heap window per SELECTED column per
    batch; pruned columns' bytes are never read."""
    from spark_fits_spark.fitscore.decode import (
        _as_array, _column_to_arrow, _scaled_column_to_arrow,
    )

    n_tiles = len(buf) // hdu.row_bytes if hdu.row_bytes else 0
    bbuf = bytes(buf)
    infos = [parse_tform(t) for t in hdu.col_tforms]   # logical ZFORMs
    # physical descriptor offsets within a compressed-table row
    phys = [parse_tform(t) for t in hdu.zt_phys_tforms]
    offs = [0]
    for p in phys:
        offs.append(offs[-1] + p.byte_width)
    # per-tile logical row counts (last tile may be short)
    rows_per = [
        min(hdu.zt_tilelen,
            hdu.zt_rows - (tile_offset + i) * hdu.zt_tilelen)
        for i in range(n_tiles)
    ]
    total_rows = sum(max(r, 0) for r in rows_per)

    arrays = []
    for pos, ci in enumerate(col_indices):
        info = infos[ci]
        ctype = hdu.zt_ctyps[ci]
        p = phys[ci]
        desc_t, desc_w = ((">i4", 4) if p.letter == "P" else (">i8", 8))
        desc = np.ndarray(
            (n_tiles, 2), dtype=desc_t, buffer=bbuf, offset=offs[ci],
            strides=(hdu.row_bytes, desc_w)).astype(np.int64)
        if n_tiles and desc.size:
            lo = int(desc[:, 1].min())
            hi = int((desc[:, 1] + desc[:, 0]).max())
            window = heap_read(lo, hi - lo)
        else:
            lo, window = 0, b""
        parts = []
        for i in range(n_tiles):
            nbytes, off = int(desc[i, 0]), int(desc[i, 1])
            parts.append(decompress_column_tile(
                window[off - lo:off - lo + nbytes], ctype, info,
                max(rows_per[i], 0) * max(info.repeat, 1)))
        flat = b"".join(parts)
        col = _reshape_column(flat, info, total_rows)
        if scaling and info.letter in ("B", "I", "J", "K", "E", "D"):
            arr = _scaled_column_to_arrow(
                col, info,
                hdu.col_tscal[ci] if hdu.col_tscal else 1.0,
                hdu.col_tzero[ci] if hdu.col_tzero else 0.0,
                hdu.col_tnull[ci] if hdu.col_tnull else None)
        else:
            arr = _column_to_arrow(col, info)
        field = arrow_schema.field(pos)
        if arr.type != field.type:
            arr = _as_array(arr.cast(field.type))
        arrays.append(arr)
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def _reshape_column(flat: bytes, info: TFormInfo, n_rows: int) -> np.ndarray:
    """Column bytes → the same numpy view shape the row-major decode
    produces for this column (so the shared converters see identical
    input)."""
    if info.letter == "A":
        return np.frombuffer(flat, dtype=f"S{max(info.repeat, 1)}",
                             count=n_rows)
    if info.letter == "X":
        return np.frombuffer(flat, dtype=f"V{info.byte_width}",
                             count=n_rows)
    if info.letter == "L":
        a = np.frombuffer(flat, dtype="S1")
        return a.reshape(n_rows, info.repeat) if info.repeat > 1 else a
    base = {"B": "i1", "I": ">i2", "J": ">i4", "K": ">i8",
            "E": ">f4", "D": ">f8"}[info.letter]
    a = np.frombuffer(flat, dtype=base)
    return a.reshape(n_rows, info.repeat) if info.repeat > 1 else a
