"""Vectorized decode: raw HDU bytes → pyarrow arrays.

This replaces the reference's element-at-a-time ``ByteBuffer`` decode
(``FitsHdu.scala:124-235``, ``getElementFromBuffer``; per-task throughput
note "32 MB ≈ 2 s" at ``FitsRecordReader.scala:379``) with a single numpy
structured-dtype view over the partition's byte range plus column-wise
conversion to Arrow. Semantics preserved:

- ``L`` decodes ASCII ``'T'`` → True, anything else → False
  (``FitsHdu.scala:209-213``).
- ``nA`` strings are trimmed like Java ``String.trim`` (both ends)
  (``FitsHdu.scala:222-226``).
- ``B`` bytes are interpreted signed (``FitsHdu.scala:214-217``).
- ``nX`` bit fields surface as a one-element array of the raw bytes
  (``FitsHdu.scala:218-221`` returns ``List(subbuf)``).
- unknown TFORMs decode to string ``"0"`` (``FitsHdu.scala:227-233``).
- image rows get an ``ImgIndex`` z-plane index
  (``FitsRecordReader.scala:377-389``).

Pure numpy + pyarrow; no Spark/JVM dependency.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spark_fits_spark.fitscore.file import HduInfo
from spark_fits_spark.fitscore.types import TFormInfo, parse_tform


def build_row_dtype(hdu: HduInfo, col_indices: list[int]) -> np.dtype:
    """Structured dtype over one row, with fields only for the selected
    columns (offsets from splitLocations — unselected byte ranges are
    never decoded, the vectorized version of the reference's ``columns``
    option, ``FitsHduBintable.scala:306-325``)."""
    locations = hdu.split_locations
    infos = hdu.tform_infos
    names, formats, offsets = [], [], []
    for pos, ci in enumerate(col_indices):
        info = infos[ci]
        if info.byte_width == 0:
            continue  # unknown TFORM: no bytes to read
        names.append(f"f{pos}")
        formats.append(info.numpy_dtype)
        offsets.append(locations[ci])
    return np.dtype({
        "names": names, "formats": formats, "offsets": offsets,
        "itemsize": hdu.row_bytes,
    })


def _as_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


_TRIM_CHARS = " \x00\t\n\r\x0b\x0c"


def _strings_to_arrow(col: np.ndarray) -> pa.Array:
    """Fixed-width FITS strings → Arrow string array, Java-trim semantics
    (both ends, all chars ≤ 0x20). Stays in Arrow C++ — no per-row
    Python, no numpy unicode conversion.

    Fast path: FITS ``A`` fields are ASCII by the standard, so the fixed
    ``S<w>`` buffer IS valid UTF-8 — wrap it with synthesized offsets via
    ``Array.from_buffers`` (one small offsets allocation instead of the
    fixed_size_binary→binary→string cast chain; ~4× on the string
    column). Any byte ≥ 0x80 (malformed file) falls back to the
    validating cast path."""
    import pyarrow.compute as pc

    if col.dtype.kind == "S" and col.dtype.itemsize > 0:
        raw_bytes = col.tobytes()  # one contiguous copy out of the row view
        u8 = np.frombuffer(raw_bytes, dtype=np.uint8)
        if not len(u8) or int(u8.max()) < 0x80:
            w = col.dtype.itemsize
            n = len(col)
            offsets = pa.py_buffer(
                np.arange(0, (n + 1) * w, w, dtype=np.int32).tobytes())
            sarr = pa.Array.from_buffers(
                pa.string(), n, [None, offsets, pa.py_buffer(raw_bytes)])
            return _as_array(pc.ascii_trim(sarr, characters=_TRIM_CHARS))
    raw = _as_array(pa.array(col))
    if not pa.types.is_string(raw.type):
        if pa.types.is_fixed_size_binary(raw.type):
            raw = raw.cast(pa.binary())
        raw = raw.cast(pa.string())
    return _as_array(pc.ascii_trim(raw, characters=_TRIM_CHARS))


def _column_to_arrow(col: np.ndarray, info: TFormInfo) -> pa.Array:
    letter = info.letter
    if letter == "A":
        return _strings_to_arrow(col)
    if letter == "L":
        if info.repeat == 1:
            return pa.array(col == b"T")
        flat = col.reshape(-1) == b"T"
        offsets = np.arange(0, flat.size + 1, info.repeat, dtype=np.int32)
        return pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    if letter == "X":
        nbytes = info.byte_width
        raw = col.tobytes()
        values = pa.array(
            [raw[i * nbytes : (i + 1) * nbytes] for i in range(len(col))],
            type=pa.binary(),
        )
        offsets = np.arange(0, len(col) + 1, dtype=np.int32)
        return pa.ListArray.from_arrays(pa.array(offsets), values)
    if letter in ("B", "I", "J", "K", "E", "D"):
        native = col.astype(col.dtype.newbyteorder("="), copy=False)
        if info.repeat == 1:
            return pa.array(native)
        flat = native.reshape(-1)
        offsets = np.arange(0, flat.size + 1, info.repeat, dtype=np.int32)
        return pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    # unknown TFORM → "0" per row (FitsHdu.scala:227-233)
    return pa.array(["0"] * len(col))


def _scaled_flat_array(
    flat: np.ndarray, letter: str, tscal: float, tzero: float,
    tnull: int | None,
) -> pa.Array:
    """Physical-value decode of a flat element array: ``raw * TSCAL +
    TZERO`` with TNULL/BLANK raw sentinels as nulls. Vectorized numpy
    throughout; exact integer paths where the factors are integral (see
    ``scaled_spark_type``)."""
    if letter == "B":
        # scaling mode reads B as the standard's unsigned byte
        flat = flat.view(np.uint8)
    mask = None
    if tnull is not None and letter in ("B", "I", "J", "K"):
        mask = flat == tnull
    if tscal == 1.0 and tzero == 0.0:
        values = flat
    elif letter == "K" and tscal == 1.0 and tzero == 9223372036854775808.0:
        # unsigned-int64 convention: flip the sign bit → uint64
        values = flat.view(np.uint64) ^ np.uint64(1 << 63)
    elif (
        letter in ("B", "I", "J")
        and float(tscal).is_integer() and float(tzero).is_integer()
    ):
        values = flat.astype(np.int64) * int(tscal) + int(tzero)
    else:
        values = flat.astype(np.float64) * tscal + tzero
    if values.dtype == np.uint64:
        # Arrow's uint64→decimal cast clamps at int64 max; build the
        # decimal array from exact Python ints (K-unsigned is rare)
        objs = [
            None if (mask is not None and m) else int(v)
            for v, m in zip(
                values, mask if mask is not None else np.zeros(len(values), bool))
        ]
        return pa.array(objs, type=pa.decimal128(20, 0))
    return pa.array(values, mask=mask)


def _scaled_column_to_arrow(
    col: np.ndarray, info, tscal: float, tzero: float, tnull: int | None
) -> pa.Array:
    native = col.astype(col.dtype.newbyteorder("="), copy=False)
    flat = native.reshape(-1) if info.repeat > 1 else native
    out = _scaled_flat_array(flat, info.letter, tscal, tzero, tnull)
    if info.repeat > 1:
        offsets = np.arange(0, flat.size + 1, info.repeat, dtype=np.int32)
        return pa.ListArray.from_arrays(pa.array(offsets), out)
    return out


_VAR_ELEM_WIDTH = {"A": 1, "L": 1, "X": 1, "B": 1, "I": 2, "J": 4,
                   "K": 8, "E": 4, "D": 8, "C": 8, "M": 16}
_VAR_ELEM_DTYPE = {"B": "i1", "I": ">i2", "J": ">i4", "K": ">i8",
                   "E": ">f4", "D": ">f8", "C": ">f4", "M": ">f8"}


def _varlen_column_to_arrow(
    desc: np.ndarray,
    info,
    heap_read,
) -> pa.Array:
    """Variable-length (P/Q) column: ``desc`` is the (n_rows, 2) array of
    (element count, heap offset) descriptors; elements are sliced out of
    one contiguous heap window per batch (single seek+read, not one I/O
    per row). Complex C/M elements decode as interleaved (re, im)."""
    counts = desc[:, 0].astype(np.int64)
    offsets = desc[:, 1].astype(np.int64)
    w = _VAR_ELEM_WIDTH.get(info.var_letter, 1)
    lengths = counts * w
    nz = counts > 0
    if not nz.any():
        window, lo = b"", 0
    else:
        lo = int(offsets[nz].min())
        hi = int((offsets[nz] + lengths[nz]).max())
        window = heap_read(lo, hi - lo)
    chunks = [
        bytes(window[offsets[i] - lo : offsets[i] - lo + lengths[i]])
        if counts[i] > 0 else b""
        for i in range(len(counts))
    ]
    flat = b"".join(chunks)
    if info.var_letter == "A":
        return _strings_to_arrow(np.array(
            [c for c in chunks], dtype=object))
    arrow_offsets = pa.array(
        np.concatenate([[0], np.cumsum(counts * (2 if info.var_letter in "CM" else 1))])
        .astype(np.int32))
    if info.var_letter == "L":
        values = pa.array(np.frombuffer(flat, dtype="S1") == b"T")
    elif info.var_letter == "X":
        values = pa.array([flat[i:i+1] for i in range(len(flat))], type=pa.binary())
    else:
        elem = np.frombuffer(flat, dtype=_VAR_ELEM_DTYPE[info.var_letter])
        values = pa.array(elem.astype(elem.dtype.newbyteorder("="), copy=False))
    return pa.ListArray.from_arrays(arrow_offsets, values)


def decode_bintable(
    buf: bytes | memoryview,
    hdu: HduInfo,
    col_indices: list[int],
    arrow_schema: pa.Schema,
    scaling: bool = False,
    heap_read=None,
) -> pa.RecordBatch:
    """Decode ``len(buf) / row_bytes`` bintable rows into a RecordBatch
    with exactly the columns in ``col_indices`` (schema-ordered). With
    ``scaling`` decode physical values (TSCAL/TZERO/TNULL)."""
    n_rows = len(buf) // hdu.row_bytes if hdu.row_bytes else 0
    dtype = build_row_dtype(hdu, col_indices)
    rows = np.frombuffer(buf, dtype=dtype, count=n_rows)
    infos = hdu.tform_infos
    arrays = []
    for pos, ci in enumerate(col_indices):
        info = infos[ci]
        if info.byte_width == 0:
            arr = pa.array(["0"] * n_rows)
        elif info.is_varlen:
            if heap_read is None:
                raise ValueError(
                    f"column {hdu.col_names[ci]!r} is variable-length "
                    f"({info.tform!r}) but no heap reader was provided")
            arr = _varlen_column_to_arrow(rows[f"f{pos}"], info, heap_read)
        elif scaling and info.letter in ("B", "I", "J", "K", "E", "D"):
            arr = _scaled_column_to_arrow(
                rows[f"f{pos}"], info,
                hdu.col_tscal[ci] if hdu.col_tscal else 1.0,
                hdu.col_tzero[ci] if hdu.col_tzero else 0.0,
                hdu.col_tnull[ci] if hdu.col_tnull else None,
            )
        else:
            arr = _column_to_arrow(rows[f"f{pos}"], info)
        field = arrow_schema.field(pos)
        if arr.type != field.type:
            arr = _as_array(arr.cast(field.type))
        arrays.append(arr)
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def decode_image(
    buf: bytes | memoryview,
    hdu: HduInfo,
    row_offset: int,
    arrow_schema: pa.Schema,
    scaling: bool = False,
) -> pa.RecordBatch:
    """Decode image rows (NAXIS1 pixels each) starting at global row
    ``row_offset`` into (Image: array<elem>, ImgIndex: long) rows.

    ``ImgIndex`` = z-plane index of the row: for a (NAXIS1 × NAXIS2 ×
    NAXIS3...) cube, row *i* belongs to plane ``i // NAXIS2``
    (``FitsRecordReader.scala:377-389``; 73×31×5 cube → 155 rows, planes
    0..4, ``ReadFitsTest.scala:108-115``)."""
    width = hdu.naxis[0] if hdu.naxis else 0
    n_rows = len(buf) // hdu.row_bytes if hdu.row_bytes else 0
    info = parse_tform(f"{width}{hdu.image_tform}" if width != 1 else hdu.image_tform)
    flat = np.frombuffer(buf, dtype=np.dtype(info.numpy_dtype).base, count=n_rows * width)
    if hdu.image_tform == "L":
        values = pa.array(flat == b"T")
    elif scaling and hdu.col_tscal:
        values = _scaled_flat_array(
            flat.astype(flat.dtype.newbyteorder("="), copy=False),
            hdu.image_tform, hdu.col_tscal[0], hdu.col_tzero[0],
            hdu.col_tnull[0] if hdu.col_tnull else None)
    else:
        values = pa.array(flat.astype(flat.dtype.newbyteorder("="), copy=False))
    offsets = np.arange(0, n_rows * width + 1, width, dtype=np.int32)
    image = pa.ListArray.from_arrays(pa.array(offsets), values)

    plane_height = hdu.naxis[1] if len(hdu.naxis) >= 2 else 1
    idx = (np.arange(row_offset, row_offset + n_rows, dtype=np.int64)) // max(plane_height, 1)
    arrays = [image, pa.array(idx)]
    out = []
    for pos, arr in enumerate(arrays):
        field = arrow_schema.field(pos)
        if arr.type != field.type:
            arr = arr.cast(field.type)
        out.append(arr)
    return pa.RecordBatch.from_arrays(out, schema=arrow_schema)


# -- ASCII table decode (beyond-reference opt-in; reference stubs TABLE
#    HDUs to empty DataFrames, FitsHdu.scala:242-267) -------------------

import re as _re

_ASCII_TFORM_RE = _re.compile(r"^\s*([AIFED])(\d+)(?:\.(\d+))?")


def ascii_table_spark_type(tform: str):
    """ASCII TFORM (Aw / Iw / Fw.d / Ew.d / Dw.d) → Spark type:
    A→string, I→long, F/E/D→double."""
    from pyspark.sql.types import DoubleType, LongType, StringType

    m = _ASCII_TFORM_RE.match(tform)
    if not m:
        return StringType()
    return {"A": StringType(), "I": LongType()}.get(m.group(1), DoubleType())


def decode_ascii_table(
    buf: bytes | memoryview,
    hdu: HduInfo,
    col_indices: list[int],
    arrow_schema: pa.Schema,
) -> pa.RecordBatch:
    """Decode fixed-width ASCII table rows: slice each field's character
    range from a numpy S-view, then bulk-parse (numpy handles b'1.2E3';
    Fortran 'D' exponents are rewritten to 'E')."""
    n_rows = len(buf) // hdu.row_bytes if hdu.row_bytes else 0
    names, formats, offsets, codes = [], [], [], []
    for pos, ci in enumerate(col_indices):
        m = _ASCII_TFORM_RE.match(hdu.col_tforms[ci])
        code = m.group(1) if m else "A"
        width = int(m.group(2)) if m else 1
        names.append(f"f{pos}")
        formats.append(f"S{width}")
        offsets.append(hdu.col_tbcols[ci] - 1)
        codes.append(code)
    dtype = np.dtype({"names": names, "formats": formats, "offsets": offsets,
                      "itemsize": hdu.row_bytes})
    rows = np.frombuffer(buf, dtype=dtype, count=n_rows)
    arrays = []
    for pos, code in enumerate(codes):
        col = rows[f"f{pos}"]
        if code == "A":
            arr = _strings_to_arrow(col)
        else:
            # unparseable cells (null sentinels like '---.--', blanks)
            # become SQL NULLs via vectorized coerce
            import pandas as pd

            stripped = np.char.strip(col)
            cleaned = np.char.replace(
                np.char.replace(stripped, b"D", b"E"), b"d", b"e")
            vals = pd.to_numeric(
                pd.Series(np.char.decode(cleaned, "ascii", "replace")),
                errors="coerce")
            if code == "I":
                arr = pa.Array.from_pandas(vals.astype("Int64"))
            else:
                arr = pa.array(vals.to_numpy(dtype=np.float64), from_pandas=True)
        field = arrow_schema.field(pos)
        if arr.type != field.type:
            arr = _as_array(arr.cast(field.type))
        arrays.append(arr)
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)
