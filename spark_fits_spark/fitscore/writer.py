"""Minimal FITS writer — used only to generate test fixtures.

Writes standard-conformant primary, BINTABLE, and IMAGE HDUs from numpy
arrays. This is the new-engine analog of the reference's fixture
generators (``src/test/resources/create_test_fits.py`` /
``create_big_fits.py``, which used astropy; astropy is not available
here, so we write the container format directly — it is ~100 lines of
public FITS 4.0 standard).
"""

from __future__ import annotations

import numpy as np

from spark_fits_spark.fitscore.constants import FITS_BLOCK_SIZE, FITS_CARD_SIZE

# the tiled-compression convention's default undefined-pixel sentinel
# (what fpack writes for ZBLANK when quantizing floats with NaNs)
ZBLANK_DEFAULT = -2147483647


def _card(keyword: str, value, comment: str | None = None) -> bytes:
    kw = f"{keyword:<8}"
    if value is None:
        body = kw + (f"  {comment}" if comment else "")
        card = body.encode("ascii")[:FITS_CARD_SIZE]
        return card.ljust(FITS_CARD_SIZE)
    if isinstance(value, bool):
        v = "T" if value else "F"
        vstr = f"{v:>20}"
    elif isinstance(value, (int, np.integer)):
        vstr = f"{value:>20d}"
    elif isinstance(value, float):
        # shortest round-trip repr (uppercased exponent): %G's six
        # significant digits would corrupt stats cards (TDMINn/
        # TDMAXn) whose consumers rely on exact bounds. repr can run
        # to 24 chars (> the 20-char fixed field) — legal free-format,
        # handled by the comment-first truncation below. Non-finite
        # floats have no FITS representation: fail loud, never emit
        # 'INF'/'NAN' garbage into a header.
        if not np.isfinite(value):
            raise ValueError(
                f"card {keyword}: non-finite float {value!r} has no "
                "FITS header representation")
        vstr = f"{repr(value).upper():>20}"
    else:
        s = str(value).replace("'", "''")
        vstr = f"'{s:<8}'"
        # a quoted string that doesn't fit the 80-byte card would be
        # silently clipped below, leaving an UNTERMINATED quote the
        # parser then mis-reads (found by inspection in r6) — the FITS
        # limit is 68 value characters and this writer does not emit
        # the OGIP CONTINUE long-string convention: fail loud, exactly
        # like non-finite floats above
        if len(f"{kw}= {vstr}") > FITS_CARD_SIZE:
            raise ValueError(
                f"card {keyword}: string value of {len(s)} chars "
                "exceeds the 68-char FITS card limit (CONTINUE "
                "long-string convention not supported)")
    body = f"{kw}= {vstr}"
    if comment:
        with_comment = f"{body} / {comment}"
        # the 80-byte cap must never clip the VALUE: if keyword+value
        # leave too little room, shorten or drop the comment instead
        if len(with_comment) > FITS_CARD_SIZE:
            room = FITS_CARD_SIZE - len(body) - 3
            with_comment = f"{body} / {comment[:room]}" if room > 0 else body
        body = with_comment
    card = body.encode("ascii")
    if len(card) > FITS_CARD_SIZE:
        card = card[:FITS_CARD_SIZE]
    return card.ljust(FITS_CARD_SIZE)


def _header_block(cards: list[bytes]) -> bytes:
    raw = b"".join(cards) + _card("END", None)
    pad = (-len(raw)) % FITS_BLOCK_SIZE
    return raw + b" " * pad


def _pad_data(raw: bytes) -> bytes:
    pad = (-len(raw)) % FITS_BLOCK_SIZE
    return raw + b"\x00" * pad


def _checksum_placeholders() -> list[bytes]:
    return [_card("CHECKSUM", "0" * 16, "HDU checksum"),
            _card("DATASUM", "0", "data unit checksum")]


def _finish(hdu: bytes, checksum: bool) -> bytes:
    if not checksum:
        return hdu
    from spark_fits_spark.fitscore.checksum import apply_checksums
    return apply_checksums(hdu)


def primary_hdu(extra_cards: list[bytes] | None = None,
                checksum: bool = False) -> bytes:
    cards = [
        _card("SIMPLE", True, "conforms to FITS standard"),
        _card("BITPIX", 8),
        _card("NAXIS", 0),
        _card("EXTEND", True),
    ]
    cards.extend(extra_cards or [])
    if checksum:
        cards.extend(_checksum_placeholders())
    return _finish(_header_block(cards), checksum)


_TFORM_NUMPY = {
    "L": ("S1", 1), "B": ("i1", 1), "I": (">i2", 2), "J": (">i4", 4),
    "K": (">i8", 8), "E": (">f4", 4), "D": (">f8", 8),
}


_VLA_RE = r"^1?([PQ])([A-Z])(?:\((\d+)\))?$"


def bintable_hdu(
    columns: list[tuple[str, str, np.ndarray]],
    extra_cards: list[bytes] | None = None,
    checksum: bool = False,
) -> bytes:
    """Build one BINTABLE HDU from (name, tform, values) columns.

    tform like '10A', 'E', '1J', '3I'. Values: 1-D arrays (or 2-D for
    vector columns; str/bytes arrays for 'A').

    Variable-length columns: tform 'PK(max)' / 'QE(max)' with values a
    ``(lengths, flat)`` pair — per-row element counts (int array) and
    the row-major concatenation of all elements (1-D numpy array, any
    byte order; stored big-endian). Descriptors are (count, byte offset
    into the heap); the heap follows the fixed table (THEAP default),
    PCOUNT covers it. P descriptors are 2×int32, Q 2×int64.
    """
    import re

    n_rows = None
    fields = []          # (record dtype, writer) per column
    row_bytes = 0
    heap_parts: list[bytes] = []
    heap_pos = 0
    for name, tform, vals in columns:
        vm = re.match(_VLA_RE, tform)
        if vm:
            pq, letter = vm.group(1), vm.group(2)
            lengths, flat = vals
            lengths = np.asarray(lengths, dtype=np.int64)
            n_rows = len(lengths) if n_rows is None else n_rows
            base, w = _TFORM_NUMPY[letter]
            flat = np.ascontiguousarray(np.asarray(flat).astype(base))
            starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
            desc_t = ">i4" if pq == "P" else ">i8"
            desc = np.empty((len(lengths), 2), dtype=desc_t)
            desc[:, 0] = lengths
            desc[:, 1] = heap_pos + starts * w
            heap_parts.append(flat.tobytes())
            heap_pos += flat.nbytes
            nbytes = 8 if pq == "P" else 16
            fields.append(((desc_t, (2,)), desc, nbytes))
            row_bytes += nbytes
            continue
        m = re.match(r"^(\d*)([A-Z])$", tform)
        repeat = int(m.group(1)) if m.group(1) else 1
        letter = m.group(2)
        n_rows = len(vals) if n_rows is None else n_rows
        if letter == "A":
            fields.append((f"S{repeat}", np.asarray(vals, dtype=f"S{repeat}"),
                           repeat))
            row_bytes += repeat
        elif letter == "X":
            nbytes = (repeat + 7) // 8
            fields.append((f"V{nbytes}", vals, nbytes))
            row_bytes += nbytes
        elif letter == "L":
            fmt = ("S1", (repeat,)) if repeat > 1 else "S1"
            fields.append(
                (fmt, np.where(np.asarray(vals, dtype=bool), b"T", b"F"),
                 repeat))
            row_bytes += repeat
        else:
            base, w = _TFORM_NUMPY[letter]
            shape = (repeat,) if repeat > 1 else ()
            fields.append(((base, shape) if shape else base, vals, w * repeat))
            row_bytes += w * repeat

    n_rows = n_rows or 0
    dtype = np.dtype([(f"f{i}", f[0]) for i, f in enumerate(fields)])
    assert dtype.itemsize == row_bytes
    rec = np.zeros(n_rows, dtype=dtype)
    for i, (_fmt, vals, _) in enumerate(fields):
        rec[f"f{i}"] = vals

    heap = b"".join(heap_parts)
    cards = [
        _card("XTENSION", "BINTABLE", "binary table extension"),
        _card("BITPIX", 8),
        _card("NAXIS", 2),
        _card("NAXIS1", row_bytes, "length of dimension 1"),
        _card("NAXIS2", n_rows, "length of dimension 2"),
        _card("PCOUNT", len(heap), "heap size in bytes"),
        _card("GCOUNT", 1),
        _card("TFIELDS", len(columns)),
    ]
    for i, (name, tform, _vals) in enumerate(columns, start=1):
        cards.append(_card(f"TTYPE{i}", name))
        cards.append(_card(f"TFORM{i}", tform))
    cards.extend(extra_cards or [])
    if checksum:
        cards.extend(_checksum_placeholders())
    return _finish(
        _header_block(cards) + _pad_data(rec.tobytes() + heap), checksum)


def image_hdu(data: np.ndarray, primary: bool = False,
              extra_cards: list[bytes] | None = None,
              checksum: bool = False) -> bytes:
    """Build an IMAGE HDU (or a primary-with-data HDU) from an ndarray.

    dtype must be one of i2/i4/i8/f4/f8/u1; stored big-endian. The array
    is written C-order, so ``data.shape == (NAXIS_n, ..., NAXIS2,
    NAXIS1)`` reversed into the header per FITS convention.
    """
    kind_map = {"i2": 16, "i4": 32, "i8": 64, "f4": -32, "f8": -64, "u1": 8, "i1": 8}
    key = f"{data.dtype.kind}{data.dtype.itemsize}"
    bitpix = kind_map[key]
    big = data.astype(data.dtype.newbyteorder(">"), copy=False)
    cards = []
    if primary:
        cards.append(_card("SIMPLE", True))
    else:
        cards.append(_card("XTENSION", "IMAGE", "image extension"))
    cards.append(_card("BITPIX", bitpix))
    cards.append(_card("NAXIS", data.ndim))
    for i, n in enumerate(reversed(data.shape), start=1):
        cards.append(_card(f"NAXIS{i}", n))
    if not primary:
        cards.append(_card("PCOUNT", 0))
        cards.append(_card("GCOUNT", 1))
    cards.extend(extra_cards or [])
    if checksum:
        cards.extend(_checksum_placeholders())
    return _finish(_header_block(cards) + _pad_data(big.tobytes()), checksum)


def compressed_image_hdu(data: np.ndarray, cmptype: str = "GZIP_1",
                         tile_rows: int = 1,
                         extra_cards: list[bytes] | None = None,
                         checksum: bool = False,
                         quantize_method: str = "NO_DITHER",
                         zdither0: int = 1) -> bytes:
    """Build a tiled-compressed image HDU (the fpack convention;
    ``fitscore/tilecomp.py`` documents the layout): a BINTABLE whose
    rows are gzip tiles of ``tile_rows`` consecutive image rows (tiles
    never span z-planes), with ``ZIMAGE``/``ZBITPIX``/``ZNAXISn``/
    ``ZTILEn``/``ZCMPTYPE`` describing the logical image. GZIP payloads
    are standard RFC-1952 streams, so other FITS tools can decompress
    these files.

    Float images under RICE_1 quantize per tile; ``quantize_method``
    picks ``NO_DITHER`` (deterministic linear),
    ``SUBTRACTIVE_DITHER_1`` (the fpack float default: per-pixel
    pseudo-random offsets from the convention's portable RNG, seed
    recorded in ``ZDITHER0``; quantization error decorrelates from the
    signal) or ``SUBTRACTIVE_DITHER_2`` (DITHER_1 plus exact
    preservation of 0.0-valued pixels via the reserved sentinel — the
    mode for sparse/masked images where zero MEANS zero). NaN pixels
    map to ZBLANK under NO_DITHER; under dithering they are rejected
    (write NO_DITHER for images with undefined pixels)."""
    from spark_fits_spark.fitscore import tilecomp

    if cmptype not in tilecomp.SUPPORTED_CODECS:
        raise NotImplementedError(
            f"cmptype {cmptype!r} not supported "
            f"(supported: {', '.join(tilecomp.SUPPORTED_CODECS)})")
    kind_map = {"i2": 16, "i4": 32, "i8": 64, "f4": -32, "f8": -64}
    key = f"{data.dtype.kind}{data.dtype.itemsize}"
    if key not in kind_map:
        raise NotImplementedError(
            f"dtype {data.dtype} not supported for compressed images")
    bitpix = kind_map[key]
    quantize = cmptype == "RICE_1" and bitpix < 0
    dither = quantize and quantize_method in ("SUBTRACTIVE_DITHER_1",
                                              "SUBTRACTIVE_DITHER_2")
    dither2 = quantize and quantize_method == "SUBTRACTIVE_DITHER_2"
    if quantize and quantize_method not in ("NO_DITHER",
                                            "SUBTRACTIVE_DITHER_1",
                                            "SUBTRACTIVE_DITHER_2"):
        raise NotImplementedError(
            f"quantize_method {quantize_method!r} not supported "
            "(NO_DITHER, SUBTRACTIVE_DITHER_1 or SUBTRACTIVE_DITHER_2)")
    if dither and not 1 <= int(zdither0) <= tilecomp.N_RANDOM:
        raise ValueError(
            f"zdither0 must be in 1..{tilecomp.N_RANDOM}, got {zdither0}")
    if cmptype == "RICE_1" and bitpix == 64:
        raise NotImplementedError(
            "RICE_1 cannot write int64 images (outside the RICE bytepix "
            "table); use GZIP_1/GZIP_2")
    if quantize and np.isinf(data).any():
        raise NotImplementedError(
            "RICE_1 float quantization cannot represent Inf pixels "
            "(NaN maps to the ZBLANK undefined-pixel sentinel; Inf has "
            "no representation in the quantized layout)")
    if dither and np.isnan(data).any():
        raise NotImplementedError(
            f"{quantize_method} write does not support NaN pixels "
            "(use quantize_method='NO_DITHER', which maps NaN to ZBLANK)")
    if data.ndim < 2:
        data = data.reshape(1, -1)
    plane_rows, width = data.shape[-2], data.shape[-1]
    planes = data.reshape(-1, plane_rows, width)
    payloads: list[bytes] = []
    zscales: list[float] = []
    zzeros: list[float] = []
    has_blank = False
    tile_num = 0                     # 1-based global tile counter (dither)
    for p in range(planes.shape[0]):
        for r0 in range(0, plane_rows, tile_rows):
            tile = planes[p, r0:r0 + tile_rows, :]
            tile_num += 1
            if quantize:
                # per-tile linear quantization (the fpack float layout,
                # NO_DITHER): ~16-bit resolution over the tile's range.
                # Lossy by design — max error zscale/2 per pixel. NaN
                # pixels store the ZBLANK sentinel (the convention's
                # default -2147483647) and a ZBLANK header card is
                # emitted; quantized values are ≥ 0 so the sentinel
                # never collides with a real pixel.
                finite = np.isfinite(tile)
                vals = tile[finite]
                lo = float(vals.min()) if vals.size else 0.0
                hi = float(vals.max()) if vals.size else 0.0
                zs = (hi - lo) / 65000.0 or 1.0
                if dither:
                    # q = NINT((v − zzero)/zscale + r − ½); the reader
                    # regenerates r from (tile_num, ZDITHER0)
                    r = tilecomp.dither_offsets(
                        tile_num, int(zdither0), tile.size)
                    q = tilecomp.nint(
                        (tile.astype(np.float64).reshape(-1) - lo) / zs
                        + r - 0.5).reshape(tile.shape)
                    if dither2:
                        # DITHER_2: exact zeros survive quantization
                        # exactly via the reserved sentinel; the offset
                        # stream above was still consumed per pixel so
                        # all other pixels keep their DITHER_1 values
                        q = np.where(tile == 0.0,
                                     float(tilecomp.ZERO_SENTINEL), q)
                else:
                    q = np.round((tile.astype(np.float64) - lo) / zs)
                    if not finite.all():
                        has_blank = True
                        q = np.where(finite, q, float(ZBLANK_DEFAULT))
                payloads.append(
                    tilecomp.compress_tile(q.astype("i4"), cmptype))
                zscales.append(zs)
                zzeros.append(lo)
            else:
                payloads.append(tilecomp.compress_tile(tile, cmptype))
    lengths = np.asarray([len(b) for b in payloads], dtype=np.int64)
    flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    maxlen = int(lengths.max()) if len(lengths) else 0
    zcards = [
        _card("ZIMAGE", True, "tile-compressed image"),
        _card("ZBITPIX", bitpix, "logical image BITPIX"),
        _card("ZNAXIS", data.ndim),
    ]
    for i, n in enumerate(reversed(data.shape), start=1):
        zcards.append(_card(f"ZNAXIS{i}", n))
    ztile = [width, tile_rows] + [1] * (data.ndim - 2)
    for i, t in enumerate(ztile, start=1):
        zcards.append(_card(f"ZTILE{i}", t))
    zcards.append(_card("ZCMPTYPE", cmptype, "tile codec"))
    if cmptype == "RICE_1":
        zcards.append(_card("ZNAME1", "BLOCKSIZE"))
        zcards.append(_card("ZVAL1", 32))
        zcards.append(_card("ZNAME2", "BYTEPIX"))
        zcards.append(_card("ZVAL2", 4 if quantize else data.dtype.itemsize))
    columns = [("COMPRESSED_DATA", f"1PB({maxlen})", (lengths, flat))]
    if quantize:
        zcards.append(_card("ZQUANTIZ", quantize_method,
                            "quantization mode"))
        if dither:
            zcards.append(_card("ZDITHER0", int(zdither0), "dither seed"))
        if has_blank:
            zcards.append(_card("ZBLANK", ZBLANK_DEFAULT,
                                "undefined-pixel sentinel"))
        columns.append(("ZSCALE", "D", np.asarray(zscales, dtype=">f8")))
        columns.append(("ZZERO", "D", np.asarray(zzeros, dtype=">f8")))
    return bintable_hdu(
        columns,
        extra_cards=zcards + (extra_cards or []),
        checksum=checksum,
    )


def compressed_bintable_hdu(
    columns: list[tuple[str, str, np.ndarray]],
    tile_rows: int = 1000,
    ctypes: dict[str, str] | str | None = None,
    extra_cards: list[bytes] | None = None,
    checksum: bool = False,
) -> bytes:
    """Build a tile-compressed BINTABLE (the fpack table convention;
    ``fitscore/tabcomp.py`` documents the layout): logical rows are
    grouped into tiles of ``tile_rows``, each column's values within a
    tile are serialized big-endian and compressed independently
    (``ctypes``: one codec name for all columns, or {column: codec};
    default GZIP_2 — byte-shuffled gzip; RICE_1 available for B/I/J
    integer columns), and the result is a BINTABLE of variable-length
    byte cells with ``ZTABLE``/``ZTILELEN``/``ZFORMn``/``ZCTYPn``
    cards. Scans back transparently with the logical schema.

    Same ``columns`` spec as :func:`bintable_hdu`, minus variable-length
    (P/Q) columns, which the convention cannot hold (rejected loud)."""
    import re

    from spark_fits_spark.fitscore import tabcomp
    from spark_fits_spark.fitscore.types import parse_tform

    if isinstance(ctypes, str):
        default_ct, per_col = ctypes, {}
    else:
        default_ct, per_col = "GZIP_2", dict(ctypes or {})

    n_rows = None
    serialized = []            # (name, tform, info, ctype, big-endian array)
    for name, tform, vals in columns:
        if re.match(_VLA_RE, tform):
            raise NotImplementedError(
                f"column {name!r}: variable-length TFORM {tform!r} cannot "
                "be tile-compressed (the table convention has no heap-in-"
                "heap form); write it uncompressed")
        info = parse_tform(tform)
        if info.byte_width == 0:
            raise ValueError(f"column {name!r}: unknown TFORM {tform!r}")
        ct = per_col.get(name, default_ct)
        tabcomp.check_table_codec(ct, info)
        if info.letter == "A":
            arr = np.asarray(vals, dtype=f"S{max(info.repeat, 1)}")
        elif info.letter == "L":
            arr = np.where(np.asarray(vals, dtype=bool), b"T", b"F").astype(
                "S1")
        elif info.letter == "X":
            arr = np.asarray(vals)
        else:
            base, _w = _TFORM_NUMPY[info.letter]
            arr = np.ascontiguousarray(np.asarray(vals).astype(base))
        n_rows = len(arr) if n_rows is None else n_rows
        serialized.append((name, tform, info, ct, arr))
    n_rows = n_rows or 0
    row_bytes = sum(i.byte_width for _n, _t, i, _c, _a in serialized)

    vla_cols = []
    for name, tform, info, ct, arr in serialized:
        lengths, payloads = [], []
        for r0 in range(0, n_rows, tile_rows):
            tile = np.ascontiguousarray(arr[r0:r0 + tile_rows])
            payload = tabcomp.compress_column_tile(
                tile.tobytes(), ct, info, tile.size)
            lengths.append(len(payload))
            payloads.append(payload)
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        maxlen = max(lengths) if lengths else 0
        vla_cols.append((name, f"1PB({maxlen})",
                         (np.asarray(lengths, dtype=np.int64), flat)))

    zcards = [
        _card("ZTABLE", True, "tile-compressed binary table"),
        _card("ZTILELEN", tile_rows, "logical rows per tile"),
        _card("ZNAXIS1", row_bytes, "logical table row bytes"),
        _card("ZNAXIS2", n_rows, "logical table rows"),
    ]
    for i, (name, tform, info, ct, _a) in enumerate(serialized, start=1):
        zcards.append(_card(f"ZFORM{i}", tform))
        zcards.append(_card(f"ZCTYP{i}", ct))
    return bintable_hdu(
        vla_cols, extra_cards=zcards + (extra_cards or []),
        checksum=checksum)


def write_fits(path: str, hdus: list[bytes], include_primary: bool = True,
               checksum: bool = False, fobj=None) -> None:
    """Serialize HDUs to ``path``, or into an already-open binary stream
    ``fobj`` (the VFS writer path — fitscore.vfs — passes its own)."""
    if fobj is not None:
        if include_primary:
            fobj.write(primary_hdu(checksum=checksum))
        for h in hdus:
            fobj.write(h)
        return
    with open(path, "wb") as f:
        write_fits(path, hdus, include_primary=include_primary,
                   checksum=checksum, fobj=f)
