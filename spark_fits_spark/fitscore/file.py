"""HDU boundary walking and per-HDU metadata.

Parity targets:
- block boundaries per HDU (headerStart, dataStart, dataStop, blockStop):
  reference ``FitsLib.scala:274-336`` (``getBlockBoundaries``) and
  ``FitsLib.scala:65-91`` (``FitsBlockBoundaries``).
- data length = |BITPIX|/8 × Π NAXISi, rounded up to 2880:
  ``FitsLib.scala:399-417`` (``getDataLen``).
- HDU count by full-file walk: ``FitsLib.scala:425-475`` (``getNHDU``).
- HDU type dispatch via XTENSION / SIMPLE, with the "non-empty HDU 0 with
  no declared type is an image" rule: ``FitsLib.scala:345-389``; ASCII
  TABLE is recognized but unimplemented (empty scan), ``FitsLib.scala:218``.
- bintable metadata (NAXIS1 row bytes, NAXIS2 rows, TFIELDS, TTYPEn,
  TFORMn, per-column byte offsets a.k.a. splitLocations):
  ``FitsHduBintable.scala:60-64, 86-118, 150-175, 212-294``.
- image metadata (BITPIX element type, NAXISn, row count = Π NAXISn for
  n≥2): ``FitsHduImage.scala:63-65, 100-136``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import BinaryIO

from spark_fits_spark.fitscore.constants import FITS_BLOCK_SIZE
from spark_fits_spark.fitscore.header import (
    header_value,
    parse_cards,
    read_header,
)
from spark_fits_spark.fitscore.types import TFormInfo, bitpix_to_tform, parse_tform

HDU_TYPE_BINTABLE = "bintable"
HDU_TYPE_IMAGE = "image"
HDU_TYPE_TABLE = "table"   # ASCII table — recognized, not implemented
HDU_TYPE_EMPTY = "empty"
# tiled-compressed image (fpack convention): physically a BINTABLE with
# ZIMAGE=T, logically an image — scanned as (Image, ImgIndex) rows
HDU_TYPE_COMPIMAGE = "compimage"
# tiled-compressed BINTABLE (ZTABLE=T; the fpack table convention)
HDU_TYPE_COMPTABLE = "comptable"


@dataclass(frozen=True)
class BlockBoundaries:
    """Byte boundaries of one HDU (``FitsLib.scala:65-91``)."""

    header_start: int
    data_start: int
    data_stop: int
    block_stop: int

    @property
    def data_len(self) -> int:
        return self.data_stop - self.data_start


def _data_len(header: dict[str, str]) -> int:
    """|BITPIX|/8 × GCOUNT × (PCOUNT + Π NAXISi), per the FITS standard.

    The reference's version (``FitsLib.scala:399-417``) omits
    GCOUNT/PCOUNT, so any file with a heap (variable-length arrays, e.g.
    its own untested ``varitab.fits``) derails its HDU walk; including
    them is a strict improvement — PCOUNT=0/GCOUNT=1 everywhere else."""
    naxis = int(header.get("NAXIS", "0"))
    if naxis == 0:
        return 0
    bitpix = abs(int(header.get("BITPIX", "0")))
    total = bitpix // 8
    for i in range(1, naxis + 1):
        total *= int(header.get(f"NAXIS{i}", "0"))
    if total:
        total += (abs(bitpix) // 8) * int(header.get("PCOUNT", "0") or "0")
        total *= int(header.get("GCOUNT", "1") or "1")
    return total


def _round_block(n: int) -> int:
    return ((n + FITS_BLOCK_SIZE - 1) // FITS_BLOCK_SIZE) * FITS_BLOCK_SIZE


def _exact_int(raw) -> int:
    """Integer header value parsed EXACTLY. ``int(float(v))`` loses
    precision past 2^53 — a large int64 TNULL/BLANK sentinel rounded
    to a nearby value silently stops matching, so undefined rows leak
    through as plausible-looking garbage (found by the r6 scaling
    hypothesis fuzz on the unsigned-K convention). The float fallback
    only runs for decimal-formatted values from sloppy writers, which
    are small in practice."""
    s = str(raw).strip()
    try:
        return int(s)
    except ValueError:
        return int(float(s))


def walk_hdus(fobj: BinaryIO) -> list[tuple[BlockBoundaries, list[str]]]:
    """Walk the whole file, returning (boundaries, header cards) per HDU."""
    fobj.seek(0, 2)
    file_len = fobj.tell()
    out: list[tuple[BlockBoundaries, list[str]]] = []
    pos = 0
    while pos < file_len:
        cards = read_header(fobj, pos)
        data_start = fobj.tell()
        header = parse_cards(cards)
        dl = _data_len(header)
        data_stop = data_start + dl
        block_stop = _round_block(data_stop)
        out.append((BlockBoundaries(pos, data_start, data_stop, block_stop), cards))
        pos = block_stop
    return out


def get_n_hdu(fobj: BinaryIO) -> int:
    """HDU count by full-file walk (``FitsLib.scala:425-475``)."""
    return len(walk_hdus(fobj))


def get_block_boundaries(fobj: BinaryIO, hdu_index: int) -> BlockBoundaries:
    """Boundaries of HDU ``hdu_index`` (``FitsLib.scala:274-336``)."""
    hdus = walk_hdus(fobj)
    if hdu_index < 0 or hdu_index >= len(hdus):
        raise ValueError(
            f"HDU index {hdu_index} out of range: file has {len(hdus)} HDUs "
            "(hdu must satisfy 0 <= hdu < nHDU)"
        )
    return hdus[hdu_index][0]


def _hdu_type(header: dict[str, str], hdu_index: int, data_len: int) -> str:
    """HDU type dispatch (``FitsLib.scala:345-389``)."""
    xtension = header_value(header, "XTENSION")
    if xtension is not None:
        x = xtension.strip().upper()
        if x == "BINTABLE":
            return HDU_TYPE_BINTABLE
        if x == "IMAGE":
            return HDU_TYPE_IMAGE
        if x == "TABLE":
            return HDU_TYPE_TABLE
        return HDU_TYPE_EMPTY
    # primary HDU (SIMPLE): non-empty data with no declared type → image
    if data_len > 0:
        return HDU_TYPE_IMAGE
    return HDU_TYPE_EMPTY


@dataclass(frozen=True)
class HduInfo:
    """Everything a scan partition needs to decode one HDU.

    Picklable: shipped inside InputPartition objects, replacing the
    reference's Hadoop-conf broadcast channel (``FitsLib.scala:615-629``).
    """

    path: str
    hdu_index: int
    hdu_type: str
    boundaries: BlockBoundaries
    header: dict[str, str]
    # bintable fields
    row_bytes: int = 0                      # NAXIS1
    n_rows: int = 0                         # NAXIS2 (bintable) or Π NAXISn,n≥2 (image)
    col_names: tuple[str, ...] = ()
    col_tforms: tuple[str, ...] = ()
    # ascii-table fields (TBCOLn: 1-based start column per field)
    col_tbcols: tuple[int, ...] = ()
    # physical-value scaling (TSCALn/TZEROn/TNULLn; opt-in — the
    # reference ignores these, SURVEY.md §1.2 "Not supported")
    col_tscal: tuple[float, ...] = ()
    col_tzero: tuple[float, ...] = ()
    col_tnull: tuple[int | None, ...] = ()
    # heap offset from data_start for variable-length (P/Q) columns
    theap: int = 0
    # image fields
    naxis: tuple[int, ...] = ()             # (NAXIS1, NAXIS2, ...)
    image_tform: str = ""                   # element type letter from BITPIX
    # tiled-compression fields (ZIMAGE bintables; fitscore/tilecomp.py)
    z_bitpix: int = 0                       # ZBITPIX: logical pixel type
    z_naxis: tuple[int, ...] = ()           # ZNAXISn: logical image dims
    z_tile: tuple[int, ...] = ()            # ZTILEn: tile grid
    z_cmptype: str = ""                     # ZCMPTYPE
    z_data_col: str = ""                    # compressed-payload column name
    z_bytepix: int = 0                      # RICE_1 BYTEPIX (ZNAMEn/ZVALn)
    z_blocksize: int = 32                   # RICE_1 BLOCKSIZE
    z_quantiz: str = ""                     # ZQUANTIZ (float quantization)
    z_blank: int | None = None              # ZBLANK: undefined-pixel sentinel
    z_dither0: int = 0                      # ZDITHER0: dither seed (1..10000)
    # tiled TABLE compression (ZTABLE bintables; fitscore/tabcomp.py).
    # For comptables, col_names/col_tforms hold the LOGICAL schema
    # (TTYPEn + ZFORMn) so schema/pruning/conformance work unchanged;
    # the physical descriptor layout lives in the zt_* fields and
    # row_bytes/n_rows describe the physical table (n_rows = tiles,
    # the unit of distribution).
    zt_tilelen: int = 0                     # ZTILELEN: logical rows per tile
    zt_rows: int = 0                        # ZNAXIS2: logical row count
    zt_row_bytes: int = 0                   # ZNAXIS1: logical row bytes
    zt_ctyps: tuple[str, ...] = ()          # ZCTYPn: per-column codec
    zt_phys_tforms: tuple[str, ...] = ()    # physical P/Q descriptor forms

    @property
    def tform_infos(self) -> list[TFormInfo]:
        return [parse_tform(t) for t in self.col_tforms]

    @property
    def split_locations(self) -> list[int]:
        """Column byte offsets within a row, plus the row end — e.g.
        ``[20A, E, E]`` → ``[0, 20, 24, 28]`` (``FitsHduBintable.scala:60-64``)."""
        offs = [0]
        for info in self.tform_infos:
            offs.append(offs[-1] + info.byte_width)
        return offs


def open_hdu(fobj: BinaryIO, path: str, hdu_index: int | str) -> HduInfo:
    """Locate HDU ``hdu_index``, parse its header, classify it, and pull
    the metadata needed for decoding (the analog of ``new Fits(path,
    conf, hduIndex)``, ``FitsLib.scala:173-238``).

    ``hdu_index`` may also be an EXTNAME string (beyond-reference —
    the reference takes integers only): the first HDU whose EXTNAME
    matches case-insensitively is selected, resolved per file so
    multi-file datasets with different HDU orderings still line up."""
    hdus = walk_hdus(fobj)
    if isinstance(hdu_index, str):
        want = hdu_index.strip().upper()
        names = []
        for i, (_b, cards) in enumerate(hdus):
            name = header_value(parse_cards(cards), "EXTNAME", "") or ""
            names.append(name)
            if name.strip().upper() == want:
                hdu_index = i
                break
        else:
            raise ValueError(
                f"No HDU with EXTNAME {hdu_index!r} in {path}; "
                f"available: {[n for n in names if n]}"
            )
    if hdu_index < 0 or hdu_index >= len(hdus):
        raise ValueError(
            f"HDU index {hdu_index} out of range: file has {len(hdus)} HDUs "
            "(hdu must satisfy 0 <= hdu < nHDU)"
        )
    boundaries, cards = hdus[hdu_index]
    header = parse_cards(cards)
    hdu_type = _hdu_type(header, hdu_index, boundaries.data_len)

    if hdu_type == HDU_TYPE_BINTABLE:
        row_bytes = int(header.get("NAXIS1", "0"))
        n_rows = int(header.get("NAXIS2", "0"))
        n_cols = int(header.get("TFIELDS", "0"))
        names = []
        tforms = []
        tscal, tzero, tnull = [], [], []
        for i in range(1, n_cols + 1):
            names.append(header_value(header, f"TTYPE{i}", f"col{i}") or f"col{i}")
            tforms.append(header_value(header, f"TFORM{i}", "") or "")
            tscal.append(float(header_value(header, f"TSCAL{i}", "1") or "1"))
            tzero.append(float(header_value(header, f"TZERO{i}", "0") or "0"))
            nv = header_value(header, f"TNULL{i}", None)
            tnull.append(_exact_int(nv) if nv is not None else None)
        info = HduInfo(
            path=path, hdu_index=hdu_index, hdu_type=hdu_type,
            boundaries=boundaries, header=header,
            row_bytes=row_bytes, n_rows=n_rows,
            col_names=tuple(names), col_tforms=tuple(tforms),
            col_tscal=tuple(tscal), col_tzero=tuple(tzero),
            col_tnull=tuple(tnull),
            theap=int(header.get("THEAP", str(row_bytes * n_rows))
                      or str(row_bytes * n_rows)),
        )
        if (header_value(header, "ZTABLE", "") or "").strip() == "T":
            # tiled-compressed TABLE (fpack table convention): expose
            # the LOGICAL schema (TTYPEn names + ZFORMn forms); keep
            # the physical P/Q layout in zt_* fields. n_rows stays the
            # TILE count (the unit of distribution).
            from dataclasses import replace as _replace

            zforms = tuple(
                header_value(header, f"ZFORM{i}", "") or ""
                for i in range(1, n_cols + 1))
            if any(not z for z in zforms):
                raise ValueError(
                    f"ZTABLE in {path} is missing ZFORMn cards for its "
                    f"{n_cols} columns")
            ctyps = tuple(
                (header_value(header, f"ZCTYP{i}", "GZIP_1") or "GZIP_1")
                .strip()
                for i in range(1, n_cols + 1))
            tilelen = _exact_int(header_value(header, "ZTILELEN", "0")
                                 or "0")
            if tilelen <= 0:
                raise ValueError(
                    f"ZTABLE in {path} has no positive ZTILELEN card")
            return _replace(
                info,
                hdu_type=HDU_TYPE_COMPTABLE,
                col_tforms=zforms,
                zt_phys_tforms=tuple(tforms),
                zt_tilelen=tilelen,
                zt_rows=_exact_int(header_value(header, "ZNAXIS2", "0")
                                   or "0"),
                zt_row_bytes=_exact_int(header_value(header, "ZNAXIS1",
                                                     "0") or "0"),
                zt_ctyps=ctyps,
            )
        if (header_value(header, "ZIMAGE", "") or "").strip() == "T":
            # tiled-compressed image (fpack convention): reclassify;
            # n_rows stays the TILE count (the unit of distribution)
            zn = int(header.get("ZNAXIS", "0"))
            z_naxis = tuple(int(header.get(f"ZNAXIS{i}", "0"))
                            for i in range(1, zn + 1))
            z_tile = tuple(
                int(header_value(header, f"ZTILE{i}",
                                 str(z_naxis[0] if i == 1 else 1))
                    or (z_naxis[0] if i == 1 else 1))
                for i in range(1, zn + 1))
            data_col = next(
                (c for c in ("COMPRESSED_DATA", "GZIP_COMPRESSED_DATA")
                 if c in info.col_names), "")
            if not data_col:
                raise ValueError(
                    f"ZIMAGE table in {path} has no COMPRESSED_DATA / "
                    f"GZIP_COMPRESSED_DATA column (columns: "
                    f"{list(info.col_names)})")
            from dataclasses import replace as _replace

            # codec parameters ride ZNAMEn/ZVALn pairs (BLOCKSIZE /
            # BYTEPIX for RICE_1); defaults per the convention
            znames = {}
            for i in range(1, 10):
                zn_name = header_value(header, f"ZNAME{i}", None)
                if zn_name is None:
                    break
                znames[zn_name.strip().upper()] = (
                    header_value(header, f"ZVAL{i}", "") or "")
            z_bitpix = int(header.get("ZBITPIX", "0"))
            try:
                z_tform = bitpix_to_tform(z_bitpix)
            except ValueError:
                z_tform = ""
            bnull = header_value(header, "BLANK", None)
            info = _replace(
                info,
                hdu_type=HDU_TYPE_COMPIMAGE,
                z_bitpix=z_bitpix,
                z_naxis=z_naxis,
                z_tile=z_tile,
                z_cmptype=(header_value(header, "ZCMPTYPE", "") or "").strip(),
                z_data_col=data_col,
                # the logical image's element letter + BSCALE/BZERO/
                # BLANK (the convention carries the uncompressed
                # image's cards in the table header) — so scaling mode
                # stays compression-transparent, like decode_image
                image_tform=z_tform,
                col_tscal=(float(header_value(header, "BSCALE", "1")
                                 or "1"),),
                col_tzero=(float(header_value(header, "BZERO", "0")
                                 or "0"),),
                col_tnull=(_exact_int(bnull) if bnull is not None
                           else None,),
                # convention default when the BYTEPIX card is absent is
                # 4 (the 32-bit RICE parameter table), NOT the image's
                # pixel width — CFITSIO decodes such files with fsbits=5
                z_bytepix=_exact_int(znames.get("BYTEPIX") or 4),
                z_blocksize=_exact_int(znames.get("BLOCKSIZE") or 32),
                z_quantiz=(header_value(header, "ZQUANTIZ", "")
                           or "").strip(),
                # quantized-float undefined-pixel sentinel (header-card
                # form; the per-tile ZBLANK column form is detected at
                # decode time from col_names)
                z_blank=(_exact_int(header_value(header, "ZBLANK", None))
                         if header_value(header, "ZBLANK", None) is not None
                         else None),
                z_dither0=_exact_int(header_value(header, "ZDITHER0", "0")
                                     or "0"),
            )
        return info

    if hdu_type == HDU_TYPE_IMAGE:
        n_axis = int(header.get("NAXIS", "0"))
        naxis = tuple(int(header.get(f"NAXIS{i}", "0")) for i in range(1, n_axis + 1))
        bitpix = int(header.get("BITPIX", "0"))
        tform = bitpix_to_tform(bitpix)
        elem_width = abs(bitpix) // 8
        row_bytes = (naxis[0] if naxis else 0) * elem_width
        n_rows = 1
        for n in naxis[1:]:
            n_rows *= n
        if not naxis:
            n_rows = 0
        bnull = header_value(header, "BLANK", None)
        return HduInfo(
            path=path, hdu_index=hdu_index, hdu_type=hdu_type,
            boundaries=boundaries, header=header,
            row_bytes=row_bytes, n_rows=n_rows,
            naxis=naxis, image_tform=tform,
            # image scaling cards ride the per-column tuples (1 "column")
            col_tscal=(float(header_value(header, "BSCALE", "1") or "1"),),
            col_tzero=(float(header_value(header, "BZERO", "0") or "0"),),
            col_tnull=(_exact_int(bnull) if bnull is not None else None,),
        )

    if hdu_type == HDU_TYPE_TABLE:
        # ASCII table: recognized; metadata parsed so the opt-in reader
        # (beyond-reference) can decode it. The default scan still
        # returns an empty DataFrame for parity (FitsHdu.scala:242-267).
        row_bytes = int(header.get("NAXIS1", "0"))
        n_rows = int(header.get("NAXIS2", "0"))
        n_cols = int(header.get("TFIELDS", "0"))
        names, tforms, tbcols = [], [], []
        for i in range(1, n_cols + 1):
            names.append(header_value(header, f"TTYPE{i}", f"col{i}") or f"col{i}")
            tforms.append(header_value(header, f"TFORM{i}", "") or "")
            tbcols.append(int(header_value(header, f"TBCOL{i}", "1") or "1"))
        return HduInfo(
            path=path, hdu_index=hdu_index, hdu_type=hdu_type,
            boundaries=boundaries, header=header,
            row_bytes=row_bytes, n_rows=n_rows,
            col_names=tuple(names), col_tforms=tuple(tforms),
            col_tbcols=tuple(tbcols),
        )

    # empty HDUs carry no scannable data
    return HduInfo(
        path=path, hdu_index=hdu_index, hdu_type=hdu_type,
        boundaries=boundaries, header=header,
    )
