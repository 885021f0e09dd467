"""FITS write support — a sink the reference never had (its
``DefaultSource`` implements no ``CreatableRelationProvider``; SURVEY.md
§2.1 "Sinks: None"). Completes the source/sink story:

    df.write.format("fits").mode("overwrite").save("/out/dir")

Each task writes one ``part-<id>-<uuid>.fits`` file (primary HDU + one
BINTABLE HDU) from its Arrow batches — embarrassingly parallel, no
driver involvement, so it scales with the number of partitions. The
uuid suffix makes ``mode("append")`` into an existing directory safe
(task ids restart at 0 per job, so bare ``part-<id>`` names would
overwrite previous data — r1 ADVICE). Reading the directory back with
``.option("hdu", 1)`` round-trips the DataFrame.

Type mapping (inverse of ``fitscore.types``): boolean→L, byte→B,
short→I, int→J, long→K, float→E, double→D, string→nA, array<numeric>→
**variable-length (P-descriptor) column** by default — lossless for
ragged arrays and schema-stable across part files regardless of each
partition's max length. ``.option("colwidths", "vec=3")`` switches a
column to a fixed-repeat vector layout (zero-padded).

String widths / vector repeats default to the **partition max** — part
files may then carry different TFORM widths, which is fine for our own
reader (schema conformance compares Spark logical types, not raw
TFORMs). For interop with readers that require uniform TFORMs across
files, pin them explicitly:

    .option("stringwidth", "24")          # all string columns → 24A
    .option("colwidths", "name=16,vec=3") # per-column width/repeat

A value longer than a pinned width raises (silent truncation would be
data loss).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

import numpy as np
from pyspark.sql.datasource import DataSourceArrowWriter, WriterCommitMessage
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

_SCALAR_TFORM = {
    BooleanType: ("L", "S1"),
    ByteType: ("B", "i1"),
    ShortType: ("I", ">i2"),
    IntegerType: ("J", ">i4"),
    LongType: ("K", ">i8"),
    FloatType: ("E", ">f4"),
    DoubleType: ("D", ">f8"),
}


def _parse_width_options(options: dict | None) -> tuple[int | None, dict[str, int]]:
    """(global stringwidth, {column: width/repeat}) from writer options."""
    if not options:
        return None, {}
    opts = {k.lower(): v for k, v in options.items()}
    global_w = int(opts["stringwidth"]) if "stringwidth" in opts else None
    per_col: dict[str, int] = {}
    if "colwidths" in opts:
        for item in opts["colwidths"].split(","):
            item = item.strip()
            if not item:
                continue
            name, _, w = item.partition("=")
            per_col[name.strip().lower()] = int(w)
    return global_w, per_col


@dataclass
class FitsCommitMessage(WriterCommitMessage):
    path: str
    rows: int
    # memory:// only — the part file's bytes, landed by the driver-side
    # commit() (executor processes cannot mutate the driver's in-memory
    # store; see fitscore.vfs module docstring). Real filesystems write
    # in the task and leave this None.
    payload: bytes | None = None
    # per-file manifest entry (HDU boundaries + schema + zone-map
    # stats), merged driver-side into _fits_manifest.json by commit()
    manifest_entry: dict | None = None


MANIFEST_NAME = "_fits_manifest.json"


def manifest_entry_from_hdu(hdu, size: int) -> dict:
    """Serialize the HduInfo fields the scan planner needs (plus the
    TDMINn/TDMAXn zone-map cards, so file-level data skipping works
    straight off the manifest) into a JSON-safe dict."""
    b = hdu.boundaries
    return {
        "size": int(size),
        "hdu_type": hdu.hdu_type,
        "boundaries": [b.header_start, b.data_start, b.data_stop,
                       b.block_stop],
        "row_bytes": hdu.row_bytes,
        "n_rows": hdu.n_rows,
        "col_names": list(hdu.col_names),
        "col_tforms": list(hdu.col_tforms),
        "col_tscal": list(hdu.col_tscal),
        "col_tzero": list(hdu.col_tzero),
        "col_tnull": list(hdu.col_tnull),
        "theap": hdu.theap,
        "stats": {k: v for k, v in hdu.header.items()
                  if k.startswith(("TDMIN", "TDMAX", "TNANFR"))},
    }


def build_manifest_entry(fs, path: str, hdu_index: int = 1) -> dict:
    """Manifest entry for an existing FITS file (used by the writer
    after landing each part, and by tools/benchmarks building a
    manifest over files written outside the Spark sink)."""
    from spark_fits_spark.fitscore.file import open_hdu

    with fs.open_input(path) as f:
        hdu = open_hdu(f, path, hdu_index)
    return manifest_entry_from_hdu(hdu, fs.size(path))


def write_manifest(fs, directory: str, entries: dict[str, dict],
                   hdu_index: int = 1, merge: bool = True) -> None:
    """Write ``_fits_manifest.json`` for ``directory``: one entry per
    part-file BASENAME (relocatable — the manifest moves with the
    directory). ``merge=True`` folds entries into any existing
    manifest (the append-mode story); entries for files that no longer
    exist are dropped on merge.

    Concurrency: two jobs committing to one directory race on the
    merge read-modify-write — last writer wins and the loser's entries
    are simply absent, which costs those files a header read at plan
    time but can never mis-describe them (entries are size-validated
    against the live file before use)."""
    import json as _json

    out = {}
    mpath = fs.join(directory, MANIFEST_NAME)
    if merge and fs.exists(mpath):
        try:
            with fs.open_input(mpath) as f:
                prev = _json.loads(f.read().decode("utf-8"))
            if prev.get("version") == 1 and prev.get("hdu") == hdu_index:
                out = {
                    name: e for name, e in prev.get("files", {}).items()
                    if fs.exists(fs.join(directory, name))
                }
        except (OSError, ValueError):
            out = {}  # unreadable manifest: rebuild from this job's files
    out.update(entries)
    doc = {"version": 1, "hdu": hdu_index, "files": out}
    with fs.open_output(mpath) as f:
        f.write(_json.dumps(doc, indent=0).encode("utf-8"))


class FitsArrowWriter(DataSourceArrowWriter):
    def __init__(self, schema: StructType, path: str, options: dict | None = None,
                 fs=None):
        from spark_fits_spark.fitscore.vfs import LOCAL

        self.schema = schema
        self.path = path
        self.fs = fs if fs is not None else LOCAL
        self.string_width, self.col_widths = _parse_width_options(options)
        opts = {k.lower(): v for k, v in (options or {}).items()}
        # .option("checksum", True): emit standard CHECKSUM/DATASUM
        # cards per HDU (FITS 4.0 §4.4.2.7) for end-to-end integrity
        self.checksum = str(opts.get("checksum", "false")).lower() == "true"
        # .option("stats", False) disables the per-column TDMINn/TDMAXn
        # min-max cards (standard FITS keywords) that the scan uses for
        # file-level data skipping against pushed filters
        self.stats = str(opts.get("stats", "true")).lower() != "false"
        # .option("manifest", False) disables _fits_manifest.json — the
        # directory-level metadata file (HDU boundaries + schema +
        # zone-map stats per part) that lets the scan plan a
        # many-thousand-file dataset without opening any data file
        self.manifest = str(opts.get("manifest", "true")).lower() != "false"
        if str(opts.get("image", "false")).lower() == "true":
            # image parts carry no manifest entry: _fits_manifest.json
            # reconstruction is BINTABLE-shaped (`_hdu_from_manifest`),
            # and image planning is header-arithmetic anyway
            self.manifest = False
        # .option("compress", "GZIP_2"|"GZIP_1"|"RICE_1") writes tiled-
        # compressed tables (the fpack table convention; scans back
        # transparently with the same logical schema). RICE_1 is valid
        # for B/I/J integer columns only — fails loud otherwise.
        # .option("tilerows", N) sets the rows-per-tile (default 1000).
        self.compress = (opts.get("compress") or "").strip() or None
        # .option("image", True): write each partition as an IMAGE HDU
        # (or, with .option("compress", ...), a tiled-compressed image
        # HDU) instead of a BINTABLE. Schema must be one array<numeric>
        # column, optionally plus an ImgIndex long (the scan-side plane
        # index — derived again on read, so it is validated but not
        # stored). Each part file is an independent 2-D image of the
        # partition's rows in partition order; to round-trip a cube,
        # repartitionByRange/sortWithinPartitions on ImgIndex first.
        self.image = str(opts.get("image", "false")).lower() == "true"
        # float-image quantization mode for RICE_1 (fitscore.writer
        # documents the three modes) + its dither seed
        self.quantize = (opts.get("quantize") or "NO_DITHER").strip()
        self.zdither0 = int(opts.get("zdither0", "1"))
        # rows per compression tile: 1000 for tables; the convention's
        # row-by-row default for images (fpack parity)
        self.tile_rows = int(opts.get("tilerows",
                                      "1" if self.image else "1000"))

    def _fixed_width(self, name: str, is_string: bool) -> int | None:
        w = self.col_widths.get(name.lower())
        if w is None and is_string:
            w = self.string_width
        return w

    def write(self, iterator) -> FitsCommitMessage:
        from pyspark import TaskContext

        from spark_fits_spark.fitscore import writer as fw

        batches = list(iterator)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc else 0
        out = self.fs.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:12]}.fits")

        import pyarrow as pa

        if batches:
            table = pa.Table.from_batches(batches)
        else:
            from pyspark.sql.pandas.types import to_arrow_schema

            table = pa.Table.from_batches([], schema=to_arrow_schema(self.schema))
        n = table.num_rows

        if self.image:
            hdus = [self._image_hdu(table, n, fw)]
        else:
            columns = []
            for field, col in zip(self.schema.fields, table.columns):
                columns.append(
                    self._to_fits_column(field.name, field.dataType, col, n))
            stats_cards = self._stats_cards(table, n) if self.stats else []
            if self.compress:
                hdus = [fw.compressed_bintable_hdu(
                    columns, tile_rows=self.tile_rows, ctypes=self.compress,
                    extra_cards=stats_cards, checksum=self.checksum)]
            else:
                hdus = [fw.bintable_hdu(columns, extra_cards=stats_cards,
                                        checksum=self.checksum)]
        if self.fs.needs_commit_payload:
            # memory:// test FS: serialize here, land driver-side in
            # commit() — the task-attempt → commit shape of an
            # object-store committer
            import io

            buf = io.BytesIO()
            fw.write_fits(out, hdus, checksum=self.checksum, fobj=buf)
            raw = buf.getvalue()
            entry = None
            if self.manifest:
                from spark_fits_spark.fitscore.file import open_hdu

                entry = manifest_entry_from_hdu(
                    open_hdu(io.BytesIO(raw), out, 1), len(raw))
            return FitsCommitMessage(path=out, rows=n, payload=raw,
                                     manifest_entry=entry)
        self.fs.makedirs(self.path)
        with self.fs.open_output(out) as f:
            fw.write_fits(out, hdus, checksum=self.checksum, fobj=f)
        entry = (build_manifest_entry(self.fs, out)
                 if self.manifest else None)
        return FitsCommitMessage(path=out, rows=n, manifest_entry=entry)

    def commit(self, messages):
        for m in messages:
            if m is not None and getattr(m, "payload", None) is not None:
                with self.fs.open_output(m.path) as f:
                    f.write(m.payload)
        if self.manifest:
            entries = {
                m.path.rstrip("/").rsplit("/", 1)[-1]: m.manifest_entry
                for m in messages
                if m is not None and getattr(m, "manifest_entry", None)
            }
            if entries:
                write_manifest(self.fs, self.path, entries)

    _IMAGE_NP = {ShortType: "i2", IntegerType: "i4", LongType: "i8",
                 FloatType: "f4", DoubleType: "f8"}

    def _image_hdu(self, table, n: int, fw) -> bytes:
        """One partition → one IMAGE (or tiled-compressed image) HDU.

        The partition's rows become consecutive image rows in partition
        order: exactly the (Image, ImgIndex) surface the image SCAN
        emits, closing the write side of the round trip (the reference
        is read-only — `FitsSourceRelation.scala` has no
        insert/save path). Uniform row widths and no NULLs are
        required — an image is a dense array, so raggedness is a loud
        error, never padding."""
        import pyarrow.compute as pc

        arr_fields = [(i, f) for i, f in enumerate(self.schema.fields)
                      if isinstance(f.dataType, ArrayType)]
        extra = [f.name for f in self.schema.fields
                 if not isinstance(f.dataType, ArrayType)
                 and f.name != "ImgIndex"]
        if len(arr_fields) != 1 or extra:
            raise ValueError(
                "FITS image writer expects exactly one array<numeric> "
                "column (plus an optional ImgIndex long); got schema "
                f"{self.schema.simpleString()}")
        for f in self.schema.fields:
            if f.name == "ImgIndex" and not isinstance(
                    f.dataType, (ByteType, ShortType, IntegerType,
                                 LongType)):
                raise ValueError(
                    "FITS image writer: ImgIndex must be an integral "
                    f"plane index, got {f.dataType.simpleString()}")
        idx, field = arr_fields[0]
        elem = type(field.dataType.elementType)
        npd = self._IMAGE_NP.get(elem)
        if npd is None:
            raise ValueError(
                f"FITS image writer: unsupported element type "
                f"{field.dataType.elementType.simpleString()} in column "
                f"{field.name!r} (short/int/long/float/double)")
        col = table.column(idx).combine_chunks()
        if n == 0:
            # empty partition: a valid zero-row image part
            return fw.image_hdu(np.empty((0, 0), dtype=npd),
                                checksum=self.checksum)
        if col.null_count or col.flatten().null_count:
            raise ValueError(
                f"FITS image writer: NULLs in column {field.name!r} — "
                "an image is dense; fill undefined pixels (NaN for "
                "float images) before writing")
        lengths = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        width = int(lengths[0])
        if not (lengths == width).all():
            raise ValueError(
                f"FITS image writer: ragged rows in column "
                f"{field.name!r} (widths {int(lengths.min())}.."
                f"{int(lengths.max())}) — image rows must be uniform")
        data = col.flatten().to_numpy(zero_copy_only=False).astype(
            npd).reshape(n, width)
        cards = []
        if self.stats and data.size:
            # standard DATAMIN/DATAMAX cards (finite pixels only)
            finite = data[np.isfinite(data)] if npd[0] == "f" else data
            if finite.size:
                lo, hi = finite.min(), finite.max()
                cards.append(fw._card("DATAMIN", lo.item(),
                                      "minimum finite pixel"))
                cards.append(fw._card("DATAMAX", hi.item(),
                                      "maximum finite pixel"))
        if self.compress:
            return fw.compressed_image_hdu(
                data, self.compress, tile_rows=self.tile_rows,
                extra_cards=cards, checksum=self.checksum,
                quantize_method=self.quantize, zdither0=self.zdither0)
        return fw.image_hdu(data, extra_cards=cards,
                            checksum=self.checksum)

    def _stats_cards(self, table, n: int) -> list[bytes]:
        """Per-column min/max as standard TDMINn/TDMAXn cards — the
        file-level zone map the scan prunes against when filters are
        pushed. Numeric scalar columns only; skipped when the column is
        empty/all-NULL or its extremes are non-finite (a NaN bound
        proves nothing)."""
        import math

        import pyarrow.compute as pc

        from spark_fits_spark.fitscore import writer as fw

        numeric = (ByteType, ShortType, IntegerType, LongType,
                   FloatType, DoubleType)
        cards: list[bytes] = []
        for i, (field, col) in enumerate(
                zip(self.schema.fields, table.columns), start=1):
            if not isinstance(field.dataType, numeric) or n == 0:
                continue
            if col.null_count == n:
                continue
            mm = pc.min_max(col).as_py()
            lo, hi = mm["min"], mm["max"]
            if lo is None or hi is None:
                continue
            if isinstance(lo, float) and not (
                    math.isfinite(lo) and math.isfinite(hi)):
                continue
            cards.append(fw._card(f"TDMIN{i}", lo, f"min of {field.name}"))
            cards.append(fw._card(f"TDMAX{i}", hi, f"max of {field.name}"))
            if isinstance(field.dataType, (FloatType, DoubleType)):
                # Arrow's min_max IGNORES NaN, so finite TDMIN/TDMAX
                # say nothing about NaN rows — and under Spark float
                # semantics NaN orders GREATEST, so it matches x > v
                # for any finite v. Record proven NaN-freeness so the
                # scan may hi-side-prune float columns; without this
                # card _stats_prune keeps the file (r6 fix — a firing
                # prune used to drop NaN rows a parquet-backed Spark
                # query returns).
                if not pc.any(pc.is_nan(col.combine_chunks().drop_null()),
                              min_count=0).as_py():
                    cards.append(fw._card(
                        f"TNANFR{i}", True,
                        f"{field.name} proven NaN-free at write"))
        return cards

    def _to_fits_column(self, name, dtype, col, n):
        import pyarrow.compute as pc

        if isinstance(dtype, StringType):
            vals = col.combine_chunks().fill_null("")
            max_len = pc.max(pc.utf8_length(vals)).as_py() if n else None
            max_len = max(1, max_len or 1)
            width = self._fixed_width(name, True)
            if width is None:
                width = max_len
            elif max_len > width:
                raise ValueError(
                    f"FITS writer: value of length {max_len} in column "
                    f"{name!r} exceeds pinned width {width} "
                    "(stringwidth/colwidths) — refusing to truncate")
            # vectorized pad: object array → fixed S<width> in one pass
            arr = np.asarray(vals.to_numpy(zero_copy_only=False),
                             dtype=f"S{width}")
            return (name, f"{width}A", arr)
        if isinstance(dtype, ArrayType):
            letter, npd = _SCALAR_TFORM[type(dtype.elementType)]
            la = col.combine_chunks()
            lengths = pc.list_value_length(la).fill_null(0)
            lengths = lengths.to_numpy(zero_copy_only=False).astype(np.int64)
            max_len = int(lengths.max()) if n else 0
            repeat = self._fixed_width(name, False)
            if repeat is None and not isinstance(dtype.elementType, BooleanType):
                # default: variable-length (P-descriptor) column — lossless
                # for ragged arrays and schema-stable across part files
                # whose max lengths differ (a fixed repeat of 1 would even
                # collapse to a scalar on read). Pin via colwidths for a
                # fixed-repeat layout.
                flat = la.flatten().to_numpy(zero_copy_only=False)
                return (name, f"P{letter}({max_len})", (lengths, flat))
            if repeat is None:
                repeat = max(1, max_len)
            elif max_len > repeat:
                raise ValueError(
                    f"FITS writer: array of length {max_len} in column "
                    f"{name!r} exceeds pinned repeat {repeat} (colwidths) "
                    "— refusing to truncate")
            # vectorized scatter: flatten() yields valid elements in row
            # order; (row, col) indices from the per-row lengths
            values = la.flatten().to_numpy(zero_copy_only=False)
            arr = np.zeros((n, repeat), dtype=npd)
            if len(values):
                ends = np.cumsum(lengths)
                starts = ends - lengths
                idx_row = np.repeat(np.arange(n), lengths)
                idx_col = np.arange(len(values)) - np.repeat(starts, lengths)
                arr[idx_row, idx_col] = values
            return (name, f"{repeat}{letter}", arr)
        if type(dtype) in _SCALAR_TFORM:
            letter, npd = _SCALAR_TFORM[type(dtype)]
            arr = col.to_numpy(zero_copy_only=False)
            if isinstance(dtype, BooleanType):
                return (name, "L", np.asarray(arr, dtype=bool))
            return (name, letter, np.asarray(arr).astype(npd))
        raise ValueError(
            f"FITS writer: unsupported Spark type {dtype.simpleString()} "
            f"for column {name!r} (supported: bool/byte/short/int/long/"
            "float/double/string/array<numeric>)"
        )
