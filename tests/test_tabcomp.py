"""Tiled TABLE compression (fpack table convention, fitscore.tabcomp):
column-wise tile codecs for bintables, transparent scan with the
logical schema, I/O-level column pruning, sink integration. The
reference has no table compression (beyond-reference)."""

import gzip
import os

import numpy as np
import pytest

from spark_fits_spark.fitscore import tabcomp
from spark_fits_spark.fitscore import writer as fw


def _cols(n):
    return [
        ("target", "10A", np.array([f"OBJ{i:06d}" for i in range(n)])),
        ("RA", "E", (np.arange(n) * 0.001).astype(">f4")),
        ("Dec", "D", np.arange(n) * 0.5),
        ("Index", "K", np.arange(n, dtype=">i8")),
        ("RunId", "I", (np.arange(n) % 7).astype(">i2")),
        ("flag", "L", (np.arange(n) % 3 == 0)),
        ("vec", "3J", np.arange(3 * n, dtype=">i4").reshape(n, 3)),
        ("b", "B", (np.arange(n) % 100).astype("i1")),
    ]


def _read(spark, path, **opts):
    r = spark.read.format("fits").option("hdu", 1)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(path)


@pytest.mark.parametrize("codec", ["GZIP_1", "GZIP_2"])
@pytest.mark.parametrize("tile_rows", [128, 1000, 37])
def test_comptable_scan_matches_plain(spark, tmp_path, codec, tile_rows):
    """Every column type through the compressed path decodes exactly
    like the plain path (the converters are shared by construction, so
    this pins the tiling/codec plumbing, incl. non-dividing final
    tiles)."""
    n = 300
    plain, comp = str(tmp_path / "p.fits"), str(tmp_path / "c.fits")
    fw.write_fits(plain, [fw.bintable_hdu(_cols(n))])
    fw.write_fits(comp, [fw.compressed_bintable_hdu(
        _cols(n), tile_rows=tile_rows, ctypes=codec)])
    a = sorted(map(tuple, _read(spark, plain).collect()))
    b = sorted(map(tuple, _read(spark, comp).collect()))
    assert len(b) == n and a == b


def test_comptable_rice_integer_columns(spark, tmp_path):
    """RICE_1 on B/I/J integer columns (fpack's int codec applied
    column-wise); K/float/string columns reject it loud."""
    n = 500
    cols = _cols(n)
    comp = str(tmp_path / "r.fits")
    fw.write_fits(comp, [fw.compressed_bintable_hdu(
        cols, tile_rows=100,
        ctypes={"RunId": "RICE_1", "vec": "RICE_1", "b": "RICE_1"})])
    plain = str(tmp_path / "p.fits")
    fw.write_fits(plain, [fw.bintable_hdu(cols)])
    assert (sorted(map(tuple, _read(spark, comp).collect()))
            == sorted(map(tuple, _read(spark, plain).collect())))
    with pytest.raises(NotImplementedError, match="B/I/J"):
        fw.compressed_bintable_hdu(cols, ctypes={"Index": "RICE_1"})
    with pytest.raises(NotImplementedError, match="B/I/J"):
        fw.compressed_bintable_hdu(cols, ctypes={"RA": "RICE_1"})


def test_comptable_rejections(spark, tmp_path):
    # VLA logical columns cannot be tile-compressed
    with pytest.raises(NotImplementedError, match="variable-length"):
        fw.compressed_bintable_hdu([
            ("v", "PK(3)", (np.array([1, 2]),
                            np.arange(3, dtype=">i8")))])
    # unknown codec rejects loud at write and at scan planning
    with pytest.raises(Exception, match="PLIO"):
        fw.compressed_bintable_hdu(_cols(4), ctypes="PLIO_1")
    p = str(tmp_path / "bad.fits")
    hdu = fw.compressed_bintable_hdu(_cols(8), tile_rows=4)
    # corrupt the codec card: ZCTYP1 GZIP_2 -> PLIO_1
    hdu = hdu.replace(b"'GZIP_2  '", b"'PLIO_1  '", 1)
    fw.write_fits(p, [hdu])
    with pytest.raises(Exception, match="PLIO_1"):
        _read(spark, p).schema


def test_comptable_column_pruning_skips_bytes(tmp_path):
    """Column pruning on a compressed table skips the pruned columns'
    BYTES: the decoder opens exactly one heap window per SELECTED
    column — pruning cuts I/O, not just decode (the at-scale win of
    column-major tiles)."""
    import io

    from spark_fits_spark.fitscore.file import open_hdu

    p = str(tmp_path / "c.fits")
    fw.write_fits(p, [fw.compressed_bintable_hdu(_cols(200),
                                                 tile_rows=50)])
    with open(p, "rb") as f:
        hdu = open_hdu(f, p, 1)
        f.seek(hdu.boundaries.data_start)
        buf = f.read(hdu.n_rows * hdu.row_bytes)
        heap_base = hdu.boundaries.data_start + hdu.theap
        raw = open(p, "rb").read()
    windows = []

    def heap_read(off, length):
        windows.append((off, length))
        return raw[heap_base + off:heap_base + off + length]

    from pyspark.sql.pandas.types import to_arrow_schema

    from spark_fits_spark.sources.fits_datasource import _bintable_schema

    schema = to_arrow_schema(_bintable_schema(hdu))
    sel = [3]  # Index only
    batch = tabcomp.decode_compressed_table(
        buf, hdu, 0, schema.empty_table().select(["Index"]).schema,
        sel, heap_read)
    assert batch.num_rows == 200
    assert batch.column(0).to_pylist() == list(range(200))
    assert len(windows) == 1  # ONE window, for the one selected column


def test_comptable_scaling_transparency(spark, tmp_path):
    """TSCAL/TZERO physical-value decode is identical through the
    compressed and plain paths (cards refer to logical columns)."""
    n = 60
    cols = [("raw", "I", (np.arange(n) - 30).astype(">i2"))]
    cards = [fw._card("TSCAL1", 0.5), fw._card("TZERO1", 100.0)]
    plain, comp = str(tmp_path / "p.fits"), str(tmp_path / "c.fits")
    fw.write_fits(plain, [fw.bintable_hdu(cols, extra_cards=cards)])
    fw.write_fits(comp, [fw.compressed_bintable_hdu(
        cols, tile_rows=16, extra_cards=cards)])
    a = sorted(r["raw"] for r in _read(spark, plain,
                                       scaling=True).collect())
    b = sorted(r["raw"] for r in _read(spark, comp,
                                       scaling=True).collect())
    assert a == b and a[0] == 100.0 + 0.5 * (-30)


def test_comptable_sink_option(spark, tmp_path):
    """df.write.format('fits').option('compress', 'GZIP_2') writes
    tile-compressed tables; the scan is transparent, zone-map stats
    cards still prune, and the files are materially smaller."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import LessThan

    from spark_fits_spark.sources.fits_datasource import (
        FitsDataSource, _HDU_CACHE,
    )

    df = spark.range(20000).select(
        F.col("id").alias("Index"),
        (F.col("id") % 100).cast("int").alias("m"),
        F.concat(F.lit("row"), F.col("id")).alias("s"))
    dc = str(tmp_path / "comp")
    dp = str(tmp_path / "plain")
    (df.repartitionByRange(4, "Index").write.format("fits")
     .option("compress", "GZIP_2").option("tilerows", 2000)
     .mode("overwrite").save(dc))
    (df.repartitionByRange(4, "Index").write.format("fits")
     .mode("overwrite").save(dp))
    size = lambda d: sum(os.path.getsize(os.path.join(d, f))
                         for f in os.listdir(d) if f.endswith(".fits"))
    assert size(dc) < size(dp) * 0.8
    a = _read(spark, dc).agg(F.count("*"), F.sum("Index"),
                             F.sum("m")).first()
    b = _read(spark, dp).agg(F.count("*"), F.sum("Index"),
                             F.sum("m")).first()
    assert tuple(a) == tuple(b)
    # stats cards prune whole compressed files too
    ds = FitsDataSource(options={"path": dc, "hdu": "1"})
    r = ds.reader(ds.schema())
    _HDU_CACHE.clear()
    list(r.pushFilters([LessThan(("Index",), 1000)]))
    kept = {p.hdu.path for p in r.partitions() if p.hdu is not None}
    assert len(kept) == 1


def test_comptable_empty_and_checksum(spark, tmp_path):
    p = str(tmp_path / "e.fits")
    fw.write_fits(p, [fw.compressed_bintable_hdu(_cols(0),
                                                 checksum=True)])
    assert _read(spark, p).count() == 0
    import spark_fits_spark as sfs

    p2 = str(tmp_path / "k.fits")
    fw.write_fits(p2, [fw.compressed_bintable_hdu(_cols(64),
                                                  tile_rows=16,
                                                  checksum=True)],
                  checksum=True)
    rows = sfs.fits_verify_checksums(spark, p2).collect()
    assert all(r["checksum_ok"] in (True, None) for r in rows)
    info = {r["hdu"]: r["compression"]
            for r in sfs.fits_info(spark, p2).collect()}
    assert info[1] == "TILED_TABLE"


def test_fits_recompress_tables_mode(spark, tmp_path):
    """fits_recompress(tables=True) — fpack's -table mode: BINTABLE
    HDUs rewrite as tiled-compressed tables with their per-column
    cards (TSCAL/TZERO, EXTNAME) carried over; VLA tables stay
    byte-verbatim; rows and scaled values round-trip exactly."""
    import spark_fits_spark as sfs

    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    n = 2000
    cards = [fw._card("TSCAL1", 2.0), fw._card("TZERO1", 10.0),
             fw._card("EXTNAME", "CAT")]
    fw.write_fits(str(src / "t.fits"), [fw.bintable_hdu(
        [("v", "I", (np.arange(n) % 50).astype(">i2")),
         ("name", "8A", np.array([f"N{i:05d}" for i in range(n)])),
         ("flag", "L", np.arange(n) % 2 == 0)],
        extra_cards=cards)])
    fw.write_fits(str(src / "vla.fits"), [fw.bintable_hdu(
        [("r", "PK(3)", (np.array([1, 3]), np.arange(4, dtype=">i8")))])])
    rep = {r["file"].rsplit("/", 1)[-1]: r for r in
           sfs.fits_recompress(spark, str(src), str(dst),
                               tables=True).collect()}
    assert (rep["t.fits"]["hdus_converted"],
            rep["t.fits"]["hdus_copied"]) == (1, 0)
    assert (rep["vla.fits"]["hdus_converted"],
            rep["vla.fits"]["hdus_copied"]) == (0, 1)
    a = _read(spark, str(src / "t.fits"))
    b = _read(spark, str(dst / "t.fz.fits"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple,
                                                         b.collect()))
    asc = sorted(r["v"] for r in _read(spark, str(src / "t.fits"),
                                       scaling=True).collect())
    bsc = sorted(r["v"] for r in _read(spark, str(dst / "t.fz.fits"),
                                       scaling=True).collect())
    assert asc == bsc and asc[0] == 10.0  # 0*2+10: scaling cards rode
    assert _read(spark, str(dst / "t.fz.fits"), hdu="CAT").count() == n
    assert _read(spark, str(dst / "vla.fz.fits")).count() == 2


def test_comptable_gzip2_payloads_are_standard_gzip(tmp_path):
    """Interop evidence at the byte level: each (tile, column) cell is
    a plain RFC-1952 gzip stream of the column's (shuffled) bytes."""
    from spark_fits_spark.fitscore.file import open_hdu

    p = str(tmp_path / "c.fits")
    fw.write_fits(p, [fw.compressed_bintable_hdu(
        [("Index", "K", np.arange(40, dtype=">i8"))], tile_rows=40)])
    with open(p, "rb") as f:
        hdu = open_hdu(f, p, 1)
        f.seek(hdu.boundaries.data_start)
        desc = np.frombuffer(f.read(8), dtype=">i4")
        f.seek(hdu.boundaries.data_start + hdu.theap + int(desc[1]))
        payload = f.read(int(desc[0]))
    raw = gzip.decompress(payload)  # a standard tool can read the cell
    shuffled = tabcomp.unshuffle_bytes(raw, 8)
    assert np.array_equal(np.frombuffer(shuffled, dtype=">i8"),
                          np.arange(40))


# ---------- property-based compressed-table parity (hypothesis) ----------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


def _ds_rows(path):
    """Read every row through the Python-datasource scan path (no
    Spark session): plan partitions, read Arrow batches, return a
    column-name -> values dict."""
    import pickle

    from spark_fits_spark.sources.fits_datasource import (
        FitsDataSource, FitsScanReader,
    )

    ds = FitsDataSource(options={"path": path, "hdu": "1"})
    reader = FitsScanReader(path, 1, ds.schema(), None, None,
                            "PERMISSIVE", 8 * 1024 * 1024, False)
    out = {}
    for part in reader.partitions():
        part = pickle.loads(pickle.dumps(part))  # executor ship
        for b in reader.read(part):
            d = b.to_pydict()
            for k, v in d.items():
                out.setdefault(k, []).extend(v)
    return out


if _HAVE_HYP:
    import math as _math

    _TFORMS = ["E", "D", "I", "J", "K", "B", "L", "8A", "3J", "2E"]

    @settings(max_examples=25, deadline=None)
    @given(
        tforms=st.lists(st.sampled_from(_TFORMS), min_size=1,
                        max_size=5),
        n_rows=st.integers(min_value=1, max_value=400),
        tile_rows=st.integers(min_value=1, max_value=173),
        codec=st.sampled_from(["GZIP_1", "GZIP_2"]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        specials=st.booleans(),
    )
    def test_comptable_parity_property(tforms, n_rows, tile_rows,
                                       codec, seed, specials):
        """Value-level fuzz the deterministic matrix doesn't reach:
        random schemas × dtype-extreme values (int bounds, NaN/±Inf/
        ±0/subnormals in floats) × arbitrary tile_rows (1-row tiles,
        tiles ≫ table, non-dividing boundaries) through BOTH write
        paths, then bit-exact parity between the plain and compressed
        scans via the actual datasource partition reader."""
        import re as _re
        import tempfile

        rng = np.random.RandomState(seed)
        cols = []
        for i, tf in enumerate(tforms):
            m = _re.match(r"(\d*)([A-Z])", tf)
            rep, code = int(m.group(1) or 1), m.group(2)
            shape = (n_rows, rep) if (rep > 1 and code != "A") else n_rows
            if code == "A":
                vals = np.array(
                    [f"s{rng.randint(0, 10**6)}" for _ in range(n_rows)])
            elif code == "L":
                vals = rng.randint(0, 2, shape).astype(bool)
            elif code == "B":
                vals = rng.randint(-128, 128, shape).astype("i1")
            elif code in ("I", "J", "K"):
                dt = {"I": ">i2", "J": ">i4", "K": ">i8"}[code]
                lim = {"I": 2**15, "J": 2**31, "K": 2**62}[code]
                vals = rng.randint(-lim, lim, shape).astype(dt)
                flat = vals.reshape(-1)
                if specials and flat.size >= 2:
                    flat[0], flat[1] = lim - 1, -lim
            else:
                dt = ">f4" if code == "E" else ">f8"
                vals = rng.randn(*(shape if isinstance(shape, tuple)
                                   else (shape,))).astype(dt)
                flat = vals.reshape(-1)
                if specials and flat.size >= 5:
                    flat[0], flat[1], flat[2], flat[3], flat[4] = (
                        np.nan, np.inf, -np.inf, -0.0, 5e-324)
            cols.append((f"c{i}", tf, vals))

        with tempfile.TemporaryDirectory() as d:
            plain = os.path.join(d, "p.fits")
            comp = os.path.join(d, "c.fits")
            fw.write_fits(plain, [fw.bintable_hdu(cols)])
            fw.write_fits(comp, [fw.compressed_bintable_hdu(
                cols, tile_rows=tile_rows, ctypes=codec)])
            a, b = _ds_rows(plain), _ds_rows(comp)

        assert list(a) == list(b)

        def _eq(x, y):
            if isinstance(x, float):
                return (_math.isnan(x) and _math.isnan(y)) or x == y
            return x == y

        for name in a:
            assert len(a[name]) == n_rows == len(b[name]), name
            for r, (x, y) in enumerate(zip(a[name], b[name])):
                if isinstance(x, list):
                    assert len(x) == len(y) and all(
                        _eq(p, q) for p, q in zip(x, y)), (name, r)
                else:
                    assert _eq(x, y), (name, r, x, y)


if _HAVE_HYP:
    _VLA_LETTERS = ["J", "K", "E", "D", "I", "B"]

    @settings(max_examples=25, deadline=None)
    @given(
        letters=st.lists(st.sampled_from(_VLA_LETTERS), min_size=1,
                         max_size=4),
        pq=st.sampled_from(["P", "Q"]),
        n_rows=st.integers(min_value=1, max_value=200),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        specials=st.booleans(),
    )
    def test_vla_roundtrip_property(letters, pq, n_rows, seed,
                                    specials):
        """Variable-length-array fuzz: random ragged shapes (zero-
        length rows included) × P/Q descriptor widths × dtype-extreme
        element values, written as heap VLA columns and read back
        through the datasource scan path — per-row lists must match
        exactly. Pins descriptor/heap offset arithmetic the fixed
        deterministic cases can't exhaust."""
        import math as _m
        import tempfile

        rng = np.random.RandomState(seed)
        cols, expect = [], {}
        for i, letter in enumerate(letters):
            lengths = rng.randint(0, 10, n_rows)
            if n_rows >= 3:
                lengths[0] = 0          # leading empty row
                lengths[n_rows // 2] = 0
            total = int(lengths.sum())
            if letter in ("J", "K", "I", "B"):
                lim = {"B": 2**7, "I": 2**15, "J": 2**31, "K": 2**62}[letter]
                flat = rng.randint(-lim, lim, total)
                if specials and total >= 2:
                    flat[0], flat[1] = lim - 1, -lim
            else:
                flat = rng.randn(total)
                if specials and total >= 4:
                    flat[0], flat[1], flat[2], flat[3] = (
                        np.nan, np.inf, -np.inf, -0.0)
                if letter == "E":
                    flat = flat.astype(">f4").astype(float)
            name = f"v{i}"
            cols.append((name, f"{pq}{letter}", (lengths, np.asarray(flat))))
            out, pos = [], 0
            for ln in lengths:
                out.append(list(np.asarray(flat)[pos:pos + ln]))
                pos += ln
            expect[name] = out

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "v.fits")
            fw.write_fits(path, [fw.bintable_hdu(cols)])
            got = _ds_rows(path)

        def _eq(x, y):
            if isinstance(x, float):
                return (_m.isnan(x) and _m.isnan(float(y))) or x == y
            return x == y

        for name, rows in expect.items():
            assert len(got[name]) == n_rows
            for r, (g, e) in enumerate(zip(got[name], rows)):
                assert len(g) == len(e), (name, r, len(g), len(e))
                e = [x.item() if isinstance(x, np.generic) else x
                     for x in e]
                assert all(_eq(gv, ev) for gv, ev in zip(g, e)), (
                    name, r, g, e)


if _HAVE_HYP:
    @settings(max_examples=30, deadline=None)
    @given(
        letter=st.sampled_from(["B", "I", "J", "K", "E", "D"]),
        convention=st.sampled_from(["unsigned", "signed_byte",
                                    "integer", "float", "identity"]),
        n_rows=st.integers(min_value=1, max_value=200),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        with_tnull=st.booleans(),
    )
    def test_scaling_decode_property(letter, convention, n_rows, seed,
                                     with_tnull):
        """TSCAL/TZERO physical-value fuzz across every decode branch
        — identity, the unsigned conventions (I+32768, J+2^31,
        K+2^63 → exact decimal, B−128 signed byte), integer-exact
        scaling, and the float64 fallback — with TNULL sentinels
        planted when the column is integral. Expected values computed
        independently with exact Python arithmetic."""
        import tempfile

        rng = np.random.RandomState(seed)
        dt = {"B": "i1", "I": ">i2", "J": ">i4", "K": ">i8",
              "E": ">f4", "D": ">f8"}[letter]
        is_int = letter in ("B", "I", "J", "K")
        lim = {"B": 2**7, "I": 2**15, "J": 2**31, "K": 2**62}.get(letter, 0)
        if is_int:
            raw = rng.randint(-lim, lim, n_rows).astype(dt)
        else:
            raw = rng.randn(n_rows).astype(dt)

        if convention == "unsigned" and letter in ("I", "J", "K"):
            tscal, tzero = 1.0, float(2 ** ({"I": 15, "J": 31, "K": 63}[letter]))
        elif convention == "signed_byte" and letter == "B":
            tscal, tzero = 1.0, -128.0
        elif convention == "integer" and letter in ("B", "I", "J"):
            tscal = float(rng.randint(1, 1000))
            tzero = float(rng.randint(-10**6, 10**6))
        elif convention == "float":
            tscal = float(rng.uniform(0.001, 10.0))
            tzero = float(rng.uniform(-100, 100))
        else:
            tscal, tzero = 1.0, 0.0

        tnull = None
        if with_tnull and is_int and n_rows >= 2:
            # plant the sentinel in row 0 — in the space the decoder
            # compares in (B is matched on the unsigned view)
            tnull = int(raw[0]) & 0xFF if letter == "B" else int(raw[0])
        cards = [fw._card(f"TSCAL1", tscal, "scale"),
                 fw._card(f"TZERO1", tzero, "zero point")]
        if tnull is not None:
            cards.append(fw._card("TNULL1", tnull, "null sentinel"))

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "s.fits")
            fw.write_fits(path, [fw.bintable_hdu(
                [("x", letter, raw)], extra_cards=cards)])
            from spark_fits_spark.sources.fits_datasource import (
                FitsDataSource, FitsScanReader,
            )

            ds = FitsDataSource(options={"path": path, "hdu": "1",
                                         "scaling": "true"})
            reader = FitsScanReader(path, 1, ds.schema(), None, None,
                                    "PERMISSIVE", 8 * 1024 * 1024,
                                    False, scaling=True)
            got = []
            for part in reader.partitions():
                for b in reader.read(part):
                    got.extend(b.column(0).to_pylist())

        # independent expected: exact Python arithmetic per branch
        import decimal
        import math as _m

        expect = []
        for v in raw:
            v = int(v) if is_int else float(v)
            if letter == "B":
                # scaling mode ALWAYS reads B as the standard's
                # unsigned byte, even under identity TSCAL/TZERO
                v = v & 0xFF
            if tnull is not None and v == tnull:
                expect.append(None)
            elif (tscal, tzero) == (1.0, 0.0):
                expect.append(v)
            elif letter == "K" and tscal == 1.0 and tzero == 2.0**63:
                expect.append(v + 2**63)  # exact (decimal path)
            elif is_int and letter != "K" and float(tscal).is_integer() \
                    and float(tzero).is_integer():
                expect.append(v * int(tscal) + int(tzero))
            else:
                expect.append(float(v) * tscal + tzero)

        assert len(got) == n_rows
        for r, (g, e) in enumerate(zip(got, expect)):
            if e is None:
                assert g is None, (r, g)
            elif isinstance(e, float):
                assert (isinstance(g, float)
                        and ((_m.isnan(g) and _m.isnan(e)) or g == e)), (r, g, e)
            elif isinstance(g, decimal.Decimal):
                assert int(g) == e, (r, g, e)
            else:
                assert g == e, (r, g, e)


if _HAVE_HYP:
    @settings(max_examples=30, deadline=None)
    @given(
        n_rows=st.integers(min_value=1, max_value=500),
        partition_rows=st.integers(min_value=1, max_value=97),
        bounds=st.tuples(st.integers(0, 520), st.integers(0, 520)),
        compressed_image=st.booleans(),
        tile_rows=st.integers(min_value=1, max_value=37),
    )
    def test_rowrange_pushdown_property(n_rows, partition_rows, bounds,
                                        compressed_image, tile_rows):
        """rowrange [a,b) soundness over random table/partition/tile
        geometry: the scan must return EXACTLY the rows in
        [a, b) ∩ [0, n) — for plain bintables (byte-range partitions)
        and tile-compressed images (logical rows map to overlapping
        tiles, boundary tiles decode-then-slice). Neither a lost
        boundary row nor a duplicated one survives this."""
        import tempfile

        a, b = min(bounds), max(bounds)
        if a == b:
            b = a + 1
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "rr.fits")
            if compressed_image:
                width = 8
                img = np.arange(n_rows * width,
                                dtype="i4").reshape(n_rows, width)
                fw.write_fits(path, [fw.compressed_image_hdu(
                    img, "GZIP_1", tile_rows=tile_rows)])
                id_of = lambda row: row[0][0] // width  # first px / width
            else:
                fw.write_fits(path, [fw.bintable_hdu(
                    [("rid", "K", np.arange(n_rows, dtype=">i8"))])])
                id_of = lambda row: row[0]

            from spark_fits_spark.sources.fits_datasource import (
                FitsDataSource, FitsScanReader,
            )

            ds = FitsDataSource(options={"path": path, "hdu": "1"})
            row_bytes = 8 * (width if compressed_image else 1)
            reader = FitsScanReader(
                path, 1, ds.schema(), None, None, "PERMISSIVE",
                max(1, partition_rows * row_bytes), False,
                rowrange=(a, b))
            got = []
            for part in reader.partitions():
                for batch in reader.read(part):
                    cols = [batch.column(i).to_pylist()
                            for i in range(batch.num_columns)]
                    got.extend(id_of(r) for r in zip(*cols))

        expect = list(range(min(a, n_rows), min(b, n_rows)))
        assert sorted(got) == expect, (
            f"rowrange [{a},{b}) over n={n_rows} "
            f"(comp={compressed_image}, tiles={tile_rows}): "
            f"got {len(got)} rows, want {len(expect)}")
