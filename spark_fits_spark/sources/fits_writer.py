"""FITS write support — a sink the reference never had (its
``DefaultSource`` implements no ``CreatableRelationProvider``; SURVEY.md
§2.1 "Sinks: None"). Completes the source/sink story:

    df.write.format("fits").mode("overwrite").save("/out/dir")

Each task writes one ``part-<id>.fits`` file (primary HDU + one BINTABLE
HDU) from its Arrow batches — embarrassingly parallel, no driver
involvement, so it scales with the number of partitions. Reading the
directory back with ``.option("hdu", 1)`` round-trips the DataFrame.

Type mapping (inverse of ``fitscore.types``): boolean→L, byte→B,
short→I, int→J, long→K, float→E, double→D, string→nA (n = longest value
in the partition, min 1), array<numeric>→fixed-repeat vector column.
"""

from __future__ import annotations

import os
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


@dataclass
class FitsCommitMessage(WriterCommitMessage):
    path: str
    rows: int


class FitsArrowWriter(DataSourceArrowWriter):
    def __init__(self, schema: StructType, path: str):
        self.schema = schema
        self.path = path

    def write(self, iterator) -> FitsCommitMessage:
        from pyspark import TaskContext

        from spark_fits_spark.fitscore import writer as fw

        batches = list(iterator)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc else 0
        out = os.path.join(self.path, f"part-{pid:05d}.fits")

        import pyarrow as pa

        if batches:
            table = pa.Table.from_batches(batches)
        else:
            from pyspark.sql.pandas.types import to_arrow_schema

            table = pa.Table.from_batches([], schema=to_arrow_schema(self.schema))
        n = table.num_rows

        columns = []
        for field, col in zip(self.schema.fields, table.columns):
            columns.append(self._to_fits_column(field.name, field.dataType, col, n))
        os.makedirs(self.path, exist_ok=True)
        fw.write_fits(out, [fw.bintable_hdu(columns)])
        return FitsCommitMessage(path=out, rows=n)

    @staticmethod
    def _to_fits_column(name, dtype, col, n):
        import pyarrow as pa

        if isinstance(dtype, StringType):
            vals = col.to_pylist()
            vals = ["" if v is None else v for v in vals]
            width = max(1, max((len(v) for v in vals), default=1))
            return (name, f"{width}A", np.asarray(vals, dtype=f"S{width}"))
        if isinstance(dtype, ArrayType):
            letter, npd = _SCALAR_TFORM[type(dtype.elementType)]
            lists = col.to_pylist()
            repeat = max(1, max((len(v) for v in lists if v is not None), default=1))
            arr = np.zeros((n, repeat), dtype=npd)
            for i, v in enumerate(lists):
                if v:
                    arr[i, : len(v)] = v
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
