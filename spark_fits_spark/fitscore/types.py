"""TFORM / BITPIX → (numpy dtype, Spark type) mapping.

Parity targets:
- TFORM → Spark type table: reference ``FitsSchema.scala:42-77``
  (``ReadMyType``); byte widths ``FitsHduBintable.scala:232-294``; element
  decode semantics ``FitsHdu.scala:124-235``.
- 1-element vectors collapse to scalars (``1J`` ≡ ``J``):
  ``FitsSchemaTest.scala:59-70``, ``ReadFitsTest.scala:177-216``.
- ``B`` (FITS unsigned byte) maps to *signed* ByteType — intentionally
  bug-compatible with the reference (``FitsSchema.scala:67``,
  ``FitsHdu.scala:214-217``; see SURVEY.md §7 "Hard parts").
- ``nX`` bit arrays surface as ``array<binary>`` holding the raw bytes
  (``FitsSchema.scala:68``, ``FitsHdu.scala:218-221``).
- unknown TFORM → StringType fallback, zero width, decodes to ``"0"``
  (``FitsSchema.scala:70-75``, ``FitsHdu.scala:227-233``).
- image BITPIX → element type, incl. the BITPIX=8 → logical quirk:
  ``FitsHduImage.scala:100-117``.

Pure Python: imports only ``pyspark.sql.types`` (no JVM needed) + numpy.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
)

# letter → (numpy base dtype string, element byte width, Spark scalar type)
_SCALAR_MAP: dict[str, tuple[str, int, DataType]] = {
    "L": ("S1", 1, BooleanType()),     # ASCII 'T'/'F'  (FitsHdu.scala:209-213)
    "B": ("i1", 1, ByteType()),        # signed on purpose (FitsSchema.scala:67)
    "I": (">i2", 2, ShortType()),
    "J": (">i4", 4, IntegerType()),
    "K": (">i8", 8, LongType()),
    "E": (">f4", 4, FloatType()),
    "D": (">f8", 8, DoubleType()),
}

_TFORM_RE = re.compile(r"^\s*(\d*)\s*([A-Z])")


@dataclass(frozen=True)
class TFormInfo:
    """Parsed TFORM: repeat count, type letter, byte width of the whole
    field, numpy dtype (as a ``(str, shape)`` pair usable in a structured
    dtype), and the Spark DataType."""

    tform: str
    letter: str
    repeat: int
    byte_width: int
    numpy_dtype: object  # str or (str, (n,))
    spark_type: DataType
    # variable-length array columns (P/Q descriptors): the element type
    # letter; None for ordinary fixed-width columns
    var_letter: str | None = None

    @property
    def is_array(self) -> bool:
        return isinstance(self.spark_type, ArrayType) and self.letter != "X"

    @property
    def is_varlen(self) -> bool:
        return self.var_letter is not None


def parse_tform(tform: str) -> TFormInfo:
    """Parse a TFORM value like ``'10A'``, ``'1J'``, ``'E'``, ``'3I'``.

    Unknown letters fall back to StringType with zero width and a
    warning, matching ``FitsSchema.scala:70-75``.
    """
    m = _TFORM_RE.match(tform.strip())
    if not m:
        return TFormInfo(tform, "?", 1, 0, "S0", StringType())
    repeat = int(m.group(1)) if m.group(1) else 1
    letter = m.group(2)

    if letter == "A":
        # fixed-width string of `repeat` chars; never an array
        return TFormInfo(tform, "A", repeat, repeat, f"S{repeat}", StringType())
    if letter == "X":
        nbytes = max(1, (repeat + 7) // 8)
        return TFormInfo(tform, "X", repeat, nbytes, f"V{nbytes}", ArrayType(BinaryType(), True))
    if letter in _SCALAR_MAP:
        np_base, width, spark_scalar = _SCALAR_MAP[letter]
        if repeat == 1:
            return TFormInfo(tform, letter, 1, width, np_base, spark_scalar)
        return TFormInfo(
            tform, letter, repeat, width * repeat, (np_base, (repeat,)),
            ArrayType(spark_scalar, True),
        )
    if letter in ("P", "Q"):
        # variable-length array descriptor: rPt(emax) — r∈{0,1}; the row
        # stores (count, heap offset) as 2×int32 (P) or 2×int64 (Q).
        # Beyond-reference: the reference has no VLA support at all (its
        # own varitab.fits fixture sits untested; unknown TFORMs fall to
        # string "0"s, FitsSchema.scala:70-75). Elements decode from the
        # heap with fixed-width semantics; C/M complex surface as
        # interleaved (re, im) float arrays.
        vm = re.match(r"^\s*\d*\s*[PQ]([A-Z])", tform.strip())
        var_letter = vm.group(1) if vm else "B"
        if letter == "P":
            width, np_desc = 8, (">i4", (2,))
        else:
            width, np_desc = 16, (">i8", (2,))
        if var_letter == "A":
            spark = StringType()
        elif var_letter in _SCALAR_MAP:
            spark = ArrayType(_SCALAR_MAP[var_letter][2], True)
        elif var_letter == "X":
            spark = ArrayType(BinaryType(), True)
        elif var_letter == "C":
            spark = ArrayType(FloatType(), True)
        elif var_letter == "M":
            spark = ArrayType(DoubleType(), True)
        else:
            spark = ArrayType(ByteType(), True)
        return TFormInfo(tform, letter, repeat, width, np_desc, spark, var_letter)
    # unknown TFORM (e.g. C/M complex scalars): StringType fallback,
    # zero byte width, decodes to "0" (FitsSchema.scala:70-75)
    import warnings

    warnings.warn(f"Unknown TFORM {tform!r}: falling back to StringType with 0 width")
    return TFormInfo(tform, letter, repeat, 0, "S0", StringType())


def tform_to_spark_type(tform: str) -> DataType:
    return parse_tform(tform).spark_type


_BITPIX_TO_TFORM = {8: "L", 16: "I", 32: "J", 64: "K", -32: "E", -64: "D"}


def bitpix_to_tform(bitpix: int) -> str:
    """Image element type letter from BITPIX (``FitsHduImage.scala:100-117``).

    Note BITPIX=8 → ``'L'`` (boolean) is a reference quirk we preserve.
    """
    try:
        return _BITPIX_TO_TFORM[int(bitpix)]
    except KeyError:
        raise ValueError(f"Cannot infer image element type from BITPIX={bitpix}")


# -- TSCAL/TZERO physical-value typing (opt-in scaling mode) ------------
#
# The reference ignores TSCALn/TZEROn/TNULLn entirely (SURVEY.md §1.2
# "Not supported"); with .option("scaling", True) we decode physical
# values per the FITS standard: physical = raw * TSCAL + TZERO, with
# TNULL raw sentinels becoming SQL NULLs.

_INT_LETTERS = ("B", "I", "J", "K")
# the standard unsigned-int convention: TSCAL=1 and TZERO=2^(bits-1)
# (for B the convention is inverted — raw is unsigned, TZERO=-128 makes
# it signed; raw B is decoded unsigned in scaling mode)
_UNSIGNED_TZERO = {"I": 32768.0, "J": 2147483648.0, "K": 9223372036854775808.0}


def scaled_spark_type(info: TFormInfo, tscal: float, tzero: float) -> DataType:
    """Spark type of the physical (scaled) value of a column.

    - identity scaling → the parity type, except B which widens to
      ShortType (raw FITS bytes are unsigned 0..255)
    - unsigned-convention integers (TSCAL=1, TZERO=2^(bits-1)) →
      next-wider signed type (K → Decimal(20,0): uint64 range)
    - integral TSCAL/TZERO on integer columns → LongType (exact)
    - anything else → DoubleType
    """
    from pyspark.sql.types import DecimalType

    def elem(spark_scalar: DataType) -> DataType:
        if info.repeat > 1 and info.letter != "A":
            return ArrayType(spark_scalar, True)
        return spark_scalar

    if info.letter not in _INT_LETTERS and info.letter not in ("E", "D"):
        return info.spark_type  # L/A/X/unknown: scaling not applicable
    if tscal == 1.0 and tzero == 0.0:
        if info.letter == "B":
            return elem(ShortType())  # true unsigned byte range
        return info.spark_type
    if info.letter in _INT_LETTERS and tscal == 1.0:
        if info.letter == "B" and tzero == -128.0:
            return elem(ByteType())
        if tzero == _UNSIGNED_TZERO.get(info.letter):
            return elem({
                "I": IntegerType(), "J": LongType(),
                "K": DecimalType(20, 0),
            }[info.letter])
    if (
        info.letter in _INT_LETTERS
        and info.letter != "K"
        and float(tscal).is_integer() and float(tzero).is_integer()
    ):
        return elem(LongType())
    return elem(DoubleType())
