"""fitscore — pure-Python FITS container parsing (no Spark dependency).

This is the new-engine analog of the reference's low-level Scala library
(``FitsLib.scala``, ``FitsHdu.scala``, ``FitsHduBintable.scala``,
``FitsHduImage.scala``, ``FitsSchema.scala``): header-block reading, card
parsing, HDU boundary walking, TFORM/BITPIX type mapping, and numpy
structured-dtype construction for vectorized decode.

Public surface (parity map, reference file:line in each docstring):

- :func:`~spark_fits_spark.fitscore.header.read_header` /
  :func:`~spark_fits_spark.fitscore.header.parse_cards`
- :func:`~spark_fits_spark.fitscore.file.get_block_boundaries` /
  :func:`~spark_fits_spark.fitscore.file.get_n_hdu` /
  :func:`~spark_fits_spark.fitscore.file.open_hdu`
- :mod:`~spark_fits_spark.fitscore.types` — TFORM → (numpy dtype, Spark type)
- :mod:`~spark_fits_spark.fitscore.writer` — minimal FITS writer (tests only)
"""

from spark_fits_spark.fitscore.constants import (
    FITS_BLOCK_SIZE,
    FITS_CARD_SIZE,
    FITS_CARDS_PER_BLOCK,
)
from spark_fits_spark.fitscore.header import parse_cards, read_header, short_string_value
from spark_fits_spark.fitscore.file import (
    BlockBoundaries,
    HduInfo,
    get_block_boundaries,
    get_n_hdu,
    open_hdu,
)
from spark_fits_spark.fitscore.types import (
    TFormInfo,
    parse_tform,
    tform_to_spark_type,
    bitpix_to_tform,
)

__all__ = [
    "FITS_BLOCK_SIZE",
    "FITS_CARD_SIZE",
    "FITS_CARDS_PER_BLOCK",
    "parse_cards",
    "read_header",
    "short_string_value",
    "BlockBoundaries",
    "HduInfo",
    "get_block_boundaries",
    "get_n_hdu",
    "open_hdu",
    "TFormInfo",
    "parse_tform",
    "tform_to_spark_type",
    "bitpix_to_tform",
]
