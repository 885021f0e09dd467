from spark_fits_spark.operators import (
    dedup,
    images,
    multimodal,
    relational,
    sample,
    similarity,
    sketch,
)

__all__ = ["dedup", "images", "multimodal", "relational", "sample",
           "similarity", "sketch"]
