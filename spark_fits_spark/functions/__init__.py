from spark_fits_spark.functions import text

__all__ = ["text"]
