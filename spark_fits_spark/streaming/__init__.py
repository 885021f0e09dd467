from spark_fits_spark.streaming import events

__all__ = ["events"]
