from spark_fits_spark.sources.fits_datasource import FitsDataSource

__all__ = ["FitsDataSource"]
