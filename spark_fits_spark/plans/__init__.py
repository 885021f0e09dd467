from spark_fits_spark.plans.session import build_session, tuned_conf

__all__ = ["build_session", "tuned_conf"]
