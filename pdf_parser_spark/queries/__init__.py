from .suite import ORACLES, SPARK_QUERIES  # noqa: F401
