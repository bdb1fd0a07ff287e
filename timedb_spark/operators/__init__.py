from timedb_spark.operators import bitemporal

__all__ = ["bitemporal"]
