from timedb_spark.functions import texttools, vectors

__all__ = ["texttools", "vectors"]
