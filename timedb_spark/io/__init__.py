from timedb_spark.io.tables import TABLE_NAMES, bitemporal_frame, load_table, load_tables

__all__ = ["TABLE_NAMES", "bitemporal_frame", "load_table", "load_tables"]
