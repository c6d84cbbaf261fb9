from eviction_lab_etl_spark.sources.loader import TABLES, load, load_all, register_views

__all__ = ["TABLES", "load", "load_all", "register_views"]
