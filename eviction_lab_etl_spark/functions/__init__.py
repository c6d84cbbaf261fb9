from eviction_lab_etl_spark.functions.determinism import DEC, RATE, big, dec, to_dbl

__all__ = ["DEC", "RATE", "big", "dec", "to_dbl"]
