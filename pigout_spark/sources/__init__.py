from pigout_spark.sources.io import load, store

__all__ = ["load", "store"]
