from quackosm_spark.geometry import model, ops, wkb

__all__ = ["model", "ops", "wkb"]
