from zg_etl_spark.operators import domain, registries

__all__ = ["domain", "registries"]
