from pigout_spark.plans.multiquery import MultiSinkPlan, store_many

__all__ = ["MultiSinkPlan", "store_many"]
