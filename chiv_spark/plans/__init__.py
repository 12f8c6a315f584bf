from chiv_spark.plans.explain import op_counts, physical_plan, pushed_filters, read_schema

__all__ = ["op_counts", "physical_plan", "pushed_filters", "read_schema"]
