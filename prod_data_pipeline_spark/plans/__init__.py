from prod_data_pipeline_spark.plans.queries import QUERIES, QuerySpec  # noqa: F401
