from vectordbfaiss_spark.operators.topk import topk_search  # noqa: F401
