from vectordbfaiss_spark.plans.ivf import (  # noqa: F401
    assign_clusters,
    build_ivf_index,
    ivf_search,
)
