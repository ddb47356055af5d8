from prod_data_pipeline_spark.functions.vector import (  # noqa: F401
    cosine_sim,
    dot,
    l2_norm,
    to_double_array,
)
from prod_data_pipeline_spark.functions.text import (  # noqa: F401
    distinct_tokens,
    shingles,
    tokens,
)
