from vectordbfaiss_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)
from vectordbfaiss_spark.functions.text import (  # noqa: F401
    chunk_text,
    filename_stem,
    hash_embed_udf,
    strip_html_names,
    tokenize,
)
