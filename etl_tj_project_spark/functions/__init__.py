"""Column-expression builders (the engine's scalar-function surface).

Everything here returns native ``pyspark.sql.Column`` expressions — never
row-at-a-time Python UDFs — so the functions stay inside whole-stage
codegen, constant-fold under Catalyst, and push down into scans at 100 TB.
"""

from etl_tj_project_spark.functions.cleaning import (  # noqa: F401
    norm_body,
    nullif_empty,
    to_bool_safe,
)
from etl_tj_project_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_metrics,
    token_count,
    word_shingles,
)
from etl_tj_project_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
