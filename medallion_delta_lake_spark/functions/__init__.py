from medallion_delta_lake_spark.functions.geo import haversine_km
from medallion_delta_lake_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from medallion_delta_lake_spark.functions.texts import (
    normalize_text,
    shingles,
    tokenize,
)

__all__ = [
    "haversine_km",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "normalize_text",
    "shingles",
    "tokenize",
]
