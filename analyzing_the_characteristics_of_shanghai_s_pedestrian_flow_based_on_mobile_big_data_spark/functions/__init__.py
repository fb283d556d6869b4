from .geo import haversine_m  # noqa: F401
from .geohash import geohash_encode, geohash_neighbors  # noqa: F401
from .text import (  # noqa: F401
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
