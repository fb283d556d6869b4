from .geo import haversine_m  # noqa: F401
# The native (JVM-codegen) family is the public default — the Arrow
# bisection variants stay importable from .geohash for cross-checks but
# are deliberately not re-exported, steering users to the Python-free
# path (see the encoder-mixing warning in geohash.py).
from .geohash import (  # noqa: F401
    geohash_encode_native as geohash_encode,
    geohash_neighbors_native as geohash_neighbors,
)
from .text import (  # noqa: F401
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
