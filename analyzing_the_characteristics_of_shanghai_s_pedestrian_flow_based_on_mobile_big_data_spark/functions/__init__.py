from .geo import haversine_m  # noqa: F401
# The native (JVM-codegen) family is the public default — the Arrow
# bisection variants stay importable from .geohash for cross-checks but
# are deliberately not re-exported, steering users to the Python-free
# path (see the encoder-mixing warning in geohash.py).
from .geohash import (  # noqa: F401
    geohash_encode_native as geohash_encode,
    geohash_neighbors_native as geohash_neighbors,
)
from .scorer import (  # noqa: F401
    bucket_weights,
    demo_weights,
    doc_features,
    linear_quality_margin,
    margin_from_features,
    margin_from_weights,
)
from .text import (  # noqa: F401
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from .urls import (  # noqa: F401
    apply_domain_blocklist,
    cap_per_domain,
    url_canonicalize,
    url_host,
    url_registered_domain,
    url_suffix,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
