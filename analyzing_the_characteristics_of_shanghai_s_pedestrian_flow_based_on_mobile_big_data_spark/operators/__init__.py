from .cascade import cascade_join  # noqa: F401
from .dedup import (  # noqa: F401
    PII_PATTERNS,
    apply_span_cut,
    containment_pairs,
    duplicate_spans,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    near_dup_pairs_auto,
    ngram_jaccard_pairs,
    pattern_spans,
    redact_and_clean_text,
    redacted_text,
    simhash,
    simhash_banding,
    simhash_hamming_pairs,
    span_cleaned_stats,
    span_cleaned_text,
    subsumption_prune,
    subsumption_prune_fixpoint,
    tf_cosine_dense_stats,
    tf_cosine_pairs,
    tf_cosine_pairs_auto,
)
from .home import home_location, mode_per_group, night_single_region_users  # noqa: F401
from .occupancy import occupancy, occupancy_approx  # noqa: F401
from .od import od_fractions, od_matrix  # noqa: F401
from .asof import asof_join  # noqa: F401
from .region_build import (  # noqa: F401
    assign_poi_type,
    assign_region,
    build_region_dim,
    mint_dense_ids,
    nearest_poi_type,
)
from .sessions import session_stats, sessionize  # noqa: F401
from .pq import (  # noqa: F401
    ivf_pq_topk,
    pq_codebooks,
    pq_encode,
    pq_refine,
    pq_topk,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    bucketed_ann_topk,
    ivf_topk,
    new_doc_semantic_candidates,
    semantic_dedup,
)
from .skew import salted_count  # noqa: F401
from .trajectory import (  # noqa: F401
    gap_fill_edges,
    gap_outliers,
    hourly_positions,
    keep_latest,
)
from .upsert import merge_upsert  # noqa: F401
