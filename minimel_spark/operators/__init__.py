"""DataFrame -> DataFrame stage operators. Each module cites the reference
operators (SURVEY.md §2 IDs) it covers; COVERAGE.md maps every ID to its
module, gate query, and test."""

from .ann import brute_force_topk, embedding_dups, ivf_topk, lsh_topk  # noqa: F401
from .blocking import (  # noqa: F401
    cap_blocks,
    dictionary_blocks,
    minhash_blocks,
    minhash_signature,
    union_blocks,
)
from .clean import clean, quantile_top_shadowed, rank_candidates  # noqa: F401
from .cluster import (  # noqa: F401
    cluster_candidates,
    connected_components,
    similarity_edges,
)
from .count import anchor_counts, counts_to_map, explode_anchors, fold_filter  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_dups,
    ngram_jaccard_dups,
    simhash,
    simhash_dups,
)
from .ent_feats import entity_features, frequent_features  # noqa: F401
from .evaluate import (  # noqa: F401
    align_gold_pred,
    macro_scores,
    micro_scores,
    pairwise_f1,
    per_name_scores,
)
from .extract import extract_paragraphs  # noqa: F401
from .mentions import count_names, detect_mentions, nil_mentions  # noqa: F401
from .multimodal import (  # noqa: F401
    extract_features,
    repartition_by_bytes,
    resize_images,
    sample_frames,
)
from .pairs import candidate_pairs, pair_features  # noqa: F401
from .scoring import (  # noqa: F401
    audit_matcher,
    match_edges,
    most_common_sense,
    predict_cascade,
    score_pairs,
    train_pair_matcher,
    upperbound_predict,
)
from .text import fingerprints, language_id, quality_scores, token_stats  # noqa: F401
