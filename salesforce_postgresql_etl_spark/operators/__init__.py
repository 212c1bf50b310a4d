from .dedup import neardup_pairs, token_sets  # noqa: F401
from .multimodal import (  # noqa: F401
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    synth_media,
)
from .simsearch import label_centroids, topk_cosine, with_sq_norm  # noqa: F401
