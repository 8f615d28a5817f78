"""Late-binding re-exports breaking the train_prep <-> dedup import cycle."""
from .dedup import duplicate_clusters, ngram_jaccard_pairs  # noqa: F401
