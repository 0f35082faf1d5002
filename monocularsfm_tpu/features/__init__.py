"""Feature pipeline stages: extraction and matching against the database."""

from monocularsfm_tpu.features.extraction import FeatureExtractor
from monocularsfm_tpu.features.matching import (
    SequentialFeatureMatcher,
    BruteFeatureMatcher,
    VocabTreeFeatureMatcher,
)

__all__ = [
    "FeatureExtractor",
    "SequentialFeatureMatcher",
    "BruteFeatureMatcher",
    "VocabTreeFeatureMatcher",
]
