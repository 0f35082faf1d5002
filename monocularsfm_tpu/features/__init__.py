"""Feature pipeline stages: extraction and matching against the database."""

from monocularsfm_tpu.features.extraction import FeatureExtractor
from monocularsfm_tpu.features.matching import (
    SequentialFeatureMatcher,
    BruteFeatureMatcher,
)

__all__ = ["FeatureExtractor", "SequentialFeatureMatcher", "BruteFeatureMatcher"]
