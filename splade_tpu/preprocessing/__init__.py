"""Offline data-construction tier.

Reference: src/preprocessing/ (pipeline, downloaders, converters, cleaners,
miners) — builds training triplets from raw Korean datasets: download ->
convert -> clean -> dedup -> (mine negatives) -> shuffle -> split -> shard.
"""

from splade_tpu.preprocessing.types import RawSample, Triplet
from splade_tpu.preprocessing.config import PipelineConfig
from splade_tpu.preprocessing.cleaners import KoreanTextCleaner
from splade_tpu.preprocessing.dedup import ExactDeduplicator, MinHashDeduplicator
from splade_tpu.preprocessing.pipeline import PreprocessingPipeline

__all__ = [
    "RawSample",
    "Triplet",
    "PipelineConfig",
    "KoreanTextCleaner",
    "ExactDeduplicator",
    "MinHashDeduplicator",
    "PreprocessingPipeline",
]
