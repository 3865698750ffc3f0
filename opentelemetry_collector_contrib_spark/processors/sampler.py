"""Probabilistic sampler: consistent hash-seeded sampling.

Reference: processor/probabilisticsamplerprocessor/config.go:15-60 —
sample at a percentage, seeded on trace id or a chosen attribute so
sampling is CONSISTENT (the same key always samples the same way across
collectors/runs). Never rand(): determinism is what makes resume and
routed-row equality hold (SURVEY.md 7.3 "deterministic sampling").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..envelope import field_get


@dataclass
class ProbabilisticSampler:
    percentage: float            # 0..100
    attribute_source: str = "trace_id"  # field path supplying the hash key
    hash_seed: int = 22          # reference default hash seed role

    def __post_init__(self):
        if not 0 <= self.percentage <= 100:
            raise ValueError("percentage must be in [0, 100]")

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.percentage >= 100:
            return df
        key = field_get(self.attribute_source).cast("string")
        bucket = F.pmod(F.xxhash64(key, F.lit(self.hash_seed)), F.lit(10000))
        keep = bucket < int(self.percentage * 100)
        return df.filter(keep)
