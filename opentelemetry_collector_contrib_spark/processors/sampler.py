"""Probabilistic sampler: consistent hash-seeded sampling, three modes.

Reference: processor/probabilisticsamplerprocessor/config.go:15-60 and
sampler_mode.go:51-57 — modes ``hash_seed`` (FNV hash of a chosen
attribute vs a 14-bit threshold), ``proportional`` (output probability
proportional to the incoming sampling probability) and ``equalizing``
(make every record's FINAL sampling probability equal to the configured
percentage, discounting what upstream samplers already removed).

Columnar restatement: the sampling coin is a deterministic bucket in
[0, 10000) derived from md5(seed ':' key) — never rand(): determinism
is what makes resume and routed-row equality hold (SURVEY.md 7.3), and
md5 (unlike xxhash64) has a bit-exact DuckDB twin via the established
nibble-parse technique, so every mode is oracle-checkable. The prior
sampling probability rides in a column (``prior_col``, default 1.0 —
"not previously sampled"), standing in for the tracestate t-value:

- ``hash_seed``:    keep iff bucket < pct * 100
- ``proportional``: same keep rule; surviving rows carry
                    ``sampling_probability = prior * pct/100``
- ``equalizing``:   keep iff bucket < min(1, (pct/100)/prior) * 10000;
                    survivors carry ``sampling_probability =
                    min(prior, pct/100)`` — rows already sampled harder
                    than the target pass through untouched

All modes are single codegen'd filter projections: no shuffle, no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import field_get

MODES = ("hash_seed", "proportional", "equalizing")


def _bucket(key: Column, seed: int, hash_function: str) -> Column:
    """Deterministic bucket in [0, 10000). ``md5`` parses the first 15
    hex chars (60 bits) of md5(seed ':' key) — reproducible in DuckDB;
    ``xxhash64`` is the cheapest JVM-only path."""
    if hash_function == "xxhash64":
        return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(10000))
    salted = F.concat(F.lit(f"{seed}:"), key)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint") % 10000


_FNV_OFFSET, _FNV_PRIME, _U32 = 2166136261, 16777619, 0xFFFFFFFF
NUM_HASH_BUCKETS = 0x4000  # sampler_mode.go:36 — 14-bit bucket space


def fnv1a32(data: Column, seed: int) -> Column:
    """EXACT reference hash: Go hash/fnv New32a over
    ``i32tob(seed) ++ utf8(data)`` (fnvhasher.go:12-24 — the seed's 4
    little-endian bytes are written first, then the attribute bytes).

    The 4 seed bytes are constants, so they fold into the initial state
    driver-side; the data bytes run through one ``aggregate`` over the
    hex-pair expansion of ``encode(data,'utf-8')`` — pure Column
    expressions inside codegen, no UDF. 64-bit intermediates can't
    overflow: state < 2^32, prime < 2^25, product < 2^57.
    """
    return fnv1a32_hex(F.hex(F.encode(data, "utf-8")), seed)


def fnv1a32_hex(hx: Column, seed: int | Column) -> Column:
    """FNV-1a over the bytes whose hex encoding is ``hx`` (2 hex chars
    per byte) — the raw-bytes entry point: trace ids hash their 16 id
    BYTES (tracesprocessor.go randomnessFromSpan: ``s.TraceID()[:]``),
    not the hex string. ``seed`` may be a per-row Column; a Python int
    folds its 4 little-endian bytes into the initial state driver-side.
    """
    # empty input: sequence(0,-1) auto-reverses to [0,-1] instead of [],
    # so guard to an empty byte array
    data_bytes = F.when(F.length(hx) == 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), (F.length(hx) / 2).cast("int") - 1),
            lambda i: F.conv(F.substring(hx, i * 2 + 1, F.lit(2)), 16, 10).cast(
                "bigint"
            ),
        )
    )
    if isinstance(seed, Column):
        s = seed.cast("bigint")
        seed_bytes = F.array(
            *[F.shiftright(s, 8 * i).bitwiseAND(F.lit(255)) for i in range(4)]
        )
        byte_arr = F.concat(seed_bytes, data_bytes)
        init = F.lit(_FNV_OFFSET).cast("bigint")
    else:
        h = _FNV_OFFSET
        for b in seed.to_bytes(4, "little"):
            h = ((h ^ b) * _FNV_PRIME) & _U32
        byte_arr = data_bytes
        init = F.lit(h).cast("bigint")
    return F.aggregate(
        byte_arr,
        init,
        lambda acc, x: (acc.bitwiseXOR(x) * _FNV_PRIME).bitwiseAND(F.lit(_U32)),
    )


def _fnv_bucket(key: Column, seed: int) -> Column:
    """The reference's 14-bit sampling bucket:
    ``computeHash(bytes, seed) & bitMaskHashBuckets``
    (sampler_mode.go:311-312)."""
    return fnv1a32(key, seed).bitwiseAND(F.lit(NUM_HASH_BUCKETS - 1))


@dataclass
class ProbabilisticSampler:
    percentage: float                    # 0..100
    attribute_source: str = "trace_id"   # field path supplying the hash key
    hash_seed: int = 22                  # reference default hash seed role
    mode: str = "hash_seed"              # hash_seed | proportional | equalizing
    prior_col: str | None = None         # incoming sampling probability (default 1.0)
    hash_function: str = "md5"           # md5 (oracle-checkable) | xxhash64
    # FailClosed (config.go): a record whose randomness source is
    # MISSING (null/empty key, or matching invalid_key_pattern — e.g.
    # '^0{32}$' for the all-zero trace id) is dropped when True, kept
    # when False (commonShouldSampleLogic: never- vs always-sample
    # threshold, logsprocessor_test.go "roughly half" / "happy_path").
    fail_closed: bool = True
    invalid_key_pattern: str | None = None
    # SamplingPriority (logsprocessor.go:231-267): numeric attribute
    # that RAISES the per-record probability to its value (percent);
    # when configured, a record whose attribute is absent or zero is
    # never sampled — the override applies AFTER fail open/closed.
    sampling_priority: str | None = None
    # the key column holds the HEX encoding of the bytes to hash (trace
    # ids / bytes-typed attributes hash their RAW bytes in the
    # reference — tracesprocessor.go s.TraceID()[:] — not the hex text)
    key_is_hex: bool = False

    def __post_init__(self):
        if not 0 <= self.percentage <= 100:
            raise ValueError("percentage must be in [0, 100]")
        if self.mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}")
        if self.hash_function not in ("md5", "xxhash64", "fnv"):
            raise ValueError("hash_function must be md5, xxhash64 or fnv")

    def __call__(self, df: DataFrame) -> DataFrame:
        if (
            self.percentage >= 100
            and self.mode == "hash_seed"
            and self.sampling_priority is None
            and not self.fail_closed
        ):
            return df
        key = field_get(self.attribute_source).cast("string")
        if self.hash_function == "fnv":
            # byte-exact reference decisions: 14-bit FNV-1a bucket vs
            # uint32(percentage * numHashBuckets/100) — the collector's
            # classic hash_seed acceptance rule
            if self.key_is_hex:
                bucket = fnv1a32_hex(F.upper(key), self.hash_seed).bitwiseAND(
                    F.lit(NUM_HASH_BUCKETS - 1)
                )
            else:
                bucket = _fnv_bucket(key, self.hash_seed)
            space = NUM_HASH_BUCKETS
            cutoff = F.lit(float(int(self.percentage * (NUM_HASH_BUCKETS / 100.0))))
        else:
            bucket = _bucket(key, self.hash_seed, self.hash_function)
            space = 10000
            cutoff = F.lit(float(int(self.percentage * 100)))
        target = self.percentage / 100.0
        prior = (
            F.col(self.prior_col).cast("double")
            if self.prior_col
            else F.lit(1.0)
        )
        if self.mode == "equalizing":
            cutoff = F.least(F.lit(1.0), F.lit(target) / prior) * space
        missing = key.isNull() | (key == "")
        if self.invalid_key_pattern is not None:
            missing = missing | key.rlike(self.invalid_key_pattern)
        cutoff = F.when(
            missing, F.lit(0.0) if self.fail_closed else F.lit(float(space))
        ).otherwise(cutoff)
        if self.sampling_priority is not None:
            prio = F.coalesce(
                field_get(self.sampling_priority).cast("double"), F.lit(0.0)
            )
            # absent/zero priority => never sample; otherwise the
            # priority can only RAISE the probability
            cutoff = F.when(prio <= 0, F.lit(0.0)).otherwise(
                F.greatest(cutoff, prio * (space / 100.0))
            )
        keep = (
            F.when(cutoff >= space, F.lit(True))
            .when(cutoff <= 0, F.lit(False))
            .otherwise(bucket < cutoff)
        )
        out = df.filter(F.coalesce(keep, F.lit(False)))
        if self.mode == "equalizing":
            return out.withColumn(
                "sampling_probability", F.least(prior, F.lit(target))
            )
        if self.mode == "proportional":
            out = out.withColumn("sampling_probability", prior * F.lit(target))
        return out
