"""Remote tap processor: pass-through + rate-limited OTLP-JSON tap.

Reference: processor/remotetapprocessor/processor.go:95-140 — a
pass-through processor (data returned unmodified) that, limited to
``limit`` batches per second (config.go:19-29, default 1), marshals
each allowed batch to OTLP JSON and broadcasts it to websocket
subscribers (the collector's live debugging tap).

Batch restatement: the websocket channel set becomes a tap DIRECTORY of
OTLP-JSON lines (the same envelope the file exporter / otlpjsonfile
receiver round-trip uses, pkg/sinks/writers.write_otlp_json); the
per-second rate limiter becomes a per-invocation row bound — each
``__call__`` writes at most ``sample_rows`` rows, so tap volume is
O(limit), never O(data), exactly the property the limiter provides.
The tap job reads only ``limit(n)`` rows (Spark stops the scan after n
rows), and the main frame is returned untouched — at 100 TB the tap
costs one bounded side job, not a second full scan.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..sinks.writers import write_otlp_json


@dataclass
class RemoteTap:
    path: str                 # tap destination directory
    sample_rows: int = 1      # config.go Limit analog (default 1)
    _taps: int = 0            # invocations that actually wrote

    def __post_init__(self):
        if self.sample_rows < 1:
            raise ValueError("sample_rows must be >= 1")

    def __call__(self, df: DataFrame) -> DataFrame:
        tap_dir = os.path.join(self.path, f"tap-{self._taps:05d}")
        write_otlp_json(df.limit(self.sample_rows), tap_dir)
        self._taps += 1
        return df
