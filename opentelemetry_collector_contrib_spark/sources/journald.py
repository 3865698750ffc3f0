"""journald input: journald-export JSON lines -> entry rows.

Reference: pkg/stanza/operator/input/journald —
- input.go:172-211 (parseJournalEntry): each line is one JSON object;
  ``__REALTIME_TIMESTAMP`` (stringified microseconds) becomes the entry
  timestamp and is DELETED from the body; ``__CURSOR`` is the resume
  cursor and STAYS in the body; a line missing either field is an
  error (dropped with a log, never emitted).
- config_all.go:27-42 + config_linux.go:53-111 (buildArgs): units,
  identifiers, priority, grep, dmesg, and matches are journalctl-level
  filters (``-u``/``-t``/``-p``/``-g``/``--dmesg``/FIELD=value).

Table restatement: the journalctl stream captured to files (the same
snapshot semantics as every other input here) is read with
``spark.read.text`` and parsed with ``from_json`` into a string map —
zero Python in the row path. The journalctl filters become Column
predicates over the parsed map, matching what journalctl itself would
have emitted:

- ``units``      -> _SYSTEMD_UNIT IN (...)
- ``identifiers``-> SYSLOG_IDENTIFIER IN (...)
- ``priority``   -> PRIORITY <= level("info")  (syslog numbering,
                    emerg=0 .. debug=7; journalctl -p NAME means
                    "at least as important as NAME")
- ``grep``       -> MESSAGE RLIKE pattern
- ``dmesg``      -> _TRANSPORT = 'kernel'
- ``matches``    -> OR across configs, AND within one config's
                    FIELD=value pairs (config_linux.go
                    buildMatchesConfig joins groups with '+')

Invalid lines (unparseable JSON / missing required dunder fields) are
returned with ``valid=false`` so the caller can count drops the way the
reference logs them; filters only apply to valid rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..envelope import try_element_at

# syslog priority names, config_linux.go priority passthrough to -p
PRIORITY_LEVELS = {
    "emerg": 0, "alert": 1, "crit": 2, "err": 3,
    "warning": 4, "notice": 5, "info": 6, "debug": 7,
}


@dataclass
class JournaldSource:
    units: list[str] = field(default_factory=list)
    identifiers: list[str] = field(default_factory=list)
    priority: str = "info"  # NewConfig default, config_all.go:22
    grep: str | None = None
    dmesg: bool = False
    matches: list[dict[str, str]] = field(default_factory=list)

    def __post_init__(self):
        if self.priority not in PRIORITY_LEVELS:
            raise ValueError(f"invalid priority {self.priority!r}")

    def _filters(self, body: Column) -> Column:
        pred = try_element_at(body, "PRIORITY").cast("int") <= PRIORITY_LEVELS[
            self.priority
        ]
        if self.units:
            pred = pred & try_element_at(body, "_SYSTEMD_UNIT").isin(self.units)
        if self.identifiers:
            pred = pred & try_element_at(body, "SYSLOG_IDENTIFIER").isin(
                self.identifiers
            )
        if self.grep:
            pred = pred & try_element_at(body, "MESSAGE").rlike(self.grep)
        if self.dmesg:
            pred = pred & (try_element_at(body, "_TRANSPORT") == "kernel")
        if self.matches:
            groups = None
            for mc in self.matches:
                g = None
                for k in sorted(mc):  # buildMatchConfig sorts keys
                    c = try_element_at(body, k) == mc[k]
                    g = c if g is None else (g & c)
                groups = g if groups is None else (groups | g)
            pred = pred & groups
        return pred

    def __call__(self, spark: SparkSession, paths: list[str] | str) -> DataFrame:
        raw = spark.read.text(paths)
        body = F.from_json(F.col("value"), "map<string,string>")
        ts_us = try_element_at(body, "__REALTIME_TIMESTAMP").cast("long")
        cursor = try_element_at(body, "__CURSOR")
        valid = body.isNotNull() & ts_us.isNotNull() & cursor.isNotNull()
        parsed = raw.select(
            F.timestamp_micros(ts_us).alias("ts"),
            cursor.alias("cursor"),
            # __REALTIME_TIMESTAMP deleted from the body, __CURSOR kept
            # (input.go:194 deletes only the timestamp)
            F.map_filter(
                body, lambda k, _: k != "__REALTIME_TIMESTAMP"
            ).alias("body"),
            valid.alias("valid"),
        )
        return parsed.filter(~F.col("valid") | self._filters(F.col("body")))
