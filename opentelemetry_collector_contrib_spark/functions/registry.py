"""OTTL-lite function registry: converters (pure) + editors (mutators).

Mirrors the reference's function surface
(pkg/ottl/ottlfuncs/README.md; SURVEY.md section 2.4 tables). Each
converter is ``args -> Column`` (args are compiled Columns, with raw
Python literals available via ``.lit`` when the arg was a literal);
each editor is ``(df, args_ast, compile, where) -> DataFrame``.

Like the reference ("The OTTL has no built-in Editors/Converters" —
everything is a registered factory, pkg/ottl/functions.go), the
registry is a plain dict users can extend; entries must return Column
expressions so the plan stays JVM-side.
"""

from __future__ import annotations

import re as _re
from typing import Callable

from pyspark.sql import Column, functions as F

from ..operators.parsers import strptime_to_jvm

# --- helpers ----------------------------------------------------------------


def _dur_to_seconds(s: str) -> float:
    """Parse a Go-style duration literal ("1h2m3s", "1500ms")."""
    m = _re.findall(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)", s)
    if not m:
        raise ValueError(f"bad duration {s!r}")
    mult = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0}
    return sum(float(v) * mult[u] for v, u in m)


# --- converters (pure scalar functions) --------------------------------------

def _concat(vals: Column, delim) -> Column:
    return F.array_join(vals, delim)


def _convert_case(col: Column, mode) -> Column:
    mode = mode if isinstance(mode, str) else "lower"
    if mode == "upper":
        return F.upper(col)
    if mode == "lower":
        return F.lower(col)
    if mode == "snake":
        return F.lower(F.regexp_replace(col, r"([a-z0-9])([A-Z])", "$1_$2"))
    if mode == "camel":
        return F.regexp_replace(
            F.initcap(F.regexp_replace(col, "_", " ")), " ", ""
        )
    raise ValueError(f"unknown case mode {mode}")


CONVERTERS: dict[str, Callable] = {}


def converter(name):
    def deco(fn):
        CONVERTERS[name] = fn
        return fn
    return deco


# string (func_concat.go, func_convert_case.go, func_split.go, ...)
converter("Concat")(lambda vals, delim="": _concat(vals, delim))
converter("ConvertCase")(_convert_case)
converter("Split")(lambda s, d: F.split(s, _re.escape(d)))
converter("Substring")(lambda s, start, length: F.substring(s, start + 1, length))
# Len is type-directed (string length vs collection size); the compiler
# special-cases it with schema knowledge — this entry is the string fallback
converter("Len")(lambda x: F.length(x))
converter("String")(lambda x: x.cast("string"))
converter("Trim")(lambda s: F.trim(s))
converter("Format")(lambda fmt, vals: F.format_string(fmt, *vals))

# regex (func_is_match.go, func_extract_patterns.go:35-75)
converter("IsMatch")(lambda s, pattern: s.rlike(pattern))


@converter("ExtractPatterns")
def _extract_patterns(s: Column, pattern: str) -> Column:
    groups = _re.compile(pattern.replace("(?<", "(?P<")).groupindex
    jvm = _re.sub(r"\(\?P?<(?![=!])[^>]*>", "(", pattern)
    return F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(g) for g in groups]),
            F.array(*[F.regexp_extract(s, jvm, i) for i in groups.values()]),
        ),
        lambda _, v: v != "",
    )


# parse (func_parse_json.go, func_parse_csv.go, func_parse_key_value.go, func_url.go)
converter("ParseJSON")(lambda s: F.from_json(s, "map<string,string>"))
converter("ParseCSV")(
    lambda s, header, delim=",": F.map_from_arrays(
        F.split(F.lit(header), _re.escape(delim)), F.split(s, _re.escape(delim))
    )
)
converter("ParseKeyValue")(
    lambda s, kv="=", pair=" ": F.str_to_map(s, F.lit(pair), F.lit(kv))
)
converter("Base64Decode")(lambda s: F.unbase64(s).cast("string"))


@converter("URL")
def _url(s: Column) -> Column:
    return F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("url.scheme"), F.lit("url.domain"), F.lit("url.path"), F.lit("url.query")),
            F.array(
                F.lower(F.parse_url(s, F.lit("PROTOCOL"))),
                F.parse_url(s, F.lit("HOST")),
                F.parse_url(s, F.lit("PATH")),
                F.parse_url(s, F.lit("QUERY")),
            ),
        ),
        lambda _, v: v.isNotNull(),
    )


# hash / ids (func_sha1.go, func_sha256.go, func_fnv.go, func_uuid.go)
converter("SHA1")(lambda s: F.sha1(s.cast("string")))
converter("SHA256")(lambda s: F.sha2(s.cast("string"), 256))
converter("MD5")(lambda s: F.md5(s.cast("string")))
converter("FNV")(lambda s: F.xxhash64(s.cast("string")))  # 64-bit role parity
converter("UUID")(lambda: F.uuid())
converter("Hex")(lambda b: F.hex(b))

# math / logic (func_int.go, func_double.go, func_log.go)
converter("Int")(lambda x: x.cast("long"))
converter("Double")(lambda x: x.cast("double"))
converter("Log")(lambda x: F.log(x))

# type predicates — schema-resolved at compile time would need the frame;
# runtime-null checks are the pragmatic columnar equivalent
converter("IsString")(lambda x: x.cast("string").isNotNull())
converter("IsInt")(lambda x: x.cast("long").isNotNull())
converter("IsDouble")(lambda x: x.cast("double").isNotNull())
converter("IsBool")(lambda x: x.cast("boolean").isNotNull())

# time (func_time.go, func_truncate_time.go, func_duration.go, func_now.go,
# func_unix_*.go, extractors)
converter("Time")(
    lambda s, fmt: F.try_to_timestamp(s, F.lit(strptime_to_jvm(fmt)))
)
converter("Now")(lambda: F.current_timestamp())
converter("UnixSeconds")(lambda t: F.unix_timestamp(t))
converter("UnixMilli")(lambda t: F.unix_millis(t))
converter("UnixMicro")(lambda t: F.unix_micros(t))
converter("UnixNano")(lambda t: F.unix_micros(t) * 1000)
converter("Year")(lambda t: F.year(t))
converter("Month")(lambda t: F.month(t))
converter("Day")(lambda t: F.dayofmonth(t))
converter("Hour")(lambda t: F.hour(t))
converter("Minute")(lambda t: F.minute(t))
converter("Duration")(lambda s: F.lit(_dur_to_seconds(s)))  # seconds (double)
# duration extractors (func_hours.go etc.) over Duration() seconds
converter("Hours")(lambda d: d / 3600.0)
converter("Minutes")(lambda d: d / 60.0)
converter("Seconds")(lambda d: d * 1.0)
converter("Milliseconds")(lambda d: d * 1000.0)
converter("Microseconds")(lambda d: d * 1000000.0)
converter("Nanoseconds")(lambda d: d * 1000000000.0)


@converter("TruncateTime")
def _truncate_time(t: Column, dur) -> Column:
    # dur: seconds literal from Duration(); map standard widths to date_trunc
    secs = dur if isinstance(dur, (int, float)) else None
    units = {1: "second", 60: "minute", 3600: "hour", 86400: "day"}
    if secs in units:
        return F.date_trunc(units[secs], t)
    if secs is None:
        raise ValueError("TruncateTime needs a literal Duration")
    return F.timestamp_seconds(
        (F.unix_timestamp(t) / int(secs)).cast("long") * int(secs)
    )


# map/list helpers
converter("Keys")(lambda m: F.map_keys(m))
converter("Values")(lambda m: F.map_values(m))
converter("Sort")(lambda a, order="asc": F.sort_array(a, order != "desc"))

# Which argument positions are compile-time constants (passed as raw Python
# values — regex patterns, formats, delimiters, durations); all other args
# arrive as Columns. Mirrors OTTL's typed factory arguments
# (pkg/ottl/functions.go reflection binding).
CONST_ARGS: dict[str, set[int]] = {
    "Concat": {1},
    "ConvertCase": {1},
    "Split": {1},
    "Substring": {1, 2},
    "Format": {0},
    "IsMatch": {1},
    "ExtractPatterns": {1},
    "ParseCSV": {1, 2},
    "ParseKeyValue": {1, 2},
    "Time": {1},
    "TruncateTime": {1},
    "Duration": {0},
    "Sort": {1},
}
