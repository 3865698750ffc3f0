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
    # same name translation as RegexParser.__post_init__: restore
    # lookbehind assertions after the Java->Python group-name rewrite
    # ((?<= / (?<! would otherwise become an invalid (?P<= / (?P<!)
    py = (
        pattern.replace("(?<", "(?P<")
        .replace("(?P<=", "(?<=")
        .replace("(?P<!", "(?<!")
    )
    groups = _re.compile(py).groupindex
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
@converter("ParseCSV")
def _parse_csv(s: Column, header: str, delim: str = ",") -> Column:
    # a row whose field count differs from the header is a nil parse
    # (reference func_parse_csv.go errors per-value), NOT a
    # MapData-length SparkRuntimeException that kills the batch
    ks = F.split(F.lit(header), _re.escape(delim))
    vs = F.split(s, _re.escape(delim))
    return F.when(F.size(vs) == F.size(ks), F.map_from_arrays(ks, vs))
@converter("ParseKeyValue")
def _parse_key_value(s: Column, kv: str = "=", pair: str = " ") -> Column:
    # duplicate keys resolve last-wins like the Go map (str_to_map
    # throws DUPLICATED_MAP_KEY under the default dedup policy)
    from ..operators.parsers import map_last_wins

    toks = F.split(s, _re.escape(pair))
    ks = F.transform(toks, lambda t: F.substring_index(t, kv, 1))
    vs = F.transform(
        toks,
        lambda t: F.when(t.contains(kv), F.substr(t, F.instr(t, kv) + len(kv))),
    )
    return map_last_wins(ks, vs)
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
converter("Int")(lambda x: x.try_cast("long"))
converter("Double")(lambda x: x.try_cast("double"))
converter("Log")(lambda x: F.log(x))

# type predicates — schema-resolved at compile time would need the frame;
# runtime-null checks are the pragmatic columnar equivalent
converter("IsString")(lambda x: x.cast("string").isNotNull())
converter("IsInt")(lambda x: x.try_cast("long").isNotNull())
converter("IsDouble")(lambda x: x.try_cast("double").isNotNull())
converter("IsBool")(lambda x: x.try_cast("boolean").isNotNull())

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
    if secs < 1 or secs != int(secs):
        # the generic path works at second resolution; a sub-second or
        # fractional width would silently divide by 0 / truncate —
        # refuse at compile time instead of nulling every timestamp
        raise ValueError(
            f"TruncateTime supports whole-second durations, got {secs}s"
        )
    return F.timestamp_seconds(
        (F.unix_timestamp(t) / int(secs)).cast("long") * int(secs)
    )


# map/list helpers
converter("Keys")(lambda m: F.map_keys(m))
converter("Values")(lambda m: F.map_values(m))
converter("Sort")(lambda a, order="asc": F.sort_array(a, order != "desc"))


@converter("Unix")
def _unix(sec: Column, nanos: Column | None = None) -> Column:
    """func_unix.go: time.Unix(seconds, nanoseconds) -> timestamp."""
    us = sec.cast("long") * 1_000_000
    if nanos is not None:
        us = us + (nanos.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(us)


def _fixed_id(raw, n_bytes: int, name: str) -> Column:
    """func_trace_id.go / func_span_id.go: a compile-time id literal
    (OTTL ``0x...`` byte syntax or a hex string) -> binary Column, length
    validated at compile time like the reference factory does."""
    if isinstance(raw, str):
        raw = bytes.fromhex(raw)
    if not isinstance(raw, (bytes, bytearray)) or len(raw) != n_bytes:
        raise ValueError(f"{name} requires a {n_bytes}-byte id literal")
    return F.lit(bytes(raw))


converter("TraceID")(lambda b: _fixed_id(b, 16, "TraceID"))
converter("SpanID")(lambda b: _fixed_id(b, 8, "SpanID"))

# IsMap / IsList are schema-resolved in the compiler (ottl._compile_call)
# because the answer is a property of the column TYPE, not the value —
# these registry entries are the no-schema fallback only
converter("IsMap")(lambda x: F.lit(False))
converter("IsList")(lambda x: F.lit(False))


# --- ParseXML (func_parse_xml.go) --------------------------------------------
# Output shape mirrors xmlElement.intoMap: {tag, content?, attributes?,
# children?} with children parsed recursively. Spark structs cannot be
# recursive, so recursion is unrolled to a fixed depth (default 3 child
# levels — one deeper than the reference's own e2e corpus exercises).
# Same-tag nesting (<a><a>..</a></a>) is beyond the regex child splitter
# and yields truncated children — documented OTTL-lite limitation.

_XML_NAME = r"[A-Za-z_][A-Za-z0-9_.\-:]*"
_XML_CHILD = rf"(?s)(<({_XML_NAME})[^>]*>.*?</\2\s*>|<{_XML_NAME}[^>]*/>)"


def _xml_elem(s: Column, depth: int) -> Column:
    tag = F.regexp_extract(s, rf"^\s*<({_XML_NAME})", 1)
    attr_str = F.regexp_extract(s, rf"^\s*<{_XML_NAME}((?:\s[^>]*?)?)/?>", 1)
    # key/value patterns share the identical full-match span, so the two
    # extract_all arrays align pairwise
    attrs = F.map_from_arrays(
        F.regexp_extract_all(
            attr_str, F.lit(rf'({_XML_NAME})\s*=\s*"[^"]*"'), F.lit(1)
        ),
        F.regexp_extract_all(
            attr_str, F.lit(rf'{_XML_NAME}\s*=\s*"([^"]*)"'), F.lit(1)
        ),
    )
    inner = F.regexp_extract(
        s, rf"(?s)^\s*<{_XML_NAME}[^>]*>(.*)</{_XML_NAME}\s*>\s*$", 1
    )
    content = F.trim(F.regexp_replace(inner, _XML_CHILD, ""))
    fields = {
        "tag": F.when(tag != "", tag),
        "content": F.when(content != "", content),
        "attributes": F.when(F.size(attrs) > 0, attrs),
    }
    if depth > 0:
        children_raw = F.regexp_extract_all(inner, F.lit(_XML_CHILD), F.lit(1))
        fields["children"] = F.when(
            F.size(children_raw) > 0,
            F.transform(children_raw, lambda c: _xml_elem(c, depth - 1)),
        )
    return F.struct(*[v.alias(k) for k, v in fields.items()])


converter("ParseXML")(lambda s, depth=3: _xml_elem(s, depth if isinstance(depth, int) else 3))

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
    "TraceID": {0},
    "SpanID": {0},
    "ParseXML": {1},
}
