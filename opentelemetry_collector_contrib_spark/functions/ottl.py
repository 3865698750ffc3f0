"""OTTL-lite compiler: statement strings -> DataFrame transformations.

Lifecycle mirror of the reference (SURVEY.md 3.2): parse once on the
driver (ast.py), bind the editor name to a factory (registry.py),
resolve paths through the log context namespace
(pkg/ottl/contexts/ottllog/log.go:201-252: time, severity_*, body,
attributes, resource, cache), then hand the resulting Column AST to
Catalyst. ``where`` clauses become ``F.when`` guards; mixed int/float
comparisons promote like pkg/ottl/compare.go:114-134 (Spark numeric
promotion matches).

``cache`` paths (statement-scoped scratch) compile to temporary
``__cache_<k>`` columns dropped at the end of a statement sequence.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at
from .ast import (
    BinOp,
    Call,
    Index,
    ListExpr,
    Lit,
    Not,
    Path,
    parse_condition,
    parse_statement,
)
from .registry import CONST_ARGS, CONVERTERS

# ---------------------------------------------------------------------------
# value compilation


def _path_str(p: Path) -> str:
    return ".".join(str(x) for x in p.parts)


def _resolve_path(p: Path) -> Column:
    head = p.parts[0]
    if head == "cache":
        return F.col("__cache_" + "_".join(str(x) for x in p.parts[1:]))
    if head == "instrumentation_scope":
        # the envelope carries the scope NAME as a string column; only
        # the name sub-path resolves — silently returning `scope` for
        # .version/.attributes would hand back the wrong value
        if len(p.parts) == 1 or list(map(str, p.parts[1:])) == ["name"]:
            return F.col("scope")
        raise ValueError(
            f"unsupported instrumentation_scope path {_path_str(p)} "
            "(the flattened envelope carries only the scope name)"
        )
    if head == "time":
        return F.col("ts")
    if head == "observed_time":
        return F.col("observed_ts")
    # datapoint context start-time twins (ottldatapoint/datapoint.go
    # accessStartTime*: case "start_time" / "start_time_unix_nano")
    if head == "start_time":
        return F.col("start_ts")
    if head == "start_time_unix_nano":
        return F.unix_micros(F.col("start_ts")) * F.lit(1000).cast("long")
    # nanosecond twins (ottllog/log.go accessTimeUnixNano,
    # ottlspanevent/span_events.go:209-222): parquet timestamps carry
    # microseconds, so *1000 is exact
    if head == "time_unix_nano":
        return F.unix_micros(F.col("ts")) * F.lit(1000).cast("long")
    if head == "observed_time_unix_nano":
        return F.unix_micros(F.col("observed_ts")) * F.lit(1000).cast("long")
    if head in ("attributes", "resource"):
        # log-context grammar: ``resource.attributes["k"]`` addresses the
        # resource attribute map (ottllog/log.go resource context) — the
        # envelope stores that map AS the ``resource`` column, so the
        # literal ``attributes`` segment is elided
        rest = list(p.parts[1:])
        if head == "resource" and rest and rest[0] == "attributes":
            rest = rest[1:]
        col = F.col(head)
        for key in rest:
            # try_element_at: missing map key / out-of-range index is nil
            # in reference OTTL; ANSI element_at would throw
            col = (
                try_element_at(col, F.lit(key))
                if isinstance(key, str)
                else try_element_at(col, F.lit(key + 1))
            )
        return col
    col = F.col(str(head))
    for key in p.parts[1:]:
        col = (
            col.getField(key)
            if isinstance(key, str)
            else try_element_at(col, F.lit(key + 1))
        )
    return col


def compile_value(node, df: DataFrame | None = None) -> Column:
    """AST value -> Column. ``df`` enables schema-directed choices."""
    if isinstance(node, Lit):
        return F.lit(node.value)
    if isinstance(node, Path):
        return _resolve_path(node)
    if isinstance(node, ListExpr):
        return F.array(*[compile_value(i, df) for i in node.items])
    if isinstance(node, Call):
        return _compile_call(node, df)
    if isinstance(node, Index):
        obj = compile_value(node.obj, df)
        if isinstance(node.key, int):
            # OTTL list indexes are 0-based; element_at is 1-based;
            # try_ variant = reference nil-on-missing + ANSI-safe
            return try_element_at(obj, F.lit(node.key + 1))
        return try_element_at(obj, F.lit(node.key))
    if isinstance(node, BinOp):
        return _compile_binop(node, df)
    if isinstance(node, Not):
        return ~compile_value(node.expr, df)
    raise TypeError(f"cannot compile {node!r}")


def _raw(node):
    """Python literal for args that must be compile-time constants
    (regex patterns, formats, durations)."""
    if isinstance(node, Lit):
        return node.value
    if isinstance(node, ListExpr):
        items = [_raw(i) for i in node.items]
        return items if all(x is not None for x in items) else None
    if isinstance(node, Call) and node.name == "Duration" and node.args:
        inner = _raw(node.args[0])
        if isinstance(inner, str):
            from .registry import _dur_to_seconds

            return _dur_to_seconds(inner)
    return None


def _compile_call(call: Call, df: DataFrame | None) -> Column:
    name = call.name
    _TYPE_PREDICATES = {
        "IsMap": ("map",),
        "IsList": ("array",),
        "IsString": ("string",),
        "IsInt": ("bigint", "int", "smallint", "tinyint", "long"),
        "IsDouble": ("double", "float"),
        "IsBool": ("boolean",),
    }
    if name in _TYPE_PREDICATES and df is not None and call.args:
        # TYPE predicates, resolved against the frame schema at compile
        # time (func_is_*.go ask what TYPE the value is — e.g.
        # IsInt("123") is FALSE in the reference, it's a string). The
        # columnar equivalent is the column's data type, constant per
        # frame; a nil value is no type, so non-container predicates
        # also require isNotNull. Unresolvable path -> false.
        wants = _TYPE_PREDICATES[name]
        try:
            expr = compile_value(call.args[0], df)
            dtype = df.select(expr).schema[0].dataType.simpleString()
            matched = dtype.startswith(wants)
            if not matched:
                return F.lit(False)
            if name in ("IsMap", "IsList"):
                return F.lit(True)
            return expr.isNotNull()
        except Exception:
            return F.lit(False)
    if name == "Len" and df is not None and call.args and isinstance(call.args[0], Path):
        try:
            dtype = df.select(compile_value(call.args[0], df)).schema[0].dataType.simpleString()
            if dtype.startswith(("array", "map")):
                return F.size(compile_value(call.args[0], df))
        except Exception:
            pass
    if name not in CONVERTERS:
        raise NameError(f"unknown converter {name}")
    fn = CONVERTERS[name]
    const_pos = CONST_ARGS.get(name, set())
    args = []
    for i, a in enumerate(call.args):
        if name == "Format" and i == 1 and isinstance(a, ListExpr):
            # Format's value list splats into format_string varargs
            args.append([compile_value(x, df) for x in a.items])
            continue
        if i in const_pos:
            raw = _raw(a)
            if raw is None:
                raise ValueError(
                    f"{name} argument {i} must be a compile-time constant"
                )
            args.append(raw)
        else:
            args.append(compile_value(a, df))
    return fn(*args)


def _dtype(df: DataFrame | None, col: Column) -> str | None:
    if df is None:
        return None
    try:
        return df.select(col).schema[0].dataType.simpleString()
    except Exception:
        return None


def _compile_binop(node: BinOp, df: DataFrame | None) -> Column:
    if node.op in ("and", "or"):
        l, r = compile_value(node.left, df), compile_value(node.right, df)
        return (l & r) if node.op == "and" else (l | r)
    if node.op in ("==", "!="):
        # OTTL nil comparisons are EXISTENCE checks (compare.go: nil is
        # ordered equal to nil, unequal to everything). Spark's
        # three-valued `col != lit(NULL)` is NULL -> never true, so
        # compile to isNull/isNotNull instead.
        for side, other in ((node.right, node.left), (node.left, node.right)):
            if isinstance(side, Lit) and side.value is None:
                col = compile_value(other, df)
                return col.isNull() if node.op == "==" else col.isNotNull()
    l, r = compile_value(node.left, df), compile_value(node.right, df)
    if node.op == "-":
        # OTTL: timestamp - timestamp yields a time.Duration
        # (pkg/ottl/math.go:102-150) — represent as seconds (double)
        lt, rt = _dtype(df, l), _dtype(df, r)
        if lt and rt and lt.startswith("timestamp") and rt.startswith("timestamp"):
            return (F.unix_micros(l) - F.unix_micros(r)) / 1000000.0
    ops = {
        "==": lambda a, b: a == b,
        "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
        "+": lambda a, b: a + b,
        "-": lambda a, b: a - b,
        "*": lambda a, b: a * b,
        "/": lambda a, b: a / b,
    }
    return ops[node.op](l, r)


def compile_condition(text: str, df: DataFrame | None = None) -> Column:
    """OTTL condition string -> boolean Column (ConditionSequence.Eval
    counterpart; null comparisons follow Spark three-valued logic)."""
    return compile_value(parse_condition(text), df)


# ---------------------------------------------------------------------------
# editors (pkg/ottl/ottlfuncs/README.md:36-404)


def _target(args) -> Path:
    t = args[0]
    if not isinstance(t, Path):
        raise TypeError("editor target must be a path")
    return t


def _set_path(
    df: DataFrame,
    p: Path,
    value: Column,
    where: Column | None,
    nil_no_op: bool = True,
) -> DataFrame:
    head = p.parts[0]
    if head == "resource" and p.parts[1:2] == ["attributes"]:
        # resource.attributes["k"] -> the resource map key (see _resolve_path)
        p = Path(["resource", *p.parts[2:]])
    if head == "cache":
        col = "__cache_" + "_".join(str(x) for x in p.parts[1:])
        if where is not None:
            value = F.when(where, value)
        return df.withColumn(col, value)
    if head == "time":
        head, p = "ts", Path(["ts"])
    elif head == "observed_time":
        head, p = "observed_ts", Path(["observed_ts"])
    elif head == "start_time":
        head, p = "start_ts", Path(["start_ts"])
    elif head in (
        "time_unix_nano",
        "observed_time_unix_nano",
        "start_time_unix_nano",
    ):
        tcol = {
            "time_unix_nano": "ts",
            "observed_time_unix_nano": "observed_ts",
            "start_time_unix_nano": "start_ts",
        }[head]
        value = F.timestamp_micros(
            (value.cast("decimal(38,0)") / F.lit(1000)).cast("long")
        )
        head, p = tcol, Path([tcol])
    if where is not None:
        try:
            current = _resolve_path(p)
            df.select(current)
        except Exception:
            current = F.lit(None)
        value = F.when(where, value).otherwise(current)
    if head in ("attributes", "resource") and len(p.parts) == 2:
        key = str(p.parts[1])
        existing = F.coalesce(
            F.col(head), F.from_json(F.lit("{}"), "map<string,string>")
        )
        cleaned = F.map_filter(existing, lambda k, _: k != F.lit(key))
        entry = F.create_map(F.lit(key), value.cast("string"))
        # func_set.go: a nil value is a NO-OP — the pre-existing key
        # must survive, not be deleted (stripping it from `cleaned` and
        # filtering the null entry would silently drop it)
        updated = F.when(value.isNull(), existing).otherwise(
            F.map_concat(cleaned, entry)
        )
        return df.withColumn(head, updated)
    if len(p.parts) == 1:
        name = str(head)
        if nil_no_op and name in df.columns:
            # func_set.go: a nil value is a no-op — keep the current
            # value instead of nulling the column. Editors that CHANGE
            # the column's type (append lifts a scalar to an array)
            # pass nil_no_op=False: coalesce(array, scalar) would be a
            # type-mismatch crash, and their null handling is their own.
            value = F.coalesce(value, F.col(name))
        return df.withColumn(name, value)
    if (
        str(head) in df.columns
        and dict(df.dtypes)[str(head)].startswith("struct")
        and all(isinstance(x, str) for x in p.parts[1:])
    ):
        # nested struct-field write (metric.name / metric.unit ... in
        # the datapoint context, ottldatapoint/datapoint.go case
        # "metric" delegating to the enclosing metric): rebuild the
        # struct column with withField — a projection, no shuffle
        target = ".".join(str(x) for x in p.parts[1:])
        if nil_no_op:
            value = F.coalesce(value, _resolve_path(p))
        return df.withColumn(
            str(head), F.col(str(head)).withField(target, value)
        )
    raise ValueError(f"cannot set path {_path_str(p)}")


def _editor_set(df, args, where, dfctx):
    # func_set.go: setting nil is a no-op
    val = compile_value(args[1], dfctx)
    if isinstance(args[1], Lit) and args[1].value is None:
        return df
    return _set_path(df, _target(args), val, where)


def _editor_delete_key(df, args, where, dfctx):
    p = _target(args)
    key = compile_value(args[1], dfctx)
    m = _resolve_path(p)
    # a nil key is a no-op (reference delete_key): without the
    # coalesce, `k != NULL` is NULL for every entry and map_filter
    # drops the WHOLE map
    new = F.map_filter(m, lambda k, _: F.coalesce(k != key, F.lit(True)))
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(m), None)


def _editor_delete_matching_keys(df, args, where, dfctx):
    p = _target(args)
    pattern = _raw(args[1])
    m = _resolve_path(p)
    new = F.map_filter(m, lambda k, _: ~k.rlike(pattern))
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(m), None)


def _editor_keep_keys(df, args, where, dfctx):
    p = _target(args)
    keys = _raw(args[1])
    if keys is None:
        # const-arg contract: a non-literal keys argument must fail
        # loudly, not silently compile to keep-NOTHING (wiping the map)
        raise ValueError("keep_keys requires a literal list of keys")
    m = _resolve_path(p)
    new = F.map_filter(m, lambda k, _: k.isin(keys))
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(m), None)


def _editor_keep_matching_keys(df, args, where, dfctx):
    p = _target(args)
    pattern = _raw(args[1])
    m = _resolve_path(p)
    new = F.map_filter(m, lambda k, _: k.rlike(pattern))
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(m), None)


def _editor_replace_pattern(df, args, where, dfctx):
    p = _target(args)
    pattern, repl = _raw(args[1]), _raw(args[2])
    src = _resolve_path(p)
    new = F.regexp_replace(src, pattern, repl)
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(src), None)


def _glob_to_regex(glob: str) -> str:
    import re as _re2

    return "^" + "".join(
        ".*" if ch == "*" else "." if ch == "?" else _re2.escape(ch) for ch in glob
    ) + "$"


def _editor_replace_match(df, args, where, dfctx):
    p = _target(args)
    glob, repl = _raw(args[1]), _raw(args[2])
    src = _resolve_path(p)
    new = F.when(src.rlike(_glob_to_regex(glob)), F.lit(repl)).otherwise(src)
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(src), None)


def _editor_replace_all_patterns(df, args, where, dfctx):
    # replace_all_patterns(attributes, "value"|"key", pattern, repl)
    p = _target(args)
    mode, pattern, repl = _raw(args[1]), _raw(args[2]), _raw(args[3])
    m = _resolve_path(p)
    if mode == "value":
        new = F.transform_values(m, lambda _, v: F.regexp_replace(v, pattern, repl))
    else:
        new = F.map_from_entries(
            F.transform(
                F.map_entries(m),
                lambda e: F.struct(
                    F.regexp_replace(e.getField("key"), pattern, repl).alias("key"),
                    e.getField("value").alias("value"),
                ),
            )
        )
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(m), None)


def _editor_replace_all_matches(df, args, where, dfctx):
    p = _target(args)
    glob, repl = _raw(args[1]), _raw(args[2])
    m = _resolve_path(p)
    regex = _glob_to_regex(glob)
    new = F.transform_values(
        m, lambda _, v: F.when(v.rlike(regex), F.lit(repl)).otherwise(v)
    )
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(m), None)


def _editor_truncate_all(df, args, where, dfctx):
    p = _target(args)
    limit = _raw(args[1])
    m = _resolve_path(p)
    new = F.transform_values(m, lambda _, v: F.substring(v, 1, int(limit)))
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(m), None)


def _editor_limit(df, args, where, dfctx):
    # limit(map, n, [priority_keys]) — func_limit.go: keep priority keys
    # first, then arbitrary-but-deterministic others up to n
    p = _target(args)
    n = _raw(args[1])
    priority = _raw(args[2]) if len(args) > 2 else []
    m = _resolve_path(p)
    entries = F.map_entries(m)
    ranked = F.transform(
        entries,
        lambda e: F.struct(
            (~e.getField("key").isin(priority or ["\x00"])).cast("int").alias("prio"),
            e.getField("key").alias("key"),
            e.getField("value").alias("value"),
        ),
    )
    kept = F.slice(F.sort_array(ranked), 1, int(n))
    new = F.map_from_entries(
        F.transform(kept, lambda e: F.struct(e.getField("key").alias("key"), e.getField("value").alias("value")))
    )
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(m), None)


def _editor_merge_maps(df, args, where, dfctx):
    # merge_maps(to, from, strategy) — func_merge_maps.go:88
    p = _target(args)
    src = compile_value(args[1], dfctx)
    strategy = _raw(args[2]) if len(args) > 2 else "upsert"
    to = _resolve_path(p)
    to_keys = F.map_keys(to)
    if strategy == "insert":
        add = F.map_filter(src, lambda k, _: ~F.array_contains(to_keys, k))
        new = F.map_concat(to, add)
    elif strategy == "update":
        upd = F.map_filter(src, lambda k, _: F.array_contains(to_keys, k))
        new = F.map_concat(F.map_filter(to, lambda k, _: ~F.array_contains(F.map_keys(upd), k)), upd)
    else:  # upsert
        new = F.map_concat(F.map_filter(to, lambda k, _: ~F.array_contains(F.map_keys(src), k)), src)
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(to), None)


def _editor_append(df, args, where, dfctx):
    # append(target, ...values) — func_append.go: target becomes an array
    p = _target(args)
    vals = [compile_value(a, dfctx) for a in args[1:]]
    try:
        current = _resolve_path(p)
        dtype = df.select(current).schema[0].dataType.simpleString()
    except Exception:
        current, dtype = None, None
    if dtype and dtype.startswith("array"):
        new = F.concat(current, F.array(*vals))
        lifted = current
    elif current is not None:
        new = F.concat(F.array(current.cast("string")), F.array(*[v.cast("string") for v in vals]))
        lifted = F.array(current.cast("string"))
    else:
        new = F.array(*vals)
        lifted = None
    if where is not None:
        # fold the guard HERE: _set_path's generic guard would put the
        # SCALAR current in the else branch of an array-typed when() —
        # a THEN/ELSE type mismatch
        if dtype and dtype.startswith("array"):
            new = F.when(where, new).otherwise(lifted)
        elif current is not None:
            # scalar target: matched rows carry the appended array
            # (stringified, like the unconditional path writing into a
            # string-typed destination); unmatched keep the EXACT value
            new = F.when(where, new.cast("string")).otherwise(
                current.cast("string")
            )
        else:
            new = F.when(where, new)
        where = None
    return _set_path(df, p, new, where, nil_no_op=False)


def _editor_flatten(df, args, where, dfctx):
    # func_flatten.go: nested maps expand into dotted keys. The string
    # map encodes nesting as JSON-object VALUES (ParseJSON of a nested
    # doc leaves inner objects as JSON strings), so each flatten pass
    # expands values that parse as JSON objects into `parent.child`
    # entries; `depth` passes (default 2) unroll deeper nesting.
    p = _target(args)
    depth = _raw(args[1]) if len(args) > 1 else 2
    m = _resolve_path(p)
    new = m
    for _ in range(int(depth)):
        entries = F.map_entries(new)
        new = F.map_from_entries(
            F.flatten(
                F.transform(
                    entries,
                    lambda e: F.when(
                        F.from_json(
                            e.getField("value"), "map<string,string>"
                        ).isNotNull()
                        & e.getField("value").rlike(r"^\{"),
                        F.transform(
                            F.map_entries(
                                F.from_json(
                                    e.getField("value"), "map<string,string>"
                                )
                            ),
                            lambda ne: F.struct(
                                F.concat(
                                    e.getField("key"), F.lit("."), ne.getField("key")
                                ).alias("key"),
                                ne.getField("value").alias("value"),
                            ),
                        ),
                    ).otherwise(F.array(e)),
                )
            )
        )
    return _set_path(df, p, new if where is None else F.when(where, new).otherwise(m), None)


EDITORS: dict[str, Callable] = {
    "set": _editor_set,
    "append": _editor_append,
    "delete_key": _editor_delete_key,
    "delete_matching_keys": _editor_delete_matching_keys,
    "keep_keys": _editor_keep_keys,
    "keep_matching_keys": _editor_keep_matching_keys,
    "replace_pattern": _editor_replace_pattern,
    "replace_match": _editor_replace_match,
    "replace_all_patterns": _editor_replace_all_patterns,
    "replace_all_matches": _editor_replace_all_matches,
    "truncate_all": _editor_truncate_all,
    "limit": _editor_limit,
    "merge_maps": _editor_merge_maps,
    "flatten": _editor_flatten,
}


def compile_statement(
    text: str,
    error_mode: str = "propagate",
    extra_where: Column | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """One OTTL statement -> DataFrame step.

    error_mode (parser.go:230-280): Spark's non-ANSI expression semantics
    (invalid casts/parses -> null) already give per-row ``ignore``
    behavior; ``propagate`` differences (abort batch) only arise for
    statements that cannot even compile — those raise at compile time in
    both modes.

    ``extra_where`` conjoins an out-of-band guard with the statement's
    own ``where`` — e.g. the routing connector scoping a route's editor
    to the rows ASSIGNED to that route.
    """
    stmt = parse_statement(text)
    if stmt.editor.name not in EDITORS:
        raise NameError(f"unknown editor {stmt.editor.name}")
    editor = EDITORS[stmt.editor.name]

    def step(df: DataFrame) -> DataFrame:
        where = compile_value(stmt.where, df) if stmt.where is not None else None
        if extra_where is not None:
            where = extra_where if where is None else (where & extra_where)
        try:
            return editor(df, stmt.editor.args, where, df)
        except Exception:
            if error_mode in ("ignore", "silent"):
                return df
            raise

    return step


def drop_cache_columns(df: DataFrame) -> DataFrame:
    """End of a statement sequence: cache is statement-scoped scratch."""
    return df.drop(*[c for c in df.columns if c.startswith("__cache_")])
