"""span processor: span-name <-> attribute manipulation + status update.

Reference: processor/spanprocessor/span.go —
- ``from_attributes`` (:99-158): span name becomes the separator-joined
  attribute values; if ANY key is missing the name is left untouched.
- ``to_attributes`` (:160-225): regex rules with NAMED groups run in
  order over the (progressively rewritten) span name; on a match each
  group's text becomes an attribute and the matched region is rewritten
  with ``{group}`` placeholders; ``break_after_match`` stops at the
  first matching rule. Empty span names are skipped.
- ``set_status`` (:227-246): force status code; description only kept
  for Error (span.go sets description only in the error branch).
- include/exclude match config gates the whole processor per span
  (:82-91 skipExpr); restated as SQL predicates.

Columnar restatement: everything is a chain of ``when`` projections —
no shuffle, no UDF. The ``{group}`` rewrite uses pattern surgery: each
top-level non-group chunk of the rule is wrapped in a capturing group
so one ``regexp_replace`` can echo it (``$N``) while named groups
become literal ``{name}`` text. This reproduces the reference's
index-based splice for the (universal in practice, and in every
reference test) case of non-nested named groups; stray unnamed groups
are demoted to non-capturing so numbering stays aligned. Like the
reference, only the FIRST match region is rewritten: the region is
located with ``regexp_instr``/``regexp_substr`` and rebuilt with an
anchored replace, so even empty-matchable rules splice exactly once.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at

_STATUS = {"Ok", "Error", "Unset"}


def _segment_rule(pattern: str) -> list[tuple[str, str]]:
    """Split a regex into top-level segments:
    ('lit', chunk) for non-group regex text, ('grp:<name>', body) for
    top-level named groups (Go ``(?P<name>...)`` or Java ``(?<name>...)``).
    Escapes and character classes are honored; nested parens stay inside
    their segment."""
    segs: list[tuple[str, str]] = []
    buf = ""
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            buf += pattern[i : i + 2]
            i += 2
            continue
        if c == "[":
            j = i + 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 2 if pattern[j] == "\\" else 1
            buf += pattern[i : j + 1]
            i = j + 1
            continue
        m = _re.match(r"\(\?P?<(\w+)>", pattern[i:]) if c == "(" else None
        if m:
            # find the matching close paren of this group
            j, depth = i, 0
            while j < n:
                if pattern[j] == "\\":
                    j += 2
                    continue
                if pattern[j] == "[":
                    # skip character classes: a ')' inside [...] (the
                    # common [^)] idiom) is literal, not a group close
                    j += 1
                    if j < n and pattern[j] == "^":
                        j += 1
                    if j < n and pattern[j] == "]":
                        j += 1  # leading ] is literal inside a class
                    while j < n and pattern[j] != "]":
                        j += 2 if pattern[j] == "\\" else 1
                    j += 1
                    continue
                if pattern[j] == "(":
                    depth += 1
                elif pattern[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if buf:
                segs.append(("lit", buf))
                buf = ""
            segs.append((f"grp:{m.group(1)}", pattern[i + m.end() : j]))
            i = j + 1
            continue
        buf += c
        i += 1
    if buf:
        segs.append(("lit", buf))
    return segs


def _demote_unnamed(chunk: str) -> str:
    """Turn plain capturing parens into non-capturing so they don't
    shift the segment group numbering."""
    out, i, n = "", 0, len(chunk)
    while i < n:
        c = chunk[i]
        if c == "\\" and i + 1 < n:
            out += chunk[i : i + 2]
            i += 2
            continue
        if c == "[":
            j = i + 1
            if j < n and chunk[j] == "]":
                j += 1
            while j < n and chunk[j] != "]":
                j += 2 if chunk[j] == "\\" else 1
            out += chunk[i : j + 1]
            i = j + 1
            continue
        if c == "(" and not chunk[i : i + 2] == "(?":
            out += "(?:"
            i += 1
            continue
        out += c
        i += 1
    return out


@dataclass
class ToAttributeRule:
    pattern: str  # regex with named groups, Go (?P<x>) or Java (?<x>) style

    def __post_init__(self):
        self.segments = _segment_rule(self.pattern)
        self.group_names = [s[0][4:] for s in self.segments if s[0].startswith("grp:")]
        if not self.group_names:
            raise ValueError(f"rule needs at least one named group: {self.pattern!r}")
        # rewrite pattern: wrap lit chunks in capturing groups; demote
        # stray unnamed groups (so numbering is exactly one group per
        # segment); build the $N / {name} replacement. Extraction uses
        # the SAME pattern with each named group's known number.
        # all segments become plain numbered groups: Java named groups
        # reject common config names like operation_website (no '_'
        # allowed), and the names are only needed Python-side anyway
        parts, repl, gnum = [], "", 0
        self.group_numbers: list[int] = []
        for kind, body in self.segments:
            body = _demote_unnamed(body)
            gnum += 1
            parts.append(f"({body})")
            if kind == "lit":
                repl += f"${gnum}"
            else:
                repl += "{" + kind[4:] + "}"
                self.group_numbers.append(gnum)
        self.rewrite_pattern = "".join(parts)
        self.replacement = repl


@dataclass
class SpanProcessor:
    from_attributes: list[str] = field(default_factory=list)
    separator: str = ""
    to_attributes: list[str] = field(default_factory=list)
    break_after_match: bool = False
    status_code: str | None = None
    status_description: str | None = None
    include_condition: str | None = None  # SQL gate (match config posture)
    exclude_condition: str | None = None
    name_col: str = "span_name"
    attrs_col: str = "attributes"
    status_col: str = "status_code"

    def __post_init__(self):
        if self.status_code is not None and self.status_code not in _STATUS:
            raise ValueError(f"status code must be one of {_STATUS}")
        self.rules = [ToAttributeRule(p) for p in self.to_attributes]

    def _gate(self, df: DataFrame) -> Column:
        g = F.lit(True)
        if self.include_condition:
            g = g & F.coalesce(F.expr(self.include_condition), F.lit(False))
        if self.exclude_condition:
            g = g & ~F.coalesce(F.expr(self.exclude_condition), F.lit(False))
        return g

    def __call__(self, df: DataFrame) -> DataFrame:
        out = df
        gate = self._gate(df)
        name, attrs = self.name_col, self.attrs_col

        # from_attributes: rename only when EVERY key is present
        if self.from_attributes:
            vals = [try_element_at(F.col(attrs), k) for k in self.from_attributes]
            present = None
            for v in vals:
                p = v.isNotNull()
                present = p if present is None else (present & p)
            new_name = F.concat_ws(self.separator, *vals)
            out = out.withColumn(
                name, F.when(gate & present, new_name).otherwise(F.col(name))
            )

        # to_attributes: rules chain over the progressively-rewritten
        # name; with break_after_match only the first matching rule runs
        if self.rules:
            applied = F.lit(False)
            for r in self.rules:
                cur = F.col(name)
                matched = (
                    gate & cur.isNotNull() & (cur != "") & cur.rlike(r.rewrite_pattern)
                )
                if self.break_after_match:
                    matched = matched & ~applied
                ext = F.map_from_arrays(
                    F.array(*[F.lit(g) for g in r.group_names]),
                    F.array(
                        *[
                            F.regexp_extract(cur, r.rewrite_pattern, gn)
                            for gn in r.group_numbers
                        ]
                    ),
                )
                kept = F.map_filter(
                    F.col(attrs),
                    lambda k, _v: ~F.array_contains(
                        F.array(*[F.lit(g) for g in r.group_names]), k
                    ),
                )
                # FIRST-match-only splice, like the reference's
                # FindStringSubmatchIndex surgery: locate the first match
                # region (regexp_instr/substr), rebuild just that region
                # with an anchored replace (a global regexp_replace would
                # also hit a trailing empty match for empty-matchable
                # rules and double the placeholders), keep the rest
                m_pos = F.regexp_instr(cur, F.lit(r.rewrite_pattern))
                m_txt = F.regexp_substr(cur, F.lit(r.rewrite_pattern))
                rebuilt = F.regexp_replace(
                    m_txt, "^(?:" + r.rewrite_pattern + ")", r.replacement
                )
                new_name = F.concat(
                    F.substring(cur, F.lit(1), m_pos - 1),
                    rebuilt,
                    F.substring(
                        cur, m_pos + F.length(m_txt), F.length(cur)
                    ),
                )
                # single withColumns so name/attrs/applied all read the
                # PRE-update name (chained withColumn would re-resolve)
                out = out.withColumns(
                    {
                        name: F.when(matched, new_name).otherwise(cur),
                        attrs: F.when(
                            matched, F.map_concat(kept, ext)
                        ).otherwise(F.col(attrs)),
                        "__sp_applied__": applied | matched,
                    }
                )
                applied = F.col("__sp_applied__")
            out = out.drop("__sp_applied__")

        # set_status: description only survives for Error (span.go:232-244)
        if self.status_code:
            prev_status = (
                F.col(self.status_col)
                if self.status_col in df.columns
                else F.lit(None).cast("string")
            )
            out = out.withColumn(
                self.status_col,
                F.when(gate, F.lit(self.status_code.upper())).otherwise(prev_status),
            )
            if self.status_code == "Error" and self.status_description:
                desc_col = "status_description"
                prev = (
                    F.col(desc_col)
                    if desc_col in out.columns
                    else F.lit(None).cast("string")
                )
                out = out.withColumn(
                    desc_col,
                    F.when(gate, F.lit(self.status_description)).otherwise(prev),
                )
        return out
