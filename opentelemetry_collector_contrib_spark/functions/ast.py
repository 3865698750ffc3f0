"""OTTL-lite grammar: tokenizer + recursive-descent parser -> AST.

Grammar modeled on the reference's participle grammar
(pkg/ottl/grammar.go:14-33,102-190):

    statement  := editor_call [ "where" bool_expr ]
    editor_call:= IDENT "(" args ")"
    args       := value ("," value)*
    value      := literal | path | list | converter_call | math_expr
    math       := term (("+"|"-") term)*        (math.go:55-150)
    term       := factor (("*"|"/") factor)*
    bool_expr  := bool_term ("or" bool_term)*
    bool_term  := bool_factor ("and" bool_factor)*
    bool_factor:= "not" bool_factor | comparison | "(" bool_expr ")" | value
    comparison := value OP value, OP in == != < <= > >=  (grammar.go:121-175)

Paths use dots and string/int index keys: ``attributes.k``,
``attributes["k"]``, ``body`` (grammar.go:254-268).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


_ESCAPES = {'"': '"', "\\": "\\", "n": "\n", "t": "\t"}


def _unescape(raw: str) -> str:
    """Single-pass left-to-right unescape: sequential str.replace
    corrupted backslash-then-letter sequences (r'C:\\new' became
    'C:' + newline + 'ew' because '\\\\' collapsed FIRST and the freed
    backslash then matched '\\n')."""
    return re.sub(
        r"\\(.)", lambda m: _ESCAPES.get(m.group(1), "\\" + m.group(1)), raw
    )


@dataclass
class Lit:
    value: object  # str, int, float, bool, None, bytes


@dataclass
class Path:
    parts: list[object]  # str segments / int indexes


@dataclass
class ListExpr:
    items: list


@dataclass
class Call:
    name: str
    args: list


@dataclass
class Index:
    obj: object   # expression yielding a map/list (e.g. converter Call)
    key: object   # str map key or int 0-based list index


@dataclass
class BinOp:
    op: str
    left: object
    right: object


@dataclass
class Not:
    expr: object


@dataclass
class Statement:
    editor: Call
    where: object | None


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<bytes>0x[0-9a-fA-F]+)
  | (?P<float>\d*\.\d+(?:[eE][-+]?\d+)?)
  | (?P<int>\d+)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|<|>|\+|\-|\*|/|\(|\)|\[|\]|,|\.)
    """,
    re.VERBOSE,
)


def tokenize(text: str) -> list[tuple[str, str]]:
    out = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise SyntaxError(f"bad token at {text[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.pos = 0

    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.pos + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, val: str) -> None:
        kind, v = self.next()
        if v != val:
            raise SyntaxError(f"expected {val!r}, got {v!r}")

    # --- statement -------------------------------------------------------
    def parse_statement(self) -> Statement:
        editor = self.parse_call()
        where = None
        if self.peek()[1] == "where":
            self.next()
            where = self.parse_bool()
        if self.peek()[0] != "eof":
            raise SyntaxError(f"trailing input at {self.peek()[1]!r}")
        return Statement(editor, where)

    def parse_call(self) -> Call:
        kind, name = self.next()
        if kind != "ident":
            raise SyntaxError(f"expected function name, got {name!r}")
        self.expect("(")
        args = []
        if self.peek()[1] != ")":
            args.append(self.parse_value())
            while self.peek()[1] == ",":
                self.next()
                args.append(self.parse_value())
        self.expect(")")
        return Call(name, args)

    # --- boolean expressions ----------------------------------------------
    def parse_bool(self):
        left = self.parse_bool_term()
        while self.peek()[1] == "or":
            self.next()
            left = BinOp("or", left, self.parse_bool_term())
        return left

    def parse_bool_term(self):
        left = self.parse_bool_factor()
        while self.peek()[1] == "and":
            self.next()
            left = BinOp("and", left, self.parse_bool_factor())
        return left

    def parse_bool_factor(self):
        if self.peek()[1] == "not":
            self.next()
            return Not(self.parse_bool_factor())
        if self.peek()[1] == "(":
            # could be a grouped bool OR the parenthesized start of a
            # math comparison like (a + b) * 2 > 10 — try the bool
            # grouping, and BACKTRACK to a value parse when it fails or
            # a math operator follows the closing paren
            snap = self.pos
            self.next()
            try:
                inner = self.parse_bool()
                self.expect(")")
                grouped = True
            except SyntaxError:
                grouped = False
            if grouped and self.peek()[1] not in ("+", "-", "*", "/"):
                left = inner
            else:
                self.pos = snap
                left = self.parse_value()
        else:
            left = self.parse_value()
        if self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            right = self.parse_value()
            return BinOp(op, left, right)
        return left

    # --- values / math -----------------------------------------------------
    def parse_value(self):
        return self.parse_math()

    def parse_math(self):
        left = self.parse_term()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            left = BinOp(op, left, self.parse_term())
        return left

    def parse_term(self):
        left = self.parse_factor()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            left = BinOp(op, left, self.parse_factor())
        return left

    def parse_factor(self):
        kind, v = self.peek()
        if v in ("-", "+"):
            # unary sign (the tokenizer no longer folds it into number
            # literals, which broke binary minus written without a
            # space: 'severity_number -1')
            self.next()
            inner = self.parse_factor()
            if v == "+":
                return inner
            if isinstance(inner, Lit) and isinstance(inner.value, (int, float)):
                return Lit(-inner.value)
            return BinOp("-", Lit(0), inner)
        if v == "(":
            self.next()
            inner = self.parse_math()
            self.expect(")")
            return inner
        if v == "[":
            self.next()
            items = []
            if self.peek()[1] != "]":
                items.append(self.parse_value())
                while self.peek()[1] == ",":
                    self.next()
                    items.append(self.parse_value())
            self.expect("]")
            return ListExpr(items)
        if kind == "string":
            self.next()
            raw = v[1:-1]
            return Lit(_unescape(raw))
        if kind == "bytes":
            self.next()
            return Lit(bytes.fromhex(v[2:]))
        if kind == "float":
            self.next()
            return Lit(float(v))
        if kind == "int":
            self.next()
            return Lit(int(v))
        if kind == "ident":
            if v == "true":
                self.next()
                return Lit(True)
            if v == "false":
                self.next()
                return Lit(False)
            if v == "nil":
                self.next()
                return Lit(None)
            if self.peek(1)[1] == "(":
                out = self.parse_call()
                # postfix indexing on converter results:
                # ParseJSON(x)["k"], Split(s, ",")[0]  (grammar.go Keys
                # on converter invocations)
                while self.peek()[1] == "[":
                    self.next()
                    kind, key = self.next()
                    if kind == "string":
                        out = Index(out, key[1:-1])
                    elif kind == "int":
                        out = Index(out, int(key))
                    else:
                        raise SyntaxError(f"bad index {key!r}")
                    self.expect("]")
                return out
            return self.parse_path()
        raise SyntaxError(f"unexpected token {v!r}")

    def parse_path(self) -> Path:
        parts: list[object] = [self.next()[1]]
        while True:
            nxt = self.peek()[1]
            if nxt == ".":
                self.next()
                kind, seg = self.next()
                if kind != "ident":
                    raise SyntaxError(f"bad path segment {seg!r}")
                parts.append(seg)
            elif nxt == "[":
                self.next()
                kind, key = self.next()
                if kind == "string":
                    parts.append(key[1:-1])
                elif kind == "int":
                    parts.append(int(key))
                else:
                    raise SyntaxError(f"bad index {key!r}")
                self.expect("]")
            else:
                break
        return Path(parts)


def parse_statement(text: str) -> Statement:
    return Parser(text).parse_statement()


def parse_condition(text: str):
    p = Parser(text)
    cond = p.parse_bool()
    if p.peek()[0] != "eof":
        raise SyntaxError(f"trailing input at {p.peek()[1]!r}")
    return cond
