"""SQL expression compiler for MATCH_RECOGNIZE DEFINE/MEASURES clauses
(reference: StreamExecMatch.java:90 + MatchCodeGenerator.scala — the
reference code-generates these expressions; we compile them to Python
closures evaluated inside the CEP executor's Arrow batches).

Supported grammar (the reference's commonly-exercised core):

- literals: numbers, 'strings', TRUE/FALSE/NULL
- column refs: ``col`` (current row), ``VAR.col`` (in DEFINE: the current
  row when VAR is the variable being defined, else LAST(VAR.col) with
  RUNNING semantics; in MEASURES: LAST(VAR.col) with FINAL semantics —
  SQL's default for ONE ROW PER MATCH)
- navigation: ``PREV(expr[, n])`` / ``NEXT(expr[, n])`` (DEFINE only;
  partition-row navigation), ``FIRST(VAR.col)`` / ``LAST(VAR.col)``
- aggregates: ``COUNT(VAR.*)``, ``COUNT(*)``, ``SUM/MIN/MAX/AVG(VAR.col)``
- ``CLASSIFIER()`` (MEASURES only)
- operators: ``= <> != < <= > >= + - * / %  AND OR NOT ( )``

NULL semantics: comparisons involving NULL are UNKNOWN — false in
DEFINE (WHERE-filtered), NULL in MEASURES (projected, three-valued
logic); arithmetic with NULL yields NULL; aggregates ignore nothing
(the CEP rows are dense dicts).
"""

from __future__ import annotations

import re
from collections.abc import Callable

_TOKENS = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.\d*|\.\d+|\d+)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op><=|>=|<>|!=|=|<|>|\+|-|\*|/|%|\(|\)|\.|,)"
    r")"
)

_KEYWORDS = {"AND", "OR", "NOT", "TRUE", "FALSE", "NULL"}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKENS.match(src, pos)
        if not m:
            if src[pos:].strip():
                raise ValueError(f"bad token at: {src[pos:]!r}")
            break
        pos = m.end()
        if m.group("num"):
            out.append(("num", m.group("num")))
        elif m.group("str"):
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("name"):
            n = m.group("name")
            out.append(("kw", n.upper()) if n.upper() in _KEYWORDS else ("name", n))
        else:
            out.append(("op", m.group("op")))
    return out


class _Parser:
    """Pratt parser → nested Python closures.

    Closures take an ``Env`` carrying the evaluation context; DEFINE and
    MEASURES differ only in how refs/navigation resolve (see _Ref*)."""

    def __init__(self, tokens: list[tuple[str, str]], mode: str, current_var: str | None):
        self.toks = tokens
        self.i = 0
        self.mode = mode  # "define" | "measures"
        self.current_var = current_var

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.take()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {kind} {val}, got {k} {v}")
        return v

    # precedence: OR < AND < NOT < cmp < addsub < muldiv < unary/primary
    def parse(self):
        e = self.parse_or()
        if self.peek() != (None, None):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return e

    def parse_or(self):
        left = self.parse_and()
        while self.peek() == ("kw", "OR"):
            self.take()
            right = self.parse_and()
            left = (lambda l, r: lambda env: bool(l(env)) or bool(r(env)))(left, right)
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.peek() == ("kw", "AND"):
            self.take()
            right = self.parse_not()
            left = (lambda l, r: lambda env: bool(l(env)) and bool(r(env)))(left, right)
        return left

    def parse_not(self):
        if self.peek() == ("kw", "NOT"):
            self.take()
            inner = self.parse_not()
            return lambda env: not bool(inner(env))
        return self.parse_cmp()

    def parse_cmp(self):
        left = self.parse_addsub()
        k, v = self.peek()
        if k == "op" and v in ("=", "<>", "!=", "<", "<=", ">", ">="):
            self.take()
            right = self.parse_addsub()

            def cmp(env, l=left, r=right, op=v, mode=self.mode):
                a, b = l(env), r(env)
                if a is None or b is None:
                    # SQL UNKNOWN: a DEFINE predicate filters it (WHERE
                    # semantics → False); a MEASURES projection must
                    # surface NULL (three-valued logic, matching the
                    # reference's generated code)
                    return False if mode == "define" else None
                if op == "=":
                    return a == b
                if op in ("<>", "!="):
                    return a != b
                if op == "<":
                    return a < b
                if op == "<=":
                    return a <= b
                if op == ">":
                    return a > b
                return a >= b

            return cmp
        return left

    def _arith(self, op, a, b):
        if a is None or b is None:
            return None
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        return a % b

    def parse_addsub(self):
        left = self.parse_muldiv()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.take()
                right = self.parse_muldiv()
                left = (lambda l, r, op: lambda env: self._arith(op, l(env), r(env)))(left, right, v)
            else:
                return left

    def parse_muldiv(self):
        left = self.parse_unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/", "%"):
                self.take()
                right = self.parse_unary()
                left = (lambda l, r, op: lambda env: self._arith(op, l(env), r(env)))(left, right, v)
            else:
                return left

    def parse_unary(self):
        k, v = self.peek()
        if (k, v) == ("op", "-"):
            self.take()
            inner = self.parse_unary()
            return lambda env: None if inner(env) is None else -inner(env)
        return self.parse_primary()

    def parse_primary(self):
        k, v = self.take()
        if k == "num":
            val = float(v) if ("." in v) else int(v)
            return lambda env: val
        if k == "str":
            return lambda env: v
        if k == "kw":
            if v == "TRUE":
                return lambda env: True
            if v == "FALSE":
                return lambda env: False
            if v == "NULL":
                return lambda env: None
            raise ValueError(f"unexpected keyword {v}")
        if (k, v) == ("op", "("):
            e = self.parse_or()
            self.expect("op", ")")
            return e
        if k == "name":
            up = v.upper()
            if self.mode == "measures" and up in ("RUNNING", "FINAL") and self.peek()[0] == "name":
                inner = self.parse_primary()
                if up == "RUNNING":
                    return inner  # running view is the default env.m
                return lambda env: inner(
                    _MeasureEnv(env.final if env.final is not None else env.m, env.final, None, None)
                )
            if self.peek() == ("op", "("):
                return self.parse_call(up)
            if self.peek() == ("op", "."):
                self.take()
                col = self.expect("name")
                return self.var_col_ref(v, col)
            return self.col_ref(v)
        raise ValueError(f"unexpected token {k} {v}")

    # ---- reference resolution (the mode-dependent part) ----------------

    def col_ref(self, col: str):
        if self.mode == "define":
            return lambda env: env.row.get(col)
        # measures: current row in ALL ROWS mode, else the match's last row
        def ref(env):
            if env.row is not None:
                return env.row.get(col)
            return env.m.last(env.m.classifier(), col) if env.m.classifier() else None

        return ref

    def var_col_ref(self, var: str, col: str):
        if self.mode == "define":
            cur = self.current_var

            def ref(env):
                if var == cur:
                    return env.row.get(col)
                rows = env.ctx.get_events_for_pattern(var)
                return rows[-1].get(col) if rows else None

            return ref
        return lambda env: env.m.last(var, col)

    def parse_call(self, fname: str):
        self.expect("op", "(")
        if fname == "CLASSIFIER":
            self.expect("op", ")")
            if self.mode != "measures":
                raise ValueError("CLASSIFIER() is a MEASURES function")
            return lambda env: env.cls if env.cls is not None else env.m.classifier()
        if fname == "COUNT":
            # COUNT(*) or COUNT(VAR.*)
            k, v = self.take()
            if (k, v) == ("op", "*"):
                self.expect("op", ")")
                return lambda env: sum(env.m.count(x) for x in env.m)
            var = v
            self.expect("op", ".")
            self.expect("op", "*")
            self.expect("op", ")")
            if self.mode == "define":
                return lambda env: len(env.ctx.get_events_for_pattern(var))
            return lambda env: env.m.count(var)
        if fname in ("SUM", "MIN", "MAX", "AVG"):
            var = self.expect("name")
            self.expect("op", ".")
            col = self.expect("name")
            self.expect("op", ")")

            def rows_of(env, var=var):
                if self.mode == "define":
                    return env.ctx.get_events_for_pattern(var)
                return env.m.rows(var)

            def agg(env, f=fname):
                vals = [r.get(col) for r in rows_of(env) if r.get(col) is not None]
                if not vals:
                    return None
                if f == "SUM":
                    return sum(vals)
                if f == "MIN":
                    return min(vals)
                if f == "MAX":
                    return max(vals)
                return sum(vals) / len(vals)

            return agg
        if fname in ("PREV", "NEXT"):
            if self.mode != "define":
                raise ValueError(f"{fname}() navigates partition rows — DEFINE only")
            # PREV(col | VAR.col [, n])
            name = self.expect("name")
            col = name
            if self.peek() == ("op", "."):
                self.take()
                col = self.expect("name")
            n = 1
            if self.peek() == ("op", ","):
                self.take()
                n = int(self.expect("num"))
            self.expect("op", ")")

            def nav(env, col=col, n=n, f=fname):
                r = env.ctx.prev(n) if f == "PREV" else env.ctx.ahead(n)
                return r.get(col) if r is not None else None

            return nav
        if fname in ("FIRST", "LAST"):
            var = self.expect("name")
            self.expect("op", ".")
            col = self.expect("name")
            self.expect("op", ")")
            if self.mode == "define":

                def fl(env, var=var, col=col, f=fname):
                    rows = env.ctx.get_events_for_pattern(var)
                    if not rows:
                        return None
                    r = rows[0] if f == "FIRST" else rows[-1]
                    return r.get(col)

                return fl

            def flm(env, var=var, col=col, f=fname):
                return env.m.first(var, col) if f == "FIRST" else env.m.last(var, col)

            return flm
        raise ValueError(f"unsupported function {fname}")


class _DefineEnv:
    __slots__ = ("row", "ctx")

    def __init__(self, row, ctx):
        self.row = row
        self.ctx = ctx


class _MeasureEnv:
    """ONE ROW PER MATCH: ``m`` is the FINAL match view and the other
    fields are None. ALL ROWS PER MATCH: ``m`` is the RUNNING view at the
    current row, ``final`` the whole match, ``row``/``cls`` the current
    row and its classifier (SQL defaults aggregates to RUNNING there;
    the FINAL keyword switches to ``final``)."""

    __slots__ = ("m", "final", "row", "cls")

    def __init__(self, m, final=None, row=None, cls=None):
        self.m = m
        self.final = final
        self.row = row
        self.cls = cls


def compile_define(var: str, sql: str) -> Callable:
    """DEFINE clause text → (row, ctx) predicate for Pattern.where_iterative."""
    fn = _Parser(_tokenize(sql), "define", var).parse()
    return lambda row, ctx: bool(fn(_DefineEnv(row, ctx)))


def compile_measure(sql: str) -> Callable:
    """MEASURES expression text → (MatchAccess, [final, row, classifier])
    → value. The optional args supply ALL ROWS PER MATCH context."""
    fn = _Parser(_tokenize(sql), "measures", None).parse()
    return lambda m, final=None, row=None, cls=None: fn(_MeasureEnv(m, final, row, cls))
