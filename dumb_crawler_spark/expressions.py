"""U7: config-expression compiler (SURVEY.md §2.3).

The reference evaluates tag expressions with a runtime infix-expression
interpreter on every URL, on a thread-local parser
(ThreadLocalEvaluator.java:39-109, URLExpressionEvaluator.java:52-62; grammar
documented in reference README.md:301-420). Interpreting per row is exactly
what a Spark engine must NOT do — so this module parses each expression ONCE
on the driver into an AST with two backends:

- :class:`ColumnCompiler` — AST → Catalyst Column tree. Executors never see
  the expression language; the predicate runs inside whole-stage codegen.
- :class:`PythonEvaluator` — AST → plain-Python evaluation over a dict of URL
  variables. Used ONLY by the single-threaded golden oracle (oracle.py), so
  engine and oracle provably share one grammar/semantics.

Grammar (reference README.md:301-420, ExpressionFunctions.java:25-30):
    expr    := or ;   or := and ('or' and)* ;   and := not ('and' not)*
    not     := 'not' not | cmp
    cmp     := primary (('=='|'!='|'<'|'<='|'>'|'>=') primary)?
    primary := STRING | NUMBER | 'true' | 'false' | 'null'
             | IDENT '(' expr (',' expr)* ')' | IDENT | '(' expr ')'
Functions (case-insensitive, like the reference parser registration):
    matches(s, re)   — Java String.matches = FULL-string regex test
                       (ExpressionFunctions.java:32-38) → anchored rlike
    extract(s, re)   — full match then named group 'value', else null
                       (ExpressionFunctions.java:54-64) → regexp_extract
    isResource(path) — static-asset extension test (ExpressionFunctions.java:46-52)
    containsElement  — DOM selector (ExpressionFunctions.java:66-71): no
                       meaning over URL variables; rejected at compile time
                       (the span-model analog is validationSelectors, fetch.py F5)
Variables: url, protocol, host, path, port, query, fragment, contentType —
the okhttp parse variables (URLExpressionEvaluator.java:29-49).

Null semantics parity: the reference's matches/isResource return FALSE (not
null) on null input and evaluateBoolean defaults to false — boolean positions
are coalesced to false, so ``not matches(...)`` is true on null input exactly
as in Java.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from .urlkit import RESOURCE_EXTENSIONS, anchor, is_resource, named_group_index

VARIABLES = ("url", "protocol", "host", "path", "port", "query", "fragment", "contentType")

# ---------------------------------------------------------------------------
# Lexer + parser → AST  (tuples: ('or',a,b) ('and',a,b) ('not',a)
# ('cmp',op,a,b) ('lit',value) ('var',name) ('call',fname,[args]))
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?)
      | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<op>==|!=|<=|>=|<|>|\(|\)|,)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)


def _lex(src: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"bad token at {pos}: {src[pos:pos + 20]!r}")
        pos = m.end()
        for kind in ("num", "str", "op", "ident"):
            if m.group(kind) is not None:
                toks.append((kind, m.group(kind)))
                break
    toks.append(("eof", ""))
    return toks


def _unquote(s: str) -> str:
    # Only quote escapes are unescaped — backslashes otherwise pass through
    # verbatim so regex literals like 'example\.com' survive (the reference
    # feeds the string straight into Pattern.compile).
    return re.sub(r"\\(['\"])", r"\1", s[1:-1])


class _Parser:
    def __init__(self, src: str):
        self.toks = _lex(src)
        self.i = 0
        self.src = src

    def parse(self) -> tuple:
        ast = self._or()
        if self._peek()[0] != "eof":
            raise ValueError(f"trailing input in expression: {self.src!r}")
        return ast

    def _peek(self):
        return self.toks[self.i]

    def _next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect(self, text: str):
        t = self._next()
        if t[1] != text:
            raise ValueError(f"expected {text!r}, got {t[1]!r}")

    def _or(self) -> tuple:
        ast = self._and()
        while self._peek() == ("ident", "or") or (
            self._peek()[0] == "ident" and self._peek()[1].lower() == "or"
        ):
            self._next()
            ast = ("or", ast, self._and())
        return ast

    def _and(self) -> tuple:
        ast = self._not()
        while self._peek()[0] == "ident" and self._peek()[1].lower() == "and":
            self._next()
            ast = ("and", ast, self._not())
        return ast

    def _not(self) -> tuple:
        if self._peek()[0] == "ident" and self._peek()[1].lower() == "not":
            self._next()
            return ("not", self._not())
        return self._cmp()

    def _cmp(self) -> tuple:
        left = self._primary()
        kind, text = self._peek()
        if kind == "op" and text in ("==", "!=", "<", "<=", ">", ">="):
            self._next()
            return ("cmp", text, left, self._primary())
        return left

    def _primary(self) -> tuple:
        kind, text = self._next()
        if kind == "num":
            return ("lit", float(text) if "." in text else int(text))
        if kind == "str":
            return ("lit", _unquote(text))
        if kind == "op" and text == "(":
            ast = self._or()
            self._expect(")")
            return ast
        if kind == "ident":
            low = text.lower()
            if low in ("true", "false"):
                return ("lit", low == "true")
            if low == "null":
                return ("lit", None)
            if self._peek()[1] == "(":
                return self._call(low)
            if text in VARIABLES:
                return ("var", text)
            raise ValueError(f"unknown variable {text!r} (have {VARIABLES})")
        raise ValueError(f"unexpected token {text!r}")

    def _call(self, fname: str) -> tuple:
        self._expect("(")
        args = []
        if self._peek()[1] != ")":
            args.append(self._or())
            while self._peek()[1] == ",":
                self._next()
                args.append(self._or())
        self._expect(")")
        if fname == "containselement":
            raise ValueError(
                "containsElement is a DOM operation (ExpressionFunctions.java:66-71); "
                "over the span data model use validationSelectors (fetch.py F5) instead"
            )
        if fname not in ("matches", "extract", "isresource"):
            raise ValueError(f"unknown function {fname!r}")
        return ("call", fname, args)


def parse_expression(src: str) -> tuple:
    return _Parser(src).parse()


def _regex_literal(ast: tuple, fn: str) -> str:
    if ast[0] != "lit" or not isinstance(ast[1], str):
        raise ValueError(f"{fn}() regex argument must be a string literal")
    return ast[1]


# ---------------------------------------------------------------------------
# Backend 1: Catalyst Columns
# ---------------------------------------------------------------------------


class ColumnCompiler:
    """AST → boolean Column over a `url_parts()` struct column."""

    def __init__(self, parts: Column):
        self.parts = parts

    def compile(self, src: str) -> Column:
        return self._bool(self._walk(parse_expression(src)))

    @staticmethod
    def _bool(col: Column) -> Column:
        return F.coalesce(col.cast("boolean"), F.lit(False))

    def _walk(self, ast: tuple) -> Column:
        op = ast[0]
        if op == "or":
            return self._bool(self._walk(ast[1])) | self._bool(self._walk(ast[2]))
        if op == "and":
            return self._bool(self._walk(ast[1])) & self._bool(self._walk(ast[2]))
        if op == "not":
            return ~self._bool(self._walk(ast[1]))
        if op == "cmp":
            l, r = self._walk(ast[2]), self._walk(ast[3])
            return {
                "==": lambda: l == r, "!=": lambda: l != r,
                "<": lambda: l < r, "<=": lambda: l <= r,
                ">": lambda: l > r, ">=": lambda: l >= r,
            }[ast[1]]()
        if op == "lit":
            return F.lit(ast[1])
        if op == "var":
            return self.parts[ast[1]]
        if op == "call":
            return self._fn(ast[1], ast[2])
        raise AssertionError(ast)

    def _fn(self, fname: str, args: list[tuple]) -> Column:
        if fname == "matches":
            pat = _regex_literal(args[1], "matches")
            return F.coalesce(self._walk(args[0]).rlike(anchor(pat)), F.lit(False))
        if fname == "extract":
            pat = _regex_literal(args[1], "extract")
            grp = named_group_index(pat, "value")
            return F.nullif(F.regexp_extract(self._walk(args[0]), anchor(pat), grp), F.lit(""))
        if fname == "isresource":
            return F.coalesce(is_resource(self._walk(args[0])), F.lit(False))
        raise AssertionError(fname)


def compile_expression(expr: str, parts: Column) -> Column:
    """Compile one tag expression to a boolean Column (driver-side, once)."""
    return ColumnCompiler(parts).compile(expr)


# ---------------------------------------------------------------------------
# Backend 2: plain Python (golden oracle only — never on executors)
# ---------------------------------------------------------------------------

_PY_RESOURCE_RE = re.compile(r".*\.(" + "|".join(RESOURCE_EXTENSIONS) + r")$")


class PythonEvaluator:
    """Evaluates the same AST over a dict of URL variables; used by the
    single-threaded oracle to generate goldens with identical semantics."""

    def __init__(self, src: str):
        self.ast = parse_expression(src)

    def evaluate_bool(self, variables: dict[str, Any]) -> bool:
        return bool(self._walk(self.ast, variables))

    def _walk(self, ast: tuple, v: dict[str, Any]) -> Any:
        op = ast[0]
        if op == "or":
            return bool(self._walk(ast[1], v)) or bool(self._walk(ast[2], v))
        if op == "and":
            return bool(self._walk(ast[1], v)) and bool(self._walk(ast[2], v))
        if op == "not":
            return not bool(self._walk(ast[1], v))
        if op == "cmp":
            l, r = self._walk(ast[2], v), self._walk(ast[3], v)
            if l is None or r is None:
                return False  # SQL-null comparison coerced false (parity with Column backend)
            return {
                "==": l == r, "!=": l != r, "<": l < r,
                "<=": l <= r, ">": l > r, ">=": l >= r,
            }[ast[1]]
        if op == "lit":
            return ast[1]
        if op == "var":
            return v.get(ast[1])
        if op == "call":
            return self._fn(ast[1], ast[2], v)
        raise AssertionError(ast)

    def _fn(self, fname: str, args: list[tuple], v: dict[str, Any]) -> Any:
        if fname == "matches":
            s = self._walk(args[0], v)
            pat = _regex_literal(args[1], "matches")
            return s is not None and re.fullmatch(pat, str(s)) is not None
        if fname == "extract":
            s = self._walk(args[0], v)
            pat = _regex_literal(args[1], "extract")
            if s is None:
                return None
            py_pat = re.sub(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", r"(?P<\1>", pat)
            m = re.fullmatch(py_pat, str(s))
            got = m.group("value") if m else None
            return got if got else None  # '' → null, like nullif in the Column backend
        if fname == "isresource":
            s = self._walk(args[0], v)
            return s is not None and _PY_RESOURCE_RE.match(str(s)) is not None
        raise AssertionError(fname)
