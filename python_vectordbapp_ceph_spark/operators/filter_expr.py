"""Milvus-style boolean filter expression → Spark Column.

The reference filters/deletes with Milvus' expression grammar, e.g.
``url == "http://.../key"`` (milvus-app/pythonvectordbceph_milvus.py:109)
and ``client.query(filter="", ...)`` (milvus-app/describe.py:27-29).
The grammar surface used/implied: ``== != > >= < <= in like and or
not``, parentheses, string/number/bool literals, identifiers, and
JSON-ish field access ``col["key"]``. Plus the rest of the published
Milvus expression surface: arithmetic (``+ - * / %`` with the usual
precedence and unary minus), ``is null`` / ``is not null``, and the
array predicates ``array_contains(field, value)`` /
``array_length(field)``.

This is a tiny recursive-descent parser producing Catalyst Columns, so
translated predicates participate in pushdown/pruning like any native
filter — predicate + ANN = filter-then-rank in one optimized plan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()|(?P<rparen>\))|(?P<lbrack>\[)|(?P<rbrack>\])|
        (?P<op>==|!=|>=|<=|>|<)|
        (?P<arith>\+|\-|\*|/|%)|
        (?P<comma>,)|
        (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')|
        (?P<number>\d+\.\d+|\d+)|
        (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "like", "true", "false", "null", "is"}


class FilterExprError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise FilterExprError(f"bad token at {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "word" and val.lower() in _KEYWORDS:
            kind = val.lower()
        out.append((kind, val))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], dtypes: dict[str, str] | None = None):
        self.toks = tokens
        self.i = 0
        # column name → Spark simpleString dtype, used to compile
        # `col["key"]` correctly for MapType vs JSON-string columns
        self.dtypes = dtypes or {}

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise FilterExprError("unexpected end of expression")
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise FilterExprError(f"expected {kind}, got {k} {v!r}")
        return v

    # or_expr := and_expr (OR and_expr)*
    def parse_or(self) -> Column:
        left = self.parse_and()
        while self.peek() == "or":
            self.next()
            left = left | self.parse_and()
        return left

    def parse_and(self) -> Column:
        left = self.parse_not()
        while self.peek() == "and":
            self.next()
            left = left & self.parse_not()
        return left

    def parse_not(self) -> Column:
        if self.peek() == "not":
            self.next()
            return ~self.parse_not()
        return self.parse_cmp()

    def parse_cmp(self) -> Column:
        if self.peek() == "lparen":
            # could be a grouped boolean expr
            save = self.i
            self.next()
            inner = self.parse_or()
            self.expect("rparen")
            # a grouped expr can't be followed by a comparison operator
            # in this grammar (operands are identifiers/literals)
            if self.peek() in ("op", "in", "like", "arith", "is"):
                self.i = save  # … unless it was a parenthesized operand
            else:
                return inner
        left = self.parse_operand()
        k = self.peek()
        if k == "is":
            self.next()
            negate = False
            if self.peek() == "not":
                self.next()
                negate = True
            self.expect("null")
            return left.isNotNull() if negate else left.isNull()
        if k == "op":
            _, op = self.next()
            right = self.parse_operand()
            return {
                "==": left.__eq__,
                "!=": left.__ne__,
                ">": left.__gt__,
                ">=": left.__ge__,
                "<": left.__lt__,
                "<=": left.__le__,
            }[op](right)
        if k == "in":
            self.next()
            opener = self.peek()
            if opener not in ("lparen", "lbrack"):
                raise FilterExprError("in-list must open with ( or [")
            self.next()
            closer = "rparen" if opener == "lparen" else "rbrack"
            vals = [self.parse_literal()]
            while self.peek() == "comma":
                self.next()
                vals.append(self.parse_literal())
            if self.peek() != closer:  # closer must match the opener
                raise FilterExprError("unterminated in-list")
            self.next()
            return left.isin(*vals)
        if k == "like":
            self.next()
            kind, v = self.next()
            if kind != "string":
                raise FilterExprError("like needs a string pattern")
            return left.like(_unquote(v))
        # bare boolean operand (e.g. `true`)
        return left.cast("boolean")

    # operand := term (('+'|'-') term)* — full arithmetic with the
    # usual precedence, so `price * (1 - discount) >= 100` compiles to
    # one Catalyst expression tree (still pushdown-eligible)
    def parse_operand(self) -> Column:
        left = self.parse_term()
        while self.peek() == "arith" and self.toks[self.i][1] in "+-":
            _, op = self.next()
            right = self.parse_term()
            left = left + right if op == "+" else left - right
        return left

    def parse_term(self) -> Column:
        left = self.parse_unary()
        while self.peek() == "arith" and self.toks[self.i][1] in "*/%":
            _, op = self.next()
            right = self.parse_unary()
            left = {"*": left.__mul__, "/": left.__truediv__,
                    "%": left.__mod__}[op](right)
        return left

    def parse_unary(self) -> Column:
        if self.peek() == "arith" and self.toks[self.i][1] == "-":
            self.next()
            return -self.parse_unary()
        return self.parse_primary()

    def parse_primary(self) -> Column:
        k = self.peek()
        if k == "lparen":  # parenthesized operand: (a) == 1
            self.next()
            inner = self.parse_operand()
            self.expect("rparen")
            return inner
        if k in ("string", "number", "true", "false", "null"):
            return F.lit(self.parse_literal())
        if k == "word":
            _, name = self.next()
            # array predicate calls: array_contains(f, v), array_length(f)
            if self.peek() == "lparen" and name in ("array_contains",
                                                    "array_length"):
                self.next()
                arg = self.parse_operand()
                if name == "array_contains":
                    self.expect("comma")
                    val = F.lit(self.parse_literal())
                    self.expect("rparen")
                    return F.array_contains(arg, val)
                self.expect("rparen")
                return F.size(arg)
            col = F.col(name)
            dtype = self.dtypes.get(name, "")
            while self.peek() == "lbrack":
                self.next()
                kind, key = self.next()
                if kind != "string":
                    raise FilterExprError("json access needs string key")
                self.expect("rbrack")
                key_s = _unquote(key)
                # Map columns need element_at — get_json_object on a
                # stringified map silently returns NULL (map<...>'s cast
                # is not JSON). JSON-string columns need the opposite.
                # With no schema available, assume MapType (the
                # collection schema's tags/props are maps). STRING
                # values are treated as JSON documents on further
                # access (NULL when not JSON); access inside any other
                # primitive value is rejected loudly at translate time
                # (a silent always-NULL predicate would make filtered
                # deletes no-op).
                if dtype.startswith("map<"):
                    col = F.try_element_at(col, F.lit(key_s))
                    dtype = _map_value_type(dtype)
                elif not dtype or dtype == "string":
                    # JSON path: string columns (and string map values)
                    # are treated as JSON documents
                    col = F.get_json_object(col.cast("string"), f"$.{key_s}") \
                        if dtype == "string" else F.try_element_at(col, F.lit(key_s))
                    dtype = "string" if dtype == "string" else ""
                else:
                    raise FilterExprError(
                        f"cannot access key {key_s!r} inside a {dtype} value"
                    )
            return col
        raise FilterExprError(f"unexpected token {k}")

    def parse_literal(self):
        kind, v = self.next()
        if kind == "arith" and v == "-":  # negative literal: in [-1, 2]
            kind, v = self.next()
            if kind != "number":
                raise FilterExprError("'-' must precede a number literal")
            return -(float(v) if "." in v else int(v))
        if kind == "string":
            return _unquote(v)
        if kind == "number":
            return float(v) if "." in v else int(v)
        if kind == "true":
            return True
        if kind == "false":
            return False
        if kind == "null":
            return None
        raise FilterExprError(f"expected literal, got {kind} {v!r}")


def _map_value_type(dtype: str) -> str:
    """Value type of a map<K,V> simpleString — splits on the top-level
    comma so key types containing commas (decimal(10,2)) parse right."""
    inner = dtype[4:-1]
    depth = 0
    for i, ch in enumerate(inner):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            return inner[i + 1:].strip()
    return ""


def _unquote(s: str) -> str:
    body = s[1:-1]
    return body.replace('\\"', '"').replace("\\'", "'").replace("\\\\", "\\")


def translate(expr: str, df=None) -> Column:
    """Compile a Milvus-style filter expression to a Catalyst Column.

    Empty/blank expression → lit(True) (Milvus' `filter=""` semantics,
    milvus-app/describe.py:27). Pass the target DataFrame as ``df`` so
    ``col["key"]`` accesses compile correctly for MapType vs
    JSON-string columns (without it, MapType is assumed).
    """
    if not expr or not expr.strip():
        return F.lit(True)
    dtypes = dict(df.dtypes) if df is not None else None
    p = _Parser(_tokenize(expr), dtypes)
    col = p.parse_or()
    if p.i != len(p.toks):
        raise FilterExprError(f"trailing tokens: {p.toks[p.i:]}")
    return col
