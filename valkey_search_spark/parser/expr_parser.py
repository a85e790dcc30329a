"""APPLY/FILTER expression language: AST + recursive-descent parser.

Grammar per /root/reference/docs/topics/search-expressions.md:10-63 with
C-like precedence, compiled by the reference at
/root/reference/src/expr/expr.cc:292-556. Note `%` is documented but NOT
implemented there (MulOp table expr.cc:527-530 has only * / ^) — we reject
it identically.

Precedence (low to high): ||  &&  == !=  < <= > >=  + -  * /  ^  unary - !
"""

from __future__ import annotations

from dataclasses import dataclass

from ..errors import ExpressionError

# function registry — the complete scalar surface
# (/root/reference/src/expr/expr.cc:193-222)
KNOWN_FUNCTIONS = {
    "exists", "abs", "ceil", "floor", "log", "log2", "exp", "sqrt",
    "upper", "lower", "startswith", "contains", "strlen", "substr",
    "concat", "dayofweek", "dayofmonth", "dayofyear", "monthofyear",
    "year", "minute", "hour", "day", "month", "timefmt", "parsetime",
}


class Expr:
    pass


@dataclass
class NumLit(Expr):
    value: float


@dataclass
class StrLit(Expr):
    value: str


@dataclass
class FieldRef(Expr):
    """`@field` — Nil if absent (/root/reference/src/expr/expr.cc:45-72)."""

    name: str


@dataclass
class BinOp(Expr):
    op: str
    left: Expr
    right: Expr


@dataclass
class UnaryOp(Expr):
    op: str  # '-' | '!'
    operand: Expr


@dataclass
class FuncCall(Expr):
    name: str
    args: list[Expr]


class ExprParser:
    def __init__(self, text: str, params: dict | None = None):
        self.s = text
        self.i = 0
        self.params = params or {}

    def parse(self) -> Expr:
        e = self._or()
        self._ws()
        if self.i < len(self.s):
            raise ExpressionError(
                f"trailing input at offset {self.i} in expression {self.s!r}")
        return e

    # -- scanning -----------------------------------------------------------
    def _ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t\n\r":
            self.i += 1

    def _peek(self, n: int = 1) -> str:
        return self.s[self.i:self.i + n]

    def _eat(self, tok: str) -> bool:
        self._ws()
        if self.s.startswith(tok, self.i):
            self.i += len(tok)
            return True
        return False

    # -- precedence climb -----------------------------------------------------
    def _or(self) -> Expr:
        e = self._and()
        while self._eat("||"):
            e = BinOp("||", e, self._and())
        return e

    def _and(self) -> Expr:
        e = self._eq()
        while self._eat("&&"):
            e = BinOp("&&", e, self._eq())
        return e

    def _eq(self) -> Expr:
        e = self._rel()
        while True:
            if self._eat("=="):
                e = BinOp("==", e, self._rel())
            elif self._eat("!="):
                e = BinOp("!=", e, self._rel())
            else:
                return e

    def _rel(self) -> Expr:
        e = self._add()
        while True:
            # two-char ops before one-char
            if self._eat("<="):
                e = BinOp("<=", e, self._add())
            elif self._eat(">="):
                e = BinOp(">=", e, self._add())
            elif self._peek() == "<" and not self.s.startswith("<=", self.i):
                self.i += 1
                e = BinOp("<", e, self._add())
            elif self._peek() == ">" and not self.s.startswith(">=", self.i):
                self.i += 1
                e = BinOp(">", e, self._add())
            else:
                return e

    def _add(self) -> Expr:
        e = self._mul()
        while True:
            self._ws()
            if self._peek() == "+":
                self.i += 1
                e = BinOp("+", e, self._mul())
            elif self._peek() == "-":
                self.i += 1
                e = BinOp("-", e, self._mul())
            else:
                return e

    def _mul(self) -> Expr:
        e = self._pow()
        while True:
            self._ws()
            c = self._peek()
            if c == "*":
                self.i += 1
                e = BinOp("*", e, self._pow())
            elif c == "/":
                self.i += 1
                e = BinOp("/", e, self._pow())
            elif c == "%":
                raise ExpressionError(
                    "`%` is documented but not implemented (expr.cc:527-530)")
            else:
                return e

    def _pow(self) -> Expr:
        e = self._unary()
        self._ws()
        if self._peek() == "^":
            self.i += 1
            return BinOp("^", e, self._pow())  # right-assoc
        return e

    def _unary(self) -> Expr:
        self._ws()
        c = self._peek()
        if c == "-":
            self.i += 1
            return UnaryOp("-", self._unary())
        if c == "!":
            self.i += 1
            return UnaryOp("!", self._unary())
        return self._primary()

    def _primary(self) -> Expr:
        self._ws()
        c = self._peek()
        if c == "":
            raise ExpressionError(f"unexpected end of expression {self.s!r}")
        if c == "(":
            self.i += 1
            e = self._or()
            self._ws()
            if not self._eat(")"):
                raise ExpressionError(f"expected `)` at offset {self.i}")
            return e
        if c == "@":
            self.i += 1
            return FieldRef(self._ident())
        if c == "$":
            self.i += 1
            name = self._ident()
            if name not in self.params:
                raise ExpressionError(f"missing PARAMS value for ${name}")
            v = self.params[name]
            if isinstance(v, (int, float)):
                return NumLit(float(v))
            return StrLit(str(v))
        if c in "'\"":
            quote = c
            self.i += 1
            out = []
            while self.i < len(self.s) and self.s[self.i] != quote:
                if self.s[self.i] == "\\" and self.i + 1 < len(self.s):
                    self.i += 1
                out.append(self.s[self.i])
                self.i += 1
            if self.i >= len(self.s):
                raise ExpressionError("unterminated string literal")
            self.i += 1
            return StrLit("".join(out))
        if c.isdigit() or (c == "." and self._peek(2)[1:2].isdigit()):
            return NumLit(self._number())
        if c.isalpha() or c == "_":
            name = self._ident()
            self._ws()
            if self._peek() == "(":
                self.i += 1
                args = []
                self._ws()
                if self._peek() != ")":
                    args.append(self._or())
                    while self._eat(","):
                        args.append(self._or())
                if not self._eat(")"):
                    raise ExpressionError(f"expected `)` at offset {self.i}")
                lname = name.lower()
                if lname not in KNOWN_FUNCTIONS:
                    raise ExpressionError(f"unknown function {name!r}")
                if lname == "concat" and len(args) > 50:
                    raise ExpressionError("concat takes at most 50 args (expr.cc:154-162)")
                return FuncCall(lname, args)
            raise ExpressionError(
                f"bare identifier {name!r} (field refs need `@`) at offset {self.i}")
        raise ExpressionError(f"unexpected char {c!r} at offset {self.i} in {self.s!r}")

    def _ident(self) -> str:
        start = self.i
        while self.i < len(self.s) and (self.s[self.i].isalnum() or self.s[self.i] in "_"):
            self.i += 1
        if self.i == start:
            raise ExpressionError(f"expected identifier at offset {self.i}")
        return self.s[start:self.i]

    def _number(self) -> float:
        start = self.i
        while self.i < len(self.s) and (self.s[self.i].isdigit() or self.s[self.i] in ".eE"):
            if self.s[self.i] in "eE" and self.i + 1 < len(self.s) and self.s[self.i + 1] in "+-":
                self.i += 2
                continue
            self.i += 1
        try:
            return float(self.s[start:self.i])
        except ValueError:
            raise ExpressionError(f"bad number {self.s[start:self.i]!r}") from None


def parse_expr(text: str, params: dict | None = None) -> Expr:
    return ExprParser(text, params).parse()
