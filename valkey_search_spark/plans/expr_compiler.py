"""Expression AST -> Spark Column with the reference's *value* semantics.

The reference evaluates expressions over a dynamic
``variant<Nil,bool,double,string,Array>`` (/root/reference/src/expr/value.h:25-111).
Here every record column has a static Spark type, so we compile to a
(Column, kind) pair and encode the dynamic coercions explicitly:

- Nil == Spark NULL, but comparisons are NOT SQL-null-propagating:
  Nil==Nil is EQUAL, Nil-vs-value is UNORDERED -> false for every
  comparison op (/root/reference/src/expr/value.cc:271-319).
- mixed numeric/string comparison promotes to double if the string
  converts, else compares both as strings (value.cc:305-319).
- `/0` -> NaN, not Nil/error (value.cc:351-363).
- math funcs on non-numeric strings -> NaN (1.2.1 compat, value.cc:411-426).
- `contains` counts occurrences; empty needle -> len+1 (value.cc:511-532).
- strlen/substr are BYTE-based (value.cc:483-565).
- upper/lower are ASCII-only (value.cc:567-631).
- time funcs use UTC gmtime on unix-seconds doubles; month/monthofyear are
  0-based, dayofyear 0-based, dayofweek 0=Sunday (value.cc:653-780).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, functions as F

from ..errors import ExpressionError
from ..parser.expr_parser import (
    BinOp, Expr, FieldRef, FuncCall, NumLit, StrLit, UnaryOp,
)

NUM, STR, BOOL = "num", "str", "bool"

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()
_NAN = F.lit(float("nan"))


@dataclass
class TypedCol:
    col: Column
    kind: str  # num | str | bool


class FieldResolver:
    """Maps @field -> TypedCol over the current record frame.
    Subclassed/bound by the aggregate executor."""

    def resolve(self, name: str) -> TypedCol:  # pragma: no cover - interface
        raise NotImplementedError


def to_num(t: TypedCol) -> Column:
    """Coerce to double: bool->0/1, numeric-string->double,
    non-numeric string -> NaN, Nil -> Nil."""
    if t.kind == NUM:
        return t.col.cast("double")
    if t.kind == BOOL:
        return t.col.cast("double")
    s = F.trim(t.col.cast("string"))
    return (
        F.when(t.col.isNull(), F.lit(None).cast("double"))
        .when(F.lower(s).isin("inf", "+inf", "infinity"), F.lit(float("inf")))
        .when(F.lower(s) == "-inf", F.lit(float("-inf")))
        .otherwise(F.coalesce(s.try_cast("double"), _NAN))
    )


def to_num_strict(t: TypedCol) -> Column:
    """Like to_num, but a string that fails numeric conversion yields Nil
    (NULL) instead of NaN — arithmetic operators return Nil when AsDouble
    fails (value.cc FuncAdd/FuncDiv), while the math FUNCTIONS keep the
    1.2.1 NaN compatibility behavior (to_num)."""
    if t.kind in (NUM, BOOL):
        return t.col.cast("double")
    s = F.trim(t.col.cast("string"))
    return (
        F.when(t.col.isNull(), F.lit(None).cast("double"))
        .when(F.lower(s).isin("inf", "+inf", "infinity"), F.lit(float("inf")))
        .when(F.lower(s) == "-inf", F.lit(float("-inf")))
        .otherwise(s.try_cast("double"))
    )


def to_str(t: TypedCol) -> Column:
    if t.kind == STR:
        return t.col
    if t.kind == BOOL:
        return F.when(t.col, F.lit("1")).otherwise(F.lit("0"))
    # double -> trim trailing .0 for integral values (Value::ToString shape)
    d = t.col.cast("double")
    return F.when(
        d == F.floor(d), d.cast("decimal(38,0)").cast("string")
    ).otherwise(d.cast("string"))


def to_bool(t: TypedCol) -> Column:
    """Bool coercion (Value::AsBool, value.cc:102-128): numeric nonzero —
    with NaN TRUE; non-empty strings truthy (1.2.1 'asbool_string_truthy'
    fix, JS-style); Nil -> Nil."""
    if t.kind == BOOL:
        return t.col
    if t.kind == NUM:
        n = t.col.cast("double")
        return F.when(n.isNull(), F.lit(None).cast("boolean")).otherwise(
            F.isnan(n) | (n != 0.0))
    return F.when(t.col.isNull(), F.lit(None).cast("boolean")).otherwise(
        F.octet_length(t.col.cast("string")) > 0)


def _compare(op: str, lt: TypedCol, rt: TypedCol) -> Column:
    """expr::Compare: EQUAL if both Nil; UNORDERED (-> false) if one Nil;
    numeric if both convert; else bytewise string (value.cc:271-319)."""
    lnull, rnull = lt.col.isNull(), rt.col.isNull()

    if lt.kind == NUM and rt.kind == NUM:
        a, b = lt.col.cast("double"), rt.col.cast("double")
        cmp_expr = _cmp_op(op, a, b)
    elif lt.kind != NUM and rt.kind != NUM:
        a, b = to_str(lt), to_str(rt)
        cmp_expr = _cmp_op(op, a, b)
    else:
        # mixed: promote to double if the non-numeric side converts
        ln, rn = to_num(lt), to_num(rt)
        both_num = ~F.isnan(ln) & ~F.isnan(rn)
        cmp_expr = F.when(both_num, _cmp_op(op, ln, rn)).otherwise(
            _cmp_op(op, to_str(lt), to_str(rt))
        )

    on_both_nil = op in ("==", "<=", ">=")  # EQUAL
    return (
        F.when(lnull & rnull, F.lit(on_both_nil))
        .when(lnull | rnull, F.lit(False))  # UNORDERED
        .otherwise(F.coalesce(cmp_expr, F.lit(False)))
    )


def _cmp_op(op: str, a: Column, b: Column) -> Column:
    if op == "==":
        return a == b
    if op == "!=":
        return a != b
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    if op == ">=":
        return a >= b
    raise ExpressionError(f"bad comparison {op}")


class ExprCompiler:
    def __init__(self, resolver: FieldResolver):
        self.resolver = resolver

    def compile(self, e: Expr) -> TypedCol:
        if isinstance(e, NumLit):
            return TypedCol(F.lit(e.value), NUM)
        if isinstance(e, StrLit):
            return TypedCol(F.lit(e.value), STR)
        if isinstance(e, FieldRef):
            return self.resolver.resolve(e.name)
        if isinstance(e, UnaryOp):
            return self._unary(e)
        if isinstance(e, BinOp):
            return self._bin(e)
        if isinstance(e, FuncCall):
            return self._func(e)
        raise ExpressionError(f"uncompilable node {e!r}")

    def compile_to_column(self, e: Expr) -> Column:
        return self.compile(e).col

    def truthy(self, e: Expr) -> Column:
        """FILTER-stage truthiness: Nil or false -> dropped."""
        return F.coalesce(to_bool(self.compile(e)), F.lit(False))

    # ------------------------------------------------------------------
    def _unary(self, e: UnaryOp) -> TypedCol:
        t = self.compile(e.operand)
        if e.op == "-":
            return TypedCol(-to_num(t), NUM)
        if e.op == "!":
            b = to_bool(t)
            return TypedCol(F.when(b.isNull(), F.lit(None).cast("boolean")).otherwise(~b), BOOL)
        raise ExpressionError(f"bad unary {e.op}")

    def _bin(self, e: BinOp) -> TypedCol:
        op = e.op
        lt, rt = self.compile(e.left), self.compile(e.right)
        if op in ("+", "-", "*", "/", "^"):
            # Nil when either operand fails numeric conversion (reference
            # FuncAdd/FuncDiv return Nil on AsDouble failure); genuine NaN
            # values still propagate as NaN
            a, b = to_num_strict(lt), to_num_strict(rt)
            if op == "+":
                out = a + b
            elif op == "-":
                out = a - b
            elif op == "*":
                out = a * b
            elif op == "/":
                # x/0 -> NaN, not Nil and not ±Infinity (value.cc:351-363)
                out = (
                    F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
                    .when(b == 0.0, _NAN)
                    .otherwise(a / b)
                )
            else:
                out = F.pow(a, b)
            return TypedCol(out, NUM)
        if op in ("==", "!=", "<", "<=", ">", ">="):
            return TypedCol(_compare(op, lt, rt), BOOL)
        if op in ("&&", "||"):
            a, b = to_bool(lt), to_bool(rt)
            # the reference yields Nil whenever EITHER side is Nil — even
            # false && Nil -> Nil (value.cc:387-409), stricter than Kleene
            out = F.when(a.isNull() | b.isNull(),
                         F.lit(None).cast("boolean")).otherwise(
                a & b if op == "&&" else a | b)
            return TypedCol(out, BOOL)
        raise ExpressionError(f"bad binary {op}")

    # ------------------------------------------------------------------
    def _func(self, e: FuncCall) -> TypedCol:
        name, args = e.name, e.args

        def arg(i) -> TypedCol:
            if i >= len(args):
                raise ExpressionError(f"{name} missing argument {i + 1}")
            return self.compile(args[i])

        if name == "exists":
            return TypedCol(arg(0).col.isNotNull().cast("double"), NUM)

        if name in ("abs", "ceil", "floor", "log", "log2", "exp", "sqrt"):
            x = to_num(arg(0))
            if name == "abs":
                out = F.abs(x)
            elif name == "ceil":
                out = F.ceil(x).cast("double")
            elif name == "floor":
                out = F.floor(x).cast("double")
            elif name == "exp":
                out = F.exp(x)
            elif name == "sqrt":
                # C sqrt(-x) = NaN; Spark returns NULL -> pin NaN
                out = F.when(x < 0, _NAN).otherwise(F.sqrt(x))
            else:  # log / log2: C semantics log(0)=-inf, log(-x)=NaN
                fn = F.log if name == "log" else F.log2
                out = (
                    F.when(x.isNull(), F.lit(None).cast("double"))
                    .when(x == 0.0, F.lit(float("-inf")))
                    .when(x < 0, _NAN)
                    .otherwise(fn(x))
                )
            return TypedCol(out, NUM)

        if name in ("upper", "lower"):
            s = to_str(arg(0))
            out = (F.translate(s, _LOWER, _UPPER) if name == "upper"
                   else F.translate(s, _UPPER, _LOWER))
            return TypedCol(out, STR)

        if name == "startswith":
            s1, s2 = to_str(arg(0)), to_str(arg(1))
            return TypedCol(s1.startswith(s2).cast("double"), NUM)

        if name == "contains":
            s1, s2 = to_str(arg(0)), to_str(arg(1))
            # occurrence COUNT, not boolean; empty needle -> len+1
            cnt = F.when(
                F.octet_length(s2) == 0, (F.octet_length(s1) + 1).cast("double")
            ).otherwise(
                ((F.octet_length(s1) - F.octet_length(F.replace(s1, s2, F.lit(""))))
                 / F.octet_length(s2)).cast("double")
            )
            return TypedCol(cnt, NUM)

        if name == "strlen":
            return TypedCol(F.octet_length(to_str(arg(0))).cast("double"), NUM)

        if name == "substr":
            s = to_str(arg(0))
            off = to_num(arg(1))
            ln = to_num(arg(2))
            # byte offsets, 0-based (value.cc:534-565): negative offset
            # wraps from the end (off+size; empty if still negative);
            # negative length truncates the remainder ((size-off)+len), so
            # substr('hello',1,-1)='ell'
            size = F.octet_length(s).cast("double")
            off_w = F.when(off < 0, off + size).otherwise(off)
            eff = F.when(ln < 0, (size - off_w) + ln).otherwise(ln)
            out = F.when(
                off.isNull() | ln.isNull(), F.lit(None).cast("string")
            ).when(
                (off_w < 0) | (off_w >= size) | (eff <= 0), F.lit("")
            ).otherwise(
                F.substring(s, off_w.cast("int") + 1, eff.cast("int")))
            return TypedCol(out, STR)

        if name == "concat":
            parts = [to_str(self.compile(a)) for a in args]
            return TypedCol(F.concat(*parts), STR)

        if name in ("dayofweek", "dayofmonth", "dayofyear", "monthofyear",
                    "year", "minute", "hour", "day", "month"):
            ts = F.timestamp_seconds(to_num(arg(0)))
            if name == "dayofweek":
                out = F.dayofweek(ts) - 1          # 0 = Sunday (tm_wday)
            elif name in ("dayofmonth", "day"):
                out = F.dayofmonth(ts)
            elif name == "dayofyear":
                out = F.dayofyear(ts) - 1          # 0-based (tm_yday)
            elif name in ("monthofyear", "month"):
                out = F.month(ts) - 1              # 0-based (tm_mon)
            elif name == "year":
                out = F.year(ts)
            elif name == "minute":
                out = F.minute(ts)
            else:
                out = F.hour(ts)
            return TypedCol(out.cast("double"), NUM)

        if name == "timefmt":
            ts = F.timestamp_seconds(to_num(arg(0)))
            fmt = "%FT%TZ" if len(args) < 2 else _literal_str(args[1])
            return TypedCol(F.date_format(ts, _strftime_to_spark(fmt)), STR)

        if name == "parsetime":
            s = to_str(arg(0))
            fmt = "%FT%TZ" if len(args) < 2 else _literal_str(args[1])
            ts = F.to_timestamp(s, _strftime_to_spark(fmt))
            return TypedCol(F.unix_timestamp(ts).cast("double"), NUM)

        raise ExpressionError(f"unknown function {name!r}")


def _literal_str(e: Expr) -> str:
    if not isinstance(e, StrLit):
        raise ExpressionError("format argument must be a string literal")
    return e.value


_STRFTIME_MAP = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%e": "d",
    "%H": "HH", "%M": "mm", "%S": "ss", "%F": "yyyy-MM-dd",
    "%T": "HH:mm:ss", "%j": "DDD", "%A": "EEEE", "%a": "EEE",
    "%B": "MMMM", "%b": "MMM", "%p": "a", "%I": "hh", "%Z": "zz",
    "%%": "%",
}


def _strftime_to_spark(fmt: str) -> str:
    """strftime(3) -> Spark DateTimeFormatter pattern (timefmt/parsetime,
    value.cc:696-765). Literal text is single-quoted per Java conventions."""
    out: list[str] = []
    i = 0
    lit: list[str] = []

    def flush():
        if lit:
            text = "".join(lit).replace("'", "''")
            out.append(f"'{text}'")
            lit.clear()

    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i:i + 2]
            if code not in _STRFTIME_MAP:
                raise ExpressionError(f"unsupported strftime code {code!r}")
            flush()
            out.append(_STRFTIME_MAP[code])
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    return "".join(out)
