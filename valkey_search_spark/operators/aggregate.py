"""FT.AGGREGATE: stage parser + DataFrame executor.

The reference folds a fully-materialized RecordSet through stages on one
thread (/root/reference/src/commands/ft_aggregate_exec.cc); here each stage
appends to a lazy DataFrame plan, so GROUPBY becomes a distributed hash
aggregation with map-side partials, SORTBY MAX becomes
TakeOrderedAndProject, and the whole chain shuffles only where keys change.

Stage registry (complete, /root/reference/src/commands/ft_aggregate_parser.cc:240-258):
LOAD / APPLY / FILTER / GROUPBY+REDUCE / SORTBY [MAX] / LIMIT / ADDSCORES.
Reducer registry (complete, ft_aggregate_exec.cc:406-414):
COUNT, COUNT_DISTINCT, SUM, MIN, MAX, AVG, STDDEV.
"""

from __future__ import annotations

import shlex
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, functions as F

from ..catalog import IndexSchema, NumericField, num_col
from ..errors import ExpressionError, QuerySyntaxError
from ..parser.expr_parser import Expr, parse_expr
from ..plans.expr_compiler import (
    NUM, STR, ExprCompiler, FieldResolver, TypedCol, to_num,
)

REDUCERS = {"COUNT", "COUNT_DISTINCT", "SUM", "MIN", "MAX", "AVG", "STDDEV"}


@dataclass
class Reduce:
    func: str
    args: list[str]          # field refs / literals as written
    out_name: str


@dataclass
class GroupBy:
    fields: list[str]
    reducers: list[Reduce]


@dataclass
class Apply:
    expr: Expr
    out_name: str


@dataclass
class Filter:
    expr: Expr


@dataclass
class SortKey:
    expr: Expr
    desc: bool
    text: str


@dataclass
class SortBy:
    keys: list[SortKey]
    max: int | None = None


@dataclass
class Limit:
    offset: int
    count: int


@dataclass
class Load:
    # (source attribute, record alias): `LOAD 3 @f AS g` binds f's value to
    # record slot g (/root/reference/src/commands/ft_aggregate_parser.cc:252)
    fields: list[tuple[str, str]] = dc_field(default_factory=list)
    star: bool = False


@dataclass
class AddScores:
    pass


Stage = Load | Apply | Filter | GroupBy | SortBy | Limit | AddScores


def parse_stages(stage_str: str, params: dict | None = None) -> list[Stage]:
    """Parse the FT.AGGREGATE argument tail, e.g.
    ``LOAD 2 @a @b APPLY "@a*2" AS x GROUPBY 1 @x REDUCE SUM 1 @a AS s``.
    Quoting follows shell rules (expressions with spaces must be quoted —
    the same shape as the RESP arg list the reference parses)."""
    try:
        toks = shlex.split(stage_str)
    except ValueError as e:           # unbalanced quoting is grammar
        raise QuerySyntaxError(f"bad stage quoting: {e}") from None
    params = params or {}
    stages: list[Stage] = []
    i = 0

    def need(n: int, what: str):
        if i + n > len(toks):
            raise QuerySyntaxError(f"truncated {what} clause")

    # counted clauses must fail as grammar errors, never leak a
    # ValueError/IndexError stack trace (the reference parser reports
    # the offending clause — ft_aggregate_parser.cc error paths)
    def _int(s: str, what: str) -> int:
        try:
            return int(s)
        except ValueError:
            raise QuerySyntaxError(
                f"{what} expects an integer, got {s!r}") from None

    def tok(idx: int, what: str) -> str:
        if idx >= len(toks):
            raise QuerySyntaxError(f"truncated {what} clause")
        return toks[idx]

    def strip_at(s: str) -> str:
        return s[1:] if s.startswith("@") else s

    while i < len(toks):
        kw = toks[i].upper()
        if kw == "LOAD":
            need(2, "LOAD")
            if toks[i + 1] == "*":
                stages.append(Load(star=True))
                i += 2
                continue
            # n counts RESP arg tokens, so `f AS g` consumes 3 of the count
            # (ft_aggregate_parser.cc:252 binds the slot to the alias)
            n = _int(toks[i + 1], "LOAD count")
            fields = []
            j = i + 2
            consumed = 0
            while consumed < n:
                name = strip_at(tok(j, "LOAD"))
                if consumed + 3 <= n and j + 2 < len(toks) \
                        and toks[j + 1].upper() == "AS":
                    fields.append((name, strip_at(toks[j + 2])))
                    j += 3
                    consumed += 3
                else:
                    fields.append((name, name))
                    j += 1
                    consumed += 1
            stages.append(Load(fields=fields))
            i = j
        elif kw == "APPLY":
            need(4, "APPLY")
            if toks[i + 2].upper() != "AS":
                raise QuerySyntaxError("APPLY requires AS <name>")
            stages.append(Apply(parse_expr(toks[i + 1], params), toks[i + 3]))
            i += 4
        elif kw == "FILTER":
            need(2, "FILTER")
            stages.append(Filter(parse_expr(toks[i + 1], params)))
            i += 2
        elif kw == "GROUPBY":
            need(2, "GROUPBY")
            n = _int(toks[i + 1], "GROUPBY count")
            fields = [strip_at(tok(i + 2 + k, "GROUPBY"))
                      for k in range(n)]
            i += 2 + n
            reducers: list[Reduce] = []
            while i < len(toks) and toks[i].upper() == "REDUCE":
                func = tok(i + 1, "REDUCE").upper()
                if func not in REDUCERS:
                    raise QuerySyntaxError(f"unknown reducer {func}")
                nargs = _int(tok(i + 2, "REDUCE"), "REDUCE nargs")
                rargs = [tok(i + 3 + k, "REDUCE") for k in range(nargs)]
                i += 3 + nargs
                if i < len(toks) and toks[i].upper() == "AS":
                    out = tok(i + 1, "REDUCE AS")
                    i += 2
                else:
                    # default name `name(args)` (ft_aggregate_exec.cc:390-398)
                    out = f"{func.lower()}({','.join(rargs)})"
                reducers.append(Reduce(func, rargs, out))
            stages.append(GroupBy(fields, reducers))
        elif kw == "SORTBY":
            need(2, "SORTBY")
            n = _int(toks[i + 1], "SORTBY count")
            j = i + 2
            keys: list[SortKey] = []
            consumed = 0
            while consumed < n:
                text = tok(j, "SORTBY")
                desc = False
                j += 1
                consumed += 1
                if consumed < n and j < len(toks) and toks[j].upper() in ("ASC", "DESC"):
                    desc = toks[j].upper() == "DESC"
                    j += 1
                    consumed += 1
                keys.append(SortKey(parse_expr(_at_to_expr(text), params), desc, text))
            mx = None
            if j < len(toks) and toks[j].upper() == "MAX":
                mx = _int(tok(j + 1, "SORTBY MAX"), "SORTBY MAX")
                j += 2
            stages.append(SortBy(keys, mx))
            i = j
        elif kw == "LIMIT":
            need(3, "LIMIT")
            stages.append(Limit(_int(toks[i + 1], "LIMIT offset"),
                                _int(toks[i + 2], "LIMIT num")))
            i += 3
        elif kw == "ADDSCORES":
            stages.append(AddScores())
            i += 1
        else:
            raise QuerySyntaxError(f"unknown aggregate clause {toks[i]!r}")
    return stages


def _at_to_expr(text: str) -> str:
    """SORTBY keys are either `@field` or full expressions."""
    return text


class RecordResolver(FieldResolver):
    """@field resolution over the evolving record frame.

    Order (mirrors the name->slot map of
    /root/reference/src/commands/ft_aggregate_parser.h:85-129):
    1. columns created by earlier stages (APPLY / REDUCE aliases)
    2. schema attributes: NUMERIC -> parsed double, others -> raw string
    3. any other document column present on the frame
    4. otherwise Nil
    """

    _NUM_DTYPES = ("double", "float", "bigint", "int", "smallint", "tinyint")

    def __init__(self, schema: IndexSchema, df: DataFrame):
        self.schema = schema
        self.created: dict[str, str] = {}   # record name -> kind
        self.dtypes: dict[str, str] = dict(df.dtypes)

    def note_created(self, name: str, kind: str) -> None:
        self.created[name] = kind

    def resolve(self, name: str) -> TypedCol:
        if name in self.created:
            return TypedCol(F.col(name), self.created[name])
        if name == "__key" or name == "key":
            return TypedCol(F.col("__key"), STR)
        if name in self.schema._by_attr:
            fdef = self.schema.field(name)
            if isinstance(fdef, NumericField):
                return TypedCol(F.col(num_col(fdef.attr)), NUM)
            # fdef.source handles ON-JSON attributes (JSONPath extraction)
            return TypedCol(fdef.source().cast("string"), STR)
        if name in self.dtypes:
            dt = self.dtypes[name]
            if dt in self._NUM_DTYPES or dt.startswith("decimal"):
                return TypedCol(F.col(name).cast("double"), NUM)
            if dt in ("timestamp", "timestamp_ntz", "date"):
                return TypedCol(F.col(name).cast("timestamp").cast("double"), NUM)
            return TypedCol(F.col(name).cast("string"), STR)
        # absent field -> Nil (expr.cc:45-72)
        return TypedCol(F.lit(None).cast("string"), STR)


class AggregateExecutor:
    """Sequential fold of the stage list over a DataFrame
    (ExecuteAggregationStages, /root/reference/src/commands/ft_aggregate.cc:348-364)."""

    def __init__(self, schema: IndexSchema, df: DataFrame,
                 score_column: str | None = None):
        self.schema = schema
        self.df = df
        self.score_column = score_column
        self.resolver = RecordResolver(schema, df)
        self.compiler = ExprCompiler(self.resolver)
        # output projection accumulates like the reference's Record fields
        self.record_cols: list[str] = []
        self.grouped = False

    def run(self, stages: list[Stage]) -> DataFrame:
        for st in stages:
            self._apply_stage(st)
        return self._project()

    # ------------------------------------------------------------------
    def _apply_stage(self, st: Stage) -> None:
        if isinstance(st, Load):
            if st.star:
                for c in self.schema.doc_df.columns:
                    if c not in self.record_cols:
                        self.record_cols.append(c)
            else:
                for src, alias in st.fields:
                    fdef = (self.schema.field(src)
                            if src in self.schema._by_attr else None)
                    from ..catalog import VectorField

                    if isinstance(fdef, VectorField):
                        # vector fields refuse to LOAD (ft_aggregate.cc:73)
                        raise QuerySyntaxError(f"cannot LOAD vector field `{src}`")
                    if alias != src:
                        # bind the record slot to the alias
                        # (ft_aggregate_parser.cc:252)
                        tc = self.resolver.resolve(src)
                        self.df = self.df.withColumn(alias, tc.col)
                        self.resolver.note_created(alias, tc.kind)
                    if alias not in self.record_cols:
                        self.record_cols.append(alias)
        elif isinstance(st, Apply):
            t = self.compiler.compile(st.expr)
            self.df = self.df.withColumn(st.out_name, t.col)
            self.resolver.note_created(st.out_name, t.kind)
            if st.out_name not in self.record_cols:
                self.record_cols.append(st.out_name)
        elif isinstance(st, Filter):
            self.df = self.df.filter(self.compiler.truthy(st.expr))
        elif isinstance(st, AddScores):
            if self.score_column:
                if self.score_column not in self.record_cols:
                    self.record_cols.append(self.score_column)
        elif isinstance(st, GroupBy):
            self._groupby(st)
        elif isinstance(st, SortBy):
            order = []
            for k in st.keys:
                t = self.compiler.compile(k.expr)
                order.append(t.col.desc_nulls_last() if k.desc else t.col.asc_nulls_last())
            self.df = self.df.orderBy(*order)
            if st.max is not None:
                # bounded-heap top-k (ft_aggregate_exec.cc:155-172) ==
                # TakeOrderedAndProject once Catalyst sees orderBy+limit
                self.df = self.df.limit(st.max)
        elif isinstance(st, Limit):
            if st.offset:
                self.df = self.df.offset(st.offset)
            self.df = self.df.limit(st.count)
        else:
            raise QuerySyntaxError(f"bad stage {st!r}")

    # ------------------------------------------------------------------
    def _groupby(self, st: GroupBy) -> None:
        group_cols = []
        for f in st.fields:
            t = self.resolver.resolve(f)
            group_cols.append(t.col.alias(f))
        aggs = []
        out_kinds: dict[str, str] = {}
        for r in st.reducers:
            col, kind = self._reducer(r)
            aggs.append(col.alias(r.out_name))
            out_kinds[r.out_name] = kind
        gdf = self.df.groupBy(*group_cols)
        self.df = gdf.agg(*aggs) if aggs else gdf.agg(F.count(F.lit(1)).alias("__n")).drop("__n")
        self.grouped = True
        # the record set is now exactly group fields + reducer outputs
        self.record_cols = list(st.fields) + [r.out_name for r in st.reducers]
        self.resolver.created = {}
        for f, c in zip(st.fields, group_cols):
            self.resolver.note_created(f, self._group_kind(f))
        for name, kind in out_kinds.items():
            self.resolver.note_created(name, kind)

    def _group_kind(self, f: str) -> str:
        t = (NUM if f in self.schema._by_attr
             and isinstance(self.schema.field(f), NumericField) else STR)
        return t

    def _arg_typed(self, raw: str) -> TypedCol:
        if raw.startswith("@"):
            return self.resolver.resolve(raw[1:])
        return self.compiler.compile(parse_expr(raw))

    def _reducer(self, r: Reduce):
        """Quirk parity (/root/reference/src/commands/ft_aggregate_exec.cc):
        COUNT -> double; SUM/AVG empty -> 0.0; STDDEV is sample stddev with
        n<=1 -> 0.0; MIN/MAX polymorphic and Nil-ignoring;
        COUNT_DISTINCT exact."""
        f = r.func
        if f == "COUNT":
            return F.count(F.lit(1)).cast("double"), NUM
        t = self._arg_typed(r.args[0])
        if f == "COUNT_DISTINCT":
            return F.count_distinct(t.col).cast("double"), NUM
        if f == "SUM":
            return F.coalesce(F.sum(to_num(t)), F.lit(0.0)), NUM
        if f == "AVG":
            return F.coalesce(F.avg(to_num(t)), F.lit(0.0)), NUM
        if f == "STDDEV":
            sd = F.stddev_samp(to_num(t))
            return F.coalesce(F.when(F.isnan(sd), F.lit(0.0)).otherwise(sd), F.lit(0.0)), NUM
        if f in ("MIN", "MAX"):
            # polymorphic by expr::Compare (value.cc:271-319): numeric when
            # both sides convert, else bytewise strings. Static NUM kinds
            # compare numerically; STRING kinds use a two-tier struct
            # ordering — numeric-convertible values compare as doubles and
            # sort before non-convertible ones (ASCII puts digits before
            # letters, so the tiers agree with the reference's pairwise
            # fold on realistic data), then bytewise within the text tier.
            # Known divergence (accepted): ASCII also has punctuation
            # BELOW '0', so for {"!a", "5"} the reference's bytewise
            # pairwise compare gives MIN="!a" while the tiering yields
            # "5" — any value that parses as a number outranks every
            # non-numeric string, including punctuation-leading ones.
            # The reference's own result is iteration-order-dependent for
            # mixed groups (pairwise fold, value.cc:271-319), so there is
            # no stable oracle to match beyond the numeric/text split.
            if t.kind == NUM:
                col = to_num(t)
                return (F.min(col) if f == "MIN" else F.max(col)), NUM
            s = t.col.cast("string")
            n = F.trim(s).try_cast("double")
            ranked = F.when(
                s.isNull(), F.lit(None).cast(
                    "struct<tier:int,num:double,str:string>")
            ).otherwise(F.struct(
                F.when(n.isNotNull(), F.lit(0)).otherwise(F.lit(1)).alias("tier"),
                F.coalesce(n, F.lit(0.0)).alias("num"),
                s.alias("str")))
            agg = F.min(ranked) if f == "MIN" else F.max(ranked)
            return agg["str"], t.kind
        raise QuerySyntaxError(f"unknown reducer {f}")

    # ------------------------------------------------------------------
    def _project(self) -> DataFrame:
        if not self.record_cols:
            # no LOAD/APPLY/GROUPBY: records carry just the key
            return self.df.select("__key")
        cols: list[Column] = []
        for name in self.record_cols:
            if name in self.resolver.created or name in self.df.columns:
                cols.append(F.col(name))
            else:
                cols.append(self.resolver.resolve(name).col.alias(name))
        return self.df.select(*cols)
