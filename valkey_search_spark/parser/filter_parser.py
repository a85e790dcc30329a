"""Recursive-descent parser for the FT.SEARCH filter language.

Grammar per /root/reference/docs/topics/search-query.md:14-44 and the
reference parser /root/reference/src/commands/filter_parser.cc (1054 LoC,
ParseExpression at :931). Shapes:

    *                              match all
    @f:{tag | tag2 | pre*}         tag match / tag prefix
    @f:[(lo (hi]                   numeric range, ±inf, ( = exclusive
    @f:word  @f:word* @f:*word* @f:%word%  @f:"exact phrase"
    word                           fieldless text -> all TEXT fields
    p1 p2                          AND (whitespace)
    p1 | p2                        OR
    -p                             NOT (matches keys missing the field)
    (...)                          grouping; @f:(w1 w2) field-scoped group
    <filter>=>[KNN k @v $vec EF_RUNTIME n AS name]

`$name` parameters (PARAMS, /root/reference/src/query/search.cc:937-952)
are substituted at parse time from the ``params`` dict.
"""

from __future__ import annotations

import math
import re
import struct as _struct

from ..errors import QuerySyntaxError
from ..functions.analysis import fold_case
from .ast import (
    FUZZY, INFIX, PHRASE, PREFIX, SUFFIX, TERM,
    And, KnnClause, MatchAll, Not, NumericPred, Or, ParsedQuery, Predicate,
    TagPred, TextPred,
)

_TERM_STOP = set(' \t\n\r()|{}[]"@:;')
# reserved inside unquoted text — the reference errors rather than
# splitting on them (filter_parser.cc:662-668 "Unexpected character")
_RESERVED_TEXT = set("{}[]:;")

# the number shapes filter_parser.cc:246-281 ParseNumber accepts:
# optional leading -, digits/dots, one exponent with optional sign
_NUM_RE = re.compile(r"^-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?$")


def _decode_vector(v) -> list[float]:
    """Accept list[float], or the reference's raw little-endian FLOAT32 blob
    (docs/topics/search-data-formats.md:104-150). A plain string is a
    grammar error — iterating it as floats would leak a ValueError per
    character (the reference accepts only the binary wire form here)."""
    if isinstance(v, (bytes, bytearray)):
        if len(v) % 4:
            raise QuerySyntaxError("vector blob length not a multiple of 4")
        return list(_struct.unpack(f"<{len(v) // 4}f", v))
    if isinstance(v, str):
        raise QuerySyntaxError(
            "KNN vector parameter must be a FLOAT32 blob (bytes) or a "
            f"numeric sequence, got the string {v[:24]!r}")
    try:
        return [float(x) for x in v]
    except (TypeError, ValueError):
        raise QuerySyntaxError(
            "KNN vector parameter must be a FLOAT32 blob (bytes) or a "
            "numeric sequence") from None


class FilterParser:
    def __init__(self, query: str, params: dict | None = None,
                 check_unused_params: bool = True):
        self.q = query
        self.i = 0
        self.params = params or {}
        self.check_unused_params = check_unused_params
        self._params_used: set[str] = set()

    # -- scanning helpers -------------------------------------------------
    def _peek(self) -> str:
        return self.q[self.i] if self.i < len(self.q) else ""

    def _ws(self) -> None:
        while self.i < len(self.q) and self.q[self.i] in " \t\n\r":
            self.i += 1

    def _expect(self, ch: str) -> None:
        if self._peek() != ch:
            raise QuerySyntaxError(f"expected `{ch}` at offset {self.i} in {self.q!r}")
        self.i += 1

    def _reject_reserved_text_char(self) -> None:
        """`{ } [ ] : ;` are reserved in unquoted text
        (filter_parser.cc:662-668); an UNESCAPED occurrence errors
        instead of silently splitting the token (`\\:` stays legal —
        the escape-aware reader consumed it into the token already)."""
        c = self._peek()
        if c in _RESERVED_TEXT:
            raise QuerySyntaxError(
                f"Unexpected character at position {self.i + 1}: `{c}`")

    def _param(self, name: str):
        if name not in self.params:
            raise QuerySyntaxError(f"missing PARAMS value for ${name}")
        self._params_used.add(name)
        return self.params[name]

    def _param_str(self, name: str) -> str:
        """A PARAMS value substituted into a TEXT position (tag value,
        numeric bound, term, k, EF_RUNTIME). RESP clients send every
        value as bytes, so valid UTF-8 decodes transparently; a binary
        blob here is a query error — Python's ``str(bytes)`` repr would
        otherwise become a phantom tag/term that could even match a
        document containing the literal repr text."""
        v = self._param(name)
        if isinstance(v, (bytes, bytearray)):
            try:
                return bytes(v).decode("utf-8")
            except UnicodeDecodeError:
                raise QuerySyntaxError(
                    f"PARAMS value for ${name} is not valid UTF-8 "
                    "(binary blobs are only accepted as vector "
                    "parameters)") from None
        return str(v)

    def _read_until(self, stops: set[str]) -> str:
        return "".join(ch for ch, _ in self._read_until_marked(stops))

    def _read_until_marked(self, stops: set[str]) -> list[tuple[str, bool]]:
        """(char, was_escaped) pairs — escape state survives so callers can
        distinguish a literal `\\*` from a wildcard `*` (the reference's
        parser consumes the backslash before the special-char check)."""
        out: list[tuple[str, bool]] = []
        while self.i < len(self.q):
            c = self.q[self.i]
            if c == "\\" and self.i + 1 < len(self.q):
                out.append((self.q[self.i + 1], True))
                self.i += 2
                continue
            if c in stops:
                break
            out.append((c, False))
            self.i += 1
        return out

    # -- entry ------------------------------------------------------------
    def parse(self) -> ParsedQuery:
        # split off `=>[KNN ...]` (PreParseQueryString, search.cc:1069)
        knn = None
        base = self.q
        if "=>" in self.q:
            base, _, knn_part = self.q.partition("=>")
            knn = self._parse_knn(knn_part.strip())
        # PARAMS names are [A-Za-z0-9_] (ft_aggregate_parser.cc:133-139)
        for name in self.params:
            s = str(name)
            if not s or not all(c.isalnum() or c == "_" for c in s):
                raise QuerySyntaxError(
                    f"Parameter name `{name}` contains an invalid"
                    " character.")
        self.q, self.i = base, 0
        self._ws()
        pred = self._or()
        self._ws()
        if self.i < len(self.q):
            raise QuerySyntaxError(f"trailing input at offset {self.i}: {self.q[self.i:]!r}")
        # every supplied PARAMS pair must be referenced somewhere in the
        # query (ft_search_parser.cc:91-98 "Parameter `X` not used.").
        # FT.AGGREGATE stage expressions may also consume params, so its
        # caller disables this check (the reference validates after ALL
        # parsing; stage usage is not tracked through this parser).
        if self.check_unused_params:
            for name in self.params:
                if name not in self._params_used:
                    raise QuerySyntaxError(f"Parameter `{name}` not used.")
        return ParsedQuery(pred, knn)

    # -- boolean structure --------------------------------------------------
    def _or(self) -> Predicate:
        kids = [self._and()]
        while True:
            self._ws()
            if self._peek() == "|":
                self.i += 1
                kids.append(self._and())
            else:
                break
        return kids[0] if len(kids) == 1 else Or(kids)

    def _and(self) -> Predicate:
        kids = []
        while True:
            self._ws()
            c = self._peek()
            if c == "" or c in "|)":
                break
            kids.append(self._unary())
        if not kids:
            raise QuerySyntaxError(f"empty clause at offset {self.i} in {self.q!r}")
        return kids[0] if len(kids) == 1 else And(kids)

    def _unary(self) -> Predicate:
        self._ws()
        c = self._peek()
        if c == "-":
            self.i += 1
            return Not(self._unary())
        if c == "(":
            self.i += 1
            inner = self._or()
            self._ws()
            self._expect(")")
            return inner
        return self._primary()

    # -- primaries ----------------------------------------------------------
    def _primary(self) -> Predicate:
        c = self._peek()
        if c == "*":
            # match-all, or fieldless suffix/infix *word / *word*
            nxt = self.q[self.i + 1] if self.i + 1 < len(self.q) else ""
            if nxt == "" or nxt in " \t\n\r)|":
                self.i += 1
                return MatchAll()
            return self._text_unit(None)
        if c == "@":
            return self._field()
        return self._text_unit(None)

    def _field(self) -> Predicate:
        self._expect("@")
        attr = self._read_until(set(":") | _TERM_STOP)
        self._expect(":")
        self._ws()
        c = self._peek()
        if c == "{":
            return self._tag(attr)
        if c == "[":
            return self._numeric(attr)
        if c == "(":
            self.i += 1
            inner = self._field_scoped_or(attr)
            self._ws()
            self._expect(")")
            return inner
        return self._text_unit(attr)

    def _field_scoped_or(self, attr: str) -> Predicate:
        kids = [self._field_scoped_and(attr)]
        while True:
            self._ws()
            if self._peek() == "|":
                self.i += 1
                kids.append(self._field_scoped_and(attr))
            else:
                break
        return kids[0] if len(kids) == 1 else Or(kids)

    def _field_scoped_and(self, attr: str) -> Predicate:
        kids = []
        while True:
            self._ws()
            c = self._peek()
            if c == "" or c in "|)":
                break
            if c == "-":
                self.i += 1
                kids.append(Not(self._text_unit(attr)))
            else:
                kids.append(self._text_unit(attr))
        if not kids:
            raise QuerySyntaxError("empty field-scoped group")
        return kids[0] if len(kids) == 1 else And(kids)

    def _tag(self, attr: str) -> Predicate:
        self._expect("{")
        tags: list[tuple[str, bool]] = []
        while True:
            self._ws()
            marked = self._read_until_marked({"|", "}"})
            # trim unescaped surrounding whitespace (tag.cc:149-177 trim)
            while marked and marked[0][0].isspace() and not marked[0][1]:
                marked.pop(0)
            while marked and marked[-1][0].isspace() and not marked[-1][1]:
                marked.pop()
            raw = "".join(ch for ch, _ in marked)
            raw_esc = "".join(("\\" + ch) if esc else ch
                              for ch, esc in marked)
            if raw:
                if raw.startswith("$") and not marked[0][1]:
                    raw = self._param_str(raw[1:])
                    raw_esc = raw
                # shipped semantics (tag.cc:145-196 ParseSearchTags;
                # predicate.cc:352-355,369-380): the backslash protects
                # `|`/`}` during the tag-set split ONLY — tags are
                # UNESCAPED before evaluation and the evaluator re-checks
                # the trailing `*`, so `{b\*}` IS a prefix query for "b"
                # (the search-query.md "Prefix Tag Query" transcript).
                # Validation runs on the RAW text: multiple trailing
                # stars error (IsValidPrefix), and the min-prefix guard
                # measures RAW length including backslashes.
                if raw.endswith("*"):
                    if (len(raw_esc) >= 2 and raw_esc[-1] == "*"
                            and raw_esc[-2] == "*"):
                        raise QuerySyntaxError(
                            f"Tag string `{raw_esc}` ends with multiple *.")
                    tags.append((raw[:-1], True, len(raw_esc)))
                else:
                    tags.append((raw, False, len(raw_esc)))
            c = self._peek()
            if c == "|":
                self.i += 1
                continue
            self._expect("}")
            break
        if not tags:
            raise QuerySyntaxError("empty tag set")
        return TagPred(attr, tags)

    def _numeric(self, attr: str) -> Predicate:
        self._expect("[")
        lo, lo_excl = self._bound()
        # a single `,` is an accepted bounds separator alongside space
        # (filter_parser.cc:298 `!Match(' ') && !Match(',')`)
        if self._peek() == ",":
            self.i += 1
        hi, hi_excl = self._bound()
        self._ws()
        self._expect("]")
        return NumericPred(attr, lo, hi, lo_excl, hi_excl)

    def _bound(self) -> tuple[float, bool]:
        self._ws()
        excl = False
        if self._peek() == "(":
            excl = True
            self.i += 1
        tok = self._read_until({" ", "\t", ",", "]"})
        if not tok:
            raise QuerySyntaxError("empty numeric bound")
        if tok.startswith("$"):
            tok = self._param_str(tok[1:])
        t = tok.lower()
        # ±inf is lexed specially, then a STRICT digits/dot/exponent
        # numeral with optional leading `-` (ParseNumber,
        # filter_parser.cc:246-281): "infinity", "nan", "+5" and
        # underscored numerals all error there, so no float() leniency
        if t in ("inf", "+inf"):
            return math.inf, excl
        if t == "-inf":
            return -math.inf, excl
        if not _NUM_RE.match(tok):
            raise QuerySyntaxError(f"bad numeric bound {tok!r}")
        return float(tok), excl

    def _text_unit(self, attr: str | None) -> Predicate:
        self._ws()
        c = self._peek()
        if c == '"':
            self.i += 1
            # escape-marked read: `\*` / `\%` inside a phrase are LITERAL
            # characters, not specifier operators (the same escape handling
            # tags get — the reference parser consumes the backslash before
            # any special-char check)
            marked = self._read_until_marked({'"'})
            self._expect('"')
            mwords: list[list[tuple[str, bool]]] = [[]]
            for ch, esc in marked:
                if ch.isspace() and not esc:
                    if mwords[-1]:
                        mwords.append([])
                else:
                    mwords[-1].append((fold_case(ch), esc))
            if mwords and not mwords[-1]:
                mwords.pop()
            if not mwords:
                raise QuerySyntaxError("empty phrase")
            phrase = " ".join("".join(ch for ch, _ in mw) for mw in mwords)
            # each member may be a word, wildcard, or fuzzy specifier
            # (docs/full-text/phrase.md) — classified on UNESCAPED chars
            words, specs = [], []
            for mw in mwords:
                w = "".join(ch for ch, _ in mw)
                kind, dist = TERM, 0
                lead_pct = 0
                while lead_pct < len(mw) and mw[lead_pct] == ("%", False):
                    lead_pct += 1
                trail_pct = 0
                while (trail_pct < len(mw)
                       and mw[-1 - trail_pct] == ("%", False)):
                    trail_pct += 1
                if lead_pct and lead_pct == trail_pct and len(w) > 2 * lead_pct:
                    if lead_pct > 3:
                        raise QuerySyntaxError("fuzzy distance > 3")
                    kind, dist = FUZZY, lead_pct
                    w = w[lead_pct:-trail_pct]
                else:
                    lead = mw[0] == ("*", False)
                    trail = mw[-1] == ("*", False) and len(w) > 1
                    if lead and trail and len(w) > 2:
                        kind, w = INFIX, w[1:-1]
                    elif trail:
                        kind, w = PREFIX, w[:-1]
                    elif lead and len(w) > 1:
                        kind, w = SUFFIX, w[1:]
                words.append(w)
                specs.append((kind, dist))
            if all(k == TERM for k, _ in specs):
                specs = None                       # plain phrase fast path
            return TextPred(attr, PHRASE, phrase.lower(), words=words,
                            verbatim=True, word_specs=specs)
        if c == "%":
            dist = 0
            while self._peek() == "%":
                dist += 1
                self.i += 1
            word = self._read_until({"%"} | _TERM_STOP)
            self._reject_reserved_text_char()
            for _ in range(dist):
                self._expect("%")
            if dist > 3:
                raise QuerySyntaxError("fuzzy distance > 3")  # search.fuzzy-max-distance
            return TextPred(attr, FUZZY, fold_case(word), distance=dist)
        leading_star = False
        if c == "*":
            leading_star = True
            self.i += 1
        word = self._read_until(_TERM_STOP | {"*", "%"})
        self._reject_reserved_text_char()
        trailing_star = False
        if self._peek() == "*":
            trailing_star = True
            self.i += 1
        if word.startswith("$"):
            word = self._param_str(word[1:])
        word = fold_case(word)
        if not word:
            raise QuerySyntaxError(f"empty term at offset {self.i} in {self.q!r}")
        if leading_star and trailing_star:
            return TextPred(attr, INFIX, word)
        if leading_star:
            return TextPred(attr, SUFFIX, word)
        if trailing_star:
            return TextPred(attr, PREFIX, word)
        return TextPred(attr, TERM, word)

    # -- KNN clause ---------------------------------------------------------
    def _parse_knn(self, s: str) -> KnnClause:
        if not (s.startswith("[") and s.endswith("]")):
            raise QuerySyntaxError(f"bad KNN clause: {s!r}")
        toks = s[1:-1].split()
        if not toks or toks[0].upper() != "KNN":
            raise QuerySyntaxError(f"bad KNN clause: {s!r}")
        try:
            # K accepts a $param like the vector/EF slots do
            # (search.cc:1143 SubstituteParam on k_string)
            k = (int(self._param_str(toks[1][1:]))
                 if toks[1].startswith("$") else int(toks[1]))
            attr_tok = toks[2]
            vec_tok = toks[3]
        except (IndexError, ValueError):
            raise QuerySyntaxError(f"bad KNN clause: {s!r}") from None
        if not attr_tok.startswith("@"):
            raise QuerySyntaxError("KNN field must be @field")
        if not vec_tok.startswith("$"):
            raise QuerySyntaxError("KNN vector must be a $param")
        vec = _decode_vector(self._param(vec_tok[1:]))
        ef = None
        score_name = None
        j = 4
        while j < len(toks):
            kw = toks[j].upper()
            if kw not in ("EF_RUNTIME", "AS"):
                raise QuerySyntaxError(f"unknown KNN option {toks[j]!r}")
            if j + 1 >= len(toks):
                raise QuerySyntaxError(
                    f"KNN option {toks[j]!r} missing its value")
            if kw == "EF_RUNTIME":
                raw = toks[j + 1]
                try:
                    ef = (int(self._param_str(raw[1:]))
                          if raw.startswith("$") else int(raw))
                except ValueError:
                    raise QuerySyntaxError(
                        f"EF_RUNTIME must be an integer, got {raw!r}"
                    ) from None
                j += 2
            else:
                score_name = toks[j + 1]
                j += 2
        return KnnClause(k=k, attr=attr_tok[1:], vector=vec, ef_runtime=ef,
                         score_name=score_name)


def parse_query(query: str, params: dict | None = None,
                check_unused_params: bool = True) -> ParsedQuery:
    return FilterParser(query, params,
                        check_unused_params=check_unused_params).parse()
