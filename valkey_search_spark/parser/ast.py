"""Predicate AST for the FT.SEARCH filter language.

Node taxonomy mirrors the reference's Predicate tree
(/root/reference/src/query/predicate.h:41-49: kTag, kNumeric,
kComposedAnd, kComposedOr, kNegate, kText) plus the parsed KNN clause
(/root/reference/src/query/search.cc:954-1067).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Predicate:
    pass


@dataclass
class MatchAll(Predicate):
    """`*` — every key in the index
    (/root/reference/src/commands/filter_parser.cc:384)."""


@dataclass
class TagPred(Predicate):
    """`@f:{a|b|ab*}` — tag-set intersection, optional trailing-`*` prefix
    (/root/reference/src/query/predicate.h:154; src/indexes/tag.cc:383-443)."""

    attr: str
    # (unescaped value, is_prefix, raw length incl. backslashes — the
    # reference's min-prefix guard measures the RAW query text,
    # tag.cc:160-166)
    tags: list[tuple[str, bool, int]]


@dataclass
class NumericPred(Predicate):
    """`@f:[(lo (hi]` — inclusive/exclusive bounds, ±inf
    (/root/reference/src/query/predicate.h:124-152)."""

    attr: str
    lo: float
    hi: float
    lo_excl: bool = False
    hi_excl: bool = False


# Text match kinds (/root/reference SURVEY.md §2.2 rows term..proximity)
TERM, PREFIX, SUFFIX, INFIX, FUZZY, PHRASE = (
    "term", "prefix", "suffix", "infix", "fuzzy", "phrase",
)


@dataclass
class TextPred(Predicate):
    """Single text-match unit. ``attr=None`` == fieldless -> all TEXT fields
    (field mask, /root/reference/src/query/predicate.h:182-194)."""

    attr: str | None
    kind: str                      # term|prefix|suffix|infix|fuzzy|phrase
    value: str                     # the word (or ignored for phrase)
    distance: int = 0              # fuzzy: Damerau-Levenshtein budget
    words: list[str] = field(default_factory=list)  # phrase words, in order
    verbatim: bool = False         # phrase/VERBATIM: skip stemming
    # phrase member specifiers, parallel to ``words``: (kind, distance) per
    # member — a word specifier inside quotes may be a wildcard or fuzzy
    # match (docs/full-text/phrase.md "Each word specifier could be a word,
    # a word wildcard match, or a fuzzy word match"). None == all terms.
    word_specs: list[tuple[str, int]] | None = None


@dataclass
class Proximity(Predicate):
    """Multi-term AND upgraded to a positional constraint (SLOP/INORDER)
    within one text field (/root/reference/src/indexes/text/proximity.h:47)."""

    attr: str | None
    words: list[str]
    # None = no span bound (INORDER without SLOP): the reference checks the
    # span only when slop is set (src/indexes/text/proximity.h slop_)
    slop: int | None = None
    inorder: bool = False
    verbatim: bool = False


@dataclass
class And(Predicate):
    children: list[Predicate]


@dataclass
class Or(Predicate):
    children: list[Predicate]


@dataclass
class Not(Predicate):
    """`-p` — complement INCLUDING keys missing/untracked for the field
    (/root/reference/src/query/predicate.h:113; src/indexes/numeric.h:128)."""

    child: Predicate


@dataclass
class KnnClause:
    """`=>[KNN k @field $vec EF_RUNTIME n AS name]`
    (/root/reference/src/query/search.cc:954-1067)."""

    k: int
    attr: str
    vector: list[float]
    ef_runtime: int | None = None
    score_name: str | None = None

    def score_alias(self, default_prefix: str = "__") -> str:
        # default score field name `__<vecfield>_score` (src/commands/ft_search.cc:74)
        return self.score_name or f"{default_prefix}{self.attr}_score"


@dataclass
class ParsedQuery:
    predicate: Predicate
    knn: KnnClause | None = None


def query_operation_flags(pred: Predicate) -> set[str]:
    """Operation flags for the INFO `query_stats` counters — mirrors the
    reference's QueryOperations bitmask classification
    (filter_parser.h:32-46; search.cc:907-935
    IncrementQueryOperationMetrics). INFIX counts under suffix (both
    serve from the suffix trie)."""
    ops: set[str] = set()

    def walk(p: Predicate) -> None:
        if isinstance(p, And):
            ops.add("and")
            for c in p.children:
                walk(c)
        elif isinstance(p, Or):
            ops.add("or")
            for c in p.children:
                walk(c)
        elif isinstance(p, Not):
            ops.add("negate")
            walk(p.child)
        elif isinstance(p, TagPred):
            ops.add("tag")
        elif isinstance(p, NumericPred):
            ops.add("numeric")
        elif isinstance(p, Proximity):
            ops.update(("text", "proximity", "text_term"))
        elif isinstance(p, TextPred):
            ops.add("text")
            ops.add({TERM: "text_term", PREFIX: "text_prefix",
                     SUFFIX: "text_suffix", INFIX: "text_suffix",
                     FUZZY: "text_fuzzy", PHRASE: "proximity"}[p.kind])
            if p.kind == PHRASE:
                ops.update(("text_term", "and"))

    walk(pred)
    return ops
