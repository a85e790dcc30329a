"""``python -m valkey_search_spark`` — a redis-cli-style REPL over the
FT.* command grammar (commands.CommandDispatcher), completing the
"paste the commands you run today" interop story:

    python -m valkey_search_spark \
        --table parts=/data/part.parquet \
        --table docs=/data/documents.parquet \
        --key p_partkey
    ft> FT.CREATE idx SCHEMA p_brand TAG p_retailprice NUMERIC
    ft> FT.SEARCH idx "@p_brand:{Brand#13}" LIMIT 0 3

FT.CREATE resolves its document frame by index name: an exact
``--table <index>=<path>`` match wins, else the single table when only
one was given. Replies print in the RESP wire shape (execute_reply);
errors print as ``(error) ...`` like a RESP client renders them.
"""
from __future__ import annotations

import argparse
import sys

from .errors import SearchError


def _render(x, indent: int = 0) -> str:
    pad = "  " * indent
    if isinstance(x, list):
        if not x:
            return f"{pad}(empty list)"
        return "\n".join(_render(v, indent + (indent > 0)) if
                         isinstance(v, list) else f"{pad}{v!r}"
                         for v in x)
    return f"{pad}{x!r}"


# FT.* grammar words for interactive tab-completion: command names
# first (line start), option/clause keywords after. Purely a typing
# aid — the dispatcher stays the single source of grammar truth.
_COMPLETIONS = (
    "FT.CREATE", "FT.SEARCH", "FT.AGGREGATE", "FT.DROPINDEX",
    "FT._LIST", "FT.INFO", "FT.EXPLAIN", "QUIT", "EXIT",
    # FT.CREATE
    "ON", "HASH", "JSON", "PREFIX", "LANGUAGE", "SCHEMA", "AS",
    "NUMERIC", "TAG", "TEXT", "VECTOR", "FLAT", "HNSW", "TYPE",
    "FLOAT32", "DIM", "DISTANCE_METRIC", "L2", "IP", "COSINE", "M",
    "EF_CONSTRUCTION", "INITIAL_CAP", "EF_RUNTIME", "SEPARATOR",
    "CASESENSITIVE", "NOSTEM", "WEIGHT", "STOPWORDS", "NOSTOPWORDS",
    "MINSTEMSIZE", "WITHSUFFIXTRIE", "NOSUFFIXTRIE", "SORTABLE",
    # FT.SEARCH / FT.AGGREGATE
    "NOCONTENT", "VERBATIM", "RETURN", "SORTBY", "ASC", "DESC",
    "LIMIT", "PARAMS", "DIALECT", "TIMEOUT", "SLOP", "INORDER",
    "WITHSORTKEYS", "LOAD", "APPLY", "FILTER", "GROUPBY", "REDUCE",
    "COUNT", "COUNT_DISTINCT", "SUM", "MIN", "MAX", "AVG", "STDDEV",
    "ADDSCORES", "KNN",
)


def _install_completer() -> None:  # pragma: no cover - needs a tty
    try:
        import readline
    except ImportError:
        return

    def complete(text: str, state: int):
        up = text.upper()
        at_start = readline.get_begidx() == 0
        pool = [w for w in _COMPLETIONS
                if (w.startswith("FT.") or w in ("QUIT", "EXIT"))
                == at_start]
        hits = [w + " " for w in pool if w.startswith(up)]
        return hits[state] if state < len(hits) else None

    readline.set_completer_delims(" \t")
    readline.set_completer(complete)
    readline.parse_and_bind("tab: complete")


def main(argv: list[str] | None = None,
         stdin=None, stdout=None) -> int:
    ap = argparse.ArgumentParser(
        prog="valkey_search_spark",
        description="FT.* command REPL over parquet tables")
    ap.add_argument("--table", action="append", default=[],
                    metavar="NAME=PATH", required=True,
                    help="parquet table an FT.CREATE of that index "
                         "name will index (repeatable). PATH may be a "
                         "single file, a directory of parquet parts, "
                         "a glob (data/2024-*.parquet), or a "
                         "comma-separated list of any of those")
    ap.add_argument("--key", default=None,
                    help="document key column (default: synthesized)")
    ap.add_argument("--json-column", default="json",
                    help="document column holding JSON text for "
                         "ON JSON indexes")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] cores for the Spark session")
    args = ap.parse_args(argv)
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout

    tables: dict[str, str] = {}
    for spec in args.table:
        name, _, path = spec.partition("=")
        if not path:
            ap.error(f"--table needs NAME=PATH, got {spec!r}")
        tables[name] = path

    from .commands import CommandDispatcher, split_command_line
    from .operators.search import SearchEngine
    from .session import get_spark

    spark = get_spark("ft-repl", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def source(index_name: str, on_json: bool):
        path = tables.get(index_name)
        if path is None and len(tables) == 1:
            path = next(iter(tables.values()))
        if path is None:
            raise SearchError(
                f"no --table mapping for index {index_name!r} "
                f"(known: {sorted(tables)})")
        # spark.read.parquet natively resolves directories and globs;
        # a comma-separated spec fans out to a multi-path union scan
        # (one DataFrame, partition-pruned like any parquet read)
        return spark.read.parquet(*path.split(","))

    disp = CommandDispatcher(SearchEngine(spark), source,
                             json_column=args.json_column,
                             key_column=args.key)

    interactive = stdin.isatty() if hasattr(stdin, "isatty") else False
    # completion (and line editing/history) only engages when input
    # flows through input()/PyOS_Readline — a plain stdin.readline()
    # bypasses GNU readline entirely, so the interactive path must use
    # input() for the completer to ever fire
    use_readline = interactive and stdin is sys.stdin
    if use_readline:
        _install_completer()
    while True:
        if use_readline:
            try:
                line = input("ft> ") + "\n"
            except EOFError:
                break
        else:
            if interactive:
                stdout.write("ft> ")
                stdout.flush()
            line = stdin.readline()
        if not line:
            break
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line.upper() in ("QUIT", "EXIT"):
            break
        try:
            out = disp.execute_reply(split_command_line(line))
            if hasattr(out, "fields"):           # IndexSchema from CREATE
                out = "OK"
            stdout.write(_render(out) + "\n")
        except SearchError as e:
            stdout.write(f"(error) {e}\n")
        except Exception as e:                    # pragma: no cover
            stdout.write(f"(error) {type(e).__name__}: {e}\n")
    return 0


if __name__ == "__main__":                        # pragma: no cover
    sys.exit(main())
