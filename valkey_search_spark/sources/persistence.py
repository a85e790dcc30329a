"""Catalog persistence: FT.CREATE declarations as JSON + document snapshots.

The reference persists index definitions and contents into RDB chunks and
can rebuild indexes on load (`--skip-rdb-load`;
/root/reference/src/rdb_serialization.cc, src/rdb_section.proto). The
Spark-native split: the *declaration* is a small JSON document; the *data*
is the document table (already parquet via DocumentStore / materialize);
derived index columns are rebuilt lazily on load — rebuild-on-load is the
default here because recomputing projections is a scan, not a migration.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from ..catalog import (
    FieldDef, IndexSchema, NumericField, TagField, TextField, VectorField,
)

_FIELD_TYPES = {
    "TagField": TagField, "NumericField": NumericField,
    "TextField": TextField, "VectorField": VectorField,
}


def _field_to_dict(f: FieldDef) -> dict:
    d = {"type": type(f).__name__, "name": f.name, "alias": f.alias}
    if f.json_source:
        d["json_source"] = f.json_source   # ON-JSON path identifier
    if isinstance(f, TagField):
        d.update(separator=f.separator, casesensitive=f.casesensitive)
    elif isinstance(f, TextField):
        d.update(nostem=f.nostem, min_stem_size=f.min_stem_size,
                 stopwords=sorted(f.stopwords), punctuation=f.punctuation,
                 with_suffixtrie=f.with_suffixtrie,
                 with_offsets=f.with_offsets)
    elif isinstance(f, VectorField):
        d.update(dim=f.dim, metric=f.metric, algo=f.algo,
                 m=f.m, ef_construction=f.ef_construction)
    return d


def _field_from_dict(d: dict) -> FieldDef:
    cls = _FIELD_TYPES[d["type"]]
    kwargs = {k: v for k, v in d.items() if k != "type"}
    if cls is TextField and "stopwords" in kwargs:
        kwargs["stopwords"] = frozenset(kwargs["stopwords"])
    return cls(**kwargs)


def save_index_def(schema: IndexSchema, path: str, doc_path: str | None = None) -> None:
    """Write the FT.CREATE declaration (and optionally snapshot the doc
    table to ``doc_path``) — the RDB-save equivalent."""
    if doc_path is not None:
        schema.doc_df.write.mode("overwrite").parquet(doc_path)
    payload = {
        "format": "index-def-v1",
        "name": schema.name,
        "key_column": schema.key_column,
        "doc_path": doc_path,
        "prefixes": list(schema.prefixes) if schema.prefixes else None,
        "fields": [_field_to_dict(f) for f in schema.fields],
        # ANN artifacts are already durable parquet+meta at their build
        # paths (the reference's RDB saves its HNSW graph,
        # rdb_serialization.cc); the declaration records attr ->
        # (kind, path) so load re-attaches without a rebuild
        "ann": {attr: {"path": art.path,
                       "kind": ("hnsw" if hasattr(art, "n_segments")
                                else "ivf")}
                for attr, art in getattr(schema, "_ann", {}).items()},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=2)


def load_index_def(spark: SparkSession, path: str,
                   doc_path: str | None = None, cache: bool = False) -> IndexSchema:
    """Rebuild an IndexSchema from a saved declaration. Derived columns are
    recomputed lazily over the snapshot (rebuild-on-load)."""
    with open(path) as fh:
        payload = json.load(fh)
    from ..artifact import check_format

    check_format(payload, "index-def-v1", path)
    dp = doc_path or payload.get("doc_path")
    if dp is None:
        raise ValueError(f"no document snapshot path for index {payload['name']!r}")
    df = spark.read.parquet(dp)
    prefixes = payload.get("prefixes")
    schema = IndexSchema(
        payload["name"], df,
        [_field_from_dict(d) for d in payload["fields"]],
        key_column=payload.get("key_column"), cache=cache,
        prefixes=tuple(prefixes) if prefixes else None,
    )
    ann = payload.get("ann") or {}
    if ann:
        from ..operators.ann import IVFIndex
        from ..operators.hnsw import HNSWIndex

        def _load_art(entry):
            # pre-round-7 declarations stored a bare path (always IVF)
            if isinstance(entry, str):
                return IVFIndex.load(spark, entry)
            loader = HNSWIndex if entry.get("kind") == "hnsw" else IVFIndex
            return loader.load(spark, entry["path"])

        schema._ann = {attr: _load_art(e) for attr, e in ann.items()}
    return schema
