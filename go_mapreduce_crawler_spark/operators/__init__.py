"""Operator registry.

Each submodule defines ``QUERIES`` (name -> (spark, sf_dir) -> DataFrame)
and ``ORACLE`` (name -> equivalent DuckDB SQL; omitted entries get the
driver's rows-only check).  ``all_queries``/``all_oracles`` aggregate them
for __spark_entry__.py.
"""

from __future__ import annotations

from . import (asof, behavior, curation, dedup, features, graph,
               maintenance, ml, multimodal, relational, sampling, scale,
               similarity, streaming_replay, temporal, text, udx)


_MODULES = (relational, dedup, similarity, text, multimodal, asof,
            temporal, scale, sampling, udx, features, behavior, graph,
            maintenance, ml, curation, streaming_replay)


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
