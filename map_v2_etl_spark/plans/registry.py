"""Query registry shared by the core and extension query modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> driver does rows-only check
    tags: list[str] = field(default_factory=list)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, tags: list[str] | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, oracle, tags or [])
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # import side-effect registration of every query module
    from . import queries, queries_ext, queries_more, queries_tpch, queries_wave3, queries_wave4, queries_wave5, queries_wave6, queries_wave7, queries_wave8, queries_wave9, queries_wave10, queries_wave11, queries_wave12, queries_wave13, queries_wave14, queries_wave15, queries_wave16, queries_wave17, queries_wave18, queries_wave19, queries_wave20, queries_wave21, queries_wave22, queries_wave23, queries_wave24, queries_wave25, queries_wave26, queries_wave27, queries_wave28, queries_wave29, queries_wave30, queries_wave31, queries_wave32, queries_wave33, queries_wave34, queries_wave35, queries_wave36, queries_wave37, queries_wave38, queries_wave39, queries_wave40, queries_wave41, queries_wave42, queries_wave43, queries_wave44, queries_wave45, queries_wave46, queries_wave47, queries_wave48, queries_wave49  # noqa: F401

    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    from . import queries, queries_ext, queries_more, queries_tpch, queries_wave3, queries_wave4, queries_wave5, queries_wave6, queries_wave7, queries_wave8, queries_wave9, queries_wave10, queries_wave11, queries_wave12, queries_wave13, queries_wave14, queries_wave15, queries_wave16, queries_wave17, queries_wave18, queries_wave19, queries_wave20, queries_wave21, queries_wave22, queries_wave23, queries_wave24, queries_wave25, queries_wave26, queries_wave27, queries_wave28, queries_wave29, queries_wave30, queries_wave31, queries_wave32, queries_wave33, queries_wave34, queries_wave35, queries_wave36, queries_wave37, queries_wave38, queries_wave39, queries_wave40, queries_wave41, queries_wave42, queries_wave43, queries_wave44, queries_wave45, queries_wave46, queries_wave47, queries_wave48, queries_wave49  # noqa: F401

    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
