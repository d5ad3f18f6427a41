"""Pipeline graph introspection — the reference's ``to_graph`` analogue
(torchdata.datapipes.utils.to_graph renders the datapipe DAG;
/root/reference/zen3geo/docs walkthroughs call it on assembled pipes).

A DataFrame's lineage IS its query plan, so the graph here is Catalyst's
own tree: ``to_graph`` returns the formatted physical plan (the node/edge
structure a user inspects to see what will execute), ``to_graph_logical``
the analyzed logical tree. Pure metadata — no job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_graph(df: DataFrame) -> str:
    """Formatted physical plan of ``df`` (nodes + per-node details) —
    what `.explain('formatted')` prints, returned as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def to_graph_logical(df: DataFrame) -> str:
    """Analyzed logical plan tree of ``df`` as a string."""
    return df._jdf.queryExecution().analyzed().toString()
