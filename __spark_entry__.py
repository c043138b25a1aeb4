"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship five-stage KG-construction pipeline
(kgforge.pipeline) over pages deterministically synthesized from the
sf0.001 documents table. ``queries()``/``oracle_sql()`` expose the operator
inventory (kgforge.queries): SQL-oracled text-analysis / dedup / similarity /
relational operators, plus rows-only KG stages (model pipelines are not
SQL-expressible; their exactness gate is the pytest P/R suite).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make `import kgforge` work regardless of the caller's CWD
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kgforge.queries import q_kg_triples

    return q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kgforge.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query above."""
    from kgforge.queries import ORACLES

    return dict(ORACLES)
