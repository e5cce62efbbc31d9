"""Every declared query must hash-match its DuckDB oracle (the driver's t2
gate, emulated at sf0.001 for speed)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_correctness import compare  # noqa: E402


def _all_query_names():
    from lvm_datapipe_spark.queries import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    from lvm_datapipe_spark.queries import ORACLE_SQL, QUERIES

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLE_SQL:
        pytest.skip(f"{name} is rows-only (no SQL oracle)")
    ddf = duck.execute(ORACLE_SQL[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"
