"""Full oracle-surface conformance: every ``oracle_sql()`` entry vs its
Ray query at sf0.001, compared the way the driver does (columns sorted
by name, floats rounded, order-insensitive values).

This is the in-repo guard for the driver's sf0.01 correctness gate: a
kernel or pipeline change that silently diverges from its DuckDB oracle
fails HERE first.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _entry_mod():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__ray_entry__")


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _oracle_names() -> list[str]:
    return sorted(_entry_mod().oracle_sql())


@pytest.mark.slow
@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(ray_session, name):
    mod = _entry_mod()
    out = mod.queries()[name](SF)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF}/{t}.parquet')"
        )
    sq = con.execute(mod.oracle_sql()[name]).df()

    a, b = _norm(out), _norm(sq)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), (len(a), len(b))
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert np.allclose(
                a[c].to_numpy(), b[c].to_numpy().astype(float), equal_nan=True
            ), c
        else:
            assert (
                a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()
            ).all(), c
