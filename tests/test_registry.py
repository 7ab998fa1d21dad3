"""End-to-end check of the driver contract: every queries() entry runs
and (when an oracle exists) matches its DuckDB oracle_sql() exactly —
the same comparison the driver performs at sf0.01, run here at sf0.001.
"""

import math

import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _to_table(res) -> pa.Table:
    import pandas as pd
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return pa.Table.from_pylist(res.take_all())
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res)
    return res


def _normalize(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    rows = []
    for r in tbl.select(cols).to_pylist():
        rows.append(tuple(_norm_val(r[c]) for c in cols))
    return cols, sorted(rows, key=lambda t: tuple(str(x) for x in t))


def _norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _oracle_table(con, sql) -> pa.Table:
    return con.execute(sql).arrow()


@pytest.fixture(scope="module")
def registry():
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def test_entry_runs(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    tbl = _to_table(res)
    assert tbl.num_rows >= 0
    assert "geometry" in tbl.column_names


def test_all_queries_against_oracles(ray_session, oracle, registry):
    queries, oracles = registry
    failures = []
    for name, fn in queries.items():
        res = _to_table(fn(SF))
        if name in oracles:
            want = _oracle_table(oracle, oracles[name])
            gc, gr = _normalize(res)
            wc, wr = _normalize(want)
            if len(gr) == 0 and len(wr) == 0:
                continue
            if gc != wc:
                failures.append(f"{name}: columns {gc} != {wc}")
            elif gr != wr:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(gr, wr)) if a != b),
                    min(len(gr), len(wr)),
                )
                failures.append(
                    f"{name}: rows {len(gr)} vs {len(wr)}; first diff at "
                    f"{diff}: {gr[diff] if diff < len(gr) else None} != "
                    f"{wr[diff] if diff < len(wr) else None}"
                )
        else:
            if res.num_rows < 0:  # pragma: no cover
                failures.append(f"{name}: negative rows?")
    assert not failures, "\n".join(failures)
