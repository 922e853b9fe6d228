"""Fast subset of the driver's Spark-vs-DuckDB correctness gate
(the full 31-query sweep lives in scripts/check_parity.py and runs
per round; this keeps `pytest -x -q` honest and quick)."""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SUBSET = [
    "q01_pricing_summary",
    "q05_range_predicate",
    "q08_top_event_per_user",
    "q13_semi_join",
    "q16_word_topk",
    "q19_fingerprint",
    "q22_token_counts",
    "q27_ann_cosine_topk",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, con, name):
    from ocr_inference_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, SF_DIR)
    scols, svals = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.sql(ORACLES[name])
    ocols, ovals = _normalize(res.fetchall(), [d[0] for d in res.description])
    assert scols == ocols
    assert len(svals) == len(ovals)
    assert svals == ovals
