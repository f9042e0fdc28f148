"""Mini driver-conformance run: every queries() entry executes at
sf0.001; every oracle_sql() entry matches its Ray result the way the
driver compares them (sorted columns, order-insensitive rows)."""

import pytest

import __ray_entry__ as E
from tests.conftest import SF_DIR
from tests.util_compare import assert_query_matches, to_pandas

QUERIES = E.queries()
ORACLES = E.oracle_sql()
# the flagship oracle embeds absolute synth-parquet paths sized for the
# driver's sf0.01 run; re-derive it for this suite's sf so the LWW SQL
# reads the same cached input the query replays
ORACLES["cdc_ingest_final_state"] = E.cdc_final_state_sql(SF_DIR)


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(ray_session):
    ds = E.entry()
    assert ds.count() > 0
    assert set(ds.schema().names) == {"doc_id", "tokens", "n_tok", "source"}


@pytest.mark.parametrize("name", sorted(ORACLES), ids=str)
def test_query_matches_driver_oracle(ray_session, name):
    assert_query_matches(QUERIES[name], ORACLES[name], SF_DIR)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES)), ids=str
)
def test_rows_only_queries_run(ray_session, name):
    df = to_pandas(QUERIES[name](SF_DIR))
    assert df is not None and len(df) >= 0
    assert len(df.columns) > 0
