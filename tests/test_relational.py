"""Driver-style conformance: each relational operator vs its DuckDB oracle
SQL at sf0.001 (the real driver runs the same comparison at sf0.01)."""

import pytest

from rfb_cnpj_etl_ray.pipelines import relational as R
from tests.conftest import SF_DIR
from tests.util_compare import assert_query_matches

CASES = [
    (R.lww_latest_events, R.LWW_LATEST_EVENTS_SQL),
    (R.explode_part_types, R.EXPLODE_PART_TYPES_SQL),
    (R.customers_without_orders, R.CUSTOMERS_WITHOUT_ORDERS_SQL),
    (R.normalize_nation_codes, R.NORMALIZE_NATION_CODES_SQL),
    (R.upsert_static_nations, R.UPSERT_STATIC_NATIONS_SQL),
    (R.pricing_summary, R.PRICING_SUMMARY_SQL),
    (R.revenue_by_nation, R.REVENUE_BY_NATION_SQL),
    (R.parts_per_order, R.PARTS_PER_ORDER_SQL),
    (R.top_orders, R.TOP_ORDERS_SQL),
    (R.hourly_user_activity, R.HOURLY_USER_ACTIVITY_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[c[0].__name__ for c in CASES])
def test_relational_matches_oracle(ray_session, fn, sql):
    assert_query_matches(fn, sql, SF_DIR)
