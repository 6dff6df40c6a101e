"""Registry integrity + smoke execution of every query at sf0.001.

The full DuckDB-oracle comparison runs via ``tools/check_oracle.py`` (and the
driver at sf0.01); here we assert the contract shape and that every plan
executes.
"""

import pytest

from projet_data_infrastructure_spark.plans import all_specs, oracle_sql_map, queries_map

SF = "/root/testdata/sf0.001"


def test_registry_shape():
    specs = all_specs()
    names = [s.name for s in specs]
    assert len(names) == len(set(names))
    assert len(specs) >= 55
    # every oracle references only pre-registered views (cheap sanity check)
    for s in specs:
        if s.oracle:
            assert "read_parquet" not in s.oracle


def test_maps_align():
    qs, os_ = queries_map(), oracle_sql_map()
    assert set(os_) <= set(qs)


@pytest.mark.parametrize("spec", all_specs(), ids=lambda s: s.name)
def test_query_executes(spark, spec):
    df = spec.fn(spark, SF)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
