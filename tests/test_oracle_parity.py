"""Every registered oracle query must match DuckDB exactly at sf0.001
— the same comparison the driver runs at sf0.01 (columns sorted by
name, order-insensitive rows, exact values)."""

import duckdb
import pytest

from python_vectordbapp_ceph_spark.io import TABLES
from python_vectordbapp_ceph_spark.queries import ORACLES, QUERIES

from conftest import SF_DIR


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


from python_vectordbapp_ceph_spark.queries._compare import canon as _canon


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, oracle_con, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols, srows = _canon(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = oracle_con.execute(ORACLES[name])
    ocols, orows = _canon(
        [d[0] for d in cur.description], [tuple(r) for r in cur.fetchall()]
    )
    assert scols == ocols
    assert len(srows) == len(orows)
    assert srows == orows


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_query_output_is_hashable(spark, name):
    """The driver's pandas canonicalizer sorts cell values before hashing
    and cannot handle array/map/struct cells (round-3 `q_array_funcs`
    red row). Every oracle-checked query must emit scalar columns only."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = QUERIES[name](spark, SF_DIR).schema
    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name} returns non-scalar columns {complex_cols}; the driver "
        "hasher cannot sort them — project to scalars or drop the oracle"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_stats_moments_match_builtin_aggregates(spark):
    """q_stats_moments computes stddev/corr/skewness from exact raw
    moments (for oracle parity); its values must stay the builtins'
    semantics — pin them to stddev_samp/corr/skewness within fp noise."""
    from pyspark.sql import functions as F

    from python_vectordbapp_ceph_spark.io import load_table
    from python_vectordbapp_ceph_spark.queries.relational import q_stats_moments

    li = load_table(spark, SF_DIR, "lineitem")
    builtin = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.stddev_samp("l_extendedprice").alias("price_sd"),
            F.corr("l_quantity", "l_extendedprice").alias("qty_price_corr"),
            F.skewness("l_discount").alias("disc_skew"),
        )
        .collect()
    }
    for r in q_stats_moments(spark, SF_DIR).collect():
        b = builtin[r["l_returnflag"]]
        assert abs(r["price_sd"] - b["price_sd"]) < 5e-3
        assert abs(r["qty_price_corr"] - b["qty_price_corr"]) < 5e-5
        assert abs(r["disc_skew"] - b["disc_skew"]) < 5e-5


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    assert {"doc_id", "distance"} <= set(df.columns)
