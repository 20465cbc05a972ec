"""The pure-SQL entry surface: register_views + spark.sql must express
the same queries as the DataFrame API (SURVEY.md §1: 'operators can be
written in pure SQL')."""

from __future__ import annotations

from honors_p1_mapreduce_spark.operators.relational import region_acctbal
from honors_p1_mapreduce_spark.sources.tables import TABLES, register_views


def test_register_views_and_sql_join(spark, sf_dir):
    register_views(spark, sf_dir)
    for t in TABLES:
        assert spark.table(t).count() >= 0  # every view resolves
    got = {
        (r.r_name, r.n_name, r.n_customers)
        for r in spark.sql(
            """
            SELECT r_name, n_name, count(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
            """
        ).collect()
    }
    want = {
        (r.r_name, r.n_name, r.n_customers)
        for r in region_acctbal(spark, sf_dir).collect()
    }
    assert got == want
