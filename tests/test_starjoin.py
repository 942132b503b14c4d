"""revenue_by_nation_year: DuckDB replay equality (beyond the shared
parity gate: exercised here at a second bucket count) + the year-grid
guard."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _oracle() -> pd.DataFrame:
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c.execute(
        """
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, order_year
        ORDER BY n_name, order_year
        """
    ).df()


def test_star_join_matches_oracle_at_odd_bucket_count(ray_session):
    from pdf_ocr_api_ray.pipelines.starjoin import revenue_by_nation_year

    got = revenue_by_nation_year(SF_DIR, num_buckets=13).sort_values(
        ["n_name", "order_year"], ignore_index=True
    )
    want = _oracle()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_star_join_year_guard_raises(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import shutil

    from pdf_ocr_api_ray.pipelines.starjoin import revenue_by_nation_year

    d = tmp_path / "sf"
    d.mkdir()
    for t in ("lineitem", "customer", "nation"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    orders = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
    orders.loc[0, "o_orderdate"] = pd.Timestamp("2050-01-01")
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False), d / "orders.parquet")
    # the op is eager (elementwise_fold executes); Ray surfaces the
    # worker's ValueError wrapped, so match on the message text
    with pytest.raises(Exception, match="year outside the fold grid"):
        revenue_by_nation_year(str(d))
