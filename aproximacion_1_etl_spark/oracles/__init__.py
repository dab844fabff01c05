"""DuckDB oracle SQL for every declared query (driver contract).

Each SQL string must produce, on the same parquet tables, exactly the
rows/columns of the Spark query with the same column names — the driver
compares row-count + schema + order-insensitive value hash (columns
sorted by name). Engine-parity rules used throughout:

- md5/sha256 hex output is identical across engines;
- integer aggregates CAST to BIGINT (DuckDB sum(int) is HUGEINT);
- timestamps via strftime; doubles via round(x, n) with both engines
  computing the same sequential expression;
- the simhash / LSH oracles are *generated* from the same constants the
  Spark implementation uses, so the two stay in lockstep by
  construction.
"""


from __future__ import annotations

# Geo keys: both sides consume the SAME generated integer-arithmetic
# expressions (functions/geo.py) — bit interleave and unrolled
# ray-cast edges are identical by construction.
from aproximacion_1_etl_spark.functions.geo import (  # noqa: E402
    diamond as _diamond,
    morton_sql as _morton_sql,
    point_in_polygon_sql as _pip_sql,
)
from .common import *  # noqa: F401,F403
from . import etl as _etl
from . import lakehouse as _lakehouse
from . import tpch as _tpch
from . import windows as _windows
from . import profile as _profile
from . import text as _text
from . import vector as _vector
from . import graph as _graph
from . import streaming as _streaming
from . import analytics as _analytics

ALL_ORACLES: dict[str, str] = {}
ALL_ORACLES.update(_etl.ORACLES)
ALL_ORACLES.update(_lakehouse.ORACLES)
ALL_ORACLES.update(_tpch.ORACLES)
ALL_ORACLES.update(_windows.ORACLES)
ALL_ORACLES.update(_profile.ORACLES)
ALL_ORACLES.update(_text.ORACLES)
ALL_ORACLES.update(_vector.ORACLES)
ALL_ORACLES.update(_graph.ORACLES)
ALL_ORACLES.update(_streaming.ORACLES)
ALL_ORACLES.update(_analytics.ORACLES)


# Streaming maintenance keys whose final render is DEFINED to equal an
# existing batch key's oracle (the stream folds state; the oracle is the
# from-scratch batch equivalent) — aliased, not duplicated, so the two
# can never drift.
ALL_ORACLES["streaming_merge_on_read"] = ALL_ORACLES["merge_on_read"]
ALL_ORACLES["streaming_hll_maintenance"] = ALL_ORACLES[
    "hll_sliding_distinct"
]
ALL_ORACLES["streaming_cms_maintenance"] = ALL_ORACLES[
    "heavy_hitters_cms"
]
ALL_ORACLES["streaming_changepoint"] = ALL_ORACLES["changepoint_detect"]
ALL_ORACLES["streaming_ewma_monitor"] = ALL_ORACLES["ewma_control_chart"]

ALL_ORACLES["morton_cells"] = f"""
WITH {_GEO_PTS_SQL},
q AS (SELECT px + 180 AS qx, py + 90 AS qy FROM pts),
c AS (SELECT {_morton_sql("qx", "qy", 9)} AS code FROM q)
SELECT CAST(code >> 6 AS BIGINT) AS cell6,
       CAST(code >> 12 AS BIGINT) AS cell3,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(min(code) AS BIGINT) AS min_code,
       CAST(max(code) AS BIGINT) AS max_code
FROM c GROUP BY 1, 2
"""

ALL_ORACLES["point_in_polygon_join"] = "WITH " + _GEO_PTS_SQL + (
    " SELECT * FROM ("
    + " UNION ALL ".join(
        f"""
SELECT CAST({j} AS INT) AS polygon_id,
       CAST(sum(CASE WHEN {_pip_sql("px", "py", _diamond(cx, cy, r))}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_points,
       CAST(sum(CASE WHEN {_pip_sql("px", "py", _diamond(cx, cy, r))}
                     THEN c_custkey ELSE 0 END) AS BIGINT) AS sum_keys
FROM pts"""
        for j, (cx, cy, r) in [
            (j, (j * 60 - 90, j * 20 - 30, 20 + 10 * j)) for j in range(4)
        ]
    )
    + ")"
)
