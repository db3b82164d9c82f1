"""Geospatial relational operators as portable SQL over a points CTE.

The driver's correctness harness (``__spark_entry__.py``) has no image
table in its registered views, so the geospatial operators are verified
over a deterministic points table derived from ``lineitem``
(engine.points.synth_points_sql) — exactly the same rows on both engines.

Operators covered (SURVEY.md §2 ids):

- X3/X4  cell assignment + cell corners (floor arithmetic)
- X1/X2  tile-name encode (SQL-emitted grammar) and envelope decode
- A2     ground DEM max(z)
- A4/A5  per-cell descending rank / top-1 in class range
- A6     class-range heights
- A7     neighborhood local-max self-join
- S4     integer extent
- S14    surface model coalesce
- V2     class-map semi-join
- V5'    point-in-polygon join against a literal polygon (sign test)
- V1     class-map dimension union/except

All half-open-bounds floor arithmetic matches gridlib.bounds
(RasterBounds.cs:118-133); tile grid is the 1 km NLS level anchored like
gridlib.tilenamer (cell_id = row * 2^32 + col).
"""

from __future__ import annotations

from ..engine.points import synth_points_sql
from ..gridlib import tilenamer as tn
from ..gridlib import topodb

# 1 km NLS grid: cell id arithmetic identical to gridlib.tilenamer.cell_id
_CELL = (
    "CAST(FLOOR((y - 6570000.0) / 1000.0) AS BIGINT) * 4294967296 "
    "+ CAST(FLOOR((x - (-76000.0)) / 1000.0) AS BIGINT)"
)
# row/col inside the tile at 128x128 cells (cellsize 7.8125 m)
_ROW = "CAST(FLOOR((y - (FLOOR((y - 6570000.0) / 1000.0) * 1000.0 + 6570000.0)) / 7.8125e0) AS INT)"
_COL = "CAST(FLOOR((x - (FLOOR((x - (-76000.0)) / 1000.0) * 1000.0 + (-76000.0))) / 7.8125e0) AS INT)"


def _with_points(body: str) -> str:
    return f"WITH points AS ({synth_points_sql('lineitem')}) {body}"


def cells_sql(dialect: str) -> str:
    """X3: point -> cell assignment; per-cell point counts."""
    return _with_points(
        f"""
    SELECT {_CELL} AS cell_id, {_ROW} AS cell_row, {_COL} AS cell_col,
           COUNT(*) AS n_points
    FROM points
    GROUP BY 1, 2, 3
    """
    )


def cell_corners_sql(dialect: str) -> str:
    """X4: distinct cells -> bottom-left world coordinates."""
    return _with_points(
        f"""
    SELECT DISTINCT {_CELL} AS cell_id, {_ROW} AS cell_row, {_COL} AS cell_col,
      FLOOR((x - (-76000.0)) / 1000.0) * 1000.0 + (-76000.0) + {_COL} * 7.8125e0 AS cell_minx,
      FLOOR((y - 6570000.0) / 1000.0) * 1000.0 + 6570000.0 + {_ROW} * 7.8125e0 AS cell_miny
    FROM points
    """
    )


def ground_dem_sql(dialect: str) -> str:
    """A2: per-cell max(z) of ground points."""
    return _with_points(
        f"""
    SELECT {_CELL} AS cell_id, {_ROW} AS cell_row, {_COL} AS cell_col,
           MAX(z) AS dem_z
    FROM points WHERE cls = 2
    GROUP BY 1, 2, 3
    """
    )


def bins_ranked_sql(dialect: str, topk: int = 3) -> str:
    """A4/A5: per-cell descending z rank over non-ground points."""
    return _with_points(
        f"""
    SELECT cell_id, cell_row, cell_col, rnk, z, cls
    FROM (
      SELECT {_CELL} AS cell_id, {_ROW} AS cell_row, {_COL} AS cell_col, z, cls,
             ROW_NUMBER() OVER (
               PARTITION BY {_CELL}, {_ROW}, {_COL}
               ORDER BY z DESC, cls, x, y
             ) AS rnk
      FROM points WHERE cls <> 2
    ) t WHERE rnk <= {topk}
    """
    )


def highest_in_class_sql(dialect: str, lo: int = 3, hi: int = 5) -> str:
    """A5: highest point in class range per cell — top-1 of the A4 desc
    sort restricted to ``lo <= cls <= hi`` (VoxelGrid.cs:305-317,
    GetHighestPointInClassRange; requires-sorted contract via the
    deterministic ORDER BY tie-break)."""
    return _with_points(
        f"""
    SELECT cell_id, cell_row, cell_col, z, cls
    FROM (
      SELECT {_CELL} AS cell_id, {_ROW} AS cell_row, {_COL} AS cell_col, z, cls,
             ROW_NUMBER() OVER (
               PARTITION BY {_CELL}, {_ROW}, {_COL}
               ORDER BY z DESC, cls, x, y
             ) AS rnk
      FROM points WHERE cls BETWEEN {lo} AND {hi}
    ) t WHERE rnk = 1
    """
    )


def heights_range_sql(dialect: str, lo: int = 3, hi: int = 5) -> str:
    """A6: class-range heights per cell."""
    return _with_points(
        f"""
    SELECT {_CELL} AS cell_id, {_ROW} AS cell_row, {_COL} AS cell_col, z, cls
    FROM points WHERE cls BETWEEN {lo} AND {hi}
    """
    )


def surface_model_sql(dialect: str, lo: int = 3, hi: int = 5) -> str:
    """S14: coalesce(class-range max, ground max, -9999) per cell."""
    return _with_points(
        f"""
    SELECT cell_id, cell_row, cell_col,
           COALESCE(surface_z, dem_z, -9999.0) AS h
    FROM (
      SELECT {_CELL} AS cell_id, {_ROW} AS cell_row, {_COL} AS cell_col,
             MAX(CASE WHEN cls BETWEEN {lo} AND {hi} THEN z END) AS surface_z,
             MAX(CASE WHEN cls = 2 THEN z END) AS dem_z
      FROM points GROUP BY 1, 2, 3
    ) t
    """
    )


def neighborhood_max_sql(dialect: str, radius: int = 1, lo: int = 3, hi: int = 5) -> str:
    """A7: strict local maxima over Chebyshev radius within each tile."""
    base = f"""
    SELECT {_CELL} AS cell_id, {_ROW} AS cell_row, {_COL} AS cell_col, MAX(z) AS zmax
    FROM points WHERE cls BETWEEN {lo} AND {hi}
    GROUP BY 1, 2, 3
    """
    return _with_points(
        f"""
    , cellmax AS ({base})
    SELECT a.cell_id, a.cell_row, a.cell_col, a.zmax,
           CAST((COUNT(CASE WHEN b.zmax >= a.zmax THEN 1 END) = 0) AS INT) AS is_local_max
    FROM cellmax a
    LEFT JOIN cellmax b
      ON a.cell_id = b.cell_id
     AND ABS(a.cell_row - b.cell_row) <= {radius} AND ABS(a.cell_col - b.cell_col) <= {radius}
     AND NOT (a.cell_row = b.cell_row AND a.cell_col = b.cell_col)
    GROUP BY a.cell_id, a.cell_row, a.cell_col, a.zmax
    """
    )


def extent_sql(dialect: str) -> str:
    """S4: floor/ceil integer envelope of the point set."""
    return _with_points(
        """
    SELECT CAST(FLOOR(MIN(x)) AS BIGINT) AS minx,
           CAST(FLOOR(MIN(y)) AS BIGINT) AS miny,
           CAST(CEIL(MAX(x)) AS BIGINT) AS maxx,
           CAST(CEIL(MAX(y)) AS BIGINT) AS maxy
    FROM points
    """
    )


def tile_encode_sql_query(dialect: str) -> str:
    """X1: NLS tile names at 1 km for each distinct cell (SQL-emitted
    grammar; the Spark side runs the engine's real numpy codec instead)."""
    name = tn.tile_encode_sql("t.ix", "t.iy", 1000)
    return _with_points(
        f"""
    SELECT t.cell_id, {name} AS tile_name, COUNT(*) AS n_points
    FROM (
      SELECT {_CELL} AS cell_id,
             CAST(FLOOR(x) AS BIGINT) AS ix, CAST(FLOOR(y) AS BIGINT) AS iy
      FROM points
    ) t
    GROUP BY t.cell_id, {name}
    """
    )


def tile_envelope_sql(dialect: str) -> str:
    """X2: decoded tile envelopes — closed-form floor arithmetic."""
    return _with_points(
        f"""
    SELECT DISTINCT {_CELL} AS cell_id,
      FLOOR((x - (-76000.0)) / 1000.0) * 1000e0 + (-76000e0) AS tile_minx,
      FLOOR((y - 6570000.0) / 1000.0) * 1000e0 + 6570000e0 AS tile_miny,
      FLOOR((x - (-76000.0)) / 1000.0) * 1000e0 + (-76000e0) + 1000e0 AS tile_maxx,
      FLOOR((y - 6570000.0) / 1000.0) * 1000e0 + 6570000e0 + 1000e0 AS tile_maxy
    FROM points
    """
    )


# literal convex test polygon for the PIP-join oracle (world space)
_PIP_POLY = [
    (381000.0, 6667000.0),
    (385000.0, 6667500.0),
    (386000.0, 6671000.0),
    (382000.0, 6672500.0),
]


def pip_literal_sql(dialect: str) -> str:
    """V5-analog: PIP join of all points against a literal convex polygon
    via the all-same-side cross-product test (boundary-inclusive, like
    IsPointInTriangle, Triangulation.cs:349-360); per-class hit counts."""
    conds = []
    n = len(_PIP_POLY)
    for i in range(n):
        x1, y1 = _PIP_POLY[i]
        x2, y2 = _PIP_POLY[(i + 1) % n]
        conds.append(f"(({x2} - {x1}) * (y - {y1}) - ({y2} - {y1}) * (x - {x1})) >= 0")
    inside = " AND ".join(conds)
    return _with_points(
        f"""
    SELECT cls, COUNT(*) AS n_inside,
           CAST(FLOOR(MIN(z)) AS BIGINT) AS min_z_floor,
           CAST(FLOOR(MAX(z)) AS BIGINT) AS max_z_floor
    FROM points WHERE {inside}
    GROUP BY cls
    """
    )


def classmap_union_sql(dialect: str) -> str:
    """V1: class-map dimension union minus removals (Rasteriser.cs:43-56)
    over literal VALUES — the broadcast dimension table ops."""
    rows_a = ", ".join(f"({k}, {v})" for k, v in sorted(topodb.BUILDING_POLYGON.items()))
    rows_b = ", ".join(f"({k}, {v})" for k, v in sorted(topodb.WATER_POLYGON.items()))
    rows_rm = ", ".join(f"({k}, {v})" for k, v in sorted(topodb.SWAMP_POLYGON.items()))
    return f"""
    SELECT luokka, value FROM (
      SELECT * FROM (VALUES {rows_a}) AS a(luokka, value)
      UNION
      SELECT * FROM (VALUES {rows_b}) AS b(luokka, value)
      UNION
      SELECT * FROM (VALUES {rows_rm}) AS r(luokka, value)
    ) u
    EXCEPT
    SELECT * FROM (VALUES {rows_rm}) AS r2(luokka, value)
    """


def classmap_semijoin_sql(dialect: str) -> str:
    """V2: LUOKKA semi-join — points keep only classes present in a tiny
    dimension (broadcast at scale); here classes 3..5 via VALUES."""
    return _with_points(
        """
    SELECT p.cls, COUNT(*) AS n
    FROM points p
    WHERE p.cls IN (SELECT cls FROM (VALUES (3), (4), (5)) AS d(cls))
    GROUP BY p.cls
    """
    )
