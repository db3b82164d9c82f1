"""ETRS-TM35FIN hierarchical map-tile codec (the engine's H3/S2 analog).

Grammar pinned by the reference (LasUtility/Nls/TileNamer.cs:6-483):

- top level: letter K..X northward (96 km rows) + digit 2..6 eastward
  (192 km cols), origin east=-76000 / north=6570000 (TileNamer.cs:28-69)
- three quadtree digit levels ``1-4`` (child order: 1=SW 2=NW 3=SE 4=NE,
  TileNamer.cs:419-451) down to 24x12 km
- ``L``/``R`` east-half suffix at exactly 12 km wanted size
  (TileNamer.cs:457-475)
- 8-way letters ``A-H`` (2 rows x 4 cols: A C E G bottom, B D F H top)
  at 6x6 km (TileNamer.cs:352-381)
- one more quad digit to 3x3 km, then 9-way ``_1.._9`` (3 cols eastward x
  3 rows northward per column) at 1x1 km (TileNamer.cs:382-416)

Because every level's grid aligns to the global origin, the recursion
collapses to closed-form floor/mod arithmetic — which is what makes the
codec vectorizable over numpy arrays *and* expressible as portable SQL
(see :func:`tile_encode_sql`) for DuckDB oracle parity.

Golden pairs from LasUtility.Tests/NlsTileNamer.Tests.cs:10-60 are pinned
in tests/test_tilenamer.py.
"""

from __future__ import annotations

import numpy as np

NORTH_CHARS = "KLMNPQRSTUVWX"  # TileNamer.cs:8-11
AH_CHARS = "ABCDEFGH"  # index = 2*col + row (A C E G bottom row)

ORIGIN_EAST = -76000  # TileNamer.cs:28
ORIGIN_NORTH = 6570000  # TileNamer.cs:33
SIZE_EAST0 = 192000  # TileNamer.cs:59
SIZE_NORTH0 = 96000  # TileNamer.cs:64
MIN_EAST = 20000  # TileNamer.cs:39
MAX_EAST = ORIGIN_EAST + 4 * SIZE_EAST0  # 692000, TileNamer.cs:49
MIN_NORTH = ORIGIN_NORTH  # TileNamer.cs:44
MAX_NORTH = ORIGIN_NORTH + 13 * SIZE_NORTH0  # 7818000, TileNamer.cs:54

# north-size of the tile produced at each successive name position
_LEVEL_SIZES = (96000, 48000, 24000, 12000, 6000, 3000, 1000)


def _level_for(wanted_size_north: int) -> int:
    """Number of sub-top levels to emit: reference stops at the first level
    whose north size <= wanted (TileNamer.cs:335,455)."""
    if wanted_size_north >= 96000:
        return 0
    for i, s in enumerate((48000, 24000, 12000, 6000, 3000, 1000)):
        if wanted_size_north >= s:
            return i + 1
    raise ValueError("wanted size must be >= 1000")


def tile_encode(east: int, north: int, wanted_size_north: int) -> str:
    """Scalar encode — mirrors TileNamer.Encode (TileNamer.cs:314-343)."""
    return tile_encode_batch(
        np.array([east], dtype=np.int64),
        np.array([north], dtype=np.int64),
        wanted_size_north,
    )[0]


def _snap_sizes(wanted_size_north: int) -> tuple[int, int]:
    """(east, north) edge lengths of the tile actually produced for a
    wanted north size — east is 2x north above the 12 km level."""
    nlev = _level_for(wanted_size_north)
    sn = _LEVEL_SIZES[nlev]
    if nlev == 3 and wanted_size_north == 12000:
        return 12000, 12000  # L/R half
    se = 2 * sn if sn >= 12000 else sn
    return se, sn


def cell_id(east, north, wanted_size_north: int) -> np.ndarray:
    """Packed int64 cell id — the engine's partition key (hot path).

    Pure integer arithmetic (no strings): id = row * 2^32 + col of the
    tile grid at the requested level, offset so ids are dense and
    range-partitionable.  ``cell_id_to_name`` recovers the NLS name.
    Hierarchy: a parent's id at a coarser level is derived by integer
    division of (row, col) — used for multi-resolution pruning.
    """
    se, sn = _snap_sizes(wanted_size_north)
    e = np.asarray(east, dtype=np.int64)
    n = np.asarray(north, dtype=np.int64)
    col = (e - ORIGIN_EAST) // se
    row = (n - ORIGIN_NORTH) // sn
    return row * np.int64(1 << 32) + col


def cell_id_envelope(cid, wanted_size_north: int):
    """cell id -> (min_e, min_n, max_e, max_n) int64 arrays (vectorized)."""
    se, sn = _snap_sizes(wanted_size_north)
    cid = np.asarray(cid, dtype=np.int64)
    row = cid >> 32
    col = cid & np.int64(0xFFFFFFFF)
    min_e = ORIGIN_EAST + col * se
    min_n = ORIGIN_NORTH + row * sn
    return min_e, min_n, min_e + se, min_n + sn


def cell_id_to_name(cid, wanted_size_north: int) -> np.ndarray:
    """cell id array -> NLS tile names (memoized on unique ids)."""
    cid = np.asarray(cid, dtype=np.int64)
    uniq, inv = np.unique(cid, return_inverse=True)
    min_e, min_n, _, _ = cell_id_envelope(uniq, wanted_size_north)
    names = tile_encode_batch(min_e, min_n, wanted_size_north)
    return names[inv]


def tile_encode_batch(east, north, wanted_size_north: int) -> np.ndarray:
    """Vectorized encode of int coordinate arrays -> array of tile names.

    Same recurrence as TileNamer.EncodeRecursive (TileNamer.cs:345-481),
    collapsed to per-level floor/mod arithmetic.  Coordinates are first
    snapped to their tile's min corner and uniquified, so cost scales with
    the number of distinct tiles, not points.
    """
    e = np.asarray(east, dtype=np.int64)
    n = np.asarray(north, dtype=np.int64)
    if np.any((e < MIN_EAST) | (e >= MAX_EAST) | (n < MIN_NORTH) | (n >= MAX_NORTH)):
        raise ValueError("Coordinates out of bounds")  # TileNamer.cs:320-323

    if e.size > 64:
        # dedupe via the integer cell id: string-build once per tile
        se, sn = _snap_sizes(wanted_size_north)
        cid = cell_id(e, n, wanted_size_north)
        uniq, inv = np.unique(cid, return_inverse=True)
        if uniq.size < e.size:  # only dedupe when it actually helps
            col = uniq & np.int64(0xFFFFFFFF)
            row = uniq >> 32
            names = _encode_nocheck(
                ORIGIN_EAST + col * se, ORIGIN_NORTH + row * sn, wanted_size_north
            )
            return names[inv]
    return _encode_nocheck(e, n, wanted_size_north)


def _encode_nocheck(e: np.ndarray, n: np.ndarray, wanted_size_north: int) -> np.ndarray:
    """Core string build — callers guarantee coordinates are tile mins or
    already bounds-checked (tile mins of edge tiles may precede MIN_EAST)."""
    E = e - ORIGIN_EAST
    N = n - ORIGIN_NORTH

    north_idx = N // SIZE_NORTH0
    east_idx = E // SIZE_EAST0

    letters = np.frombuffer(NORTH_CHARS.encode(), dtype="S1")
    parts = [
        letters[north_idx].astype("U1"),
        np.char.mod("%d", east_idx + 2),
    ]

    nlev = _level_for(wanted_size_north)
    # quadtree digit levels: child sizes (96000,48000) (48000,24000) (24000,12000)
    for child_se, child_sn in ((96000, 48000), (48000, 24000), (24000, 12000))[
        : min(nlev, 3)
    ]:
        i_e = (E // child_se) % 2
        i_n = (N // child_sn) % 2
        parts.append(np.char.mod("%d", 1 + i_n + 2 * i_e))

    if nlev == 3 and wanted_size_north == 12000:
        # L/R east-half suffix, only for exactly-12km requests (TileNamer.cs:459)
        lr = np.where((E // 12000) % 2 == 0, "L", "R")
        parts.append(lr)
    if nlev >= 4:  # A-H 6x6 km level
        i_e = (E // 6000) % 4
        i_n = (N // 6000) % 2
        ah = np.frombuffer(AH_CHARS.encode(), dtype="S1")
        parts.append(ah[2 * i_e + i_n].astype("U1"))
    if nlev >= 5:  # quad to 3x3 km
        i_e = (E // 3000) % 2
        i_n = (N // 3000) % 2
        parts.append(np.char.mod("%d", 1 + i_n + 2 * i_e))
    if nlev >= 6:  # 9-way to 1x1 km
        i_e = (E // 1000) % 3
        i_n = (N // 1000) % 3
        parts.append(np.char.mod("_%d", 1 + 3 * i_e + i_n))

    out = parts[0]
    for p in parts[1:]:
        out = np.char.add(out, p)
    return out


def tile_decode(name: str) -> tuple[int, int, int, int]:
    """name -> half-open envelope (min_e, min_n, max_e, max_n).

    Mirrors TileNamer.Decode/DecodeRecursive (TileNamer.cs:82-304).
    """
    if name is None or len(name) < 2:
        raise ValueError("Input string is null or less than 2 chars long")
    s = name.upper()

    try:
        north_idx = NORTH_CHARS.index(s[0])
    except ValueError:
        raise ValueError("Map tile has invalid first letter") from None
    if not s[1].isdigit():
        raise ValueError("Map tile name must continue with digit after the first char")
    east_digit = int(s[1])
    if east_digit < 2 or east_digit > 6:
        raise ValueError("Digit must be between 2-6 on the second char")

    min_e = ORIGIN_EAST + (east_digit - 2) * SIZE_EAST0
    min_n = ORIGIN_NORTH + north_idx * SIZE_NORTH0
    size_e, size_n = SIZE_EAST0, SIZE_NORTH0

    i = 2
    while i < len(s):
        c = s[i]
        if size_n == 12000 and i == len(s) - 1 and c in "LR":
            size_e //= 2  # TileNamer.cs:151-166
            if c == "R":
                min_e += size_e
            i += 1
            continue
        if size_n == 12000:
            # A-H 8-way (TileNamer.cs:168-207)
            k = AH_CHARS.find(c)
            if k < 0:
                raise ValueError(f"Tile name {name}: expected A-H at position {i}")
            size_e //= 4
            size_n //= 2
            min_e += (k // 2) * size_e
            min_n += (k % 2) * size_n
        elif size_n == 3000:
            # _1.._9 (TileNamer.cs:209-268)
            if c != "_":
                raise ValueError(f"Tile name {name}: expected underscore at position {i}")
            i += 1
            if i >= len(s) or not s[i].isdigit():
                raise ValueError(f"Tile name {name}: expected digit after underscore")
            d = int(s[i])
            if d < 1 or d > 9:
                raise ValueError(f"Tile name {name}: digit must be 1-9")
            size_e = size_n = 1000
            min_e += ((d - 1) // 3) * 1000
            min_n += ((d - 1) % 3) * 1000
        else:
            # quad digits 1-4 (TileNamer.cs:269-301)
            if not c.isdigit():
                raise ValueError(f"Tile name {name}: expected digit at position {i}")
            d = int(c)
            if d < 1 or d > 4:
                raise ValueError(f"Tile name {name}: digit must be 1-4")
            size_e //= 2
            size_n //= 2
            if d in (3, 4):
                min_e += size_e
            if d in (2, 4):
                min_n += size_n
        i += 1

    return min_e, min_n, min_e + size_e, min_n + size_n


def tile_decode_batch(names) -> np.ndarray:
    """Array of names -> (n, 4) int64 envelopes, memoized on unique names."""
    names = np.asarray(names)
    uniq, inv = np.unique(names, return_inverse=True)
    envs = np.array([tile_decode(str(u)) for u in uniq], dtype=np.int64)
    return envs[inv]


def tile_encode_sql(e_expr: str, n_expr: str, wanted_size_north: int) -> str:
    """Portable ANSI-SQL expression computing tile_encode — same arithmetic,
    runnable by both DuckDB and Spark SQL (used for oracle parity).
    """
    E = f"(CAST({e_expr} AS BIGINT) - ({ORIGIN_EAST}))"
    N = f"(CAST({n_expr} AS BIGINT) - {ORIGIN_NORTH})"

    def idx_char(chars: str, idx_expr: str) -> str:
        cases = " ".join(
            f"WHEN {i} THEN '{c}'" for i, c in enumerate(chars)
        )
        return f"(CASE {idx_expr} {cases} END)"

    parts = [
        idx_char(NORTH_CHARS, f"CAST(FLOOR({N} / {SIZE_NORTH0}) AS INT)"),
        f"CAST(CAST(FLOOR({E} / {SIZE_EAST0}) AS INT) + 2 AS STRING)",
    ]
    nlev = _level_for(wanted_size_north)
    for child_se, child_sn in ((96000, 48000), (48000, 24000), (24000, 12000))[
        : min(nlev, 3)
    ]:
        ie = f"(CAST(FLOOR({E} / {child_se}) AS INT) % 2)"
        inn = f"(CAST(FLOOR({N} / {child_sn}) AS INT) % 2)"
        parts.append(f"CAST(1 + {inn} + 2 * {ie} AS STRING)")
    if nlev == 3 and wanted_size_north == 12000:
        parts.append(
            f"(CASE WHEN CAST(FLOOR({E} / 12000) AS INT) % 2 = 0 THEN 'L' ELSE 'R' END)"
        )
    if nlev >= 4:
        ie = f"(CAST(FLOOR({E} / 6000) AS INT) % 4)"
        inn = f"(CAST(FLOOR({N} / 6000) AS INT) % 2)"
        parts.append(idx_char(AH_CHARS, f"(2 * {ie} + {inn})"))
    if nlev >= 5:
        ie = f"(CAST(FLOOR({E} / 3000) AS INT) % 2)"
        inn = f"(CAST(FLOOR({N} / 3000) AS INT) % 2)"
        parts.append(f"CAST(1 + {inn} + 2 * {ie} AS STRING)")
    if nlev >= 6:
        ie = f"(CAST(FLOOR({E} / 1000) AS INT) % 3)"
        inn = f"(CAST(FLOOR({N} / 1000) AS INT) % 3)"
        parts.append(f"('_' || CAST(1 + 3 * {ie} + {inn} AS STRING))")
    return "(" + " || ".join(parts) + ")"
