"""NLS topographic-database code books (Nls/TopographicDb.cs:18-104).

Dictionaries mapping NLS feature-class codes (LUOKKA) to raster byte
values; in the engine these become tiny broadcast dimension tables (V1)
joined semi-style before rasterization (V2).
"""

MAP_TILE_EDGE_M = 12000  # TopographicDb.cs:9

WATER_LINE = {36311: 50, 36312: 51}  # TopographicDb.cs:18-22
ROAD_LINE = {  # TopographicDb.cs:24-39
    12111: 70,
    12112: 72,
    12121: 74,
    12122: 76,
    12131: 78,
    12132: 80,
    12141: 82,
    12313: 88,
    12314: 86,
    12316: 84,
}
BUILDING_POLYGON = {  # TopographicDb.cs:41-62
    42210: 100,
    42211: 101,
    42212: 102,
    42220: 103,
    42221: 104,
    42222: 105,
    42230: 106,
    42231: 107,
    42232: 108,
    42240: 109,
    42241: 110,
    42242: 111,
    42270: 112,
    42250: 113,
    42251: 114,
    42252: 115,
    42260: 116,
    42261: 117,
    42262: 118,
}
WATER_POLYGON = {36200: 130, 36211: 131}  # TopographicDb.cs:64-68
SWAMP_POLYGON = {35411: 135, 35412: 136, 35421: 137, 35422: 138}  # :70-76
FIELD_POLYGON = {32611: 140, 32612: 141, 32800: 142}  # :78-83
ROCK_POLYGON = {34700: 145, 34100: 146, 32500: 147, 32111: 148}  # :85-91
ROCK_LINE = {34400: 150, 34500: 151, 34800: 152}  # :93-98
SAND_POLYGON = {34300: 160, 32112: 161}  # :100-104

ALL_POLYGON = {
    **BUILDING_POLYGON,
    **WATER_POLYGON,
    **SWAMP_POLYGON,
    **FIELD_POLYGON,
    **ROCK_POLYGON,
    **SAND_POLYGON,
}
ALL_LINE = {**WATER_LINE, **ROAD_LINE, **ROCK_LINE}

# LAS point classes (Nls/PointCloud05p.cs:8-89)
CLS_UNCLASSIFIED = 1
CLS_GROUND = 2
CLS_LOW_VEGETATION = 3
CLS_MEDIUM_VEGETATION = 4
CLS_HIGH_VEGETATION = 5
CLS_LOW_ERROR = 7
CLS_OVERLAP = 12
CLS_AIR = 15
CLS_ISOLATED = 16
CLS_FAULT = 17
