from .core import (  # noqa: F401
    DIM_XY,
    DIM_XYM,
    DIM_XYZ,
    DIM_XYZM,
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    GeometryError,
)
from .wkt import from_wkt, to_wkt  # noqa: F401
from .wkb import from_wkb, to_wkb  # noqa: F401
