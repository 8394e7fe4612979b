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
from .relate import relate, relate_matches  # noqa: F401
from .overlay import (  # noqa: F401
    difference,
    intersection,
    overlay,
    symmetric_difference,
    union,
    union_many,
)
