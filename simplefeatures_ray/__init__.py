"""simplefeatures_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch re-expression of the peterstace/simplefeatures semantics
(OGC Simple Feature Access) as vectorized Arrow/numpy kernels inside
ray.data.Dataset pipelines. See SURVEY.md for the blueprint.

Nothing in this package calls ray.init()/ray.shutdown(); sessions are
owned by the caller (tests' conftest, bench.py, CLI scripts).
"""

__version__ = "0.1.0"
