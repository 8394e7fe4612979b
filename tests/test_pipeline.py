"""End-to-end flagship pipeline tests: correctness of the join output,
bit-for-bit determinism across parallelism (north rule), skew handling.
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_run(ray_session):
    from simplefeatures_ray.pipelines.geotag import geotag_join_tiles
    from simplefeatures_ray.sources.pages import pages_dataset
    from simplefeatures_ray.sources.polygons import make_polygons

    # final_sort=True: these tests assert on the globally-sorted variant
    # (the default is the partitioned-sink shape, exercised by
    # test_golden_output_hash and the checkpoint suite)
    out = geotag_join_tiles(pages_dataset(5000), make_polygons(64),
                            final_sort=True)
    return out.to_pandas()


def test_flagship_output_shape(small_run):
    df = small_run
    assert len(df) > 0
    assert list(df.columns) == [
        "url", "lat", "lon", "cell", "poly_id", "poly_name", "tile_id",
        "n_tokens", "quality", "lang_pred", "fingerprint",
    ]
    # sorted by (tile_id, url)
    key = list(zip(df["tile_id"], df["url"]))
    assert key == sorted(key)
    # tile ids are dense ranks
    tiles = np.sort(df["tile_id"].unique())
    assert tiles[0] == 0 and tiles[-1] == len(tiles) - 1


def test_join_matches_brute_force(small_run):
    """Every output row's point is really inside its polygon, and a
    brute-force recount of (page, polygon) hits matches."""
    from simplefeatures_ray.geometry.predicates import points_in_polygon
    from simplefeatures_ray.geometry.wkb import from_wkb
    from simplefeatures_ray.sources.pages import page_coords
    from simplefeatures_ray.sources.polygons import make_polygons

    polys = make_polygons(64)
    rings = {}
    for pid, w in zip(polys["poly_id"].to_pylist(), polys["wkb"].to_pylist()):
        g = from_wkb(w)
        rings[pid] = [r for leaf in g.flatten() for r in leaf.rings]
    idx = np.arange(5000, dtype=np.uint64)
    has_geo, lon, lat = page_coords(idx)
    expected = 0
    for pid, rr in rings.items():
        loc = points_in_polygon(lon[has_geo], lat[has_geo], rr)
        expected += int((loc >= 0).sum())
    assert len(small_run) == expected


def test_deterministic_across_parallelism(ray_session, small_run):
    """North rule: bit-for-bit identical output at different block
    layouts / batch sizes (the sandbox proxy for 8 vs 32 CPUs)."""
    from simplefeatures_ray.pipelines.geotag import geotag_join_tiles
    from simplefeatures_ray.sources.pages import pages_dataset
    from simplefeatures_ray.sources.polygons import make_polygons

    out2 = geotag_join_tiles(
        pages_dataset(5000, override_num_blocks=3),
        make_polygons(64),
        batch_size=577,
        final_sort=True,
    ).to_pandas()
    assert small_run.reset_index(drop=True).equals(out2.reset_index(drop=True))


def test_skewed_cells_present(small_run):
    """The synthetic corpus plants urban hot cells; confirm the skew the
    salting machinery exists for is actually in the data."""
    counts = small_run.groupby("cell").size().sort_values(ascending=False)
    assert counts.iloc[0] >= 5 * counts.median()
    assert counts.iloc[0] >= 50


def test_semi_and_anti_modes(ray_session):
    from simplefeatures_ray.pipelines.geotag import geotag_join_tiles
    from simplefeatures_ray.sources.pages import pages_dataset
    from simplefeatures_ray.sources.polygons import make_polygons
    from simplefeatures_ray.stages.extract import extract_geotags_batch
    from simplefeatures_ray.stages.join import build_polygon_index, spatial_join_batch
    import ray

    pages = pages_dataset(2000)
    index_ref = ray.put(build_polygon_index(make_polygons(64)))
    ex = pages.map_batches(extract_geotags_batch, batch_format="pyarrow") \
              .filter(expr="has_geo")
    n_geo = ex.count()
    semi = ex.map_batches(spatial_join_batch,
                          fn_kwargs={"index_ref": index_ref, "mode": "semi"},
                          batch_format="pyarrow").count()
    anti = ex.map_batches(spatial_join_batch,
                          fn_kwargs={"index_ref": index_ref, "mode": "anti"},
                          batch_format="pyarrow").count()
    assert semi + anti == n_geo
    assert semi > 0 and anti > 0


def test_golden_output_hash(ray_session):
    """Pinned content hash of the flagship output at a fixed input — the
    bit-for-bit regression gate (north rule: reproduce join rows and tile
    ids exactly). If an intentional semantic change moves this hash,
    update the pin in the same commit and say why."""
    import hashlib

    from simplefeatures_ray.pipelines.geotag import geotag_join_tiles
    from simplefeatures_ray.sources.pages import pages_dataset
    from simplefeatures_ray.sources.polygons import make_polygons

    def canon(df):
        # default is now the production shape (final_sort=False): content
        # is deterministic, row order is not — canonicalize by sorting
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    df = canon(geotag_join_tiles(pages_dataset(3000), make_polygons(64)).to_pandas())
    digest = hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()
    df2 = canon(geotag_join_tiles(
        pages_dataset(3000, override_num_blocks=2), make_polygons(64), batch_size=333
    ).to_pandas())
    assert hashlib.sha256(df2.to_csv(index=False).encode()).hexdigest() == digest
    # the opt-in global sort must produce the same CONTENT
    df3 = canon(geotag_join_tiles(
        pages_dataset(3000), make_polygons(64), final_sort=True).to_pandas())
    assert hashlib.sha256(df3.to_csv(index=False).encode()).hexdigest() == digest
    # pin (update deliberately, never casually):
    assert digest == GOLDEN_FLAGSHIP_3000, digest


# re-pinned 2026-08-17: flagship default switched to the partitioned-sink
# shape (final_sort=False) and the gate hash is now computed over rows
# canonicalized by sort-by-all-columns, so the digest changed while the
# underlying join rows and tile ids are unchanged (df3 equality above
# proves sorted-path content identity).
GOLDEN_FLAGSHIP_3000 = "a78d17dab18b18121cf2f72f69e07109e1eba763d0d2a0461a4263b7d256a4f4"


def test_extracted_text_byte_identical(ray_session):
    """input_hint per-row invariant: the engine's extractor reproduces
    the reference extraction (the pages table's `text` column)
    byte-identically per url, at any batch slicing."""
    import numpy as np
    import pyarrow as pa

    from simplefeatures_ray.sources.pages import gen_pages_batch
    from simplefeatures_ray.stages.extract import ExtractGeotags

    batch = gen_pages_batch(pa.table({"id": pa.array(np.arange(4096, dtype=np.int64))}))
    ex = ExtractGeotags(analyze=False)
    out = ex(batch)
    assert out["text"].to_pylist() == batch["text"].to_pylist()
    # same under a different slicing
    half = ex(batch.slice(1000, 500))
    assert half["text"].to_pylist() == batch.slice(1000, 500)["text"].to_pylist()


def test_branch_cache_cluster_safety(ray_session, tmp_path, monkeypatch):
    """Cluster-safety invariant (VERDICT r4 #1): the branch cache never
    spills to a node-local default path. With no shared spill dir
    configured the pipeline must use the distributed object store
    (materialize); an explicit shared path is honored and produces
    identical content."""
    import glob
    import hashlib

    from simplefeatures_ray.pipelines.geotag import geotag_join_tiles
    from simplefeatures_ray.sources.pages import pages_dataset
    from simplefeatures_ray.sources.polygons import make_polygons

    monkeypatch.delenv("SFRAY_SPILL_DIR", raising=False)

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    def digest(df):
        return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()

    before = set(glob.glob("/tmp/sfray-branch-*"))
    d_default = canon(geotag_join_tiles(
        pages_dataset(2000), make_polygons(64)).to_pandas())
    # no node-local tempdir was created by the default path
    assert set(glob.glob("/tmp/sfray-branch-*")) == before

    shared = tmp_path / "shared-spill"  # stands in for an NFS/object-store URI
    d_spill = canon(geotag_join_tiles(
        pages_dataset(2000), make_polygons(64),
        spill_dir=str(shared)).to_pandas())
    assert len(list(shared.glob("*.parquet"))) > 0  # spill actually used
    assert digest(d_default) == digest(d_spill)

    # env-var route works too
    shared2 = tmp_path / "shared-spill-env"
    monkeypatch.setenv("SFRAY_SPILL_DIR", str(shared2))
    d_env = canon(geotag_join_tiles(
        pages_dataset(2000), make_polygons(64)).to_pandas())
    assert len(list(shared2.glob("*.parquet"))) > 0
    assert digest(d_env) == digest(d_default)


def test_flagship_on_intl_corpus(ray_session):
    """VERDICT r4 #2 'done' bar: the flagship runs on a >=50%-non-ASCII
    corpus with bit-identical content at different parallelism, and its
    per-row invariant (engine extraction == reference text) holds."""
    import hashlib

    import pyarrow as pa

    from simplefeatures_ray.pipelines.geotag import geotag_join_tiles
    from simplefeatures_ray.sources.pages import gen_pages_batch, pages_dataset
    from simplefeatures_ray.sources.polygons import make_polygons
    from simplefeatures_ray.stages.extract import ExtractGeotags

    # corpus really is majority non-ASCII
    import numpy as np

    batch = gen_pages_batch(
        pa.table({"id": pa.array(np.arange(4096, dtype=np.int64))}),
        intl=True)
    nonascii = sum(1 for t in batch["text"].to_pylist() if not t.isascii())
    assert nonascii >= 0.5 * len(batch)

    # per-row invariant: engine extraction == stored reference text
    out = ExtractGeotags(analyze=False)(batch)
    assert out["text"].to_pylist() == batch["text"].to_pylist()

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    polys = make_polygons(64)
    a = canon(geotag_join_tiles(
        pages_dataset(3000, intl=True), polys).to_pandas())
    assert len(a) > 0
    b = canon(geotag_join_tiles(
        pages_dataset(3000, override_num_blocks=2, intl=True), polys,
        batch_size=333).to_pandas())
    ha = hashlib.sha256(a.to_csv(index=False).encode()).hexdigest()
    hb = hashlib.sha256(b.to_csv(index=False).encode()).hexdigest()
    assert ha == hb
