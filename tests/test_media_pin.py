"""Value pin for the rows-only media_features query: the oracle set
cannot express image/audio/video decode, so the full result table is
content-pinned here instead (memory rule: rows-only gates hide value
regressions)."""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_media_features_value_pin(ray_session):
    import __ray_entry__ as em

    df = em.media_features("/root/testdata/sf0.001").to_pandas()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values("media_id").reset_index(drop=True)
    digest = hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()
    assert len(df) == 256
    # pin (update deliberately with a reason in the same commit)
    assert digest == PINNED_MEDIA_FEATURES, digest


PINNED_MEDIA_FEATURES = "29bc8f95d64204bdf262d8febd8ed27ca3c61b2e67171d18534ec9fb2d6d1f2a"


def test_minhash_candidates_value_pin(ray_session):
    """docs_minhash_pairs is rows-only by design (banding admits
    just-under-threshold collisions); pin the exact candidate set."""
    import __ray_entry__ as em

    df = em.docs_minhash_pairs("/root/testdata/sf0.001").to_pandas()
    pairs = sorted(zip(df["id_a"].astype(int), df["id_b"].astype(int)))
    digest = hashlib.sha256(repr(pairs).encode()).hexdigest()
    assert digest == PINNED_MINHASH_CANDS, (len(pairs), digest)


PINNED_MINHASH_CANDS = "ca46f62876020ffbff5a041b447c3205a31f155e2d6b6ebf30408fc54e42f066"


def test_media_image_dc_matches_sql_oracle(ray_session):
    """The DC-exact query must match its pure-SQL oracle bit-for-bit:
    constant 8x8 blocks make the lossy JPEG round trip closed-form."""
    import duckdb

    import __ray_entry__ as em

    eng = em.media_image_dc("/root/testdata/sf0.001").to_pandas()
    ora = duckdb.sql(em._media_image_dc_oracle_sql()).fetchdf()
    for df in (eng, ora):
        df.sort_values(["media_id"], inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert len(eng) == 192
    assert list(eng.sort_index(axis=1).columns) == list(ora.sort_index(axis=1).columns)
    assert (eng["sum_r"].astype("int64").values
            == ora["sum_r"].astype("int64").values).all()
    assert (eng["codec"].values == ora["codec"].values).all()
