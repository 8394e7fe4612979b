"""nb_train_score: one-pass Naive Bayes trainer + integer-exact scorer."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from simplefeatures_ray.functions.scoring import nb_train_score


def corpus(n=300, seed=3):
    rng = np.random.default_rng(seed)
    pos_vocab = ["quality", "research", "thorough", "evidence", "careful"]
    neg_vocab = ["spam", "click", "buy", "cheap", "winner"]
    common = ["the", "a", "of", "and", "page"]
    rows = []
    for i in range(n):
        y = bool(i % 2)
        vocab = (pos_vocab if y else neg_vocab) + common
        rows.append((i, " ".join(rng.choice(vocab, 12)), y))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "y": pa.array([r[2] for r in rows]),
    })


def test_learns_separation(ray_session):
    tbl = corpus()
    out = nb_train_score(rd.from_arrow(tbl).repartition(4), label_col="y") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    y = tbl["y"].to_pylist()
    acc = float(np.mean(out["predicted"].to_numpy() == np.array(y)))
    assert acc > 0.95  # disjoint class vocabularies -> near-perfect
    assert (out["predicted"] == (out["nb_score"] > 0)).all()


def test_parallelism_invariant_scores(ray_session):
    tbl = corpus()
    outs = [nb_train_score(rd.from_arrow(tbl).repartition(p), label_col="y")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
            for p in (1, 7)]
    assert outs[0].equals(outs[1])


def test_score_other_dataset(ray_session):
    train = corpus(200, seed=1)
    unseen = pa.table({
        "doc_id": pa.array([900, 901], pa.int64()),
        "text": pa.array(["quality research evidence", "buy cheap spam now"]),
    })
    out = nb_train_score(rd.from_arrow(train), label_col="y",
                         score_ds=rd.from_arrow(unseen)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["predicted"].tolist() == [True, False]


def test_single_class_raises(ray_session):
    tbl = corpus(50)
    one = tbl.set_column(tbl.schema.get_field_index("y"), "y",
                         pa.array([True] * 50))
    with pytest.raises(ValueError, match="both classes"):
        nb_train_score(rd.from_arrow(one), label_col="y")
