"""Model scoring as a streaming batch transform.

The lightest rung of the model-inference ladder in a training-data
pipeline: a fixed-weight linear / logistic scorer over numeric feature
columns (fastText-style quality classifiers, importance-resampling
weights, contamination priors all take this shape once featurized).
Pure map_batches — no state, no shuffle; heavier models follow the same
contract but live in an actor pool (see stages/multimodal.py for the
actor-pool pattern with per-actor setup in __init__).

Determinism contract: z is accumulated in float64 in a fixed column
order, probabilities use 1/(1+exp(-z)), and the driver oracle recomputes
the identical expression in SQL — so scores match the DuckDB twin
bit-for-bit (modulo the shared ROUND at the gate boundary).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def logistic_score(ds, weights: dict[str, float], bias: float = 0.0,
                   out_col: str = "score", keep_col: str | None = "keep",
                   threshold: float = 0.5, log1p_cols: tuple[str, ...] = ()):
    """Add sigmoid(bias + sum_i w_i * x_i) per row.

    weights: feature column -> coefficient, applied in dict order.
    log1p_cols: columns fed as log(1 + x) (long-tailed counts). Uses
    np.log(x + 1.0) — NOT log1p — so SQL ln(1 + x) reproduces the same
    double rounding.
    keep_col: optional boolean column `score >= threshold`.
    """

    def kernel(t: pa.Table) -> pa.Table:
        z = np.full(len(t), float(bias), dtype=np.float64)
        for col, w in weights.items():
            x = np.asarray(t[col], dtype=np.float64)
            if col in log1p_cols:
                x = np.log(x + 1.0)
            z += float(w) * x
        p = 1.0 / (1.0 + np.exp(-z))
        t = t.append_column(out_col, pa.array(p, pa.float64()))
        if keep_col:
            t = t.append_column(keep_col, pa.array(p >= threshold, pa.bool_()))
        return t

    return ds.map_batches(kernel, batch_format="pyarrow")


# Fixed demo weights for the gated docs classifier: reward stopword
# density and length, punish punctuation soup (Gopher/C4-style signals).
QUALITY_WEIGHTS = {
    "n_chars": 0.55,       # via log(1+x)
    "punct_ratio": -40.0,
    "stop_ratio": 18.0,
}
QUALITY_BIAS = -3.2
