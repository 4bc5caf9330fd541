"""PCA projection vs a dense numpy reference; JSON int-field extraction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from splink_ray.functions.text import json_int_field
from splink_ray.stages.ann import pca_project


def test_pca_matches_numpy_reference(ray_session):
    rng = np.random.default_rng(31)
    # anisotropic cloud so the top components are well-separated
    base = rng.normal(0, 1, (600, 8))
    scale = np.array([10, 5, 1, 0.5, 0.3, 0.2, 0.1, 0.05])
    X = base * scale + rng.normal(0, 0.01, (600, 8))
    df = pd.DataFrame({"vec_id": np.arange(600), "embedding": list(X)})
    out = (
        pca_project(rd.from_pandas(df).repartition(5), "embedding", "vec_id", k=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    mu = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    w, v = np.linalg.eigh((cov + cov.T) / 2)
    W = v[:, ::-1][:, :3]
    for j in range(3):
        i = int(np.abs(W[:, j]).argmax())
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    S = (X - mu) @ W
    for j in range(3):
        np.testing.assert_allclose(
            out[f"pc{j + 1}"].to_numpy(), S[:, j], atol=2e-6
        )


def test_pca_partition_invariance(ray_session):
    rng = np.random.default_rng(32)
    X = rng.normal(0, 1, (300, 6))
    df = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(X)})
    a = (
        pca_project(rd.from_pandas(df).repartition(2), "embedding", "vec_id", k=2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        pca_project(rd.from_pandas(df).repartition(9), "embedding", "vec_id", k=2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # moments fold in different orders -> results agree to rounding noise
    np.testing.assert_allclose(a["pc1"], b["pc1"], atol=2e-6)
    np.testing.assert_allclose(a["pc2"], b["pc2"], atol=2e-6)


def test_pca_k_exceeds_dim_raises(ray_session):
    df = pd.DataFrame({"vec_id": [1], "embedding": [[1.0, 2.0]]})
    with pytest.raises(ValueError):
        pca_project(rd.from_pandas(df), "embedding", "vec_id", k=3)


def test_json_int_field():
    a = pa.array(['{"k": 87}', '{"k": -3, "j": 1}', '{"j": 5}', None, '{"k": "x"}'])
    out = json_int_field(a, "k")
    assert out.to_pylist() == [87, -3, None, None, None]
