"""pca_project is pinned bit-exact against a sequential numpy
reference that follows the documented recipe (e6 fixed-point moments →
exact-int covariance numerators → eigh → sign-fixed top-k projection).
embedding_covariance itself is SQL-oracled in test_oracle_parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _sequential_pca(sf_dir: str, k: int = 2) -> pd.DataFrame:
    from chug_ray.ops.knn import _emb_e6

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    x = _emb_e6(np.stack(t["embedding"].to_numpy()))
    n, d = x.shape
    s = x.sum(axis=0)
    g = x.T @ x
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            c = float(int(n) * int(g[i, j]) - int(s[i]) * int(s[j])) / (
                float(n) * float(n)
            )
            cov[i, j] = cov[j, i] = c
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, np.argsort(vals)[::-1][:k]]
    for c in range(k):
        p = np.argmax(np.abs(comps[:, c]))
        if comps[p, c] < 0:
            comps[:, c] = -comps[:, c]
    proj = (x / 1e6 - (s / n) / 1e6) @ comps
    return pd.DataFrame(
        {
            "vec_id": t["vec_id"].astype(np.int64),
            **{f"pc{c + 1}": proj[:, c] for c in range(k)},
        }
    ).sort_values("vec_id", ignore_index=True)


def test_pca_project_matches_sequential_bit_exact(ray_session):
    from chug_ray.ops.knn import pca_project

    out = (
        pca_project(SF_DIR)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(out, _sequential_pca(SF_DIR), check_exact=True)


def test_pca_components_capture_variance_order(ray_session):
    """pc1 sample variance ≥ pc2 sample variance (top-eigenvalue
    ordering survived the distributed path)."""
    from chug_ray.ops.knn import pca_project

    out = pca_project(SF_DIR).to_pandas()
    assert out["pc1"].var() >= out["pc2"].var()


def test_mahalanobis_matches_sequential_and_trace_identity(ray_session):
    """Distributed scores equal the sequential recipe bit-exactly, and
    the sample mean of m² equals d (trace(S⁻¹S) identity, up to the
    tiny ridge)."""
    from chug_ray.ops.knn import _emb_e6, mahalanobis_outliers

    out = (
        mahalanobis_outliers(SF_DIR)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    x = _emb_e6(np.stack(t["embedding"].to_numpy()))
    n, d = x.shape
    s = x.sum(axis=0)
    g = x.T @ x
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            c = float(int(n) * int(g[i, j]) - int(s[i]) * int(s[j])) / (
                float(n) * float(n)
            )
            cov[i, j] = cov[j, i] = c
    sinv = np.linalg.inv(cov / 1e12 + 1e-6 * np.eye(d))
    xc = x / 1e6 - (s / n) / 1e6
    m2 = np.einsum("ij,jk,ik->i", xc, sinv, xc)
    ref = pd.DataFrame(
        {"vec_id": t["vec_id"].astype(np.int64), "m2": m2}
    ).sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
    assert abs(out["m2"].mean() - d) < 0.1
