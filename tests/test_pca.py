"""pca_top_component: exact python-reference pin (numpy running the
IDENTICAL rounded power-iteration recipe must reproduce every score
bit-for-bit after rounding), plus the algebraic invariants the oracle
hash can't see — centered scores, Rayleigh-quotient consistency, and
the sign convention that makes +/-w unique."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

from simplex_mapreduce_spark.operators.similarity import (
    PCA_ITERS,
    PCA_STATE_ROUND,
    _embeddings,
    pca_power_train,
)
from simplex_mapreduce_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _numpy_reference(x: np.ndarray, iters: int = PCA_ITERS):
    """The trainer's contract restated in numpy, including the 9dp
    state rounding both engines apply each step."""
    n, dim = x.shape
    mu = np.array(
        [round(v, PCA_STATE_ROUND) for v in x.mean(axis=0)], dtype=np.float64
    )
    c = x - mu
    w = np.full(dim, round(1.0 / math.sqrt(dim), PCA_STATE_ROUND))
    for _ in range(iters):
        s = c @ w
        u = np.array(
            [round(v, PCA_STATE_ROUND) for v in (c.T @ s) / n],
            dtype=np.float64,
        )
        nrm = math.sqrt(float(np.dot(u, u)))
        w = np.array(
            [round(v / nrm, PCA_STATE_ROUND) for v in u], dtype=np.float64
        )
    j = min(range(dim), key=lambda i: (-abs(w[i]), i))
    if w[j] < 0:
        w = -w
    return mu, w


def _load_numpy() -> tuple[np.ndarray, np.ndarray]:
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    order = np.argsort(tbl["vec_id"])
    return np.array(
        [tbl["embedding"][i] for i in order], dtype=np.float64
    ), np.array(tbl["vec_id"])[order]


def test_trainer_matches_numpy_reference(spark):
    x, _ = _load_numpy()
    mu_np, w_np = _numpy_reference(x)
    mu, w, n = pca_power_train(_embeddings(spark, SF_DIR))
    assert n == x.shape[0]
    # the 9dp state rounding pins both paths to identical decimals;
    # numpy's vectorized sums and Spark's shuffle-order sums differ by
    # ~1e-15 relative, far inside the 0.5e-9 rounding margin
    assert mu == [round(v, PCA_STATE_ROUND) for v in mu_np]
    assert w == [round(v, PCA_STATE_ROUND) for v in w_np]


def test_scores_match_numpy_and_invariants(spark):
    x, vec_ids = _load_numpy()
    mu_np, w_np = _numpy_reference(x)
    rows = QUERIES["pca_top_component"](spark, SF_DIR).collect()
    got = {r["vec_id"]: r["pc1_score"] for r in rows}
    expect = (x - mu_np) @ w_np
    for vid, e in zip(vec_ids, expect):
        assert got[int(vid)] == round(float(e), 6)
    # centered: scores sum to ~0 (exact up to the mu rounding residue)
    assert abs(sum(got.values())) < 1e-3 * len(got)
    # Rayleigh quotient: the published eigenvalue is avg(score^2)
    lam = rows[0]["pc1_eigenvalue"]
    assert lam == round(float(np.mean(expect**2)), 4)
    assert lam > 0
    # sign convention: the largest-|component| loading is positive
    j = min(range(len(w_np)), key=lambda i: (-abs(w_np[i]), i))
    assert w_np[j] > 0


def test_iterate_improves_rayleigh_quotient(spark):
    """Power iteration is monotone in the Rayleigh quotient: the
    trained direction must explain at least as much variance as the
    uniform start it began from (strictly more on non-degenerate
    data)."""
    x, _ = _load_numpy()
    mu_np, w_np = _numpy_reference(x)
    c = x - mu_np
    dim = x.shape[1]
    w0 = np.full(dim, 1.0 / math.sqrt(dim))
    r_trained = float(np.mean((c @ w_np) ** 2))
    r_start = float(np.mean((c @ w0) ** 2))
    assert r_trained > r_start


def test_top2_components_match_numpy_and_deflation_invariants(spark):
    """PC2 must equal the same rounded recipe run in numpy after exact
    Hotelling deflation of PC1; the two loadings are near-orthogonal
    and eigenvalues non-increasing."""
    x, vec_ids = _load_numpy()
    mu1, w1 = _numpy_reference(x)
    c = x - mu1
    x2 = c - np.outer(c @ w1, w1)  # deflated (still uncentered for pass 2)
    mu2, w2 = _numpy_reference(x2)

    rows = QUERIES["pca_top2_components"](spark, SF_DIR).collect()
    got = {(r["vec_id"], r["component"]): r["score"] for r in rows}
    lam = {r["component"]: r["eigenvalue"] for r in rows}

    s1 = c @ w1
    s2 = (x2 - mu2) @ w2
    for vid, a, b in zip(vec_ids, s1, s2):
        assert got[(int(vid), 1)] == round(float(a), 6)
        assert got[(int(vid), 2)] == round(float(b), 6)
    assert lam[1] >= lam[2] > 0
    assert lam[1] == round(float(np.mean(s1**2)), 4)
    # near-orthogonal: deflation removes the PC1 direction up to the
    # 9dp state rounding residue
    assert abs(float(np.dot(w1, w2))) < 1e-6
