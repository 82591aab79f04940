"""Optimized Product Quantization: an orthonormal pre-rotation for PQ.

Public sources: Ge, He, Ke, Sun — "Optimized Product Quantization for
Approximate Nearest Neighbor Search", CVPR 2013 (the non-parametric
alternating solver: fix R -> fit per-subspace codebooks, fix codebooks
-> orthogonal Procrustes for R), with the eigenvalue-balanced PCA
allocation of the parametric variant as the initialization — the same
pair of ideas behind the common OPQ pre-transform in public ANN
libraries.

Why it exists: plain PQ slices dimensions [0:sub), [sub:2*sub), ... and
quantizes each slice independently, implicitly assuming the slices carry
comparable, uncorrelated variance.  Real embedding matrices concentrate
variance in a few correlated directions, so some sub-quantizers drown
(all 256 centroids spent on noise) while others saturate.  A rotation R
with R^T R = I redistributes variance across slices BEFORE quantization;
||Rx - Rq|| == ||x - q|| exactly, so nothing downstream changes — exact
rerank, thresholds, and recall oracles all see the same true distances —
only the CODES get tighter.

Scale shape: fitting is driver-side numpy over the SAME bounded
train_size sample ProductQuantizer.fit already collects (the kmeans /
PQ bounded-fit pattern — the corpus is never scanned for training);
applying R adds one (dim x dim) matmul inside the existing Arrow
kernels (encode / LUT build), map-only, no new shuffle, no new scan.

Reference parity: none — the reference's quantizer (vector_ops.rs:
390-578) has no rotation; this is extension-axis quality recovery,
sibling to plans/tuning.tune_pq's knob guidance.
"""

from __future__ import annotations

import numpy as np

from fabstir_vectordb_spark.operators._kmeans import kmeans_fit

__all__ = ["pca_balanced_rotation", "fit_rotation", "train_mse"]


def pca_balanced_rotation(X: np.ndarray, n_subspaces: int) -> np.ndarray:
    """Eigenvalue-balanced PCA rotation (the parametric OPQ allocation):
    rotate onto the principal axes, then deal the axes onto the M
    subspaces so each bucket's log-variance load is as even as greedy
    allows (largest eigenvalue first, always into the lightest
    non-full bucket).  Returns R with columns orthonormal; apply as
    ``X @ R``."""
    dim = X.shape[1]
    if dim % n_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    Xc = X - X.mean(axis=0, keepdims=True)
    cov = (Xc.T @ Xc) / max(len(X) - 1, 1)
    w, V = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    buckets: list[list[int]] = [[] for _ in range(n_subspaces)]
    loads = np.zeros(n_subspaces)
    for i in range(dim):
        open_buckets = [b for b in range(n_subspaces) if len(buckets[b]) < sub]
        b = min(open_buckets, key=lambda j: loads[j])
        buckets[b].append(i)
        loads[b] += np.log(max(float(w[i]), 1e-12))
    perm = [i for bucket in buckets for i in bucket]
    return V[:, perm]


def _quantize(Y: np.ndarray, books: list[np.ndarray], sub: int) -> np.ndarray:
    """Reconstruct Y through the per-subspace codebooks (train-time
    helper; the distributed encode lives in ProductQuantizer)."""
    Yq = np.empty_like(Y)
    for m, C in enumerate(books):
        S = Y[:, m * sub : (m + 1) * sub]
        d = (
            np.einsum("ij,ij->i", S, S)[:, None]
            - 2.0 * S @ C.T
            + np.einsum("ij,ij->i", C, C)[None, :]
        )
        Yq[:, m * sub : (m + 1) * sub] = C[d.argmin(axis=1)]
    return Yq


def train_mse(
    X: np.ndarray,
    books: np.ndarray,
    rotation: np.ndarray | None,
) -> float:
    """Mean squared reconstruction error of a fitted quantizer on a
    sample, measured in the ORIGINAL space (rotation is orthonormal, so
    rotated-space error equals original-space error — stated for
    clarity, computed in rotated space)."""
    Y = X @ rotation if rotation is not None else X
    sub = Y.shape[1] // len(books)
    Yq = _quantize(Y, list(books), sub)
    return float(np.mean(np.sum((Y - Yq) ** 2, axis=1)))


def fit_rotation(
    X: np.ndarray,
    n_subspaces: int,
    n_centroids: int,
    iters: int = 8,
    km_iters: int = 10,
    seed: int = 42,
    tol: float = 1e-3,
) -> np.ndarray:
    """Non-parametric OPQ (Ge et al. Alg. 1): alternate between fitting
    per-subspace codebooks on the rotated sample and solving the
    orthogonal Procrustes problem min_R ||XR - Yq||_F (R = U V^T from
    the SVD of X^T Yq).  Initialized at the eigenvalue-balanced PCA
    rotation.  Deterministic for a fixed seed.

    Stops early when an iteration improves sample MSE by less than
    ``tol`` relative — on saturated geometries (e.g. the 16x128 code
    config, where PCA init is already near-optimal) this cuts the fit
    from ~90 s to a couple of iterations with the same kept/declined
    outcome (the strict-improvement gate in ProductQuantizer.fit is
    judged on the FINAL refit either way)."""
    dim = X.shape[1]
    sub = dim // n_subspaces
    rng = np.random.RandomState(seed)
    R = pca_balanced_rotation(X, n_subspaces)
    prev = None
    for _ in range(iters):
        Y = X @ R
        books = [
            kmeans_fit(Y[:, m * sub : (m + 1) * sub], n_centroids, km_iters, rng)
            for m in range(n_subspaces)
        ]
        Yq = _quantize(Y, books, sub)
        mse = float(np.mean(np.sum((Y - Yq) ** 2, axis=1)))
        U, _, Vt = np.linalg.svd(X.T @ Yq)
        R = U @ Vt
        if prev is not None and prev - mse < tol * prev:
            break
        prev = mse
    return R
