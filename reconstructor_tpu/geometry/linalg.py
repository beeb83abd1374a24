"""Small-matrix linear algebra helpers tuned for batched TPU use.

The RANSAC minimal solvers need one thing from dense linear algebra: the
smallest eigenvector of a tiny PSD normal matrix (9x9 for F/E/H, 12x12
for PnP), across thousands of hypotheses at once. XLA's full ``eigh``
computes every eigenpair with QR/Jacobi iterations — far more work than
required and the dominant cost of hypothesis batches. Inverse iteration
(ridge-regularized LU solves) converges to the smallest eigenvector in a
handful of steps at a fraction of the cost and batches trivially.
"""

from __future__ import annotations

import jax.numpy as jnp


def smallest_eigvec(A: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Smallest-eigenvalue eigenvector of a symmetric PSD matrix.

    A: (..., n, n). Returns (..., n), unit norm. Inverse iteration with a
    spectrum-relative ridge; for minimal-sample normal matrices (exact
    nullspace) this is essentially exact after one step, and for
    least-squares refits it converges geometrically with ratio
    (lambda_min + eps) / (lambda_2 + eps).
    """
    n = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    ridge = 1e-7 * tr + 1e-30
    A_reg = A + ridge * jnp.eye(n, dtype=A.dtype)
    # deterministic start with components in every direction
    x = jnp.ones(A.shape[:-2] + (n,), A.dtype) + \
        0.01 * jnp.arange(n, dtype=A.dtype)
    for _ in range(iters):
        x = jnp.linalg.solve(A_reg, x[..., :, None])[..., 0]
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    return x
