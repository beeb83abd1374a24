"""Small-matrix linear algebra helpers tuned for batched TPU use.

The RANSAC minimal solvers need one thing from dense linear algebra: the
smallest eigenvector of a tiny PSD normal matrix (9x9 for F/E/H, 12x12
for PnP), across thousands of hypotheses at once. XLA's full ``eigh``
computes every eigenpair with QR/Jacobi iterations — far more work than
required and the dominant cost of hypothesis batches. Inverse iteration
converges to the smallest eigenvector in a handful of steps and batches
trivially — but its inner solve must NOT be ``jnp.linalg.solve``: XLA
lowers batched tiny LU to sequential pivoted loops that leave the VPU
idle. Instead the PSD structure lets us Cholesky-factor ONCE with a
fully unrolled right-looking update (n steps of rank-1 outer products,
each a batch-wide vector op) and back/forward-substitute with unrolled
triangular solves. Everything is elementwise/outer-product arithmetic
over the hypothesis batch: exactly what the VPU wants.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(A: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky of a small SPD matrix via an unrolled
    right-looking (outer-product) elimination.

    A: (..., n, n) SPD. Returns lower-triangular L with A = L L^T.
    n is static and small (<= ~16); the loop unrolls into n rank-1
    updates, each an (..., n, n) elementwise op — no per-element control
    flow, no pivoting (SPD input is assumed ridge-regularized).
    """
    n = A.shape[-1]
    rows = jnp.arange(n)
    S = A
    cols = []
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(S[..., j, j], 1e-30))
        col = S[..., :, j] / d[..., None]
        col = jnp.where(rows >= j, col, 0.0)
        S = S - col[..., :, None] * col[..., None, :]
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def cho_solve_unrolled(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = b with unrolled forward/backward substitution.

    L: (..., n, n) lower-triangular; b: (..., n).
    """
    n = L.shape[-1]
    # forward: L y = b
    r = b
    y = []
    for i in range(n):
        yi = r[..., i] / L[..., i, i]
        r = r - yi[..., None] * L[..., :, i]
        y.append(yi)
    y = jnp.stack(y, axis=-1)
    # backward: L^T x = y
    r = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        xi = r[..., i] / L[..., i, i]
        r = r - xi[..., None] * L[..., i, :]
        x[i] = xi
    return jnp.stack(x, axis=-1)


def smallest_eigvec(A: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Smallest-eigenvalue eigenvector of a symmetric PSD matrix.

    A: (..., n, n). Returns (..., n), unit norm. Inverse iteration with a
    spectrum-relative ridge; for minimal-sample normal matrices (exact
    nullspace) this is essentially exact after one step, and for
    least-squares refits it converges geometrically with ratio
    (lambda_min + eps) / (lambda_2 + eps). The factorization is computed
    once and reused across iterations (see module docstring).
    """
    n = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    ridge = 1e-7 * tr + 1e-30
    A_reg = A + ridge * jnp.eye(n, dtype=A.dtype)
    L = cholesky_unrolled(A_reg)
    # deterministic start with components in every direction
    x = jnp.ones(A.shape[:-2] + (n,), A.dtype) + \
        0.01 * jnp.arange(n, dtype=A.dtype)
    for _ in range(iters):
        x = cho_solve_unrolled(L, x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    return x


def smallest_eigvec_3x3_sym(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form smallest eigenvector of a symmetric 3x3 matrix.

    Eigenvalue by the trigonometric (Kahan-stable) characteristic-
    polynomial formula; eigenvector as the largest cross product of rows
    of A - lambda_min I (rows of a rank-<=2 matrix span the orthogonal
    complement of the eigenvector). Entirely closed-form arithmetic — no
    iteration, batches to pure vector ops. Degenerate (repeated
    eigenvalue) inputs fall back through extra cross-product candidates;
    any vector of the eigenspace is a correct answer there.

    A: (3, 3) symmetric. Returns (3,), unit norm.
    """
    q = jnp.trace(A) / 3.0
    off = A[0, 1] ** 2 + A[0, 2] ** 2 + A[1, 2] ** 2
    p2 = ((A[0, 0] - q) ** 2 + (A[1, 1] - q) ** 2 + (A[2, 2] - q) ** 2
          + 2.0 * off)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    B = (A - q * jnp.eye(3, dtype=A.dtype)) / p
    r = jnp.clip(jnp.linalg.det(B) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    M = A - lam_min * jnp.eye(3, dtype=A.dtype)
    scale2 = jnp.sum(M * M) + 1e-30

    # generic case: rows of the rank-2 M span the eigenvector's orthogonal
    # complement -> the largest pairwise row cross product IS the vector
    crosses = jnp.stack([jnp.cross(M[0], M[1]),
                         jnp.cross(M[0], M[2]),
                         jnp.cross(M[1], M[2])])
    cn = jnp.linalg.norm(crosses, axis=-1)
    v_cross = crosses[jnp.argmax(cn)]

    # repeated eigenvalue (rank-1 M): rows are parallel; anything
    # orthogonal to the shared row direction is an eigenvector. These
    # candidates are only meaningful in that regime, so they must not
    # compete with the generic path by raw norm — tiered selection.
    rs = M[0] + M[1] + M[2]
    f1 = jnp.cross(rs, jnp.array([1.0, 0.0, 0.0], A.dtype))
    f2 = jnp.cross(rs, jnp.array([0.0, 1.0, 0.0], A.dtype))
    v_rank1 = jnp.where(jnp.linalg.norm(f1) > jnp.linalg.norm(f2), f1, f2)
    # triple eigenvalue (M ~ 0): every direction works
    v_rank1 = jnp.where(jnp.linalg.norm(v_rank1) ** 2 > 1e-12 * scale2,
                        v_rank1, jnp.array([1.0, 0.0, 0.0], A.dtype))

    v = jnp.where(jnp.max(cn) ** 2 > 1e-12 * scale2 ** 2, v_cross, v_rank1)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)


def project_rank2(M: jnp.ndarray) -> jnp.ndarray:
    """Closest rank-2 matrix to a 3x3 M (Frobenius), without an SVD.

    With v3 the right-singular vector of the smallest singular value,
    the SVD truncation equals M (I - v3 v3^T): subtracting the
    sigma3 u3 v3^T term directly. v3 comes from the closed-form
    symmetric-3x3 eigensolver on M^T M (vs jnp.linalg.svd's loop-heavy
    batched QR iterations).
    """
    v3 = smallest_eigvec_3x3_sym(M.T @ M)
    return M - jnp.outer(M @ v3, v3)
