"""Fused log-space Sinkhorn iteration as a Pallas TPU kernel.

SuperGlue's optimal-transport head runs ~100 alternating row/column
logsumexp normalizations over the (M+1, N+1) score matrix
(matching/superglue.py:log_sinkhorn). In pure XLA each half-iteration is a
separate reduction kernel that re-reads the coupling matrix from HBM —
2 x iters x M x N x 4 bytes of traffic for a few FLOPs per element: a
textbook HBM-bandwidth-bound loop.

The Pallas kernel keeps the entire coupling matrix (2048^2 f32 = 16 MB at
SuperGlue's keypoint scale — checked against the VMEM budget by the
caller; typical K=1024 needs 4 MB) resident in VMEM and runs the whole
iteration loop on-chip: one HBM read of the scores, one write of the
result, everything in between at VMEM bandwidth. The u/v potentials live
in VMEM scratch.

Max-stabilized logsumexp is used on both axes (exact, not approximate).
Masked (padded) rows/columns carry -1e9 scores; their potentials stay
finite, and the caller's mask handling is unchanged vs the XLA version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sinkhorn_kernel(couplings_ref, log_mu_ref, log_nu_ref, out_ref,
                     u_ref, v_ref, *, num_iters: int):
    """One-block kernel: (M1, N1) couplings + (M1,1)/(N1,1) marginals.

    u_ref: (M1, 1) scratch; v_ref: (N1, 1) scratch (column layout keeps
    reductions on the lane axis).
    """
    C = couplings_ref[:]                      # (M1, N1)
    log_mu = log_mu_ref[:]                    # (M1, 1)
    log_nu = log_nu_ref[:]                    # (N1, 1)

    u_ref[:] = jnp.zeros_like(u_ref)
    v_ref[:] = jnp.zeros_like(v_ref)

    def lse_rows(x):
        # logsumexp over axis 1 -> (M1, 1)
        m = jnp.max(x, axis=1, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=1, keepdims=True))

    def body(_, carry):
        u, v = carry
        # u update: row-wise logsumexp of C + v^T
        u = log_mu - lse_rows(C + v.T)
        # v update: column-wise logsumexp of C + u — reduce along axis 0
        x = C + u
        m = jnp.max(x, axis=0, keepdims=True)
        v = (log_nu - (m + jnp.log(jnp.sum(jnp.exp(x - m), axis=0,
                                           keepdims=True))).T)
        return u, v

    u, v = jax.lax.fori_loop(0, num_iters, body, (u_ref[:], v_ref[:]))
    out_ref[:] = C + u + v.T


@functools.partial(jax.jit, static_argnames=("num_iters", "interpret"))
def sinkhorn_pallas(couplings: jnp.ndarray, log_mu: jnp.ndarray,
                    log_nu: jnp.ndarray, num_iters: int = 100,
                    interpret: bool = False) -> jnp.ndarray:
    """Run the fused Sinkhorn loop.

    couplings: (M1, N1) augmented score matrix (with dust bins already
    appended); log_mu: (M1,); log_nu: (N1,). Returns couplings + u + v^T
    (the caller subtracts its norm constant).
    """
    M1, N1 = couplings.shape
    out = pl.pallas_call(
        functools.partial(_sinkhorn_kernel, num_iters=num_iters),
        out_shape=jax.ShapeDtypeStruct((M1, N1), couplings.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M1, 1), couplings.dtype),
                        pltpu.VMEM((N1, 1), couplings.dtype)],
        interpret=interpret,
    )(couplings, log_mu[:, None], log_nu[:, None])
    return out


def supported(K0: int, K1: int, dtype_bytes: int = 4,
              vmem_budget: int = 12 * 1024 * 1024) -> bool:
    """Whether the fused kernel's VMEM-resident (K0+1, K1+1) coupling
    fits Mosaic's scoped-vmem stack (16 MiB default on v5e; measured:
    K=2048 -> 16.8 MB coupling OOMs the 16 MiB limit, K=4096 -> 132 MB
    fails outright). Callers fall back to the XLA sinkhorn beyond this;
    the learned pipeline caps its keypoint budget at 1024 so the fused
    kernel stays on the fast path."""
    return (K0 + 1) * (K1 + 1) * dtype_bytes <= vmem_budget


def log_sinkhorn_fused(scores: jnp.ndarray, alpha: jnp.ndarray,
                       mask0: jnp.ndarray, mask1: jnp.ndarray,
                       num_iters: int, interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for matching.superglue.log_sinkhorn backed by
    the fused kernel. Same contract: returns the (M+1, N+1) log-coupling
    shifted by -norm."""
    M, N = scores.shape
    big_neg = -1e9
    scores = jnp.where(mask0[:, None] & mask1[None, :], scores, big_neg)
    couplings = jnp.concatenate([
        jnp.concatenate([scores, jnp.full((M, 1), alpha, scores.dtype)], axis=1),
        jnp.concatenate([jnp.full((1, N), alpha, scores.dtype),
                         alpha[None, None].astype(scores.dtype)], axis=1),
    ], axis=0)
    m_eff = jnp.sum(mask0).astype(scores.dtype)
    n_eff = jnp.sum(mask1).astype(scores.dtype)
    norm = -jnp.log(m_eff + n_eff + 1e-9)
    log_mu = jnp.concatenate([jnp.where(mask0, norm, big_neg),
                              (jnp.log(n_eff + 1e-9) + norm)[None]])
    log_nu = jnp.concatenate([jnp.where(mask1, norm, big_neg),
                              (jnp.log(m_eff + 1e-9) + norm)[None]])
    Z = sinkhorn_pallas(couplings, log_mu, log_nu, num_iters,
                        interpret=interpret)
    return Z - norm
