"""Measure candidate optimizations for the SoA BA core (throwaway).

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site python scripts/profile_ba4.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 20


def timeit(fn, *a, repeat=3):
    out = fn(*a)
    float(np.asarray(out))
    best = float("inf")
    for _ in range(repeat):
        t0 = time.time()
        out = fn(*a)
        float(np.asarray(out))
        best = min(best, time.time() - t0)
    return best / K * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("device:", jax.devices()[0], file=sys.stderr)
    rng = np.random.default_rng(0)
    C, L, O, M = 32, 16384, 49152, 32
    n = C * 12

    Jc = jnp.asarray(rng.normal(size=(12, 2, O)).astype(np.float32))
    Jp = jnp.asarray(rng.normal(size=(3, 2, O)).astype(np.float32))
    onehot = jnp.asarray((rng.integers(0, 2, (O, C)) > 0).astype(np.float32))
    src12 = jnp.asarray(rng.normal(size=(12, O + 1)).astype(np.float32))
    src12r = jnp.asarray(np.ascontiguousarray(np.asarray(src12).T))
    p_idxT = jnp.asarray(rng.integers(0, O, (M, L)).astype(np.int32))
    w_idx = jnp.asarray(rng.integers(0, O, (C, L)).astype(np.int32))
    src36 = jnp.asarray(rng.normal(size=(36, O + 1)).astype(np.float32))
    src36r = jnp.asarray(np.ascontiguousarray(np.asarray(src36).T))
    W = jnp.asarray(rng.normal(size=(C, 12, 3, L)).astype(np.float32))
    Hinv = jnp.asarray(rng.normal(size=(3, 3, L)).astype(np.float32))
    Ss = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    S = Ss @ Ss.T + jnp.eye(n) * 10.0
    S4 = jnp.stack([S + i * jnp.eye(n) for i in range(4)])
    rhs = jnp.ones((n,), jnp.float32)

    def loop(fn):
        @jax.jit
        def run(eps):
            def body(i, acc):
                return acc + fn(eps + acc * 1e-30)
            return lax.fori_loop(0, K, body, eps)
        return run

    cases = []

    # H_cc: einsum vs broadcast
    cases.append(("H_cc einsum", loop(lambda e: (
        (jnp.einsum("iro,jro->ijo", Jc + e, Jc).reshape(144, -1)
         @ onehot)[0, 0]))))

    def hcc_bcast(e):
        a0, a1 = (Jc + e)[:, 0], Jc[:, 1]
        h = a0[:, None] * a0[None] + a1[:, None] * a1[None]
        return (h.reshape(144, -1) @ onehot)[0, 0]
    cases.append(("H_cc broadcast", loop(hcc_bcast)))

    # column-gather (k, idx) vs row-gather (idx, k)
    cases.append(("pt gather cols (12,M,L)", loop(
        lambda e: (src12 + e)[:, p_idxT][0, 0, 0])))
    cases.append(("pt gather rows (M,L,12)", loop(
        lambda e: (src12r + e)[p_idxT][0, 0, 0])))
    cases.append(("W gather cols (36,C,L)", loop(
        lambda e: jax.vmap(lambda idx: (src36 + e)[:, idx])(w_idx)[0, 0, 0])))
    cases.append(("W gather rows (C,L,36)", loop(
        lambda e: (src36r + e)[w_idx][0, 0, 0])))

    # B: einsum vs unrolled broadcast
    cases.append(("B einsum", loop(
        lambda e: jnp.einsum("cijl,jkl->cikl", W + e, Hinv)[0, 0, 0, 0])))

    def b_bcast(e):
        Wl = W + e
        acc = Wl[:, :, 0, None, :] * Hinv[0][None, None]
        acc += Wl[:, :, 1, None, :] * Hinv[1][None, None]
        acc += Wl[:, :, 2, None, :] * Hinv[2][None, None]
        return acc[0, 0, 0, 0]
    cases.append(("B broadcast", loop(b_bcast)))

    # cholesky: single vs batched-4
    cases.append(("cho_factor x1", loop(
        lambda e: jax.scipy.linalg.cho_factor(S + e)[0][0, 0])))
    cases.append(("cho_factor x4 batched", loop(
        lambda e: jax.vmap(lambda m: jax.scipy.linalg.cho_factor(m)[0])(
            S4 + e)[0, 0, 0])))
    chol = jax.scipy.linalg.cho_factor(S)
    cases.append(("cho_solve x1", loop(
        lambda e: jax.scipy.linalg.cho_solve(chol, rhs + e)[0])))
    cases.append(("lu solve x1", loop(
        lambda e: jnp.linalg.solve(S, rhs + e)[0])))

    for name, fn in cases:
        print(f"{name:26s}: {timeit(fn, jnp.float32(0.0)):8.2f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
