"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from reconstructor_tpu.matching import superglue as sg
from reconstructor_tpu.matching import pallas_sinkhorn as ps


class TestFusedSinkhorn:
    def test_matches_xla_reference(self):
        rng = np.random.default_rng(0)
        M, N = 48, 40
        scores = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))
        alpha = jnp.asarray(0.7, jnp.float32)
        mask0 = jnp.asarray(np.arange(M) < 44)
        mask1 = jnp.asarray(np.arange(N) < 36)
        Z_ref = sg.log_sinkhorn(scores, alpha, mask0, mask1, 60)
        Z_pal = ps.log_sinkhorn_fused(scores, alpha, mask0, mask1, 60,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(Z_pal), np.asarray(Z_ref),
                                   atol=1e-4)

    def test_marginals(self):
        rng = np.random.default_rng(1)
        M, N = 32, 32
        scores = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))
        Z = ps.log_sinkhorn_fused(scores, jnp.asarray(0.5), jnp.ones(M, bool),
                                  jnp.ones(N, bool), 100, interpret=True)
        P = np.exp(np.asarray(Z))
        np.testing.assert_allclose(P[:-1].sum(axis=1), 1.0, rtol=1e-3)
        np.testing.assert_allclose(P[:, :-1].sum(axis=0), 1.0, rtol=1e-3)
