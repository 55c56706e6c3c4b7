"""Lie-group ops vs closed forms and matrix exponentials (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.linalg import expm

from ldso_tpu.math import lie

RNG = np.random.default_rng(0)


def rand_vec(n, scale=1.0, batch=(16,)):
    v = RNG.normal(size=batch + (n,)) * scale
    if n in (3, 6, 7):
        # keep rotation angles below pi so log∘exp is the identity
        phi = v[..., 3:6] if n > 3 else v
        norm = np.linalg.norm(phi, axis=-1, keepdims=True)
        phi *= np.where(norm > 3.0, 3.0 / norm, 1.0)
    return jnp.asarray(v)


def se3_generator(xi):
    """4x4 Lie-algebra matrix for tangent [rho, phi]."""
    G = np.zeros(xi.shape[:-1] + (4, 4))
    G[..., :3, :3] = np.asarray(lie.hat(xi[..., 3:6]))
    G[..., :3, 3] = xi[..., :3]
    return jnp.asarray(G)


def sim3_generator(tau):
    G = np.zeros(tau.shape[:-1] + (4, 4))
    G[..., :3, :3] = np.asarray(lie.hat(tau[..., 3:6]))
    G[..., :3, :3] += tau[..., 6, None, None] * np.eye(3)
    G[..., :3, 3] = tau[..., :3]
    return jnp.asarray(G)


class TestSO3:
    def test_exp_vs_expm(self):
        phi = rand_vec(3)
        R = lie.so3_exp(phi)
        R_ref = jax.vmap(expm)(lie.hat(phi))
        np.testing.assert_allclose(R, R_ref, atol=1e-9)

    def test_exp_small_angle(self):
        phi = rand_vec(3, scale=1e-10)
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-9)

    def test_log_roundtrip(self):
        phi = rand_vec(3, scale=1.2)
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(phi)), phi, atol=1e-8)

    def test_log_near_pi(self):
        axis = np.asarray([[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [0.6, 0.8, 0]])
        for theta in [np.pi - 1e-4, np.pi - 1e-7]:
            phi = jnp.asarray(axis * theta)
            R = lie.so3_exp(phi)
            phi_back = lie.so3_log(R)
            R_back = lie.so3_exp(phi_back)
            np.testing.assert_allclose(R_back, R, atol=1e-6)

    def test_orthonormal(self):
        R = lie.so3_exp(rand_vec(3, 2.0))
        eye = np.broadcast_to(np.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-9)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-9)


class TestSE3:
    def test_exp_vs_expm(self):
        xi = rand_vec(6)
        T = lie.se3_exp(xi)
        T_ref = jax.vmap(expm)(se3_generator(xi))
        np.testing.assert_allclose(T, T_ref, atol=1e-9)

    def test_log_roundtrip(self):
        xi = rand_vec(6, 1.0)
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-8)

    def test_inverse(self):
        T = lie.se3_exp(rand_vec(6))
        eye = np.broadcast_to(np.eye(4), T.shape)
        np.testing.assert_allclose(T @ lie.se3_inverse(T), eye, atol=1e-9)

    def test_adjoint_identity(self):
        """Adj(T)·xi == log(T · exp(xi) · T⁻¹)."""
        T = lie.se3_exp(rand_vec(6, batch=(8,)))
        xi = rand_vec(6, 0.1, batch=(8,))
        lhs = jnp.einsum("...ij,...j->...i", lie.se3_adjoint(T), xi)
        rhs = lie.se3_log(T @ lie.se3_exp(xi) @ lie.se3_inverse(T))
        np.testing.assert_allclose(lhs, rhs, atol=1e-7)

    def test_grad_finite(self):
        f = lambda xi: jnp.sum(lie.se3_exp(xi))
        g = jax.grad(f)(jnp.zeros(6))
        assert np.all(np.isfinite(g))
        g2 = jax.grad(lambda T: jnp.sum(lie.se3_log(T) ** 2))(lie.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.05, 0.0, 0.3])))
        assert np.all(np.isfinite(g2))


class TestSim3:
    def test_exp_vs_expm(self):
        tau = rand_vec(7, 0.8)
        T = lie.sim3_exp(tau)
        T_ref = jax.vmap(expm)(sim3_generator(tau))
        np.testing.assert_allclose(T, T_ref, atol=1e-8)

    def test_exp_vs_expm_small_branches(self):
        # exercise all 4 (theta, sigma) small/large branches
        for th_scale, sig_scale in [(1e-9, 1e-9), (1e-9, 0.5), (0.8, 1e-9), (0.8, 0.5)]:
            tau = np.asarray(RNG.normal(size=(8, 7)))
            tau[:, 3:6] *= th_scale
            tau[:, 6] *= sig_scale
            tau = jnp.asarray(tau)
            T = lie.sim3_exp(tau)
            T_ref = jax.vmap(expm)(sim3_generator(tau))
            np.testing.assert_allclose(T, T_ref, atol=1e-8, err_msg=f"{th_scale=} {sig_scale=}")

    def test_log_roundtrip(self):
        tau = rand_vec(7, 0.7)
        np.testing.assert_allclose(lie.sim3_log(lie.sim3_exp(tau)), tau, atol=1e-7)

    def test_scale_recovery(self):
        tau = rand_vec(7, 0.5)
        np.testing.assert_allclose(lie.sim3_scale(lie.sim3_exp(tau)), jnp.exp(tau[..., 6]), atol=1e-9)

    def test_inverse(self):
        T = lie.sim3_exp(rand_vec(7, 0.5))
        eye = np.broadcast_to(np.eye(4), T.shape)
        np.testing.assert_allclose(T @ lie.sim3_inverse(T), eye, atol=1e-8)

    def test_adjoint_identity(self):
        T = lie.sim3_exp(rand_vec(7, 0.5, batch=(8,)))
        tau = rand_vec(7, 0.05, batch=(8,))
        lhs = jnp.einsum("...ij,...j->...i", lie.sim3_adjoint(T), tau)
        rhs = lie.sim3_log(T @ lie.sim3_exp(tau) @ lie.sim3_inverse(T))
        np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_se3_embedding(self):
        T = lie.se3_exp(rand_vec(6))
        np.testing.assert_allclose(lie.sim3_scale(T), 1.0, atol=1e-9)
        np.testing.assert_allclose(lie.sim3_to_se3(T), T, atol=1e-9)


class TestQuat:
    def test_roundtrip(self):
        R = lie.so3_exp(rand_vec(3, 2.0, batch=(64,)))
        q = lie.matrix_to_quat(R)
        R_back = lie.quat_to_matrix(q)
        np.testing.assert_allclose(R_back, R, atol=1e-8)

    def test_near_pi(self):
        R = lie.so3_exp(jnp.asarray([[np.pi - 1e-6, 0, 0], [0, np.pi - 1e-6, 0]]))
        q = lie.matrix_to_quat(R)
        np.testing.assert_allclose(lie.quat_to_matrix(q), R, atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
