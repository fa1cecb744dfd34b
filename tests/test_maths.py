"""L1 math unit tests.

Includes the reference's own test vectors (maths.rs:229-287 — note its
test_cross as committed doesn't compile; the intent is covered here) and the
mat3 hand-computed cases (mat3.rs:145-244).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu import maths, mat3


def vec(x, y, z):
    return jnp.asarray([x, y, z], jnp.float32)


def assert_near(a, b, tol=1e-6):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol)


class TestVec:
    def test_negate(self):
        # maths.rs:243-249
        assert_near(-vec(1.0, 2.0, 3.0), vec(-1.0, -2.0, -3.0))

    def test_reflect(self):
        # maths.rs:251-257
        assert_near(maths.reflect(vec(1, 0, -1), vec(0, 0, 1)), vec(1, 0, 1))

    def test_project(self):
        # maths.rs:259-269
        assert_near(maths.project(vec(1, 1, 0), vec(1, 0, 0)), vec(1, 0, 0))
        assert_near(maths.project(vec(2, 3, 0), vec(2, 1, 0)), vec(2.8, 1.4, 0))

    def test_cross(self):
        # maths.rs:271-277 (intent — the committed Rust test doesn't compile)
        assert_near(maths.cross(vec(1, 0, 0), vec(0, 1, 0)), vec(0, 0, 1))
        # anti-commutativity + orthogonality
        a, b = vec(1.0, 2.0, 3.0), vec(-2.0, 0.5, 4.0)
        assert_near(maths.cross(a, b), -maths.cross(b, a))
        assert abs(float(maths.dot(maths.cross(a, b), a))) < 1e-5

    def test_refract_identity(self):
        # maths.rs:279-286: eta=1 through-refraction returns the direction
        a = maths.normalize(vec(1, 0, -1))
        assert_near(maths.refract(a, vec(0, 0, 1), 1.0), a, tol=1e-6)

    def test_refract_snell(self):
        # 45deg into ir=1.5 medium: sin(theta_t) = sin(45)/1.5
        uv = maths.normalize(vec(1, -1, 0))
        n = vec(0, 1, 0)
        out = maths.refract(uv, n, 1.0 / 1.5)
        out = maths.normalize(out)
        sin_t = float(out[0])
        assert abs(sin_t - np.sin(np.radians(45)) / 1.5) < 1e-6

    def test_normalize_unit_length(self):
        v = vec(3.0, -4.0, 12.0)
        assert abs(float(maths.length(maths.normalize(v))) - 1.0) < 1e-6

    def test_near_zero(self):
        assert bool(maths.near_zero(vec(1e-9, -1e-9, 0)))
        assert not bool(maths.near_zero(vec(1e-9, 1e-7, 0)))

    def test_batched(self):
        a = jnp.ones((5, 3))
        b = jnp.broadcast_to(vec(0, 0, 1), (5, 3))
        assert maths.dot(a, b).shape == (5,)
        assert maths.cross(a, b).shape == (5, 3)
        assert_near(maths.dot(a, b), jnp.ones(5))


class TestMat3:
    def m(self, rows):
        return jnp.asarray(rows, jnp.float32)

    def test_identity_mul(self):
        # mat3.rs:153-164
        a = self.m([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
        assert_near(mat3.mul(a, mat3.identity()), a)
        assert_near(mat3.mul(mat3.identity(), a), a)

    def test_general_mul(self):
        # mat3.rs:166-180 style: hand-checked product
        a = self.m([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
        b = self.m([[9, 8, 7], [6, 5, 4], [3, 2, 1]])
        expected = self.m([[30, 24, 18], [84, 69, 54], [138, 114, 90]])
        assert_near(mat3.mul(a, b), expected)

    def test_transpose(self):
        a = self.m([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
        assert_near(mat3.transpose(a), a.T)
        assert_near(mat3.transpose(mat3.transpose(a)), a)

    def test_det(self):
        assert abs(float(mat3.det(mat3.identity())) - 1.0) < 1e-6
        a = self.m([[2, 0, 0], [0, 3, 0], [0, 0, 4]])
        assert abs(float(mat3.det(a)) - 24.0) < 1e-5
        singular = self.m([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
        assert abs(float(mat3.det(singular))) < 1e-4

    def test_cofactor_adjugate(self):
        a = self.m([[1, 2, 0], [0, 1, 3], [4, 0, 1]])
        adj = mat3.adjugate(a)
        # A * adj(A) == det(A) * I
        assert_near(mat3.mul(a, adj), float(mat3.det(a)) * np.eye(3), tol=1e-4)

    def test_inverse(self):
        a = self.m([[2, 1, 0], [1, 3, 1], [0, 1, 2]])
        inv, valid = mat3.inverse(a)
        assert bool(valid)
        assert_near(mat3.mul(a, inv), np.eye(3), tol=1e-5)

    def test_inverse_singular(self):
        singular = self.m([[1, 2, 3], [2, 4, 6], [1, 1, 1]])
        inv, valid = mat3.inverse(singular)
        assert not bool(valid)
        assert_near(inv, np.eye(3))  # default fallback

    def test_mul_vec3_corrected(self):
        # The reference mul_vec3 is a stub bug (mat3.rs:52-54 returns rhs);
        # ours implements the real product.
        a = self.m([[0, -1, 0], [1, 0, 0], [0, 0, 1]])
        v = vec(1, 0, 0)
        assert_near(mat3.mul_vec3(a, v), vec(0, 1, 0))

    def test_batched_inverse(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(10, 3, 3)).astype(np.float32))
        a = a + 3.0 * jnp.eye(3)  # well-conditioned
        inv, valid = mat3.inverse(a)
        assert bool(jnp.all(valid))
        assert_near(jnp.matmul(a, inv), np.broadcast_to(np.eye(3), (10, 3, 3)),
                    tol=1e-4)
