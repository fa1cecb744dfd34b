"""RNG tests: exact xorshift32 parity + counter-based generator sanity."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu import rng


def _xorshift_py(state):
    """Straight-line Python reimplementation of random.rs:22-30."""
    x = state
    x ^= (x << 13) & 0xFFFFFFFF
    x ^= x >> 17
    x ^= (x << 5) & 0xFFFFFFFF
    return x


class TestXorshift32:
    def test_stream_matches_python(self):
        s = rng.DEFAULT_SEED
        host = rng.XorShift32()
        jx = jnp.uint32(s)
        py = s
        for _ in range(100):
            py = _xorshift_py(py)
            jx = rng.xorshift32(jx)
            assert int(host.next_u32()) == py
            assert int(jx) == py

    def test_float_mapping(self):
        # random.rs:15-17: u32 / u32::MAX, rounded to f32
        bits = jnp.uint32(0xFFFFFFFF)
        assert float(rng.random_f32_from_bits(bits)) == 1.0
        assert float(rng.random_f32_from_bits(jnp.uint32(0))) == 0.0
        host = rng.XorShift32()
        jx = jnp.uint32(rng.DEFAULT_SEED)
        for _ in range(50):
            jx = rng.xorshift32(jx)
            f_host = host.random_f32()
            f_jax = float(rng.random_f32_from_bits(jx))
            assert f_host == np.float32(f_jax)

    def test_bilateral_range(self):
        host = rng.XorShift32()
        vals = [host.random_bilateral_f32() for _ in range(1000)]
        assert all(-1.0 <= v <= 1.0 for v in vals)
        assert min(vals) < -0.5 and max(vals) > 0.5

    def test_default_seed(self):
        # random.rs:9
        assert rng.DEFAULT_SEED == 2547549


class TestPcg3d:
    def test_deterministic(self):
        a = rng.pcg3d(jnp.uint32(1), jnp.uint32(2), jnp.uint32(3))
        b = rng.pcg3d(jnp.uint32(1), jnp.uint32(2), jnp.uint32(3))
        for x, y in zip(a, b):
            assert int(x) == int(y)

    def test_counter_sensitivity(self):
        a = rng.pcg3d(jnp.uint32(1), jnp.uint32(2), jnp.uint32(3))
        b = rng.pcg3d(jnp.uint32(1), jnp.uint32(2), jnp.uint32(4))
        assert int(a[0]) != int(b[0])

    def test_uniformity(self):
        n = 1 << 14
        idx = jnp.arange(n, dtype=jnp.uint32)
        u, v, w = rng.uniform3(idx, jnp.uint32(7), jnp.uint32(1))
        for x in (u, v, w):
            x = np.asarray(x)
            assert 0.0 <= x.min() and x.max() <= 1.0
            assert abs(x.mean() - 0.5) < 0.01
            assert abs(x.var() - 1.0 / 12.0) < 0.01
        # u, v, w mutually decorrelated
        assert abs(np.corrcoef(np.asarray(u), np.asarray(v))[0, 1]) < 0.05

    def test_bilateral(self):
        idx = jnp.arange(1024, dtype=jnp.uint32)
        x, y, z = rng.uniform_bilateral3(idx, jnp.uint32(0), jnp.uint32(2))
        for a in (x, y, z):
            a = np.asarray(a)
            assert -1.0 <= a.min() and a.max() <= 1.0
            assert abs(a.mean()) < 0.05
