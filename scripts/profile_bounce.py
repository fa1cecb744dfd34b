"""Micro-profile of the wavefront bounce-step components on the live device.

Everything (including setup) is inside jit — eager dispatch through the axon
tunnel costs ~1s/op and would swamp the measurement.
"""

import functools
import time
import sys

import jax
import jax.numpy as jnp

import raytracer_tpu as rt
from raytracer_tpu import intersect, materials as mats_mod, rng
from raytracer_tpu.render import _bounce_step

W = H = 512
B = W * H
STEPS = 64


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:28s} {dt:7.3f}s  {dt/STEPS*1e3:8.3f} ms/step "
          f"{B*STEPS/dt/1e6:9.1f} Mlanes/s", flush=True)
    return out


def main():
    w = rt.models.default_world()
    scene = w.to_scene()
    cam = w.to_camera()

    def make_rays():
        rows = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)
        cols = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)
        pix = (rows * W + cols).astype(jnp.uint32)
        u = (cols.astype(jnp.float32) + 0.5) / jnp.float32(W - 1)
        v = (rows.astype(jnp.float32) + 0.5) / jnp.float32(H - 1)
        o, d = cam.cast_rays(u, v)
        return o, d, pix

    @jax.jit
    def loop_rng():
        _, _, pix = make_rays()
        def body(c, i):
            bx, by, bz = rng.uniform_bilateral3(pix, jnp.uint32(7),
                                                i.astype(jnp.uint32))
            return c + bx + by + bz, None
        out, _ = jax.lax.scan(body, jnp.zeros((B,)), jnp.arange(STEPS))
        return out

    @jax.jit
    def loop_spheres():
        o, d, _ = make_rays()
        pack = intersect.pack_scene(scene)
        def body(c, i):
            oo = c
            t, si = intersect.sphere_hits_batch(oo, d, scene, pack)
            return oo + 1e-9 * t[:, None], None
        oo, _ = jax.lax.scan(body, o, None, length=STEPS)
        return oo

    @jax.jit
    def loop_triangles():
        o, d, _ = make_rays()
        pack = intersect.pack_scene(scene)
        def body(c, i):
            oo = c
            t, ti = intersect.triangle_hits_batch(oo, d, scene, pack)
            return oo + 1e-9 * t[:, None], None
        oo, _ = jax.lax.scan(body, o, None, length=STEPS)
        return oo

    @jax.jit
    def loop_intersect():
        o, d, _ = make_rays()
        pack = intersect.pack_scene(scene)
        def body(c, i):
            oo, dd = c
            h = intersect.closest_hit_batch(oo, dd, scene, pack)
            return (h.position, jnp.where((h.t % 2 < 1)[:, None], dd,
                                          h.normal)), None
        (oo, dd), _ = jax.lax.scan(body, (o, d), None, length=STEPS)
        return oo, dd

    @jax.jit
    def loop_scatter():
        o, d, pix = make_rays()
        def body(c, i):
            dd = c
            bx, by, bz = rng.uniform_bilateral3(pix, jnp.uint32(7),
                                                i.astype(jnp.uint32))
            runit = mats_mod.random_unit_sphere(bx, by, bz)
            mat = (pix % 9).astype(jnp.int32)
            sc = mats_mod.scatter(scene.materials, mat, dd, runit, runit)
            return sc.direction, None
        dd, _ = jax.lax.scan(body, d, jnp.arange(STEPS))
        return dd

    @jax.jit
    def loop_full():
        o, d, pix = make_rays()
        pack = intersect.pack_scene(scene)
        carry = (o, d, jnp.ones((B, 3)), jnp.zeros((B, 3)),
                 jnp.ones((B,), bool), jnp.int32(0))
        step = functools.partial(_bounce_step, scene, pack, pix,
                                 jnp.uint32(0), True)
        carry, _ = jax.lax.scan(step, carry,
                                jnp.arange(STEPS, dtype=jnp.int32))
        return carry[3], carry[5]

    print(f"device: {jax.devices()[0].device_kind}  B={B} STEPS={STEPS}",
          flush=True)
    timed("rng (pcg3d x3)", loop_rng)
    timed("spheres only", loop_spheres)
    timed("triangles only", loop_triangles)
    timed("intersect (closest hit)", loop_intersect)
    timed("scatter only", loop_scatter)
    timed("full bounce step", loop_full)


if __name__ == "__main__":
    main()
