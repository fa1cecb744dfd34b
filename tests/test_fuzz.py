"""Differential fuzzing of the three parity engines (VERDICT r1 item 8).

Golden truth in this repo is self-derived (no Rust toolchain), mitigated by
three INDEPENDENT implementations of the reference algorithm that must
bit-agree: the Python oracle (oracle.py), the native C++ engine
(native/raytracer_core.cpp, its own parser + renderer), and the JAX parity
renderer (render.ray_trace_parity).  Fixed golden scenes cover the common
case; this fuzz harness drives RANDOM scenes (all material kinds, spheres +
triangles, negative radii, edge-case floats) at random small sizes through
all three and requires bitwise agreement, and drives random VALID and
MUTATED sources through the Python and C++ parsers requiring identical
accept/reject decisions.

Deterministic (seeded) so failures reproduce; each case's seed is in the
assert message.
"""

import random

import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu import parser as parser_mod

# ir=0 / degenerate-geometry fuzz cases intentionally exercise NaN paths
pytestmark = pytest.mark.filterwarnings("ignore::RuntimeWarning")

native = pytest.importorskip("raytracer_tpu.native")
try:
    native.load_library()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False


# --- random scene generation ------------------------------------------------

def _f(rng: random.Random, lo: float, hi: float) -> str:
    """A DSL float literal: -?digits[.digits] (no exponent) — sometimes an
    edge-case form the grammar also accepts (ints, many decimals, -0)."""
    v = rng.uniform(lo, hi)
    form = rng.randrange(5)
    if form == 0:
        return str(int(v))          # bare int, no dot
    if form == 1:
        return f"{v:.1f}"
    if form == 2:
        return f"{v:.6f}"           # long mantissa
    if form == 3 and lo <= 0.0:
        return "-0.0" if rng.random() < 0.5 else "0.000"
    return f"{v:.3f}"


def make_source(seed: int) -> str:
    """A random valid scene-DSL source (parser.rs grammar + Emission)."""
    rng = random.Random(seed)
    ws = lambda: rng.choice([" ", "  ", "\n", " \n ", "\t "])
    lines = [f"camera origin {_f(rng, -2, 2)} {_f(rng, -1, 2)} "
             f"{_f(rng, -1, 3)} aspect {rng.choice(['1.0', '1.5', '1.777'])};"]
    nmat = rng.randrange(1, 5)
    for i in range(nmat):
        kind = rng.randrange(4)
        if kind == 0:
            body = (f"Diffuse color {_f(rng, 0, 1)} {_f(rng, 0, 1)} "
                    f"{_f(rng, 0, 1)}")
        elif kind == 1:
            body = (f"Metal color {_f(rng, 0, 1)} {_f(rng, 0, 1)} "
                    f"{_f(rng, 0, 1)} fuzz {_f(rng, 0, 1)}")
        elif kind == 2:
            body = f"Dielectric ir {_f(rng, 0.8, 2.4)}"
        else:
            body = (f"Emission color {_f(rng, 0, 4)} {_f(rng, 0, 4)} "
                    f"{_f(rng, 0, 4)}")
        lines.append(f"material m{i} :{ws()}{body};")
        if rng.random() < 0.3:
            lines.append("// a comment line")
    for _ in range(rng.randrange(0, 5)):
        r = _f(rng, 0.1, 1.2)
        if rng.random() < 0.15:
            r = "-" + r.lstrip("-")   # hollow-glass negative radius
        lines.append(
            f"sphere center {_f(rng, -2, 2)} {_f(rng, -1, 1)} "
            f"{_f(rng, -4, -1)} radius {r} material m{rng.randrange(nmat)};")
    for _ in range(rng.randrange(0, 3)):
        vs = " ".join(
            f"v{k} {_f(rng, -2, 2)} {_f(rng, -1, 2)} {_f(rng, -4, -1)}"
            for k in range(3))
        lines.append(f"triangle {vs} material m{rng.randrange(nmat)};")
    return "\n".join(lines) + "\n"


# --- render differential -----------------------------------------------------

@pytest.mark.skipif(not HAVE_NATIVE, reason="native library unavailable")
class TestRenderDifferential:
    @pytest.mark.parametrize("seed", range(8))
    def test_oracle_native_jax_bit_match(self, seed):
        src = make_source(seed)
        rng = random.Random(seed ^ 0xABCD)
        w = rng.choice([7, 12, 16])
        h = rng.choice([5, 9, 13])
        spp = rng.choice([1, 2])
        depth = rng.choice([1, 2, 4])
        rseed = rng.choice([0, 1, 987654])

        world = parser_mod.parse_input(src)
        ocam, oworld = world.to_oracle()
        ref = rt.oracle.ray_trace(oworld, ocam, w, h, spp, depth,
                                  **({"seed": rseed} if rseed else {}))

        nw = native.NativeWorld(src)
        got_native = nw.render(w, h, samples_per_pixel=spp,
                               max_ray_bounces=depth, seed=rseed)
        assert np.array_equal(got_native, ref), (
            f"seed={seed}: native != oracle "
            f"(maxdiff {np.abs(got_native.astype(int) - ref.astype(int)).max()})"
            f"\nsource:\n{src}")

        got_jax = rt.ray_trace_parity(
            world.to_scene(), world.to_camera(), w, h,
            samples_per_pixel=spp, depth=depth,
            **({"seed": rseed} if rseed else {}))
        assert np.array_equal(np.asarray(got_jax), ref), (
            f"seed={seed}: jax parity != oracle\nsource:\n{src}")


# --- parser differential ------------------------------------------------------

def _python_accepts(src: str) -> bool:
    try:
        parser_mod.parse_input(src)
        return True
    except parser_mod.ParseError:
        return False
    except RecursionError:
        return False


def _native_accepts(src: str) -> bool:
    lib = native.load_library()
    data = src.encode("utf-8", errors="ignore")
    h = lib.rt_load_world_n(data, len(data))
    if h:
        lib.rt_destroy_world(h)
        return True
    return False


def _mutate(src: str, rng: random.Random) -> str:
    """One random mutation; may or may not keep the source valid — the
    property under test is only that BOTH parsers decide identically."""
    ops = rng.randrange(8)
    if ops == 0 and len(src) > 4:                      # truncate
        return src[:rng.randrange(1, len(src))]
    if ops == 1:                                       # drop one ';'
        idx = [i for i, c in enumerate(src) if c == ";"]
        if idx:
            i = rng.choice(idx)
            return src[:i] + src[i + 1:]
    if ops == 2:                                       # typo a keyword
        kw = rng.choice(["sphere", "material", "camera", "radius",
                         "color", "aspect", "origin"])
        return src.replace(kw, kw[:-1] + "x", 1)
    if ops == 3:                                       # undefined material
        return src.replace("material m0;", "material nosuch;", 1)
    if ops == 4:                                       # comment w/o newline
        return src.rstrip("\n") + "\n// trailing comment no newline"
    if ops == 5:                                       # insert valid comment
        lines = src.split("\n")
        lines.insert(rng.randrange(len(lines)), "// fuzz comment")
        return "\n".join(lines)
    if ops == 6:                                       # trailing garbage
        return src + rng.choice(["zzz", "sphere", "123", ";"])
    if ops == 7:                                       # double a dot
        return src.replace(".", "..", 1)
    return src


@pytest.mark.skipif(not HAVE_NATIVE, reason="native library unavailable")
class TestParserDifferential:
    @pytest.mark.parametrize("seed", range(12))
    def test_valid_sources_accepted_by_both(self, seed):
        src = make_source(seed + 1000)
        assert _python_accepts(src), f"seed={seed}\n{src}"
        assert _native_accepts(src), f"seed={seed}\n{src}"

    @pytest.mark.parametrize("seed", range(40))
    def test_mutated_sources_decided_identically(self, seed):
        rng = random.Random(seed)
        src = _mutate(make_source(seed + 2000), rng)
        py = _python_accepts(src)
        cc = _native_accepts(src)
        assert py == cc, (
            f"seed={seed}: python={'accept' if py else 'reject'} "
            f"native={'accept' if cc else 'reject'}\nsource:\n{src!r}")
