"""Round-5b glue probes: what does each regroup formulation actually cost?

The OBJ-10k binned frame is GLUE-dominated (PERFSTUDY
"r5_binned_decomposition": ~35 of 52 ms in per-ray regroups + slot-sort
assembly).  Per bounce the engine pays
    argsort(int32 keys)  +  15-plane gather  (plane-major [:, order])
and the final assembly pays
    argsort(int32 slots) +  (N, 3) gather.

Candidate cheaper formulations, each measured head-to-head at the
benchmark ray counts (1M primary; capped secondaries run 64k-512k):

  A  argsort alone (int32)                       — the sort floor
  B  argsort + plane-major gather x15            — production regroup
  C  argsort + ray-major gather  [N,15][order]   — row-gather form
  D  lax.sort_key_val with planes as payloads    — sort carries payload
  E  inverse permutation by scatter (iota.at[order].set) — vs argsort
  F  (N,3) gather via plane-major vs ray-major   — assembly cost
  G  one-hot matmul permutation within 128-ray chunk groups (MXU idea,
     only valid if permutation is block-local — measured for reference)

Timing: (t(2R)-t(R))/R with data-dependent chaining so XLA cannot CSE
repeated iterations (axon tunnel methodology, ROUND4_NOTES).
"""
import statistics
import sys, time, json
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

P = 15


def timed_pair(make_run, reps, *args):
    # float() of a reduced scalar is the only reliable device sync over
    # the axon tunnel (block_until_ready returns early; ROUND4_NOTES)
    f1, f2 = make_run(reps), make_run(2 * reps)

    def reduce_all(f):
        def g(*a):
            outs = f(*a)
            outs = outs if isinstance(outs, tuple) else (outs,)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
        return g
    r1 = jax.jit(reduce_all(f1))
    r2 = jax.jit(reduce_all(f2))
    _ = float(r1(*args))
    _ = float(r2(*args))
    deltas = []
    for _t in range(5):
        t0 = time.perf_counter()
        _ = float(r1(*args))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(r2(*args))
        tb = time.perf_counter() - t0
        deltas.append((tb - ta) / reps)
    return statistics.median(deltas)


def measure(out, tag, make, reps, *args, want=None):
    if want is not None and not want(tag):
        return
    v = timed_pair(make, reps, *args)
    out[tag] = v
    print(f"  {tag:36s} {v*1e3:8.3f} ms", flush=True)


def chain(keys, dep):
    # cheap data dependency: xor a value derived from the previous
    # iteration's output into the keys so iterations can't be CSE'd
    return keys ^ (dep & jnp.int32(1))


def probe(n, only=None):
    rng = np.random.default_rng(0)
    keys0 = jnp.asarray(rng.integers(0, 1 << 20, size=n, dtype=np.int32))
    state_pm = jnp.asarray(rng.random((P, n), np.float32))   # plane-major
    state_rm = jnp.asarray(np.ascontiguousarray(
        np.asarray(state_pm).T))                             # ray-major
    rgb = jnp.asarray(rng.random((n, 3), np.float32))

    out = {}

    def want(tag):
        return only is None or tag.split("_")[0] in only

    def run_argsort(reps):
        def f(keys):
            order = keys
            for _ in range(reps):
                order = jnp.argsort(keys)
                keys = chain(keys, order[0])
            return keys, order
        return f
    measure(out, "A_argsort_int32", run_argsort, 4, keys0, want=want)

    def run_prod(reps):
        def f(keys, state):
            acc = jnp.float32(0)
            for _ in range(reps):
                order = jnp.argsort(keys)
                state = state[:, order]
                acc = acc + state[0, 0]
                keys = chain(keys, order[0])
            return acc, state
        return f
    measure(out, "B_argsort_plus_15plane_gather", run_prod, 4, keys0,
            state_pm, want=want)

    def run_raymajor(reps):
        def f(keys, state):
            acc = jnp.float32(0)
            for _ in range(reps):
                order = jnp.argsort(keys)
                state = state[order]
                acc = acc + state[0, 0]
                keys = chain(keys, order[0])
            return acc, state
        return f
    measure(out, "C_argsort_plus_raymajor_gather", run_raymajor, 4,
            keys0, state_rm, want=want)

    def run_sortpayload(reps):
        def f(keys, state):
            acc = jnp.float32(0)
            for _ in range(reps):
                ops = [keys] + [state[i] for i in range(P)]
                sorted_ops = jax.lax.sort(ops, num_keys=1)
                state = jnp.stack(sorted_ops[1:])
                acc = acc + state[0, 0]
                keys = chain(keys, sorted_ops[0][0])
            return acc, state
        return f
    measure(out, "D_sort_with_15_payloads", run_sortpayload, 2, keys0,
            state_pm, want=want)

    def run_scatter_inv(reps):
        def f(keys):
            acc = jnp.int32(0)
            order = jnp.argsort(keys)
            for _ in range(reps):
                inv = jnp.zeros((n,), jnp.int32).at[order].set(
                    jnp.arange(n, dtype=jnp.int32))
                acc = acc + inv[0]
                order = order ^ (inv[0] & 1)
            return acc
        return f
    measure(out, "E_scatter_inverse_perm", run_scatter_inv, 4, keys0,
            want=want)

    def run_rgb_pm(reps):
        def f(keys, rgbv):
            acc = jnp.float32(0)
            rgb_pm = rgbv.T
            for _ in range(reps):
                order = jnp.argsort(keys)
                g = rgb_pm[:, order]
                acc = acc + g[0, 0]
                keys = chain(keys, order[0])
            return acc
        return f
    measure(out, "F_argsort_plus_rgb3_gather", run_rgb_pm, 4, keys0,
            rgb, want=want)

    def run_gather_only_15(reps):
        order0 = jnp.argsort(keys0)
        def f(state):
            acc = jnp.float32(0)
            order = order0
            for _ in range(reps):
                state = state[:, order]
                acc = acc + state[0, 0]
                order = order ^ (state[0, 0].astype(jnp.int32) & 1)
            return acc, state
        return f
    measure(out, "G_15plane_gather_only", run_gather_only_15, 4,
            state_pm, want=want)

    def run_gather_rm_only(reps):
        order0 = jnp.argsort(keys0)
        def f(state):
            acc = jnp.float32(0)
            order = order0
            for _ in range(reps):
                state = state[order]
                acc = acc + state[0, 0]
                order = order ^ (state[0, 0].astype(jnp.int32) & 1)
            return acc, state
        return f
    measure(out, "H_raymajor_gather_only", run_gather_rm_only, 4,
            state_rm, want=want)

    return out


def probe2(n, counts):
    """Sort cost vs payload-operand count."""
    rng = np.random.default_rng(0)
    keys0 = jnp.asarray(rng.integers(0, 1 << 20, size=n, dtype=np.int32))
    state_pm = jnp.asarray(rng.random((P, n), np.float32))
    out = {}
    for np_ in counts:
        def run(reps, np_=np_):
            def f(keys, state):
                last = state[0]
                for _ in range(reps):
                    ops = [keys] + [state[i] for i in range(np_)]
                    so = jax.lax.sort(ops, num_keys=1)
                    last = so[1]
                    keys = chain(keys, so[1][0].astype(jnp.int32))
                return keys, last
            return f
        measure(out, f"D{np_}_sort_payloads", run, 4, keys0, state_pm)
    return out


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    sizes = ([int(s) for s in sys.argv[2].split(",")]
             if len(sys.argv) > 2 else [1 << 20])
    results = {}
    for n in sizes:
        print(f"== n={n}", flush=True)
        if only and any(o.startswith("pay") for o in only):
            cts = [int(o[3:]) for o in only if o.startswith("pay")]
            results[str(n)] = probe2(n, cts)
        else:
            results[str(n)] = probe(n, only)
    p = Path("/tmp/glue_probe.json")
    old = json.loads(p.read_text()) if p.exists() else {}
    for k, v in results.items():
        old.setdefault(k, {}).update(v)
    p.write_text(json.dumps(old, indent=1))
