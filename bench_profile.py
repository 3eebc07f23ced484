"""Hot-path profiling tool for the 64k headline config (docs/perf_notes.md).

Usage:  python bench_profile.py            # component breakdown (chained scans)
        python bench_profile.py --trace    # capture + summarize a device trace

Timing rule (docs/perf_notes.md #3): the axon runtime memoizes identical
(executable, input) dispatches, so every measurement here is ONE dispatch
of a long lax.scan whose carry changes every iteration.
"""
import time
import numpy as np
import jax
from metadyn_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.packed_engine import PackedEngine
from metadyn_tpu.ops.packed import PackedSpec
from metadyn_tpu.integrate.packed import make_packed_langevin_step
from metadyn_tpu.ops.packed_pallas2 import _half_stacks, packed_lj_force_pallas2

d = np.load("bench_data/liq64k.npz")
liq_pos, liq_vel, L = d["pos"], d["vel"], float(d["L"])
n = liq_pos.shape[0]
box = Box.cubic(L)
spec = PackedSpec.create(L, n, r_cut=2.5, skin=0.55, cap=40,
                         shift_energy=False, uniform_sigma=1.0,
                         uniform_eps=1.0)
engine = PackedEngine(spec, rebuild_every=10)
state, _ = engine.pack_state(
    liq_pos, box, np.zeros(n, np.int32),
    eps_i=np.ones(n, np.float32), sigma_i=np.ones(n, np.float32),
    vel=liq_vel)
state, aux = engine.init(state)
key = jax.random.PRNGKey(0)
ITERS = 1000

step = make_packed_langevin_step(
    lambda s: engine.force_into(s, None), dt=0.005, kT=1.0, gamma=1.0)
step_nof = make_packed_langevin_step(
    lambda s: s, dt=0.005, kT=1.0, gamma=1.0)


def run(name, scan_fn, *args):
    out = scan_fn(*args)          # compile + warm
    jax.block_until_ready(out)
    t0 = time.time()
    out = scan_fn(*args)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"{name:44s} {dt/ITERS*1e6:9.1f} us/iter  (total {dt:.2f}s)")


@jax.jit
def full(s, key):
    def body(st, i):
        return step(st, jax.random.fold_in(key, i)), None
    return jax.lax.scan(body, s, jnp.arange(ITERS))[0]

@jax.jit
def baoab_only(s, key):
    def body(st, i):
        return step_nof(st, jax.random.fold_in(key, i)), None
    return jax.lax.scan(body, s, jnp.arange(ITERS))[0]

@jax.jit
def force_only(s):
    def body(st, i):
        # unique input each iter (chained via f -> r feedback, tiny)
        st = st.replace(r=st.r + 1e-9 * st.f)
        return packed_lj_force_pallas2(st, spec, with_energy=False), None
    return jax.lax.scan(body, s, jnp.arange(ITERS))[0]

@jax.jit
def stacks_only(s):
    def body(st, i):
        st = st.replace(r=st.r + 1e-9 * st.f)
        stacks = _half_stacks(st, spec)
        acc = sum(jnp.sum(x[:, :1, :1]) for x in stacks)
        return st.replace(f=st.f + acc * 0.0), None
    return jax.lax.scan(body, s, jnp.arange(ITERS))[0]

run("full langevin (force+baoab)", full, state, key)
run("baoab only", baoab_only, state, key)
run("force only (kernel+stacks+rollback)", force_only, state)
run("stacks only", stacks_only, state)


def capture_trace():
    """Capture a device trace of the force scan and print the op summary."""
    import glob, gzip, json, os
    @jax.jit
    def scan_force(s):
        def body(st, i):
            st = st.replace(r=st.r + 1e-9 * st.f)
            from metadyn_tpu.ops.packed_pallas2 import packed_lj_force_pallas2
            return packed_lj_force_pallas2(st, spec, with_energy=False), None
        return jax.lax.scan(body, s, jnp.arange(50))[0]
    out = scan_force(state)
    jax.block_until_ready(out)
    os.makedirs("/tmp/trace", exist_ok=True)
    with jax.profiler.trace("/tmp/trace"):
        out = scan_force(out)
        jax.block_until_ready(out)
    files = glob.glob("/tmp/trace/**/*.trace.json.gz", recursive=True)
    f = sorted(files)[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    agg = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        n = e["name"]
        if n.startswith("$") or "PjitFunction" in n or n.startswith("jit_") or n == "while":
            continue
        kind = n.split(".")[0]
        agg.setdefault(kind, [0, 0.0])
        agg[kind][0] += 1
        agg[kind][1] += e.get("dur", 0)
    for kind, (cnt, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:15]:
        print(f"{dur/1e3:10.2f} ms  x{cnt:6d}  {kind}")


if __name__ == "__main__" and "--trace" in __import__("sys").argv:
    capture_trace()
