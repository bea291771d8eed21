"""Slot-store variants, forcing materialization via a consuming sum."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp

N = int(os.environ.get("BENCH_N", 100_000))
S = 9
L = int(os.environ.get("EXP_L", max(8192, (N // 9) & ~15)))
print(f"N={N} L={L} dev={jax.devices()}", flush=True)

rng = np.random.default_rng(0)
tgt = jnp.asarray(np.sort(rng.choice(N, size=L, replace=False)), jnp.int32)
prev = jnp.asarray(np.sort(rng.choice(N, size=L, replace=False)), jnp.int32)
allv = jnp.asarray(rng.standard_normal((L, 25 * S)), jnp.float32)
fields = [jnp.asarray(rng.standard_normal((N, S)), jnp.float32)
          for _ in range(25)]


def timeit(fn, *args, n=30, name=""):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / n * 1000
    print(f"{name:52s} {el:8.2f} ms", flush=True)


def consume(slices):
    # consume each slice like the scene store does: identity copy into
    # distinct outputs (the barrier pins each as a real materialized
    # array), plus a scalar so nothing is DCE'd
    outs = [jax.lax.optimization_barrier(s) for s in slices]
    return outs, sum(jnp.sum(o) for o in outs)


def var_a(allv, tgt):
    scat = jnp.zeros((N + 1, 25 * S), jnp.float32).at[tgt].set(
        allv, mode="drop", unique_indices=True)[:N]
    return consume([scat[:, i * S:(i + 1) * S] for i in range(25)])


def var_b(allv, tgt):
    scat = jnp.zeros((N + 1, 25 * S), jnp.float32).at[tgt].set(
        allv, mode="drop", unique_indices=True)[:N]
    t = jnp.swapaxes(scat.reshape(N, 25, S), 0, 1)
    t = jax.lax.optimization_barrier(t)
    return consume([t[i] for i in range(25)])


def var_c(allv, tgt, prev, *fields):
    outs = []
    for i, f in enumerate(fields):
        v = allv[:, i * S:(i + 1) * S]
        outs.append(f.at[prev].set(0.0, mode="drop", unique_indices=True)
                    .at[tgt].set(v, mode="drop", unique_indices=True))
    return consume(outs)


def var_e(allv6, tgt):
    scat = jnp.zeros((N + 1, 6 * S), jnp.float32).at[tgt].set(
        allv6, mode="drop", unique_indices=True)[:N]
    return consume([scat[:, i * S:(i + 1) * S] for i in range(6)])


timeit(var_a, allv, tgt, name="a) [L,225] scatter + 25 strided slices")
timeit(var_b, allv, tgt, name="b) scatter + transpose + contig slices")
timeit(var_c, allv, tgt, prev, *fields,
       name="c) 25 double scatters (not donated)")
timeit(lambda a6, t, p, *fs: var_c(a6, t, p, *fs),
       allv[:, :6 * S], tgt, prev, *fields[:6],
       name="d) 6 double scatters (not donated)")
timeit(var_e, allv[:, :6 * S], tgt,
       name="e) [L,54] scatter + 6 strided slices")
