"""Measure variants of writing [L, 25S] compacted slot rows into
per-particle storage (25 separate [N, S] scene fields), at BENCH_N.

Variants:
  a) one [L,25S] row scatter into [N+1,25S] zeros + 25 strided slices
  b) same scatter + one reshape/transpose to [25,N,S] + contiguous slices
  c) 25 in-place double scatters ([N,S].at[prev].set(0).at[tgt].set(v))
     with donated inputs (the spring-update pattern)
  d) 6-field variant of (c) (springs only)
  e) one [L,6S] scatter into [N+1,6S] zeros + 6 strided slices
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp

N = int(os.environ.get("BENCH_N", 100_000))
S = 9
L = int(os.environ.get("EXP_L", max(8192, (N // 9) & ~15)))
print(f"N={N} L={L}", flush=True)

rng = np.random.default_rng(0)
tgt = jnp.asarray(np.sort(rng.choice(N, size=L, replace=False)), jnp.int32)
prev = jnp.asarray(np.sort(rng.choice(N, size=L, replace=False)), jnp.int32)
allv = jnp.asarray(rng.standard_normal((L, 25 * S)), jnp.float32)
fields = [jnp.asarray(rng.standard_normal((N, S)), jnp.float32)
          for _ in range(25)]


def timeit(fn, *args, n=30, name="", donate=()):
    jfn = jax.jit(fn, donate_argnums=donate)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
        if donate:
            break
    jax.block_until_ready(out)
    reps = 1 if donate else n
    el = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:52s} {el:8.2f} ms", flush=True)
    return out


def var_a(allv, tgt):
    scat = jnp.zeros((N + 1, 25 * S), jnp.float32).at[tgt].set(
        allv, mode="drop", unique_indices=True)[:N]
    return [scat[:, i * S:(i + 1) * S] for i in range(25)]


def var_b(allv, tgt):
    scat = jnp.zeros((N + 1, 25 * S), jnp.float32).at[tgt].set(
        allv, mode="drop", unique_indices=True)[:N]
    t = jnp.swapaxes(scat.reshape(N, 25, S), 0, 1)
    t = jax.lax.optimization_barrier(t)
    return [t[i] for i in range(25)]


def var_c(allv, tgt, prev, *fields):
    outs = []
    for i, f in enumerate(fields):
        v = allv[:, i * S:(i + 1) * S]
        outs.append(f.at[prev].set(0.0, mode="drop", unique_indices=True)
                    .at[tgt].set(v, mode="drop", unique_indices=True))
    return outs


def var_e(allv6, tgt):
    scat = jnp.zeros((N + 1, 6 * S), jnp.float32).at[tgt].set(
        allv6, mode="drop", unique_indices=True)[:N]
    return [scat[:, i * S:(i + 1) * S] for i in range(6)]


timeit(var_a, allv, tgt, name="a) [L,225] scatter + 25 strided slices")
timeit(var_b, allv, tgt, name="b) scatter + transpose + contig slices")
timeit(var_c, allv, tgt, prev, *fields, donate=tuple(range(2, 27)),
       name="c) 25 in-place double scatters (donated)")
timeit(lambda a6, t, p, *fs: var_c(a6, t, p, *fs),
       allv[:, :6 * S], tgt, prev, *fields[:6],
       donate=tuple(range(2, 8)),
       name="d) 6 in-place double scatters (donated)")
timeit(var_e, allv[:, :6 * S], tgt,
       name="e) [L,54] scatter + 6 strided slices")
