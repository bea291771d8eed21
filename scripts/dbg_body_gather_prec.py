"""Check gather_body_rows / sum_up_external_forces MXU precision on TPU:
DEFAULT truncates the data operand to bf16 (docstring claims exactness).
Measure the cost of per-operand exact precision at 1M particles."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp

N, B = 1_000_000, 34
rng = np.random.default_rng(0)
arr = jnp.asarray(rng.standard_normal((B, 3, 3)), jnp.float32)
bid = jnp.asarray(rng.integers(0, B, N), jnp.int32)
vec = jnp.asarray(rng.standard_normal((N, 6)), jnp.float32)

def gather(arr, bid, precision):
    oh = (bid[:, None] == jnp.arange(B, dtype=bid.dtype)[None, :]
          ).astype(arr.dtype)
    flat = arr.reshape(B, -1)
    out = jnp.einsum("nb,bf->nf", oh, flat,
                     preferred_element_type=arr.dtype, precision=precision)
    return out.reshape((N,) + arr.shape[1:])

truth = np.asarray(arr)[np.asarray(bid)]
P = jax.lax.Precision
for name, prec in [("DEFAULT", P.DEFAULT),
                   ("(DEFAULT,HIGHEST)", (P.DEFAULT, P.HIGHEST)),
                   ("HIGHEST", P.HIGHEST)]:
    f = jax.jit(lambda a, b, p=prec: gather(a, b, p))
    out = np.asarray(f(arr, bid))
    exact = np.array_equal(out, truth)
    t0 = time.perf_counter()
    for _ in range(20):
        o = f(arr, bid)
    jax.block_until_ready(o)
    ms = (time.perf_counter() - t0) / 20 * 1000
    print(f"gather {name:20s} exact={exact}  {ms:7.3f} ms", flush=True)

def sumup(bid, vec, precision):
    oh = (bid[:, None] == jnp.arange(B)[None, :]).astype(vec.dtype)
    return jnp.einsum("nb,nc->bc", oh, vec,
                      preferred_element_type=vec.dtype, precision=precision)

truth64 = np.zeros((B, 6))
np.add.at(truth64, np.asarray(bid), np.asarray(vec, np.float64))
for name, prec in [("DEFAULT", P.DEFAULT),
                   ("(DEFAULT,HIGHEST)", (P.DEFAULT, P.HIGHEST)),
                   ("HIGHEST", P.HIGHEST)]:
    f = jax.jit(lambda b, v, p=prec: sumup(b, v, p))
    out = np.asarray(f(bid, vec), np.float64)
    rel = np.max(np.abs(out - truth64) / np.maximum(np.abs(truth64), 1e-30))
    t0 = time.perf_counter()
    for _ in range(20):
        o = f(bid, vec)
    jax.block_until_ready(o)
    ms = (time.perf_counter() - t0) / 20 * 1000
    print(f"sumup  {name:20s} rel_err={rel:.3e}  {ms:7.3f} ms", flush=True)
