"""Bisect the 3D sorted-pack path's compile/run cost: single step vs
lax.scan chunks, with flushed timing prints."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from bench import build_scene_3d

t0 = time.perf_counter()
def lap(msg):
    global t0
    t1 = time.perf_counter()
    print(f"[{t1 - t0:8.1f}s] {msg}", flush=True)
    t0 = t1

scheme, scene = build_scene_3d()
lap("scene built")
step = scheme.make_step(scene)
lap("step traced/built (host)")
dt = jnp.float32(1e-4)
s1 = step(scene, dt)
jax.block_until_ready(s1.x)
lap("single step compile+run")
t = time.perf_counter()
for _ in range(5):
    s1 = step(s1, dt)
jax.block_until_ready(s1.x)
lap(f"5 eager steps ({(time.perf_counter()-t)/5*1000:.1f} ms/step)")

chunk = int(os.environ.get("CHUNK", "10"))
def multi(s, _):
    return step(s, dt), None
@jax.jit
def chunked(s):
    s, _ = jax.lax.scan(multi, s, None, length=chunk)
    return s
s2 = chunked(scene)
jax.block_until_ready(s2.x)
lap(f"scan({chunk}) compile+run")
t = time.perf_counter()
s2 = chunked(s2)
jax.block_until_ready(s2.x)
lap(f"scan({chunk}) warm ({(time.perf_counter()-t)/chunk*1000:.1f} ms/step)")
