"""Shared timing helper for the scripts/ benches.

One methodology everywhere: jit the fn, warm up twice (first call
compiles, second hits steady state), dispatch `iters` calls without
blocking, then block ONCE on a scalar digest fetch — through the
remote-TPU tunnel `jax.block_until_ready` does not actually block, so
the digest fetch is the only reliable sync point (NOTES.md).
"""

from __future__ import annotations

import time

import numpy as np


def timed(name, fn, *args, iters=20, batch=None, width=44):
    """Time `iters` jitted dispatches of fn(*args); returns mean ms.

    batch: when given, also prints batch/dt samples/s.
    """
    import jax
    import jax.numpy as jnp

    jit_fn = jax.jit(fn)
    digest = jax.jit(lambda y: sum(jnp.sum(t.astype(jnp.float32))
                                   for t in jax.tree_util.tree_leaves(y)
                                   if hasattr(t, "astype")))
    r = jit_fn(*args)
    np.asarray(digest(r))
    r = jit_fn(*args)
    np.asarray(digest(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jit_fn(*args)
    np.asarray(digest(r))
    ms = (time.perf_counter() - t0) / iters * 1000
    extra = f"   {batch / (ms / 1000):7.1f} samples/s" if batch else ""
    print(f"{name:{width}s} {ms:8.2f} ms{extra}", flush=True)
    return ms
