"""Probe: does the (T, exp).reshape(-1) key emission tax the sort?

probe_binrows measured the rows-path sorts at 19.3/38.3 ms @1M/2M while
probe_sort2 measured identical-size standalone sorts at 9.7/14.0 ms.
Suspect: the emission layout. entry keys are built as (T, 2) arrays
(2 valid lanes per 128-lane tile) and .reshape(-1) before lax.sort —
a cross-lane relayout the emit prefix never paid because jnp.sum
consumes the UN-reshaped producer. The sort, though, must materialize
the (2T,) operand.

Variants (same key multiset, so the sorted result is identical):
  a) reshape  — (T, 2).reshape(-1)              [shipped form]
  b) concat   — two (T,) arrays, jnp.concatenate
  c) reshape2T— (2, T).reshape(-1) (row-major, lane-friendly)

Interleaved reps in ONE process, full-sum consume of the SORTED keys,
carry-varied inputs (CLAUDE.md timing rules).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)

SIZES = tuple(
    int(s) for s in os.environ.get("PROBE_N", "2000000,4000000").split(",")
)
INNER = 4
TRI_BITS = 21
NFB = 2026


def consume(*arrays):
    return sum(jnp.sum(a.astype(jnp.float32) * jnp.float32(1e-12))
               for a in arrays)


def make_loop(fn):
    @jax.jit
    def run(tile0, tile1, tri, carry0):
        def body(carry, _):
            return fn(tile0, tile1, tri, carry), 0
        return jax.lax.scan(body, carry0, None, length=INNER)[0]
    return run


for N in SIZES:
    key = jax.random.PRNGKey(1)
    k0, k1 = jax.random.split(key)
    # tile ids in [0, NFB], skewed like real bins (half sentinel)
    tile0 = jax.device_put(
        jax.random.randint(k0, (N,), 0, NFB + 1, dtype=jnp.int32))
    tile1 = jax.device_put(
        jax.random.randint(k1, (N,), 0, NFB + 1, dtype=jnp.int32))
    tri = jax.device_put(jnp.arange(N, dtype=jnp.int32))

    def _sort_consume(k, carry):
        (s,) = jax.lax.sort((k,), num_keys=1, is_stable=False)
        return consume(s) + carry

    def v_reshape(tile0, tile1, tri, carry):
        c = carry.astype(jnp.int32)
        t2 = jnp.stack([tile0 ^ (c & 1), tile1 ^ (c & 1)], axis=1)  # (T,2)
        tri2 = jnp.broadcast_to(tri[:, None], (N, 2))
        k = ((t2.astype(jnp.uint32) << TRI_BITS)
             | tri2.astype(jnp.uint32)).reshape(-1)
        return _sort_consume(k, carry)

    def v_concat(tile0, tile1, tri, carry):
        c = carry.astype(jnp.int32)
        ks = [((t ^ (c & 1)).astype(jnp.uint32) << TRI_BITS)
              | tri.astype(jnp.uint32) for t in (tile0, tile1)]
        return _sort_consume(jnp.concatenate(ks), carry)

    def v_reshape2T(tile0, tile1, tri, carry):
        c = carry.astype(jnp.int32)
        t2 = jnp.stack([tile0 ^ (c & 1), tile1 ^ (c & 1)], axis=0)  # (2,T)
        tri2 = jnp.broadcast_to(tri[None, :], (2, N))
        k = ((t2.astype(jnp.uint32) << TRI_BITS)
             | tri2.astype(jnp.uint32)).reshape(-1)
        return _sort_consume(k, carry)

    loops = {n: make_loop(f) for n, f in
             (("reshape", v_reshape), ("concat", v_concat),
              ("reshape2T", v_reshape2T))}
    carry0 = jnp.float32(0.0)
    for run in loops.values():
        _ = float(run(tile0, tile1, tri, carry0))
    res = {n: [] for n in loops}
    for rep in range(5):
        for n, run in loops.items():
            t0 = time.perf_counter()
            _ = float(run(tile0, tile1, tri, carry0))
            res[n].append((time.perf_counter() - t0) / INNER * 1e3)
    print(json.dumps({
        "N_keys": 2 * N,
        **{n + "_ms": round(sorted(v)[2], 2) for n, v in res.items()},
        "all": {n: [round(x, 1) for x in v] for n, v in res.items()},
    }), flush=True)
