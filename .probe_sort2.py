"""Microbench: the rows-binning sort shapes on the real chip.

probe_binrows measured the two per-stream sorts at ~19.3 ms for
2 x 2M u32 keys (4.8 ns/key) while probe_sort measured one 8M-key sort
at 14 ms (1.75 ns/key) — consistent with a ~5 ms fixed overhead per
lax.sort CALL. If real, batching the two streams into ONE (2, N)
axis-sort halves that overhead. Shapes probed (all u32, unstable,
full-sum consume, carry-varied inputs, interleaved reps):

  a) two (N,) sorts        — the shipped rows2 form
  b) one (2, N) axis sort  — batched streams
  c) one (2N,) sort        — combined length (key width permitting)
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


def consume(*arrays):
    return sum(jnp.sum(a.astype(jnp.float32) * jnp.float32(1e-12))
               for a in arrays)


def make_loop(fn):
    @jax.jit
    def run(x):
        def body(carry, _):
            return fn(x, carry), 0
        return jax.lax.scan(body, jnp.float32(0.0), None, length=INNER)[0]
    return run


for N in SIZES:
    k2 = jax.device_put(
        jax.random.bits(jax.random.PRNGKey(0), (2, N), dtype=jnp.uint32)
    )

    def two_sorts(k, carry):
        kk = k ^ carry.astype(jnp.uint32)
        outs = [jax.lax.sort((kk[i],), num_keys=1, is_stable=False)[0]
                for i in range(2)]
        return consume(*outs) + carry

    def axis_sort(k, carry):
        kk = k ^ carry.astype(jnp.uint32)
        s = jax.lax.sort((kk,), dimension=1, num_keys=1, is_stable=False)[0]
        return consume(s) + carry

    def one_sort(k, carry):
        kk = (k ^ carry.astype(jnp.uint32)).reshape(-1)
        s = jax.lax.sort((kk,), num_keys=1, is_stable=False)[0]
        return consume(s) + carry

    loops = {name: make_loop(fn) for name, fn in
             (("two_sorts", two_sorts), ("axis_sort", axis_sort),
              ("one_sort", one_sort))}
    for run in loops.values():  # compile + warm all first
        _ = float(run(k2))
    res = {name: [] for name in loops}
    for rep in range(5):
        for name, run in loops.items():
            t0 = time.perf_counter()
            _ = float(run(k2))
            res[name].append((time.perf_counter() - t0) / INNER * 1e3)
    print(json.dumps({
        "N_per_stream": N,
        **{name + "_ms": round(sorted(v)[2], 2) for name, v in res.items()},
        "all": {name: [round(x, 1) for x in v] for name, v in res.items()},
    }), flush=True)
