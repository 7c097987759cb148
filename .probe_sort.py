"""Microbench: binning-sort building blocks on the real chip.

Decision inputs for the 2M-triangle split-2 question (packed u32 key no
longer fits there -> pair sort) and the entry-compaction idea:
  - packed u32 sort of N entries vs pair (u32 key + i32 payload) sort
  - cumsum over N i32 (compaction position computation)
  - elementwise scatter of M kept entries into a budget array
All in ONE process, compiled first, interleaved reps (CLAUDE.md rules).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)

SIZES = tuple(
    int(s) for s in os.environ.get("PROBE_T", "1000000,2000000").split(",")
)


def timeit(fn, *args, reps=5, inner=4):
    # fn is jitted over a scan of `inner` chained iterations.
    @jax.jit
    def run(x):
        def body(carry, _):
            out = fn(x, carry)
            return out, 0
        return jax.lax.scan(body, jnp.uint32(0), None, length=inner)[0]

    _ = run(*args).block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = run(*args).block_until_ready()
        ts.append((time.perf_counter() - t0) / inner * 1e3)
    return round(sorted(ts)[len(ts) // 2], 2)


for T in SIZES:
    N = 4 * T  # expansion-4 entry count
    key = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)
    payload = jnp.arange(N, dtype=jnp.int32)

    def sort_packed(k, carry):
        kk = k ^ carry  # vary input per iteration (defeat caching)
        (s,) = jax.lax.sort((kk,), num_keys=1, is_stable=False)
        return s[0] + s[-1] + carry

    def sort_pair(k, carry):
        kk = k ^ carry
        s, p = jax.lax.sort((kk, payload), num_keys=1, is_stable=True)
        return s[0] + p[-1].astype(jnp.uint32) + carry

    def cumsum_only(k, carry):
        kk = (k ^ carry) & jnp.uint32(1)
        c = jnp.cumsum(kk.astype(jnp.int32))
        return c[-1].astype(jnp.uint32) + carry

    def compact_scatter(k, carry):
        kk = k ^ carry
        keepm = (kk & jnp.uint32(3)) == 0  # ~25% kept ~ real-entry frac
        pos = jnp.cumsum(keepm.astype(jnp.int32)) - 1
        budget = (3 * T) // 2
        tgt = jnp.where(keepm & (pos < budget), pos, budget)
        out = jnp.zeros((budget + 1,), jnp.uint32)
        out = out.at[tgt].set(kk, mode="drop")
        return out[0] + out[-2] + carry

    res = {"N": N}
    for name, fn in (("sort_packed", sort_packed),
                     ("sort_pair", sort_pair),
                     ("cumsum", cumsum_only),
                     ("compact_scatter", compact_scatter)):
        res[name + "_ms"] = timeit(fn, key)
    print(json.dumps(res), flush=True)
