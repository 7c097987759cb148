"""Microbench: the sorted-path record-row gather under different index
distributions, on the real chip.

The stream stage is ONE row gather `recs[sorted_tri]` over the static
entry budget (~13 ns/row measured round 2). At 2M triangles the budget is
3M rows (~40 ms) but only ~total_real (~1.2 per visible triangle) are
live — the tail gathers arbitrary record rows nobody reads. If duplicate
or clustered indices are cheaper (DMA coalescing / caching), masking the
dead tail to row 0 — or even sorting being naturally clustered — is a
free win; if not, the only stream lever is the budget itself.

Arms (same (T,128) f32 row-major table, same budget-length index vector):
  rand   — uniform random rows (worst case, today's upper bound)
  dead0  — last third masked to row 0 (the GATHER_MASK_DEAD candidate)
  allz   — every index 0 (pure duplicate-row floor)
  sorted — sorted random indices (clustered/ascending, the real stream's
           per-tile locality is between rand and this)
One process, all arms compiled first, interleaved reps (CLAUDE.md rules).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)

SIZES = tuple(
    int(s) for s in os.environ.get("PROBE_T", "250000,2000000").split(",")
)


def timeit(fn, *args, reps=5, inner=4):
    @jax.jit
    def run(x, idx):
        def body(carry, _):
            out = fn(x, idx, carry)
            return out, 0
        return jax.lax.scan(body, jnp.float32(0.0), None, length=inner)[0]

    # float() fetch, NOT block_until_ready: the tunneled runtime's
    # block_until_ready can return before execution (CLAUDE.md).
    _ = float(run(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(*args))
        ts.append((time.perf_counter() - t0) / inner * 1e3)
    return round(sorted(ts)[len(ts) // 2], 2)


for T in SIZES:
    budget = (3 * T) // 2
    table = jax.random.normal(jax.random.PRNGKey(1), (T, 128), jnp.float32)
    base = jax.random.randint(
        jax.random.PRNGKey(2), (budget,), 0, T, jnp.int32
    )
    dead = jnp.where(
        jnp.arange(budget) < (2 * budget) // 3, base, 0
    )
    allz = jnp.zeros((budget,), jnp.int32)
    srt = jnp.sort(base)

    def gather(x, idx, carry):
        # vary EVERY index per iteration (adding the carry's low bit) so
        # loop-invariant code motion can't hoist any part of the gather
        # out of the scan; the +0/+1 shift preserves each arm's index
        # distribution (dup-heavy stays dup-heavy, sorted stays sorted)
        i = jnp.minimum(
            idx + (carry.astype(jnp.int32) & 1), jnp.int32(x.shape[0] - 1)
        )
        g = x[i]
        # consume EVERY gathered lane: the first version of this probe
        # returned g[0,0] + g[-1,-1] and XLA narrowed the gather to TWO
        # rows (0.01 ns/row "measured" — physically impossible). The
        # full-sum consumption adds one budget x 128 reduce, identical
        # across arms.
        return carry + jnp.sum(g) * jnp.float32(1e-20) + jnp.float32(1e-9)

    res = {"T": T, "budget": budget}
    for name, idx in (("rand", base), ("dead0", dead),
                      ("allz", allz), ("sorted", srt)):
        ms = timeit(gather, table, idx)
        res[name + "_ms"] = ms
        res[name + "_ns_per_row"] = round(ms * 1e6 / budget, 2)
    print(json.dumps(res), flush=True)
