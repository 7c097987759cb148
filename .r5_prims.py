"""Round-5 fragment-stream primitives: measure the XLA building blocks a
pixel-key-sorted fragment raster would stand on, BEFORE building it
(VERDICT r4 item 1; CLAUDE.md: A/B on hardware before believing op-count
math).

The candidate pipeline at 2M tris / 1080p replaces binning (7.8 ms) +
stream gather (5.0) + fold (27.6) = 40.4 ms with:
  emission (Pallas, ~1-2 est) + SORT(key=pixel u32, z f32, eid u32)
  + SEGMENTED first-winner max-scan + frame write (scatter OR 2nd sort).
Budget ~1.5 entries/tri -> N ~ 3-4M fragment slots. Each primitive is
timed in-graph (lax.scan, carry-varied inputs, single fetch; medians).

Primitives:
  sort1/sort2/sort3 @ 2M/4M/8M  - lax.sort with 1/2/3 operands
  segscan @ 4M                  - Hillis-Steele (z, eid) within key runs,
                                  strict-greater + first-winner ties
  scatter_set1/set8/max1 @ 3M -> 2M-px frame - .at[idx] forms
  ssorted @ 4M/2M               - searchsorted(sorted keys, sorted queries)
  batched_sort                  - (135, 33k) minor-axis sort vs flat 4.5M
                                  (the radix-partition question: do many
                                  small sorts beat one big one, ignoring
                                  partition cost entirely)
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

print("device:", jax.devices()[0], flush=True)

P = 1080 * 1920  # frame pixels
REPS_IN_SCAN = 8


def timed(fn, *args, label=""):
    out = fn(*args)
    _ = float(out)
    ts = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3 / REPS_IN_SCAN)
    return sorted(ts)[2]


def scanify(body):
    """Run body REPS times inside one jit with a chained carry; body takes
    (i32 salt) and returns f32 check."""
    @jax.jit
    def fn(*args):
        def step(carry, i):
            salt = i + (carry * jnp.float32(1e-30)).astype(jnp.int32)
            return carry + body(salt, *args) * jnp.float32(1e-20), 0
        c, _ = jax.lax.scan(
            step, jnp.float32(0.0), jnp.arange(REPS_IN_SCAN)
        )
        return c
    return fn


rng = np.random.default_rng(0)
results = {}

# ---- sorts ----------------------------------------------------------------
for n in (2_000_000, 4_000_000, 8_000_000):
    keys = jnp.asarray(rng.integers(0, P, n, dtype=np.uint32))
    zf = jnp.asarray(rng.random(n, dtype=np.float32))
    eid = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))

    def s1(salt, keys=keys):
        k = keys ^ salt.astype(jnp.uint32)
        (sk,) = jax.lax.sort((k,), num_keys=1, is_stable=False)
        return jnp.sum(sk.astype(jnp.float32) * jnp.float32(1e-12))

    def s2(salt, keys=keys, zf=zf):
        k = keys ^ salt.astype(jnp.uint32)
        sk, sz = jax.lax.sort((k, zf), num_keys=1, is_stable=True)
        return jnp.sum(sk.astype(jnp.float32) * jnp.float32(1e-12)) + (
            jnp.sum(sz * jnp.float32(1e-12))
        )

    def s3(salt, keys=keys, zf=zf, eid=eid):
        k = keys ^ salt.astype(jnp.uint32)
        sk, sz, se = jax.lax.sort((k, zf, eid), num_keys=1, is_stable=True)
        return (
            jnp.sum(sk.astype(jnp.float32) * jnp.float32(1e-12))
            + jnp.sum(sz * jnp.float32(1e-12))
            + jnp.sum(se.astype(jnp.float32) * jnp.float32(1e-12))
        )

    for name, body in (("sort1", s1), ("sort2", s2), ("sort3", s3)):
        ms = timed(scanify(body))
        results[f"{name}@{n//1_000_000}M"] = round(ms, 2)
        print(f"{name}@{n}: {ms:.2f} ms", flush=True)

# ---- segmented first-winner scan @4M --------------------------------------
n = 4_000_000
keys_np = np.sort(rng.integers(0, P, n, dtype=np.uint32))
keys_s = jnp.asarray(keys_np)
zf = jnp.asarray(rng.random(n, dtype=np.float32))
eid = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))


def make_segscan(max_d):
    def segscan(salt, ks, zf, eid):
        # keys ride as a jit ARGUMENT (not a baked constant) so XLA cannot
        # constant-fold the key rolls/compares out of the measurement.
        k = ks + salt.astype(jnp.uint32) * jnp.uint32(0)
        z = zf + salt.astype(jnp.float32) * jnp.float32(1e-20)
        e = eid
        d = 1
        while d < max_d:
            same = k == jnp.roll(k, d)
            idx_ok = jnp.arange(n) >= d
            same = same & idx_ok
            zp = jnp.roll(z, d)
            ep = jnp.roll(e, d)
            take = same & (zp >= z)  # earlier wins ties (first-writer)
            z = jnp.where(take, zp, z)
            e = jnp.where(take, ep, e)
            d *= 2
        return jnp.sum(z * jnp.float32(1e-12)) + jnp.sum(
            e.astype(jnp.float32) * jnp.float32(1e-12)
        )
    return segscan


for max_d, tag in ((n, "full22"), (128, "cap128")):
    ms = timed(scanify(make_segscan(max_d)), keys_s, zf, eid)
    results[f"segscan@4M_{tag}"] = round(ms, 2)
    print(f"segscan@4M_{tag}:", ms, flush=True)

# ---- scatters @3M -> 2M frame --------------------------------------------
n = 3_000_000
idx = jnp.asarray(rng.integers(0, P, n, dtype=np.int32))
vals1 = jnp.asarray(rng.random(n, dtype=np.float32))
vals8 = jnp.asarray(rng.random((n, 8), dtype=np.float32))


def sc_set1(salt, idx=idx, vals1=vals1):
    v = vals1 + salt.astype(jnp.float32) * jnp.float32(1e-20)
    out = jnp.zeros((P,), jnp.float32).at[idx].set(v, mode="drop")
    return jnp.sum(out * jnp.float32(1e-12))


def sc_set8(salt, idx=idx, vals8=vals8):
    v = vals8 + salt.astype(jnp.float32) * jnp.float32(1e-20)
    out = jnp.zeros((P, 8), jnp.float32).at[idx].set(v, mode="drop")
    return jnp.sum(out * jnp.float32(1e-12))


def sc_max1(salt, idx=idx, vals1=vals1):
    v = vals1 + salt.astype(jnp.float32) * jnp.float32(1e-20)
    out = jnp.full((P,), -3.0e38, jnp.float32).at[idx].max(v, mode="drop")
    return jnp.sum(jnp.where(out > -3.0e38, out, 0.0) * jnp.float32(1e-12))


for name, body in (("scatter_set1", sc_set1), ("scatter_set8", sc_set8),
                   ("scatter_max1", sc_max1)):
    ms = timed(scanify(body))
    results[f"{name}@3M"] = round(ms, 2)
    print(f"{name}@3M: {ms:.2f} ms", flush=True)

# ---- searchsorted: 4M sorted keys, 2M sorted queries ----------------------
q = jnp.arange(P, dtype=jnp.uint32)


def ssorted(salt, keys_s=keys_s, q=q):
    k = keys_s  # already sorted; salt only perturbs the consume
    pos = jnp.searchsorted(k, q, side="left")
    return jnp.sum(pos.astype(jnp.float32) * jnp.float32(1e-12)) + (
        salt.astype(jnp.float32) * jnp.float32(1e-20)
    )


ms = timed(scanify(ssorted))
results["searchsorted@4Mx2M"] = round(ms, 2)
print("searchsorted:", ms, flush=True)

# ---- batched minor-axis sort (radix-partition upper bound) ---------------
rows, per = 135, 33_000
flat = jnp.asarray(rng.integers(0, 1 << 20, rows * per, dtype=np.uint32))
mat = flat.reshape(rows, per)


def b_flat(salt, flat=flat):
    k = flat ^ salt.astype(jnp.uint32)
    (sk,) = jax.lax.sort((k,), num_keys=1, is_stable=False)
    return jnp.sum(sk.astype(jnp.float32) * jnp.float32(1e-12))


def b_rows(salt, mat=mat):
    k = mat ^ salt.astype(jnp.uint32)
    sk = jax.lax.sort(k, dimension=1, is_stable=False)
    return jnp.sum(sk.astype(jnp.float32) * jnp.float32(1e-12))


for name, body in (("sort_flat@4.5M", b_flat), ("sort_rows@135x33k", b_rows)):
    ms = timed(scanify(body))
    results[name] = round(ms, 2)
    print(f"{name}: {ms:.2f} ms", flush=True)

print(json.dumps(results), flush=True)
