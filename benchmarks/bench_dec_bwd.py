"""Isolate the MFP per-field-shared decoder BACKWARD cost (sg ablation says
3.8 ms — benchmarks/bench_pf_parts.py — for a 28.7k-row target stream into
the packed (250k+, 128) decoder table; the 98k-row input scatter costs only
~1.3 ms in-step). Each candidate op is fori_loop-amortized in ONE dispatch
(tunnel dispatch ~1.2 ms)."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B, M, K = 4096, 7, 25
N = B * M              # 28672 target positions
E = 32                 # proj
V = 1_006_698          # ~canonical vocab
ITERS = 20


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1].sum(), out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1].sum(), out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt * 1e3:8.3f} ms", flush=True)


def loop(body):
    def run(c0, *rest):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: body(i, c, *rest), c0)

    return run


def main():
    from map_tpu.ops.packed_table import pack_table, packed_lookup

    rng = np.random.default_rng(0)
    # Zipf-ish target ids (the NCE targets are unigram-distributed)
    zipf = (rng.zipf(1.3, size=N).astype(np.int64) % V).astype(np.int32)
    ids = jnp.asarray(zipf)
    packed = jnp.asarray(pack_table(
        jnp.asarray(rng.standard_normal((V, E)), jnp.float32), E))
    pr = packed.shape[0]
    cot32 = jnp.asarray(rng.standard_normal((N, E)), jnp.float32)
    cot128 = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)
    bias_packed = jnp.asarray(pack_table(
        jnp.asarray(rng.standard_normal((V, 1)), jnp.float32), 1))
    cot1 = jnp.asarray(rng.standard_normal(N), jnp.float32)

    # 1. forward packed lookup only
    bench("fwd packed_lookup 28.7k",
          loop(lambda i, c, p, s: c + packed_lookup(p, s + i, E).sum()),
          jnp.zeros(()), packed, ids)

    # 2. raw 128-wide scatter-add into a fresh (pr,128) buffer
    def raw_scatter(i, c, s, g):
        z = jnp.zeros((pr, 128), jnp.float32).at[(s + i) // 4].add(g)
        return c + z[0, 0]

    bench("raw scatter 28.7k x128 into (pr,128)",
          loop(raw_scatter), jnp.zeros(()), ids, cot128)

    # 3. full packed_lookup VJP (what the step's backward runs)
    def lk_grad(i, c, p, s, g):
        gp = jax.grad(lambda pp: jnp.sum(packed_lookup(pp, s + i, E) * g))(p)
        return c + gp[0, 0]

    bench("packed_lookup grad (emb path)",
          loop(lk_grad), jnp.zeros(()), packed, ids, cot32)

    # 4. bias path VJP: 1-wide lane select backward (p=128 expand)
    def bias_grad(i, c, p, s, g):
        gp = jax.grad(
            lambda pp: jnp.sum(packed_lookup(pp, s + i, 1)[..., 0] * g))(p)
        return c + gp[0, 0]

    bench("packed_lookup grad (bias path p=128)",
          loop(bias_grad), jnp.zeros(()), bias_packed, ids, cot1)

    # 5. emb + bias + 600-row noise grads together (the full decoder bwd)
    nf = jnp.asarray(rng.integers(0, V, 600, dtype=np.int64).astype(np.int32))
    cotn = jnp.asarray(rng.standard_normal((600, E)), jnp.float32)

    def all_grads(i, c, p, bp, s, g, gb):
        def f(pp, bb):
            t = jnp.sum(packed_lookup(pp, s + i, E) * g)
            t += jnp.sum(packed_lookup(bb, s + i, 1)[..., 0] * gb)
            t += jnp.sum(packed_lookup(pp, nf, E) * cotn)
            return t

        gp, gbp = jax.grad(f, argnums=(0, 1))(p, bp)
        return c + gp[0, 0] + gbp[0, 0]

    bench("decoder bwd total (emb+bias+noise)",
          loop(all_grads), jnp.zeros(()), packed, bias_packed, ids, cot32,
          cot1)

    # 6. dedup candidate: sort + segment-fold + unique scatter at 28.7k
    def sorted_scatter(i, c, s, g):
        sk, sv = jax.lax.sort_key_val(s + i, jnp.arange(N, dtype=jnp.int32))
        gperm = jnp.take(g, sv, axis=0)
        z = jnp.zeros((pr, 128), jnp.float32).at[sk // 4].add(
            gperm, indices_are_sorted=True)
        return c + z[0, 0]

    bench("sorted scatter (sort+permute+sorted add)",
          loop(sorted_scatter), jnp.zeros(()), ids, cot128)


if __name__ == "__main__":
    main()
