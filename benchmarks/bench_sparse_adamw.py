"""Standalone chip A/B of the sparse-stream fused AdamW kernel vs the dense
path it replaces, at the canonical pf-shared decoder geometry (R=253,952
packed rows, 28.7k-entry target stream, 600-entry noise stream, Zipf ids).

Measures, amortized over a lax.fori_loop of ITERS kernel calls per dispatch
(the tunnel's ~1.2 ms dispatch would otherwise dominate):
  dense_kernel      fused_adamw_dense on a PREBUILT dense grad (floor: the
                    mandatory 7-access table pass)
  dense_path        scatter compact stream -> dense grad -> dense kernel
                    (what the production step pays today)
  sparse_kernel     sparse_fused_adamw on the PREBUILT encoding
  sparse_path       encode (expand+concat) -> sparse kernel

Usage: python benchmarks/bench_sparse_adamw.py [variant ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 30


def zipf_unique_sorted(rng, n_draw, n_slots, vocab):
    raw = np.minimum((rng.pareto(1.1, size=n_draw) * 2000).astype(np.int64),
                     vocab - 1)
    uniq = np.unique(raw)[: n_slots - 1]
    c = len(uniq)
    ids = np.concatenate([uniq, np.full(n_slots - c, vocab, np.int64)])
    return ids.astype(np.int32), c


def main():
    import jax
    import jax.numpy as jnp

    from map_tpu.ops import sparse_adamw as sa
    from map_tpu.ops.fused_adamw import fused_adamw_dense, pack_scalars
    from map_tpu.ops.packed_table import expand_to_packed, packed_shape

    which = set(sys.argv[1:]) or {"dense_kernel", "dense_path",
                                  "sparse_kernel", "sparse_path"}
    v = 1013819
    pe = 4  # proj_size 32
    rows, width = packed_shape(v, 32)
    n_t, n_n = 28672, 600
    rng = np.random.default_rng(0)
    t_ids, ct = zipf_unique_sorted(rng, 8 * n_t, n_t, v)
    n_ids, cn = zipf_unique_sorted(rng, 4 * n_n, n_n, v)
    print(f"rows={rows} target uniques={ct} noise uniques={cn}",
          file=sys.stderr)
    t_vals = rng.standard_normal((n_t, 32)).astype(np.float32)
    t_vals[ct:] = 0
    n_vals = rng.standard_normal((n_n, 32)).astype(np.float32)
    n_vals[cn:] = 0
    p, mu = (jnp.asarray(rng.standard_normal((rows, width)) * 0.01,
                         jnp.float32) for _ in range(2))
    nu = jnp.abs(jnp.asarray(rng.standard_normal((rows, width)) * 1e-4,
                             jnp.float32))
    scalars = pack_scalars(1e-3, 0.05, 0.9, 0.999, 1e-8, 3.0)
    t_ids_j, n_ids_j = jnp.asarray(t_ids), jnp.asarray(n_ids)
    t_vals_j, n_vals_j = jnp.asarray(t_vals), jnp.asarray(n_vals)

    sa.enable(True)
    plan = sa.pf_plan(rows, width, pe, n_t, n_n)
    assert plan is not None, (rows, n_t)
    print(f"plan: {plan} tile={sa.TILE_ROWS}", file=sys.stderr)

    def build_dense_grad():
        g = jnp.zeros((rows, width), jnp.float32)
        for ids, vals in ((t_ids_j, t_vals_j), (n_ids_j, n_vals_j)):
            phys = jnp.where(ids < v, ids // pe, rows)
            wide = expand_to_packed(vals, jnp.where(ids < v, ids % pe, 0), pe)
            g = g.at[phys].add(wide, mode="drop", indices_are_sorted=True)
        return g

    def build_enc():
        tp = jnp.where(t_ids_j < v, t_ids_j // pe, rows)
        np_ = jnp.where(n_ids_j < v, n_ids_j // pe, rows)
        return (sa.encode_target(t_vals_j,
                                 jnp.where(t_ids_j < v, t_ids_j % pe, 0),
                                 tp, plan)
                + sa.encode_noise(n_vals_j,
                                  jnp.where(n_ids_j < v, n_ids_j % pe, 0),
                                  np_, plan))

    g_dense = jax.jit(build_dense_grad)()
    enc = jax.jit(build_enc)()
    g_dense.block_until_ready()
    enc.block_until_ready()

    def loop(body):
        def run(p0, mu0, nu0):
            def it(_, carry):
                return body(*carry)
            return jax.lax.fori_loop(0, ITERS, it, (p0, mu0, nu0))
        return jax.jit(run)

    variants = {}
    if "xla_adamw" in which:
        variants["xla_adamw"] = loop(
            lambda p0, mu0, nu0: fused_adamw_dense(p0, mu0, nu0, g_dense,
                                                   scalars, force_xla=True))
    if "copy_floor" in which:
        # same HBM traffic, no math: the floor for any 7-access pass
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        r, w = p.shape
        tt = 512

        def ck(g_ref, p_ref, mu_ref, nu_ref, po, muo, nuo):
            po[:] = p_ref[:] + g_ref[:]
            muo[:] = mu_ref[:]
            nuo[:] = nu_ref[:]

        tile = lambda: pl.BlockSpec((tt, w), lambda i: (i, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)
        cp = pl.pallas_call(
            ck, grid=(r // tt,),
            in_specs=[tile()] * 4, out_specs=[tile()] * 3,
            out_shape=[jax.ShapeDtypeStruct((r, w), jnp.float32)] * 3,
            input_output_aliases={1: 0, 2: 1, 3: 2})
        variants["copy_floor"] = loop(
            lambda p0, mu0, nu0: cp(g_dense, p0, mu0, nu0))
    if "dense_kernel" in which:
        variants["dense_kernel"] = loop(
            lambda p0, mu0, nu0: fused_adamw_dense(p0, mu0, nu0, g_dense,
                                                   scalars))
    if "dense_path" in which:
        variants["dense_path"] = loop(
            lambda p0, mu0, nu0: fused_adamw_dense(p0, mu0, nu0,
                                                   build_dense_grad(),
                                                   scalars))
    if "sparse_kernel" in which:
        variants["sparse_kernel"] = loop(
            lambda p0, mu0, nu0: sa.sparse_fused_adamw(
                p0, mu0, nu0, enc, scalars, plan.c_enc, plan.n_enc,
                plan.wblk))
    if "sparse_path" in which:
        variants["sparse_path"] = loop(
            lambda p0, mu0, nu0: sa.sparse_fused_adamw(
                p0, mu0, nu0, build_enc(), scalars, plan.c_enc, plan.n_enc,
                plan.wblk))

    for name, fn in variants.items():
        out = fn(p, mu, nu)          # compile + warm
        float(out[0][0, 0])          # host fetch barrier
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(p, mu, nu)
            float(out[0][0, 0])
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{name:14s} {best * 1e3:7.3f} ms/call", flush=True)

    # exactness spot-check: sparse kernel vs dense math on the same stream
    if {"dense_kernel", "sparse_kernel"} <= which:
        a = fused_adamw_dense(p, mu, nu, g_dense, scalars)
        b = sa.sparse_fused_adamw(p, mu, nu, enc, scalars, plan.c_enc,
                                  plan.n_enc, plan.wblk)
        d = max(float(jnp.abs(x - y).max()) for x, y in zip(a, b))
        print(f"max |dense-sparse| = {d:.3e}", file=sys.stderr)


if __name__ == "__main__":
    main()
