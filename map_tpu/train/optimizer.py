"""Optimizer factory: AdamW with decoupled weight decay and a no-decay mask.

Parity: reference `code/trainer.py:60-85` — two param groups, weight decay on
everything except names containing "bias" / "LayerNorm.weight"; betas parsed
from a csv flag; optional global-norm gradient clipping applied before the
update (`trainer.py:137-140`). transformers' legacy AdamW applies
`p -= lr * wd * p` after the Adam step, which is exactly optax.adamw's
decoupled decay.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from map_tpu.train.schedules import make_schedule


def no_decay_mask(params: Any) -> Any:
    """True = apply weight decay. No decay for biases and norm scales.

    Mapping of the reference's name filter (trainer.py:61): torch "bias"
    substring -> our leaf names starting with 'bias' (Dense/Conv/GRU biases,
    LR bias, GraphLayer bias_p, CrossNetV2 bias_i, NCE decoder bias table,
    LayerNorm/BatchNorm bias); torch "LayerNorm.weight" -> our norm 'scale'.
    """
    flat = traverse_util.flatten_dict(params)

    def decay(path) -> bool:
        leaf = path[-1]
        if leaf.startswith("bias"):
            return False
        if leaf == "scale":  # LayerNorm / BatchNorm scale
            return False
        return True

    return traverse_util.unflatten_dict({k: decay(k) for k in flat})


def is_table_leaf(path, leaf) -> bool:
    """Vocabulary-table heuristic for the fused dense-AdamW partition — the
    SAME size-based test the sharding rules use (parallel/sharding.py), so
    the fused-update set and the row-sharded set coincide. Misclassification
    is harmless for the optimizer — the fused kernel computes the identical
    AdamW update (pinned vs optax in tests/test_fused_adamw.py)."""
    from map_tpu.parallel.sharding import is_vocab_table

    return is_vocab_table(path, leaf)


class Replace:
    """Update wrapper meaning 'set the param to value' instead of 'add'."""

    def __init__(self, value):
        self.value = value


jax.tree_util.register_pytree_node(
    Replace, lambda r: ((r.value,), None), lambda _, c: Replace(c[0]))


def apply_updates(params, updates):
    """optax.apply_updates plus Replace-wrapper support (PartitionedTx)."""
    return jax.tree_util.tree_map(
        lambda u, p: u.value if isinstance(u, Replace)
        else optax.apply_updates(p, u),
        updates, params, is_leaf=lambda x: isinstance(x, Replace))


class PartitionedTx:
    """optax-interface optimizer that routes vocabulary-table leaves through
    the fused one-pass Pallas AdamW (map_tpu.ops.fused_adamw) and everything
    else through optax.adamw. Updates for table leaves come back as
    Replace(new_param); use optimizer.apply_updates. State is
    (rest_state, table_moments, count) — a plain tuple, checkpoint/resume
    serializable like any optax state."""

    def __init__(self, schedule, b1, b2, eps, weight_decay):
        self.schedule = schedule
        self.b1, self.b2, self.eps = b1, b2, eps
        self.weight_decay = weight_decay
        self._rest = None  # built lazily against the param structure

    def _masks(self, params):
        table = jax.tree_util.tree_map_with_path(is_table_leaf, params)
        rest = jax.tree_util.tree_map(lambda t: not t, table)
        return table, rest

    def init(self, params):
        table_mask, rest_mask = self._masks(params)
        self._rest = optax.masked(
            optax.adamw(learning_rate=self.schedule, b1=self.b1, b2=self.b2,
                        eps=self.eps, weight_decay=self.weight_decay,
                        mask=no_decay_mask),
            rest_mask)
        rest_state = self._rest.init(params)
        table_state = jax.tree_util.tree_map(
            lambda is_t, p: (jnp.zeros_like(p), jnp.zeros_like(p))
            if is_t else optax.MaskedNode(),
            table_mask, params,
            is_leaf=lambda x: isinstance(x, bool))
        return (rest_state, table_state, jnp.zeros([], jnp.int32))

    def update(self, grads, state, params):
        from map_tpu.ops.fused_adamw import fused_adamw_dense, pack_scalars
        from map_tpu.parallel.context import table_mesh

        # row-sharded tables take the XLA form (shards elementwise for free;
        # a pallas_call would all-gather the table)
        force_xla = table_mesh() is not None
        rest_state, table_state, count = state
        if self._rest is None:  # e.g. after restoring state in a new process
            self.init(params)
        table_mask, _ = self._masks(params)
        decay_mask = no_decay_mask(params)
        updates, new_rest = self._rest.update(grads, rest_state, params)
        lr = self.schedule(count)
        ci = (count + 1).astype(jnp.float32)

        def leaf(path, is_t, decays, u, g, p, mom):
            if not is_t:
                return u, mom
            wd = self.weight_decay if decays else 0.0
            scalars = pack_scalars(lr, wd, self.b1, self.b2, self.eps, ci)
            # Sparse-stream handoff (ops/sparse_adamw): the NCE decoder's
            # 'emb' cotangent may arrive as an ENCODED compact stream —
            # recognized by (flag, registered shape, leaf name) so a same-
            # shaped dense-grad table can never be mis-decoded.
            from map_tpu.ops import sparse_adamw as sa

            meta = (sa.lookup(g.shape)
                    if sa.enabled() and not force_xla
                    and path and getattr(path[-1], "key", None) == "emb"
                    else None)
            if meta is not None:
                from map_tpu.ops.fused_adamw import _on_tpu

                new_p, mu, nu = sa.sparse_fused_adamw(
                    p, mom[0], mom[1], g.astype(jnp.float32), scalars,
                    meta.c_enc, meta.n_enc, meta.wblk,
                    interpret=not _on_tpu())
                return Replace(new_p), (mu, nu)
            new_p, mu, nu = fused_adamw_dense(p, mom[0], mom[1],
                                              g.astype(jnp.float32), scalars,
                                              force_xla=force_xla)
            return Replace(new_p), (mu, nu)

        flat_t, treedef = jax.tree_util.tree_flatten(table_mask)
        flat_paths = [pp for pp, _ in
                      jax.tree_util.tree_flatten_with_path(params)[0]]
        flat = [leaf(pp, t, d, u, g, p, m) for pp, t, d, u, g, p, m in zip(
            flat_paths,
            flat_t,
            jax.tree_util.tree_leaves(decay_mask),
            jax.tree_util.tree_leaves(updates),
            jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(params),
            treedef.flatten_up_to(table_state))]
        new_updates = jax.tree_util.tree_unflatten(
            treedef, [x[0] for x in flat])
        new_table = jax.tree_util.tree_unflatten(
            treedef, [x[1] for x in flat])
        return new_updates, (new_rest, new_table, count + 1)


def build_optimizer(args, num_training_steps: int, num_warmup_steps: int
                    ) -> optax.GradientTransformation:
    beta1, beta2 = (float(x) for x in args.adam_betas.split(","))
    schedule = make_schedule(args.lr_sched, args.learning_rate,
                             num_warmup_steps, num_training_steps)
    clip = bool(args.max_grad_norm and args.max_grad_norm > 0)
    if getattr(args, "fused_table_update", True) and not clip:
        # global-norm clipping needs every grad in one optax chain; the
        # canonical configs train unclipped (run_script/*.sh), so the fused
        # path is the default and clipping falls back to plain optax
        return PartitionedTx(schedule, beta1, beta2, args.adam_epsilon,
                             args.weight_decay), schedule
    tx = optax.adamw(
        learning_rate=schedule,
        b1=beta1,
        b2=beta2,
        eps=args.adam_epsilon,
        weight_decay=args.weight_decay,
        mask=no_decay_mask,
    )
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(args.max_grad_norm), tx)
    return tx, schedule
