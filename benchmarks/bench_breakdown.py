"""Step-time breakdown for the canonical DCNv2 config: forward / fwd+bwd /
full train step, plus matmul-only and embedding-only variants. Identifies the
bottleneck before kernel work. Run on hardware."""

from __future__ import annotations

import time

import numpy as np


def timeit(fn, *args, iters=30):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from map_tpu import models
    from map_tpu.config import Config, TrainingArguments
    from map_tpu.train import train_step as ts
    from map_tpu.train.optimizer import build_optimizer

    b, f, v = 4096, 24, 1_000_000
    cfg = Config(model_name="dcnv2", input_size=v, num_fields=f, embed_size=16,
                 hidden_size=1000, num_hidden_layers=3, hidden_act="relu",
                 hidden_dropout_rate=0.0, num_cross_layers=3, pretrain=False,
                 embed_norm=False, layer_norm_eps=1e-12, embed_dropout_rate=0.0,
                 use_pallas=False)
    args = TrainingArguments(output_dir="/tmp/bb", learning_rate=1e-3,
                             weight_decay=0.1, lr_sched="const",
                             warmup_ratio=0.0, max_grad_norm=0.0)
    model = models.from_config(cfg)
    tx, _ = build_optimizer(args, 1000, 0)
    rng = np.random.default_rng(0)
    batch = {"input_ids": np.asarray(rng.integers(10, v, (b, f)), np.int32),
             "labels": rng.integers(0, 2, b).astype(np.float32),
             "weight": np.ones(b, np.float32)}
    state = ts.create_train_state(model, cfg, args, tx, jax.random.PRNGKey(0), batch)
    variables = {"params": state.params}
    dbatch = jax.device_put(batch)
    ids = dbatch["input_ids"]

    fwd = jax.jit(lambda p, i: model.apply({"params": p}, i))
    print(f"forward:        {timeit(fwd, state.params, ids) * 1e3:7.2f} ms")

    def loss_fn(p, i, y, w):
        logits = model.apply({"params": p}, i, train=True,
                             rngs={"dropout": jax.random.PRNGKey(0)})
        from map_tpu.objectives.supervised import bce_loss
        return bce_loss(logits, y, w)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g = grad_fn(state.params, ids, dbatch["labels"], dbatch["weight"])
    print(f"fwd+bwd:        {timeit(grad_fn, state.params, ids, dbatch['labels'], dbatch['weight']) * 1e3:7.2f} ms")

    upd = jax.jit(lambda g, s, p: tx.update(g, s, p))
    print(f"optimizer:      {timeit(upd, g, state.opt_state, state.params) * 1e3:7.2f} ms")

    emb = jnp.array(state.params["embed"]["embedding"])  # copy before donation

    step, _ = ts.make_supervised_steps(model, cfg, args, tx, jax.random.PRNGKey(1))
    s2 = state
    s2, m = step(s2, dbatch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(30):
        s2, m = step(s2, dbatch)
    float(m["loss"])
    print(f"full step:      {(time.perf_counter() - t0) / 30 * 1e3:7.2f} ms")

    # components
    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    print(f"emb gather:     {timeit(take, emb, ids) * 1e3:7.2f} ms")

    gsc = jax.jit(lambda g_, i: jnp.zeros((v, 16), jnp.float32).at[i.reshape(-1)].add(
        g_.reshape(-1, 16)).sum())
    gflat = jnp.ones((b, f, 16), jnp.float32)
    print(f"emb scatteradd: {timeit(gsc, gflat, ids) * 1e3:7.2f} ms")

    x = jnp.ones((b, 384), jnp.float32)
    w1 = jnp.ones((384, 1000), jnp.float32)
    w2 = jnp.ones((1000, 1000), jnp.float32)

    def mlp(x, w1, w2):
        h = x @ w1
        h = h @ w2
        h = h @ w2
        return h.sum()

    print(f"mlp fwd only:   {timeit(jax.jit(mlp), x, w1, w2) * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
