"""One-off experiment: where do DiT-XL/2 two-phase step's 340ms go?

Times, on the current default device at batch 16:
  fwd      : one training-loss forward
  grad     : one value_and_grad of the loss (fwd + bwd)
  opt      : one adamw update + EMA lerp + mask multiply (no model math)
Compare 2*grad + opt against the measured two-phase step time.

Usage: python scripts/exp_dit_breakdown.py [policy]
"""
import dataclasses
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, n=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:8s} {dt * 1e3:8.1f} ms", flush=True)
    return dt


def main(policy: str = "full", batch: int = 16) -> None:
    import optax

    from uurg_tpu.core import tree as tr
    from uurg_tpu.train import make_optimizer
    from uurg_tpu.workloads.dit import DiTWorkload

    wl = DiTWorkload.build("DiT-XL/2")
    if policy == "none":
        wl = dataclasses.replace(wl, cfg=dataclasses.replace(wl.cfg, remat=False))
    elif policy != "full":
        wl = dataclasses.replace(
            wl, cfg=dataclasses.replace(wl.cfg, remat_policy=policy))
    params = wl.init_params(jax.random.key(0))
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    loss_fn = wl.train_loss_fn()
    kd = jax.random.key(2)
    rb = (jax.random.normal(kd, (batch, 32, 32, 4)) * 0.2,
          jax.random.randint(jax.random.fold_in(kd, 2), (batch,), 1, 1000))

    fwd = jax.jit(loss_fn)
    t_fwd = timeit(fwd, params, rb, jax.random.key(3), label="fwd")

    grad = jax.jit(jax.value_and_grad(loss_fn))
    _, g = grad(params, rb, jax.random.key(3))
    jax.block_until_ready(g)
    t_grad = timeit(lambda p: grad(p, rb, jax.random.key(3))[1], params,
                    label="grad")

    opt = make_optimizer("adamw", 1e-4, weight_decay=0.0,
                         mu_dtype=jnp.bfloat16)
    opt_state = jax.jit(opt.init)(params)
    mask = jax.tree_util.tree_map(
        lambda p: (jax.random.uniform(jax.random.key(1), p.shape) > 0.5
                   ).astype(jnp.bfloat16), params)
    ema = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t))(params)
    gc.collect()

    def opt_step(params, opt_state, g, mask, ema):
        g = tr.tree_mul(g, mask)
        g, _ = tr.clip_by_global_norm(g, 1.0)
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: (e.astype(jnp.float32) * 0.9999
                          + p.astype(jnp.float32) * 1e-4).astype(e.dtype),
            ema, params)
        return params, opt_state, ema

    opt_j = jax.jit(opt_step)
    t_opt = timeit(lambda: opt_j(params, opt_state, g, mask, ema), label="opt")

    print(f"2*grad + 2*opt = {(2 * t_grad + 2 * t_opt) * 1e3:.1f} ms "
          f"(bench two-phase step: ~340 ms)", flush=True)
    print(f"bwd/fwd ratio: {t_grad / t_fwd:.2f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "full")
