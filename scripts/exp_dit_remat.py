"""One-off experiment: DiT-XL/2 two-phase step throughput vs remat policy.

Usage: python scripts/exp_dit_remat.py <policy>   (full | attn | dots | none)
Prints steps/sec for the policy on the current default device.
"""
import dataclasses
import gc
import sys
import time

import jax
import jax.numpy as jnp


def main(policy_name: str, batch: int = 16, n_steps: int = 10) -> None:
    from uurg_tpu.train import make_optimizer
    from uurg_tpu.unlearn import SFRonConfig, make_sfron_step
    from uurg_tpu.unlearn.sfron import init_state
    from uurg_tpu.workloads.dit import DiTWorkload

    wl = DiTWorkload.build("DiT-XL/2")
    if policy_name == "full":
        pass  # default: remat=True, remat_policy=None
    elif policy_name == "none":
        wl = dataclasses.replace(wl, cfg=dataclasses.replace(wl.cfg, remat=False))
    else:
        wl = dataclasses.replace(
            wl, cfg=dataclasses.replace(wl.cfg, remat_policy=policy_name))

    print(f"policy={policy_name} remat={wl.cfg.remat} "
          f"remat_policy={wl.cfg.remat_policy}", flush=True)
    params = wl.init_params(jax.random.key(0))
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    mask = jax.tree_util.tree_map(
        lambda p: (jax.random.uniform(jax.random.key(1), p.shape) > 0.5
                   ).astype(jnp.bfloat16), params)
    opt = make_optimizer("adamw", 1e-4, weight_decay=0.0,
                         mu_dtype=jnp.bfloat16)
    cfg = SFRonConfig(n_iters=600, forget_alpha=1e-3, remain_alpha=1.0,
                      alpha_sched="const", forget_clip=1.0, remain_clip=None,
                      ema_mu=0.9999)
    step = make_sfron_step(cfg, opt, wl.forget_loss_fn("ga"),
                           wl.train_loss_fn())
    state = init_state(params, opt, ema=True, mask=mask,
                       ema_dtype=jnp.bfloat16)
    del params, mask
    gc.collect()
    kd = jax.random.key(2)
    fb = (jax.random.normal(kd, (batch, 32, 32, 4)) * 0.2,
          jnp.zeros((batch,), jnp.int32))
    rb = (jax.random.normal(jax.random.fold_in(kd, 1),
                            (batch, 32, 32, 4)) * 0.2,
          jax.random.randint(jax.random.fold_in(kd, 2), (batch,), 1, 1000))

    t0 = time.perf_counter()
    stepj = jax.jit(step, donate_argnums=(0,))
    state, _ = stepj(state, fb, rb, jax.random.key(3))
    jax.block_until_ready(state.params)
    print(f"compile+1st step: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, _ = stepj(state, fb, rb, jax.random.key(3))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    print(f"RESULT policy={policy_name} {n_steps / dt:.3f} steps/sec "
          f"({dt / n_steps * 1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "full")
