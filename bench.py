"""Benchmark: the north-star SFR-on two-phase step on the DDPM CIFAR-10 config.

Measures the full fused unlearning iteration — adaga forget loss fwd+bwd,
saliency-mask multiply, clip, Adam update, remain loss fwd+bwd, clip, Adam
update, EMA lerp — on the 35.7M-param conditional UNet at batch 128 / 32x32
(DDPM/configs/cifar10_sfron.yml). The reference's claim is class-forgetting
"in just 50 steps" (README.md:18); BASELINE.json sets the target as 50-step
wall-clock at >= 2x A100.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares our steps/sec against an estimated reference
throughput of 3.0 it/s for torch on a single A100 (two fwd+bwd passes of the
35.7M UNet at batch 128 plus host-side mask loops; the reference publishes no
wall-clock numbers — see BASELINE.md).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: TPU compiles in this environment go through
# a remote-compile RPC with multi-minute latency; cache hits skip it entirely
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_REF_STEPS_PER_SEC_EST = 3.0


def main():
    from uurg_tpu.utils.rng import configure_rng

    configure_rng("auto")  # rbg on TPU: the training-CLI default
    from uurg_tpu.core.config import Config
    from uurg_tpu.core import tree as tr
    from uurg_tpu.train import make_optimizer
    from uurg_tpu.unlearn import SFRonConfig, fisher_ratio_mask, make_sfron_step
    from uurg_tpu.unlearn.sfron import init_state
    from uurg_tpu.workloads.ddpm import DDPMWorkload

    cfg = Config({
        "data": {"image_size": 32, "channels": 3, "n_classes": 10,
                 "rescaled": True},
        "model": {"in_channels": 3, "out_ch": 3, "ch": 128,
                  "ch_mult": [1, 2, 2, 2], "num_res_blocks": 2,
                  "attn_resolutions": [16], "dropout": 0.1,
                  "var_type": "fixedlarge", "resamp_with_conv": True,
                  "cond_drop_prob": 0.1},
        "diffusion": {"beta_schedule": "linear", "beta_start": 1e-4,
                      "beta_end": 2e-2, "num_diffusion_timesteps": 1000},
        "training": {"lambd": 0.5},
    })
    batch = 128

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    wl = DDPMWorkload.from_config(cfg, dtype=jnp.bfloat16)
    note("init_params...")
    params = wl.init_params(jax.random.key(0))
    jax.block_until_ready(params)
    note("init done")

    # realistic ~50%-sparse saliency mask, built in ONE jitted dispatch
    @jax.jit
    def make_mask(key):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(key, len(leaves))
        masks = [
            (jax.random.uniform(k, p.shape) > 0.5).astype(jnp.float32)
            for k, p in zip(keys, leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, masks)

    mask = make_mask(jax.random.key(1))
    jax.block_until_ready(mask)
    note("mask done")

    opt = make_optimizer("adam", 1e-4, beta1=0.9, eps=1e-8)
    sf_cfg = SFRonConfig(n_iters=150, forget_alpha=10.0, remain_alpha=1.0,
                         alpha_sched="cosine", forget_clip=1.0,
                         remain_clip=1.0, ema_mu=1e-4)
    step = make_sfron_step(sf_cfg, opt, wl.adaga_forget_loss_fn(),
                           wl.train_loss_fn())

    state = init_state(params, opt, ema=True, mask=mask)
    kd = jax.random.key(2)
    fb = (jax.random.normal(kd, (batch, 32, 32, 3)) * 0.5,
          jnp.zeros((batch,), jnp.int32))
    rb = (jax.random.normal(jax.random.fold_in(kd, 1), (batch, 32, 32, 3)) * 0.5,
          jax.random.randint(jax.random.fold_in(kd, 2), (batch,), 1, 10))

    note("state ready; compiling two-phase step...")
    # warmup / compile
    state, _ = step(state, fb, rb, jax.random.key(3))
    jax.block_until_ready(state.params)
    note("step compiled")

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, fb, rb, jax.random.key(3))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    print(json.dumps({
        "metric": "ddpm_cifar10_sfron_two_phase_step_b128",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / A100_REF_STEPS_PER_SEC_EST, 3),
    }))


if __name__ == "__main__":
    main()
