"""Experiment: DiT-XL/2 two-phase step throughput vs remat/memory policy.

The round-3 measurement (README): full remat 2.96 steps/s (34.5% model-MFU),
"attn" policy +2%, "dots" OOM by 1.44GB. The bf16-nu optimizer state
(-1.35GB) and the bit-packed saliency mask (-590MB) buy back 1.94GB, which
should let "dots" fit — skipping most backward recompute (~25% of step
FLOPs under full remat).

Round-4 results: dots16 3.096 steps/s (+4.5% over full remat; adopted).
Round-5 results (v5e, 10-step timing after AOT compile):
    attndots16  3.222 steps/s  51.5 img/s  temp 8.49GiB   (+4.1% over dots16;
                                                           adopted)
    dots24      2.106 steps/s  50.5 img/s  temp 9.69GiB   (flat per-image)
    attndots24  2.149 steps/s  51.6 img/s  temp 10.05GiB  (flat per-image)
    dots32/attndots32: compile exceeded the 30-min relay budget; per-image
    flatness at b24 already shows the step is matmul-bound, not
    occupancy-bound — batch scaling is a measured NEGATIVE.
    none16 (remat wrapper dropped entirely): OOM — XLA's keep-everything
    layout does not fit even with the freed 1.9GB.
    bf16ln16 (attn+dots + norm_dtype=bf16): 3.197 steps/s — NEGATIVE:
    XLA already fuses the LN/modulate elementwise chains into the
    adjacent matmuls, so halving their nominal dtype only inserts casts;
    the fused-adaLN family of candidates is not where the residual is.

Run one variant per process (fresh HBM):
    python scripts/exp_dit_remat.py base|attn|dots16|attn16
"""
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

VARIANTS = {
    #          remat_policy  nu_dtype       packed_mask  batch
    "base":   (None,         None,          False,       16),
    "attn":   ("attn",       None,          False,       16),
    "dots16": ("dots",       jnp.bfloat16,  True,        16),
    "attn16": ("attn",       jnp.bfloat16,  True,        16),
    # the other way to spend the freed ~2GB: double the batch under full
    # remat (per-image throughput if the b16 step is occupancy-bound)
    "b32":    (None,         jnp.bfloat16,  True,        32),
    # round-5 candidates: spend the dots headroom on batch, and compose
    # the two measured-positive policies (dots can't see inside the
    # flash-attention pallas_call; attn+dots saves its output too)
    "dots24":     ("dots",      jnp.bfloat16, True, 24),
    "dots32":     ("dots",      jnp.bfloat16, True, 32),
    "attndots16": ("attn+dots", jnp.bfloat16, True, 16),
    "attndots24": ("attn+dots", jnp.bfloat16, True, 24),
    "attndots32": ("attn+dots", jnp.bfloat16, True, 32),
    # no remat wrapper at all: XLA keeps every intermediate it wants
    # (attn+dots still recomputes the elementwise/LN chains in bwd —
    # breakdown measures that at ~16ms/phase of the 310ms step)
    "none16":     ("off",       jnp.bfloat16, True, 16),
    # bf16 LN+modulate chains on top of attn+dots: halves the per-block
    # elementwise HBM traffic (stats stay f32 inside flax)
    "bf16ln16":   ("attn+dots+bf16ln", jnp.bfloat16, True, 16),
}


def main(variant: str, n_steps=10):
    policy, nu_dtype, packed, batch = VARIANTS[variant]

    from uurg_tpu.core.tree import pack_mask
    from uurg_tpu.train import make_optimizer
    from uurg_tpu.unlearn import SFRonConfig, make_sfron_step
    from uurg_tpu.unlearn.sfron import init_state
    from uurg_tpu.workloads.dit import DiTWorkload

    if policy == "off":  # drop the nn.remat wrapper entirely
        wl = DiTWorkload.build("DiT-XL/2", remat=False)
    elif policy == "attn+dots+bf16ln":
        wl = DiTWorkload.build("DiT-XL/2", remat_policy="attn+dots",
                               norm_dtype=jnp.bfloat16)
    else:
        wl = DiTWorkload.build("DiT-XL/2", remat_policy=policy)
    print(f"[{variant}] init params...", file=sys.stderr, flush=True)
    params = wl.init_params(jax.random.key(0))
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])

    @jax.jit
    def make(key):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(key, len(leaves))
        masks = [jax.random.uniform(k, p.shape) > 0.5
                 for k, p in zip(keys, leaves)]
        return jax.tree_util.tree_unflatten(treedef, masks)

    mask = make(jax.random.key(1))
    if packed:
        mask = pack_mask(mask)
    jax.block_until_ready(jax.tree_util.tree_leaves(mask)[0])

    opt = make_optimizer("adamw", 1e-4, weight_decay=0.0,
                         mu_dtype=jnp.bfloat16, nu_dtype=nu_dtype)
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
    rb = (jax.random.normal(jax.random.fold_in(kd, 1), (batch, 32, 32, 4)) * 0.2,
          jax.random.randint(jax.random.fold_in(kd, 2), (batch,), 1, 1000))
    print(f"[{variant}] compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    step_c = step.lower(state, fb, rb, jax.random.key(3)).compile()
    print(f"[{variant}] compiled in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    try:
        mem = step_c.memory_analysis()
        print(f"[{variant}] temp={mem.temp_size_in_bytes/2**30:.2f}GiB "
              f"args={mem.argument_size_in_bytes/2**30:.2f}GiB",
              file=sys.stderr, flush=True)
    except Exception:
        pass
    state, _ = step_c(state, fb, rb, jax.random.key(3))
    float(jnp.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, _ = step_c(state, fb, rb, jax.random.key(3))
    float(jnp.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0])
    dt = time.perf_counter() - t0
    print(f"RESULT {variant}: {n_steps/dt:.3f} steps/sec "
          f"(batch {batch}, {n_steps*batch/dt:.1f} imgs/sec/phase-pair)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "base")
