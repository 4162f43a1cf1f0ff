"""Benchmark suite: every headline workload metric, one driver-parseable line.

Headline (the driver's north-star): the fused SFR-on two-phase step on the
DDPM CIFAR-10 config — adaga forget loss fwd+bwd, saliency-mask multiply,
clip, Adam update, remain loss fwd+bwd, clip, Adam update, EMA lerp — on the
35.7M-param conditional UNet at batch 128 / 32x32
(DDPM/configs/cifar10_sfron.yml). The reference's claim is class-forgetting
"in just 50 steps" (README.md:18); BASELINE.json sets the target as 50-step
wall-clock at >= 2x A100.

Also measured (round-3: regressions in ANY headline claim become visible):
  - ddim50_cfg_sampling_b128      imgs/sec, DDIM-50 with CFG double-forward
  - classification_sfron_b256     it/sec, ResNet-18 device-resident scan path
  - evaluator_inception_features  imgs/sec, FID/sFID/IS feature extraction,
    BOTH end-to-end (host batches in, features downloaded — includes the
    TPU tunnel) and _device (compute only): the gap is the tunnel bound
  - dit_xl2_sfron_step_b16        steps/sec, DiT-XL/2 675M two-phase step
  - sd_unet_nsfw_step_b4_xattn    steps/sec, SD 860M nsfw_removal step
  - sd_unet_nsfw_step_b4_full     steps/sec, same step, full-parameter path
  - sd_unet_nsfw_step_b8_{xattn,full}  steps/sec, batch-8 variants
    (round-5: +18%/+24% per-image over b4 at 50%/47% MFU — SD is
    occupancy-bound at b4, unlike the matmul-bound DiT step where batch
    was a measured negative)

``--mesh data=N`` additionally shards the headline DDPM step over N local
devices (..._meshN metric) — no-op at N=1, free scaling numbers on any
future multi-chip allotment.

Output (timeout-proof by design — a driver kill mid-run must never zero the
round's perf record, BENCH_r03 post-mortem): the headline metric dict
{"metric", "value", "unit", "vs_baseline", "flops_per_step", "mfu"} is
printed as its own JSON line THE MOMENT the DDPM bench completes; a final
combined line (same dict + an "all" array carrying every metric, failed
benches recording an "error" field) follows when the suite finishes. The
in-progress record is additionally mirrored to BENCH_partial.json after
every bench. A ``--budget`` wall-clock guard (default 2400s, env
BENCH_BUDGET_SEC) skips benches after the headline once exceeded
(recorded as {"error": "budget"}) instead of being killed mid-bench.

Every metric carries ``flops_per_step`` (XLA cost analysis of the exact
compiled program) and ``mfu`` (flops/sec over the chip's peak bf16 rate) so
"is it actually fast" is answerable per-workload from the JSON alone.

``vs_baseline`` divides our number by an ESTIMATED torch single-A100
throughput (the reference publishes no wall-clock numbers — BASELINE.md);
estimates are listed in _EST below and documented in README.md.
"""
import argparse
import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: TPU compiles in this environment go through
# a remote-compile RPC with multi-minute latency; cache hits skip it entirely.
# TPU-only: CPU AOT blobs are host-ISA-specific and reloading one compiled on
# a different machine risks SIGILL (the cpu_aot_loader feature-mismatch
# errors __graft_entry__._setup_cache documents) — never cache those.
if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Estimated reference (torch, single A100) throughputs. The reference repo
# publishes no wall-clock numbers; these are engineering estimates used only
# to populate vs_baseline: DDPM step = two fwd+bwd of the 35.7M UNet b128
# plus host-side named_parameters() mask loops; sampling = python loop,
# 2x CFG forwards per step; DiT-XL/SD = DataParallel single-process rates;
# classification = ResNet-18 b256 fwd+bwd with host dataloader; evaluator =
# the TF1 Inception session pipeline.
_EST = {
    "ddpm_cifar10_sfron_two_phase_step_b128": 3.0,     # steps/sec
    "ddim50_cfg_sampling_b128": 45.0,                  # imgs/sec
    # torch CIFAR loops with a host dataloader typically sustain 4-6k
    # img/s on A100; the SFR-on iter moves TWO b256 batches -> ~30 it/s
    "classification_sfron_b256": 30.0,                 # it/sec
    "evaluator_inception_features_b256": 400.0,        # imgs/sec
    # device-compute-only rate vs the same torch pipeline estimate: on an
    # A100 (no tunnel) end-to-end ~= device rate, so the baseline is shared
    "evaluator_inception_features_device_b256": 400.0,  # imgs/sec
    "dit_xl2_sfron_step_b16": 1.2,                     # steps/sec
    "sd_unet_nsfw_step_b4_xattn": 1.0,                 # steps/sec
    # full-parameter path: torch backward reaches every param and Adam
    # updates all 860M (xattn freezes ~90% of the update work) -> ~0.8
    "sd_unet_nsfw_step_b4_full": 0.8,                  # steps/sec
    # b8 variants: same est. imgs/sec as b4, so half the steps/sec
    "sd_unet_nsfw_step_b8_xattn": 0.5,                 # steps/sec
    "sd_unet_nsfw_step_b8_full": 0.4,                  # steps/sec
}


def note(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# peak dense bf16 FLOP/s per chip, keyed by device_kind substring (order
# matters: 'v5 lite' before 'v5'). Sources: Google TPU system architecture
# docs (v5e 197 TF, v5p 459 TF, v4 275 TF, v6e/Trillium 918 TF).
_PEAK_BF16 = [
    ("v6 lite", 918e12), ("v6e", 918e12),
    ("v5 lite", 197e12), ("v5e", 197e12),
    ("v5p", 459e12), ("v5", 459e12),
    ("v4", 275e12), ("v3", 123e12), ("v2", 45e12),
]


def _chip_peak_flops():
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return None


def _aot(jitted, *args):
    """AOT-compile a jitted fn for ``args``: (compiled_callable, flops).

    ONE compile total (the timing loop calls the compiled object, never the
    jit wrapper) and the exact program's FLOP count from XLA cost analysis —
    no hand-derived roofline math."""
    compiled = jitted.lower(*args).compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", 0.0))
        if f > 0:
            flops = f
    except Exception as e:
        note(f"cost_analysis unavailable: {e!r}")
    return compiled, flops


def _sync(tree):
    """Force REAL completion: fetch one scalar element through the host.

    jax.block_until_ready has been observed to return early through the
    axon TPU relay under load (round-4: a 300-iteration scan "finished" in
    7 ms). A host fetch of a value data-dependent on the final state cannot
    lie — the whole chain must have executed."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def _abstract(tree):
    """Arrays -> ShapeDtypeStructs (nothing allocated, nothing moved)."""
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype)
        if hasattr(a, "dtype") else a, tree)


_FLOPS_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_FLOPS_CACHE.json")


def _flops_cached(key: str, thunk):
    """Persist FLOPs across bench runs (BENCH_FLOPS_CACHE.json).

    FLOPs are deterministic for a fixed (metric, shape) program, but the
    CPU-backend costing compile behind _lowered_flops is NOT covered by the
    jax compilation cache and costs minutes at 860M scale — without this,
    every bench run pays it again and the default-budget driver run
    budget-skips the tail of the suite. Keys encode batch/config (they are
    metric names or metric-derived); delete the file after model-code
    changes that alter the math — the next run regenerates it."""
    try:
        with open(_FLOPS_CACHE) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        cache = {}
    if key in cache:
        return cache[key]["flops"]
    flops = thunk()
    if flops:
        cache[key] = {"flops": flops, "jax": jax.__version__}
        try:
            with open(_FLOPS_CACHE, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
        except OSError:
            pass
    return flops


def _lowered_flops(fn, *args):
    """FLOPs of one call of ``fn(*args)`` WITHOUT dispatching to the chip.

    Used where the compiled program hides work from XLA cost analysis:
    a lax.scan/while body is counted ONCE regardless of trip count, and
    lax.cond counts BOTH branches — so specific sub-programs are costed
    separately and recombined by the caller. Tries the free
    Lowered.cost_analysis(); the axon TPU relay returns None there, so the
    fallback compiles the SAME program on the host CPU backend (FLOPs are
    platform-independent; the compile never touches the TPU). Pallas TPU
    kernels can't lower for CPU, so traces run inside ops.xla_only() — the
    plain-XLA attention computes the same math/FLOPs. ``args`` may be
    ShapeDtypeStruct trees."""
    from uurg_tpu.ops.flash_attention import xla_only

    args = _abstract(args)

    def flops_of(ca):
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        if not isinstance(ca, dict):
            return None
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None

    try:
        with xla_only():
            f = flops_of(jax.jit(fn).lower(*args).cost_analysis())
        if f:
            return f
    except Exception:
        pass
    try:
        with xla_only():
            return flops_of(jax.jit(fn, backend="cpu")
                            .lower(*args).compile().cost_analysis())
    except Exception as e:
        note(f"cpu-backend cost_analysis unavailable: {e!r}")
        return None


def _metric(name, value, unit, flops=None, calls_per_sec=None,
            est_name=None, n_chips=1):
    """``flops`` is per compiled call; ``calls_per_sec`` converts it to a
    FLOP rate when one call != one unit of ``value`` (img/sec, it/sec).
    ``est_name`` keys the baseline estimate when ``name`` carries a suffix
    (e.g. the _meshN variants share the single-chip baseline); ``n_chips``
    scales the peak-FLOPs denominator for mesh runs."""
    m = {"metric": name, "value": round(value, 3), "unit": unit,
         "vs_baseline": round(value / _EST[est_name or name], 3)}
    if flops is not None:
        rate = calls_per_sec if calls_per_sec is not None else value
        m["flops_per_step"] = flops
        peak = _chip_peak_flops()
        if peak:
            m["mfu"] = round(flops * rate / (peak * n_chips), 4)
            if m["mfu"] > 1.0:  # physically impossible: timing didn't sync
                m["timing_suspect"] = True
    return m


def _ddpm_workload(batch):
    from uurg_tpu.core.config import Config
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
    return DDPMWorkload.from_config(cfg, dtype=jnp.bfloat16)


def _random_mask(params, key):
    # realistic ~50%-sparse saliency mask, built in ONE jitted dispatch.
    # bool, matching fisher_ratio_mask: 1 byte/elem in HBM; tree_mul casts
    # at the multiply site (an f32 DiT-XL mask alone is 2.7GB and OOMs the
    # 16GB chip)
    @jax.jit
    def make(key):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(key, len(leaves))
        masks = [jax.random.uniform(k, p.shape) > 0.5
                 for k, p in zip(keys, leaves)]
        return jax.tree_util.tree_unflatten(treedef, masks)

    mask = make(key)
    jax.block_until_ready(mask)
    return mask


def bench_ddpm_sfron_step(batch=128, n_steps=30, mesh_n=1, wl_factory=None):
    """Headline: the fused two-phase step (DDPM/runners/diffusion.py
    sfron_forget hot loop, 1075-1176) at batch 128.

    ``mesh_n > 1`` runs the SAME step data-sharded over the first
    ``mesh_n`` local devices (the ddpm_runner._data_sharding layout: state
    replicated, batch leading axis split over a 1-D 'data' mesh) and
    records the metric as ..._mesh{N} against the single-chip baseline —
    the driver gets scaling numbers for free on any future multi-chip
    allotment. At mesh_n=1 this is byte-identical to the default bench.
    ``wl_factory`` overrides the workload for the tiny-config mesh smoke
    test (tests/test_bench_mesh.py)."""
    from uurg_tpu.train import make_optimizer
    from uurg_tpu.unlearn import SFRonConfig, make_sfron_step
    from uurg_tpu.unlearn.sfron import init_state

    wl = (wl_factory or _ddpm_workload)(batch)
    note("ddpm: init_params...")
    params = wl.init_params(jax.random.key(0))
    jax.block_until_ready(params)
    mask = _random_mask(params, jax.random.key(1))

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

    name = "ddpm_cifar10_sfron_two_phase_step_b128"
    if mesh_n > 1:
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        if batch % mesh_n:
            raise ValueError(f"batch {batch} not divisible by mesh {mesh_n}")
        mesh = Mesh(np.asarray(jax.devices()[:mesh_n]), ("data",))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        data_sh = NamedSharding(mesh, P("data"))
        fb = jax.device_put(fb, data_sh)
        rb = jax.device_put(rb, data_sh)
        name = f"{name}_mesh{mesh_n}"

    note("ddpm: compiling two-phase step...")
    step_c, flops = _aot(step, state, fb, rb, jax.random.key(3))
    state, _ = step_c(state, fb, rb, jax.random.key(3))
    _sync(state.params)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step_c(state, fb, rb, jax.random.key(3))
    _sync(state.params)
    dt = time.perf_counter() - t0
    return _metric(name, n_steps / dt, "steps/sec", flops=flops,
                   est_name="ddpm_cifar10_sfron_two_phase_step_b128",
                   n_chips=mesh_n)


def bench_ddim50_sampling(batch=128, n_rounds=3):
    """DDIM-50 CFG sampling (DDPM/runners/diffusion.py:825-872 sample_image
    as a lax.scan) — the FID-set generation rate."""
    wl = _ddpm_workload(batch)
    params = wl.init_params(jax.random.key(0))
    sampler = jax.jit(wl.make_sampler(num_steps=50, cond_scale=2.0))
    labels = jnp.arange(batch, dtype=jnp.int32) % 10
    note("ddim50: compiling sampler...")
    sampler_c, flops = _aot(sampler, params, labels, jax.random.key(1))
    out = sampler_c(params, labels, jax.random.key(1))
    _sync(out)
    t0 = time.perf_counter()
    for i in range(n_rounds):
        out = sampler_c(params, labels, jax.random.key(i))
    _sync(out)
    dt = time.perf_counter() - t0
    # the sampler is ONE lax.scan over the 50 timesteps and XLA cost
    # analysis counts the body once — scale to the executed trip count
    # (the non-loop prologue/epilogue is noise-gen + affine rescale, ~0)
    if flops is not None:
        flops *= 50
    return _metric("ddim50_cfg_sampling_b128", n_rounds * batch / dt,
                   "imgs/sec", flops=flops, calls_per_sec=n_rounds / dt)


def bench_classification(batch=256, chunk=50, n_chunks=6):
    """ResNet-18 SFR-on device-resident scan path (the main_random.py
    protocol engine: forget every 5 steps, fast-slow mix, BN state,
    in-jit flip+pad-crop augmentation). bf16 compute (--dtype bf16; the
    TPU-native configuration — params/BN stats stay f32)."""
    import numpy as np

    from uurg_tpu.models.resnet import ResNet18, init_classifier
    from uurg_tpu.train import make_optimizer
    from uurg_tpu.train.optim import cosine_annealing
    from uurg_tpu.unlearn import SFRonConfig
    from uurg_tpu.unlearn.methods.classification import _device_batcher
    from uurg_tpu.unlearn.sfron import (init_state, make_sfron_scan,
                                        make_sfron_step)
    from uurg_tpu.workloads.classification import Classifier

    model = ResNet18(dtype=jnp.bfloat16)
    params, batch_stats = init_classifier(jax.random.key(0), model)
    cls = Classifier(model)
    opt = make_optimizer("sgd", 0.01, momentum=0.9, weight_decay=5e-4)
    cfg = SFRonConfig(n_iters=1500, forget_alpha=25.0, remain_alpha=1.0,
                      alpha_sched="cosine", forget_freq=5, forget_clip=7.0,
                      remain_clip=None, fast_slow_beta=1.0)
    run = make_sfron_scan(cfg, opt, cls.neg_adaptive_ce_loss_fn(0.5),
                          cls.ce_loss_fn(), chunk,
                          lr_schedule=cosine_annealing(0.01, 1500),
                          has_model_state=True,
                          device_batcher=_device_batcher(batch, augment=True))
    rng = np.random.default_rng(0)
    f_data = (jnp.asarray(rng.integers(0, 255, (5000, 32, 32, 3), np.uint8)),
              jnp.zeros((5000,), jnp.int32))
    r_data = (jnp.asarray(rng.integers(0, 255, (45000, 32, 32, 3), np.uint8)),
              jnp.asarray(rng.integers(0, 10, 45000).astype(np.int32)))
    # honest executed-FLOPs per iteration: the chunk scan body is counted
    # ONCE by XLA cost analysis AND its lax.cond (forget every 5th step)
    # counts BOTH branches. Blend two free lowered-HLO costs instead:
    # executed/it = remain-only + (full - remain-only)/forget_freq.
    import dataclasses as _dc

    step_full = make_sfron_step(cfg, opt, cls.neg_adaptive_ce_loss_fn(0.5),
                                cls.ce_loss_fn(),
                                lr_schedule=cosine_annealing(0.01, 1500),
                                has_model_state=True, donate=False,
                                jit=False)
    cfg_off = _dc.replace(cfg, forget_alpha=0.0, alpha_sched="const")
    step_off = make_sfron_step(cfg_off, opt, cls.neg_adaptive_ce_loss_fn(0.5),
                               cls.ce_loss_fn(),
                               lr_schedule=cosine_annealing(0.01, 1500),
                               has_model_state=True, donate=False, jit=False)
    s_abs = init_state(params, opt, model_state=batch_stats)
    b_abs = (jnp.zeros((batch, 32, 32, 3), jnp.bfloat16),
             jnp.zeros((batch,), jnp.int32))
    fl_full = _flops_cached(
        f"classification_sfron_b{batch}:full",
        lambda: _lowered_flops(step_full, s_abs, b_abs, b_abs,
                               jax.random.key(0)))
    fl_off = _flops_cached(
        f"classification_sfron_b{batch}:off",
        lambda: _lowered_flops(step_off, s_abs, b_abs, b_abs,
                               jax.random.key(0)))
    flops_it = None
    if fl_full and fl_off:
        flops_it = fl_off + (fl_full - fl_off) / cfg.forget_freq

    state = init_state(params, opt, model_state=batch_stats)
    note("classification: compiling scan chunk...")
    run_c, _ = _aot(run, state, f_data, r_data, jax.random.key(1))
    state, _ = run_c(state, f_data, r_data, jax.random.key(1))
    _sync(state.params)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, _ = run_c(state, f_data, r_data, jax.random.key(1))
    _sync(state.params)
    dt = time.perf_counter() - t0
    return _metric("classification_sfron_b256", n_chunks * chunk / dt,
                   "it/sec", flops=flops_it)


def bench_evaluator(batch=256, n_batches=20):
    # n_batches=20 (~10s timed): the tunnel's transfer throughput is noisy
    # (paired A/B runs spread ~20%, scripts/exp_featurize_ab.py), so a
    # longer window tightens the estimate.
    """Inception feature extraction (pool/spatial/logits — the FID/sFID/IS
    front end, DDPM/evaluator.py read_activations). Random-init weights:
    throughput only.

    END-TO-END like the FID pipeline: the per-batch feature download to
    host numpy is INSIDE the timed loop, measured through the REAL
    ``eval.generative.featurize`` path (the one evaluate_all uses), which
    since round 4 overlaps batch i's download with batch i+1's compute
    (make_extractor(materialize=False)). Through this box's TPU tunnel the
    download is the long pole — device-only compute measures ~5300
    imgs/sec — so the mfu row still reads low; this is the honest number
    for "how fast does a 50k FID set featurize here"."""
    import numpy as np

    from uurg_tpu.eval.generative import featurize
    from uurg_tpu.eval.inception import (init_inception, make_extractor,
                                         preprocess)

    model, variables = init_inception(jax.random.key(0))
    run = jax.jit(lambda imgs: model.apply(variables, preprocess(imgs)))
    imgs_dev = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (batch, 32, 32, 3), np.uint8))
    note("evaluator: compiling inception...")
    run_c, flops = _aot(run, imgs_dev)  # cost of the per-batch program
    extractor = make_extractor(variables, materialize=False)
    images = np.asarray(imgs_dev)
    all_images = np.broadcast_to(
        images, (n_batches,) + images.shape).reshape(-1, *images.shape[1:])
    out = featurize(extractor, all_images, batch_size=batch)  # warm compile
    t0 = time.perf_counter()
    out = featurize(extractor, all_images, batch_size=batch)
    dt = time.perf_counter() - t0
    del out
    e2e = _metric("evaluator_inception_features_b256",
                  n_batches * batch / dt, "imgs/sec",
                  flops=flops, calls_per_sec=n_batches / dt)
    # device-compute-only rate (features never leave the chip; one final
    # data-dependent scalar fetch forces completion): separates "is the
    # extractor fast" from "how fast is this box's tunnel" — the two were
    # conflated before (round-4 verdict). The e2e/device ratio IS the
    # measured tunnel bound; README quantifies it in GB/s.
    out = run_c(imgs_dev)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        out = run_c(imgs_dev)
    _sync(out)
    dt_dev = time.perf_counter() - t0
    dev = _metric("evaluator_inception_features_device_b256",
                  n_batches * batch / dt_dev, "imgs/sec",
                  flops=flops, calls_per_sec=n_batches / dt_dev)
    return [e2e, dev]


def bench_dit_xl(batch=16, n_steps=10):
    """DiT-XL/2 (675M) two-phase step at batch 16 latents (DiT/forget.py
    hot loop) — the full memory policy: bf16 Adam mu AND nu, bf16 EMA,
    bit-packed saliency mask, remat_policy="attn+dots". The bf16-nu
    (-1.35GB) + packed-mask (-0.52GB) headroom is what lets the save-
    everything-expensive policy (MXU outputs via "dots" + the flash-
    attention outputs "dots" can't see inside the pallas_call) fit on one
    16GB chip: 3.22 steps/s vs 3.10 dots-only vs 2.96 full remat; batch
    24/32 variants measured FLAT per-image (scripts/exp_dit_remat.py) —
    the step is matmul-bound, not occupancy-bound."""
    from uurg_tpu.core.tree import pack_mask
    from uurg_tpu.train import make_optimizer
    from uurg_tpu.unlearn import SFRonConfig, make_sfron_step
    from uurg_tpu.unlearn.sfron import init_state
    from uurg_tpu.workloads.dit import DiTWorkload

    wl = DiTWorkload.build("DiT-XL/2", remat_policy="attn+dots")
    note("dit: init_params (675M)...")
    params = wl.init_params(jax.random.key(0))
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    mask = pack_mask(_random_mask(params, jax.random.key(1)))
    opt = make_optimizer("adamw", 1e-4, weight_decay=0.0,
                         mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16)
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
    # model-FLOPs (MFU proper, excludes the full-remat recompute = HFU):
    # the scan-over-depth program hides 27 of 28 blocks from XLA cost
    # analysis. Cost tiny UNROLLED variants at depth 1 and 2 (the delta is
    # exactly one block), extrapolate fwd = d1 + (d2-d1)*(depth-1), and
    # take step = 2 phases x (1 fwd + 2 fwd-equivalent bwd) = 6 x fwd.
    import dataclasses as _dc

    from uurg_tpu.models.dit import DiT

    def _fwd_flops_at_depth(d):
        ucfg = _dc.replace(wl.cfg, scan_blocks=False, remat=False, depth=d)
        m = DiT(ucfg)
        sz, ch = wl.cfg.input_size, wl.cfg.in_channels
        p_abs = jax.eval_shape(
            lambda k: m.init(k, jnp.zeros((1, sz, sz, ch)),
                             jnp.zeros((1,), jnp.int32),
                             jnp.zeros((1,), jnp.int32)),
            jax.random.key(0))["params"]
        x_abs = jax.ShapeDtypeStruct((batch, sz, sz, ch), jnp.float32)
        i_abs = jax.ShapeDtypeStruct((batch,), jnp.int32)
        return _flops_cached(
            f"dit_{wl.cfg.hidden_size}h_p{wl.cfg.patch_size}"
            f"_fwd_depth{d}_b{batch}",
            lambda: _lowered_flops(
                lambda p, x, t, y: m.apply({"params": p}, x, t, y),
                p_abs, x_abs, i_abs, i_abs))

    f1, f2 = _fwd_flops_at_depth(1), _fwd_flops_at_depth(2)
    flops = 6 * (f1 + (f2 - f1) * (wl.cfg.depth - 1)) if f1 and f2 else None

    note("dit: compiling two-phase step...")
    step_c, _ = _aot(step, state, fb, rb, jax.random.key(3))
    state, _ = step_c(state, fb, rb, jax.random.key(3))
    _sync(state.params)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, _ = step_c(state, fb, rb, jax.random.key(3))
    _sync(state.params)
    dt = time.perf_counter() - t0
    return _metric("dit_xl2_sfron_step_b16", n_steps / dt, "steps/sec",
                   flops=flops)


def bench_sd(batch=4, n_steps=10, train_method="xattn"):
    """SD-v1 UNet (860M) nsfw_removal two-phase step at batch 4
    (SD/train-scripts/nsfw_removal.py:67-77,108-203).

    ``train_method='xattn'`` is the restricted protocol (cross-attention
    params only — frozen layers carry NO optimizer state);
    ``'full'`` is what the headline NSFW-removal protocol trains
    unrestricted: Adam over all 860M params, run with bf16 second moments
    (the ``--nu_dtype bf16`` CLI knob; -1.7GB — the full-path moments
    otherwise crowd the 16GB chip)."""
    from uurg_tpu.models.sd_unet import init_sd_unet, SDUNetConfig
    from uurg_tpu.unlearn import SFRonConfig, make_sfron_step
    from uurg_tpu.unlearn.sfron import init_state
    from uurg_tpu.workloads.sd import SDWorkload
    from uurg_tpu.workloads.sd_runner import _method_optimizer

    wl = SDWorkload.build()
    note("sd: init_params (860M)...")
    _, unet_params = init_sd_unet(jax.random.key(0), SDUNetConfig())
    opt = _method_optimizer(
        unet_params, train_method, 1e-5,
        nu_dtype=jnp.bfloat16 if train_method == "full" else None)
    cfg = SFRonConfig(n_iters=1000, forget_alpha=1.0, remain_alpha=1.0,
                      alpha_sched="const", forget_clip=None, remain_clip=None)
    step = make_sfron_step(cfg, opt, wl.nsfw_forget_loss_fn(),
                           wl.shared_step_loss)
    state = init_state(unet_params, opt)
    del unet_params  # the state holds its own copy; don't double-hold 3.4GB
    gc.collect()
    kd = jax.random.key(2)
    z = jax.random.normal(kd, (batch, 64, 64, 4)) * 0.2
    ctx_f = jax.random.normal(jax.random.fold_in(kd, 1), (batch, 77, 768)) * 0.1
    ctx_p = jax.random.normal(jax.random.fold_in(kd, 2), (batch, 77, 768)) * 0.1
    fb = (z, ctx_f, ctx_p)
    rb = (z, ctx_p)
    note("sd: compiling two-phase step...")
    step_c, flops_tpu = _aot(step, state, fb, rb, jax.random.key(3))
    # TPU cost analysis counts Pallas custom calls as ~0 FLOPs (the flash
    # attention is ~20% of this step's math): cost the SAME math via the
    # xla_only CPU lowering instead; keep the TPU figure as fallback. Must
    # be a FRESH unjitted step — the jitted one has already cached its
    # traced jaxpr WITH the pallas call from the TPU compile above, and
    # xla_only can only steer a fresh trace.
    def _cost():
        step_cost = make_sfron_step(cfg, opt, wl.nsfw_forget_loss_fn(),
                                    wl.shared_step_loss, donate=False,
                                    jit=False)
        return _lowered_flops(step_cost, _abstract(state), fb, rb,
                              jax.random.key(3))

    flops = _flops_cached(f"sd_unet_nsfw_step_b{batch}_{train_method}",
                          _cost) or flops_tpu
    state, _ = step_c(state, fb, rb, jax.random.key(3))
    _sync(state.params)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, _ = step_c(state, fb, rb, jax.random.key(3))
    _sync(state.params)
    dt = time.perf_counter() - t0
    return _metric(f"sd_unet_nsfw_step_b{batch}_{train_method}",
                   n_steps / dt, "steps/sec", flops=flops)


BENCHES = [
    ("ddpm", bench_ddpm_sfron_step),
    ("classification", bench_classification),
    ("ddim50", bench_ddim50_sampling),
    ("evaluator", bench_evaluator),
    ("dit", bench_dit_xl),
    ("sd", bench_sd),
    ("sd_full", lambda: bench_sd(train_method="full")),
    ("sd_b8", lambda: bench_sd(batch=8)),
    ("sd_b8_full", lambda: bench_sd(batch=8, train_method="full")),
]


HEADLINE = "ddpm_cifar10_sfron_two_phase_step_b128"
_PARTIAL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_partial.json")


def _combined(results):
    headline = next(
        (m for m in results if m.get("metric") == HEADLINE and "value" in m),
        results[0] if results else {"metric": "none", "error": "no benches"})
    out = dict(headline)
    out["all"] = results
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated bench names (default: all)")
    ap.add_argument("--mesh", type=str, default="",
                    help="'data=N': run the headline DDPM step data-sharded "
                         "over the first N local devices, recorded as "
                         "..._meshN. N=1 (or unset) is the plain single-chip "
                         "bench; on a multi-chip allotment this gives the "
                         "driver scaling numbers with no code change")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_SEC", "2400")),
                    help="wall-clock budget (sec). The headline DDPM bench "
                         "always runs; later benches are skipped once the "
                         "budget is exceeded, recorded as error='budget' — "
                         "a clean partial record beats a driver kill "
                         "mid-bench (BENCH_r03: rc=124, parsed=null)")
    args = ap.parse_args()
    only = {s for s in args.only.split(",") if s}
    mesh_n = 1
    if args.mesh:
        axis, _, n = args.mesh.partition("=")
        if axis != "data" or not n.isdigit():
            ap.error(f"--mesh must look like data=N, got {args.mesh!r}")
        mesh_n = min(int(n), len(jax.devices()))
        if mesh_n != int(n):
            note(f"--mesh data={n}: only {mesh_n} local device(s), clamped")

    from uurg_tpu.utils.rng import configure_rng

    configure_rng("auto")  # rbg on TPU: the training-CLI default

    t_start = time.perf_counter()
    results = []
    for name, fn in BENCHES:
        if only and name not in only:
            continue
        elapsed = time.perf_counter() - t_start
        if results and elapsed > args.budget:
            note(f"{name}: skipped — budget {args.budget:.0f}s exceeded "
                 f"({elapsed:.0f}s elapsed)")
            results.append({"metric": name, "error": "budget"})
            continue
        note(f"=== {name} ===")
        try:
            t0 = time.perf_counter()
            out = fn(mesh_n=mesh_n) if name == "ddpm" and mesh_n > 1 else fn()
            for m in (out if isinstance(out, list) else [out]):
                note(f"{name}: {m['metric']} {m['value']} {m['unit']} "
                     f"({time.perf_counter() - t0:.0f}s incl. compile)")
                results.append(m)
                # the headline lands on stdout THE MOMENT it exists: any
                # later timeout/kill still leaves a parseable perf line
                if m.get("metric") == HEADLINE and "value" in m:
                    print(json.dumps(m), flush=True)
        except Exception as e:  # record the failure, keep benching
            note(f"{name} FAILED: {e!r}")
            results.append({"metric": name, "error": repr(e)})
        try:  # mirror progress to disk (evidence survives a mid-run kill)
            with open(_PARTIAL, "w") as f:
                json.dump(_combined(results), f)
        except OSError:
            pass
        gc.collect()

    print(json.dumps(_combined(results)), flush=True)


if __name__ == "__main__":
    main()
