"""Shared setup for the DiT CLIs (forget / generate_fisher / generate_mask).

The reference repeats this model+data plumbing in each of
DiT/{forget,generate_fisher}.py (DiT/forget.py:193-267,
DiT/generate_fisher.py:150-216); here it is built once and imported by the
three entry points.
"""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_workload(args):
    """DiT workload + params, with reference-or-orbax checkpoint loading
    (DiT/forget.py:199-215 find_model)."""
    import jax
    import jax.numpy as jnp

    from uurg_tpu.io.checkpoint import restore_checkpoint
    from uurg_tpu.workloads.dit import DiTWorkload

    remat_policy = getattr(args, "remat_policy", "full")
    wl = DiTWorkload.build(
        args.model, args.image_size, args.num_classes,
        remat_policy=None if remat_policy == "full" else remat_policy)
    params = wl.init_params(jax.random.key(args.global_seed))
    if args.ckpt:
        if args.ckpt.endswith((".pt", ".pth", ".ckpt")):
            from uurg_tpu.io.dit_interop import load_dit_reference_checkpoint

            params = jax.tree_util.tree_map(
                jnp.asarray,
                load_dit_reference_checkpoint(args.ckpt, wl.cfg))
        else:
            ck = restore_checkpoint(args.ckpt,
                                    {"model": params, "ema": params})
            params = ck["model"]
    return wl, params


def forget_remain_iterators(args):
    """(forget_it, remain_it) device-array batch iterators over the three
    data tiers (all stream without holding the corpus in RAM):

      dir of npz shards  -> sharded latent reader (ImageNet-256 scale)
      single .npz        -> in-memory latents
      image folder       -> lazy per-batch decode + frozen-VAE encode in
                            the loop (DiT/forget.py:265-267 parity)
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uurg_tpu.data import class_forget_split, synthetic_dataset
    from uurg_tpu.data.arrays import infinite_batches
    from uurg_tpu.data.lazy import (
        LazyImageFolder,
        list_latent_shards,
        sharded_latent_batches,
    )

    latent_size = args.image_size // 8

    def device_stream(it):
        for x, y in it:
            yield jnp.asarray(x), jnp.asarray(y)

    shards = list_latent_shards(args.data_path) if args.data_path else []
    is_image_folder = (args.data_path and os.path.isdir(args.data_path)
                       and not shards)

    # a shard DIR (even with one file) streams; a bare .npz loads in-memory
    use_sharded = len(shards) > 1 or (
        len(shards) == 1 and os.path.isdir(args.data_path))
    if use_sharded:
        forget_it = device_stream(sharded_latent_batches(
            shards, args.global_batch_size, seed=args.global_seed,
            keep_label=lambda y: y == args.label_to_forget))
        remain_it = device_stream(sharded_latent_batches(
            shards, args.global_batch_size, seed=args.global_seed + 1,
            keep_label=lambda y: y != args.label_to_forget))
        return forget_it, remain_it

    if shards:  # single npz, in-memory
        data = np.load(shards[0])
        from uurg_tpu.data.arrays import ArrayDataset

        ds = ArrayDataset(data["latents"], data["labels"])
    elif is_image_folder:
        ds = LazyImageFolder(args.data_path, args.image_size)
    else:
        logging.warning("no latent dataset; synthetic latents")
        ds = synthetic_dataset(1024, latent_size, 4, args.num_classes,
                               args.global_seed)
    remain, forget = class_forget_split(ds, args.label_to_forget)

    if is_image_folder:
        # jitted frozen-VAE encode per batch
        from uurg_tpu.io.checkpoint import restore_checkpoint as _rc
        from uurg_tpu.models.autoencoder_kl import AutoencoderKL, init_vae

        vae, vae_params = init_vae(jax.random.key(0),
                                   resolution=args.image_size)
        if getattr(args, "vae_ckpt", ""):
            vae_params = _rc(args.vae_ckpt, vae_params)
        enc = jax.jit(lambda x, k: vae.apply(
            {"params": vae_params}, x, k, method=AutoencoderKL.encode))

        def batches(d, seed):
            key = jax.random.key(seed)
            for x, y in infinite_batches(d, args.global_batch_size,
                                         seed=seed):
                key, sub = jax.random.split(key)
                yield enc(jnp.asarray(x * 2.0 - 1.0), sub), jnp.asarray(y)

        return (batches(forget, args.global_seed),
                batches(remain, args.global_seed + 1))

    forget_it = device_stream(infinite_batches(
        forget, args.global_batch_size, seed=args.global_seed))
    remain_it = device_stream(infinite_batches(
        remain, args.global_batch_size, seed=args.global_seed + 1))
    return forget_it, remain_it
