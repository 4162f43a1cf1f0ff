#!/usr/bin/env python
"""SA-FIM CLI — reference-flag-compatible (DDPM/fim.py): per-sample
full-ELBO Fisher information, chunked over timesteps.

The reference computes per-sample grads with sequential
``loss[i].backward(retain_graph=True)`` over ``n_chunks`` timestep chunks
(DDPM/runners/diffusion.py:262-352); here it is ``vmap(grad)`` per chunk —
one compiled program, no retain-graph gymnastics.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--ckpt_folder", type=str, required=True)
    p.add_argument("--n_chunks", type=int, default=20)
    p.add_argument("--n_samples", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from uurg_tpu.core import tree as tr
    from uurg_tpu.core.config import load_config
    from uurg_tpu.data import data_transform, epoch_batches
    from uurg_tpu.io.checkpoint import save_checkpoint
    from uurg_tpu.unlearn import make_per_sample_fisher_step
    from uurg_tpu.workloads import ddpm_runner as R
    from uurg_tpu.workloads.ddpm import DDPMWorkload

    config = load_config(args.config)
    wl = DDPMWorkload.from_config(config)
    params = R.load_params(args, config, wl)
    ds = R._load_train_dataset(args, config)

    T = wl.schedule.num_timesteps
    chunk_size = T // args.n_chunks
    fisher = tr.tree_zeros_like(params)
    key = jax.random.key(args.seed)
    # ONE compiled program for every chunk: the timestep chunk rides in the
    # per-example batch tuple instead of being a closure constant
    step = make_per_sample_fisher_step(wl.elbo_chunk_loss_fn())
    for ci in range(args.n_chunks):
        ts = np.arange(ci * chunk_size, (ci + 1) * chunk_size,
                       dtype=np.int32)
        n_seen = 0
        for x, c in epoch_batches(ds, args.batch_size):
            if n_seen >= args.n_samples:
                break
            x = data_transform(config, jnp.asarray(x))
            rngs = jax.random.split(key, x.shape[0])
            key = jax.random.fold_in(key, 1)
            ts_b = jnp.broadcast_to(jnp.asarray(ts), (x.shape[0],) + ts.shape)
            fisher = step(fisher, params, (x, jnp.asarray(c), ts_b), rngs)
            n_seen += x.shape[0]
        logging.info("chunk %d/%d done", ci + 1, args.n_chunks)

    fisher = tr.tree_scale(fisher, 1.0 / args.n_chunks)
    out = os.path.join(args.ckpt_folder, "fisher_dict")
    save_checkpoint(out, fisher)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
