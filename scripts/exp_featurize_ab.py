"""One-off A/B: serial vs pipelined inception featurize, same process.

Eliminates tunnel-condition variance between benchmark windows by timing
both disciplines back to back (twice, interleaved).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from uurg_tpu.eval.generative import featurize
from uurg_tpu.eval.inception import init_inception, make_extractor


def main(batch=256, n_batches=8):
    _, variables = init_inception(jax.random.key(0))
    ext_np = make_extractor(variables)                     # serial download
    ext_dev = make_extractor(variables, materialize=False)  # pipelined
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (n_batches * batch, 32, 32, 3), np.uint8)

    # warm both jits (same underlying program; two wrappers)
    featurize(ext_np, images[:batch], batch)
    featurize(ext_dev, images[:batch], batch)

    for rep in range(2):
        for name, ext in (("serial", ext_np), ("pipelined", ext_dev)):
            t0 = time.perf_counter()
            out = featurize(ext, images, batch)
            dt = time.perf_counter() - t0
            del out
            print(f"rep{rep} {name:10s} {len(images) / dt:8.1f} imgs/sec "
                  f"({dt:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
