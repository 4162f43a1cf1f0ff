"""Sharded sampling on the 8-device CPU mesh: SPMD DDIM over local chips."""
import types

import jax
import numpy as np
import pytest

from uurg_tpu.data import synthetic_dataset
from uurg_tpu.workloads import ddpm_runner as R
from tests.test_ddpm_pipeline import TINY_CFG, _args


@pytest.mark.slow
def test_sample_images_sharded_across_devices(tmp_path, monkeypatch):
    assert jax.device_count() == 8
    monkeypatch.setattr(R, "_load_train_dataset",
                        lambda a, c: synthetic_dataset(32, 8, 3, 4))
    args = _args(tmp_path)
    from uurg_tpu.workloads.ddpm import DDPMWorkload
    import jax.numpy as jnp

    wl = DDPMWorkload.from_config(TINY_CFG, dtype=jnp.float32)
    params = wl.init_params(jax.random.key(0))
    labels = np.asarray([1, 2, 3, 1, 2, 3, 1, 2, 3, 1])
    imgs = R.sample_images(args, TINY_CFG, params, labels, num_steps=4,
                           batch_size=8)
    assert imgs.shape == (10, 8, 8, 3)
    assert imgs.dtype == np.uint8
