"""bench.py --mesh data=N path on the virtual 8-device CPU mesh.

Asserts the bench's OWN mesh code (state replication + batch sharding +
the SPMD-compiled two-phase step) runs end to end — the single-chip driver
bench never exercises it, so without this the mesh mode would rot.
Parity intent: DiT/sample_ddp.py:54-60 (the reference's only multi-device
path is data-sharded work division).
"""
import jax
import jax.numpy as jnp
import pytest

import bench

pytestmark = pytest.mark.slow  # compiles a (tiny) UNet fwd+bwd twice


def _tiny_ddpm(batch):
    from uurg_tpu.core.config import Config
    from uurg_tpu.workloads.ddpm import DDPMWorkload

    cfg = Config({
        "data": {"image_size": 32, "channels": 3, "n_classes": 10,
                 "rescaled": True},
        "model": {"in_channels": 3, "out_ch": 3, "ch": 16,
                  "ch_mult": [1, 2], "num_res_blocks": 1,
                  "attn_resolutions": [16], "dropout": 0.0,
                  "var_type": "fixedlarge", "resamp_with_conv": True,
                  "cond_drop_prob": 0.1},
        "diffusion": {"beta_schedule": "linear", "beta_start": 1e-4,
                      "beta_end": 2e-2, "num_diffusion_timesteps": 1000},
        "training": {"lambd": 0.5},
    })
    return DDPMWorkload.from_config(cfg, dtype=jnp.float32)


def test_bench_ddpm_mesh_smoke():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    m = bench.bench_ddpm_sfron_step(batch=16, n_steps=2, mesh_n=8,
                                    wl_factory=_tiny_ddpm)
    assert m["metric"] == "ddpm_cifar10_sfron_two_phase_step_b128_mesh8"
    assert m["value"] > 0
    assert m["vs_baseline"] > 0  # keyed off the single-chip estimate


def test_bench_ddpm_mesh1_name_unchanged():
    # mesh_n=1 must be byte-identical to the default bench record shape —
    # the driver's plain `python bench.py` path.
    m = bench.bench_ddpm_sfron_step(batch=8, n_steps=1, mesh_n=1,
                                    wl_factory=_tiny_ddpm)
    assert m["metric"] == "ddpm_cifar10_sfron_two_phase_step_b128"
