"""Per-sample full-ELBO FIM integrand test (SA pipeline)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_ddpm_pipeline import TINY_CFG
from uurg_tpu.core import tree as tr
from uurg_tpu.unlearn import make_per_sample_fisher_step
from uurg_tpu.workloads.ddpm import DDPMWorkload


@pytest.mark.slow
def test_elbo_chunk_per_sample_fisher():
    wl = DDPMWorkload.from_config(TINY_CFG, dtype=jnp.float32)
    params = wl.init_params(jax.random.key(0))
    step = make_per_sample_fisher_step(wl.elbo_chunk_loss_fn())
    fisher = tr.tree_zeros_like(params)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    c = jnp.asarray([0, 1])
    # two different chunks through the SAME compiled step
    for ts in (jnp.asarray([[0, 1, 2], [0, 1, 2]], jnp.int32),
               jnp.asarray([[3, 4, 5], [3, 4, 5]], jnp.int32)):
        rngs = jax.random.split(jax.random.key(2), 2)
        fisher = step(fisher, params, (x, c, ts), rngs)
    leaves = jax.tree_util.tree_leaves(fisher)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(l)) > 0 for l in leaves)
