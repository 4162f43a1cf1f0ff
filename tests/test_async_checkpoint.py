"""Async checkpointing: save_checkpoint(block=False) + wait_for_saves.

The snapshot must be taken eagerly (later param updates must not leak into
an in-flight save) and the metadata sidecar must land only after Orbax
finalizes the directory."""
import os

import jax.numpy as jnp
import numpy as np

from uurg_tpu.io.checkpoint import (load_metadata, restore_checkpoint,
                                    save_checkpoint, wait_for_saves)


def test_async_save_roundtrip(tmp_path):
    tree = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "step": jnp.asarray(7)}
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, tree, metadata={"kind": "test"}, block=False)
    wait_for_saves()
    back = restore_checkpoint(path, tree)
    np.testing.assert_array_equal(np.asarray(back["w"]),
                                  np.asarray(tree["w"]))
    assert int(back["step"]) == 7
    assert load_metadata(path)["kind"] == "test"


def test_async_save_snapshots_eagerly(tmp_path):
    """Mutating the (host numpy) tree after save must not change what
    lands on disk."""
    arr = np.ones((4,), np.float32)
    path = os.path.join(str(tmp_path), "ckpt2")
    save_checkpoint(path, {"w": arr}, block=False)
    arr[:] = -1.0
    wait_for_saves()
    back = restore_checkpoint(path, {"w": np.zeros((4,), np.float32)})
    np.testing.assert_array_equal(back["w"], np.ones((4,), np.float32))


def test_wait_for_saves_idempotent():
    wait_for_saves()
    wait_for_saves()
