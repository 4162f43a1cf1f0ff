from uurg_tpu.core.registry import Registry

model_registry = Registry("model")

from uurg_tpu.models.unet_cond import CondUNet, UNetConfig, init_unet  # noqa: E402

model_registry.register("cond_unet", CondUNet)
