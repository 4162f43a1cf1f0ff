from uurg_tpu.core.registry import Registry

model_registry = Registry("model")

from uurg_tpu.models.unet_cond import CondUNet, UNetConfig, init_unet  # noqa: E402
from uurg_tpu.models.resnet import (  # noqa: E402
    ResNet18, ResNet34, ResNet50, ResNet101, ResNet152, init_classifier,
)
from uurg_tpu.models.vit import ViT_B  # noqa: E402
from uurg_tpu.models.swin import Swin_T, Swin_S, Swin_B  # noqa: E402
from uurg_tpu.models.dit import DiT, DiTConfig, DiT_configs, build_dit, init_dit  # noqa: E402

model_registry.register("cond_unet", CondUNet)

# classifier registry (Classification/models/__init__.py:5-6 create_model
# parity, without eval())
for _name, _fn in [
    ("ResNet18", ResNet18), ("ResNet34", ResNet34), ("ResNet50", ResNet50),
    ("ResNet101", ResNet101), ("ResNet152", ResNet152),
    ("ViT_B", ViT_B), ("Swin_T", Swin_T), ("Swin_S", Swin_S),
    ("Swin_B", Swin_B),
]:
    model_registry.register(_name, _fn)


def create_model(model_name: str, num_classes: int = 10, **kw):
    """Classifier factory keeping the reference's create_model signature."""
    return model_registry.get(model_name)(num_classes=num_classes, **kw)
