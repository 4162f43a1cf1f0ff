from uurg_tpu.data.arrays import (
    ArrayDataset,
    epoch_batches,
    infinite_batches,
    random_flip_batch,
    pad_crop_batch,
    rand_augment_batch,
)
from uurg_tpu.data.datasets import (
    dataset_registry,
    load_cifar10,
    load_cifar100,
    load_svhn,
    load_image_folder,
    synthetic_dataset,
)
from uurg_tpu.data.splits import (
    class_forget_split,
    incremental_random_split,
    random_forget_split,
)
from uurg_tpu.data.transforms import data_transform, inverse_data_transform
