from uurg_tpu.train.optim import (
    make_optimizer,
    cosine_annealing,
    build_reference_optimizer,
)
