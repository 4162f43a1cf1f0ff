from uurg_tpu.unlearn.fisher import (
    make_fisher_batch_step,
    accumulate_fisher,
    make_per_sample_fisher_step,
)
from uurg_tpu.unlearn.saliency import (
    fisher_ratio_mask,
    topk_saliency_mask,
    mask_sparsity,
)
from uurg_tpu.unlearn.ema import ema_update, fast_slow_mix
from uurg_tpu.unlearn.sfron import (SFRonConfig, SFRonState, make_sfron_step,
                                    stack_microbatches)
