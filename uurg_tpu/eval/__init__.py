from uurg_tpu.eval.features import (
    softmax, entropy, m_entropy, confidence, correctness,
)
from uurg_tpu.eval.mia import membership_attack_prob, svc_mia
from uurg_tpu.eval.js_div import (
    kl_divergence, js_divergence, get_js_divergence,
)
from uurg_tpu.eval.generative import (
    FIDStatistics, compute_fid, inception_score, precision_recall,
    evaluate_all,
)
from uurg_tpu.eval.classifier_eval import classifier_probe, topk_classification
