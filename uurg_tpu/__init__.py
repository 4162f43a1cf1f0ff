"""uurg_tpu — a TPU-native machine-unlearning framework.

A from-scratch JAX/Flax/pjit re-design of the capabilities of
K1nght/Unified-Unlearning-w-Remain-Geometry (SFR-on: saliency forgetting in the
remain-preserving manifold, online), covering four workloads:

- image-classifier unlearning  (reference: Classification/)
- conditional-DDPM unlearning  (reference: DDPM/)
- latent-DiT unlearning        (reference: DiT/)
- Stable-Diffusion erasure     (reference: SD/)

Unlike the reference (four silos sharing zero code), the algorithmic core —
Fisher-diagonal saliency, adaptive gradient-ascent loss, the fast-slow
two-phase update, EMA mixing — is built ONCE here (`uurg_tpu.unlearn`) and
shared by every workload. Compute runs through jit/pjit over a
`jax.sharding.Mesh`; samplers are `lax.scan` loops; hot ops have Pallas
kernels in `uurg_tpu.ops`.
"""

__version__ = "0.1.0"
