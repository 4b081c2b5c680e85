"""arvae_tpu — a TPU-native framework for attribute-regularized VAEs.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
ashispati/ar-vae (Pati & Lerch, "Attribute-based Regularization of
Latent Spaces for Variational Auto-Encoders", NCAA 2020).

Layer map (mirrors SURVEY.md §1 of the reference, re-designed TPU-first):

- ``arvae_tpu.core``      — configs, run-naming, checkpointing (orbax).
- ``arvae_tpu.parallel``  — device mesh + sharding (data parallelism over ICI).
- ``arvae_tpu.ops``       — loss library incl. the fused Pallas AR-reg kernel.
- ``arvae_tpu.models``    — Flax model families (image VAE, measure VAE, fader).
- ``arvae_tpu.data``      — host-side dataset builders + attribute extractors.
- ``arvae_tpu.training``  — jitted train steps + epoch drivers.
- ``arvae_tpu.eval``      — disentanglement metric suite (host, sklearn).
- ``arvae_tpu.utils``     — plotting / artifact generation / MIDI IO.
"""

__version__ = "0.1.0"
