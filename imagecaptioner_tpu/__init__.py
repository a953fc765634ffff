"""imagecaptioner_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-captioning
knowledge-distillation framework.

Brand-new implementation of the capabilities of the PyTorch reference
``VeeraKarthick609/ImageCaptioner`` (see SURVEY.md): a ViT-S/16 + transformer
decoder teacher distilled into CNN-LSTM students, with multi-level
distillation losses, on-device greedy/beam decoding, BLEU/METEOR evaluation,
and a pipeline orchestrator — all designed TPU-first: functional modules over
parameter pytrees, jit-compiled train steps, `lax.scan` recurrences, Pallas
kernels for the hot LSTM+attention path, and data-parallel sharding over a
`jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
