"""ocpg_tpu — a TPU-native (JAX/XLA/Pallas) referring video object segmentation framework.

From-scratch rebuild of the capabilities of TJUMMG/OCPG (weakly supervised
referring VOS): given a video clip and a natural-language expression, predict
per-frame binary masks of the referred object.

Design principles (TPU-first):
  * static shapes everywhere; frames ride the batch dimension
  * NHWC layouts so channels land on the 128-wide lane dimension
  * bf16 matmul path with fp32 islands (FFT, softmax, losses)
  * data/sequence parallelism via jax.sharding.Mesh + jit, not NCCL
"""

__version__ = "0.1.0"
