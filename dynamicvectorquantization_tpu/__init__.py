"""dynamicvectorquantization_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework
for two-stage variable-length VQ image generation (DQ-VAE + DQ-Transformer).

Capability-parity rebuild of CrossmodalGroup/DynamicVectorQuantization
(CVPR 2023), designed TPU-first: NHWC convs on the MXU, a fused Pallas
distance+argmin+gather vector-quantization kernel, static padded shapes for
variable-length code sequences, KV-cached coarse-to-fine autoregressive
sampling, and data parallelism over a `jax.sharding.Mesh`.

Public surface mirrors the reference's (see SURVEY.md):
  - YAML configs with `{target, params}` reflection (reference target strings
    are mapped to the classes here via `config.registry`).
  - Stage-1 models: DualGrainVQModel (feature / entropy router),
    TripleGrainVQModel.
  - Stage-2 models: Dualformer (unconditional / class-conditional).
  - encode / decode / sample entry points; PyTorch checkpoints loadable via
    `utils.torch_ckpt`.
"""

__version__ = "0.1.0"
