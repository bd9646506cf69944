"""Mapping from the reference repo's `target` strings to this package's classes.

The reference's YAML schema (see e.g.
`configs/stage1/dqvae-entropy-dual-r05_imagenet.yml` in
CrossmodalGroup/DynamicVectorQuantization) is the public config surface we
reproduce: any `target:` dotted path appearing in a shipped reference config
resolves here to the TPU-native implementation.  Native
`dynamicvectorquantization_tpu.*` paths pass through unchanged.
"""
from __future__ import annotations

_PKG = "dynamicvectorquantization_tpu"

TARGET_ALIASES = {
    # ---- stage-1 models (reference models/stage1_dynamic/*) ----
    "models.stage1_dynamic.dqvae_dual_entropy.DualGrainVQModel": f"{_PKG}.models.dqvae.DualGrainVQModel",
    "models.stage1_dynamic.dqvae_dual_feat.DualGrainVQModel": f"{_PKG}.models.dqvae.DualGrainVQModel",
    "models.stage1_dynamic.dqvae_triple_feat.TripleGrainVQModel": f"{_PKG}.models.dqvae.TripleGrainVQModel",
    # ---- stage-2 models (reference models/stage2_dynamic/*) ----
    "models.stage2_dynamic.dqtransformer_uncond_entropy.Dualformer": f"{_PKG}.models.dqtransformer.Dualformer",
    "models.stage2_dynamic.dqtransformer_class2_entropy.Dualformer": f"{_PKG}.models.dqtransformer.ClassCondDualformer",
    "models.stage2_dynamic.dqtransformer_class.Dualformer": f"{_PKG}.models.dqtransformer.ClassCondDualformer",
    # ---- dynamic modules ----
    "modules.dynamic_modules.EncoderDual.DualGrainEncoder": f"{_PKG}.nn.encoder_dual.DualGrainEncoder",
    "modules.dynamic_modules.EncoderTriple.TripleGrainEncoder": f"{_PKG}.nn.encoder_triple.TripleGrainEncoder",
    "modules.dynamic_modules.RouterDual.DualGrainFeatureRouter": f"{_PKG}.nn.routers.DualGrainFeatureRouter",
    "modules.dynamic_modules.RouterDual.DualGrainFixedEntropyRouter": f"{_PKG}.nn.routers.DualGrainFixedEntropyRouter",
    "modules.dynamic_modules.RouterTriple.TripleGrainFeatureRouter": f"{_PKG}.nn.routers.TripleGrainFeatureRouter",
    "modules.dynamic_modules.RouterTriple.TripleGrainFixedEntropyRouter": f"{_PKG}.nn.routers.TripleGrainFixedEntropyRouter",
    "modules.dynamic_modules.DecoderPositional.Decoder": f"{_PKG}.nn.decoder_positional.PositionalDecoder",
    "modules.dynamic_modules.Decoder.Decoder": f"{_PKG}.nn.decoder_positional.PositionalDecoder",
    "modules.dynamic_modules.permuter.DualGrainSeperatePermuter": f"{_PKG}.models.permuter.DualGrainSeparatePermuter",
    "modules.dynamic_modules.stackgpt.StackGPT": f"{_PKG}.nn.stackgpt.StackGPT",
    "modules.dynamic_modules.budget.BudgetConstraint_RatioMSE_DualGrain": f"{_PKG}.models.budget.BudgetConstraintRatioMSEDualGrain",
    "modules.dynamic_modules.budget.BudgetConstraint_NormedSeperateRatioMSE_TripleGrain": f"{_PKG}.models.budget.BudgetConstraintNormedSeparateRatioMSETripleGrain",
    "modules.dynamic_modules.label_provider.PositionAwareSOSProvider": f"{_PKG}.models.label_providers.PositionAwareSOSProvider",
    "modules.dynamic_modules.label_provider.ClassAwareSOSProvider": f"{_PKG}.models.label_providers.ClassAwareSOSProvider",
    "modules.dynamic_modules.label_provider.ClassForContentOnlyPositionAwareSOSProvider": f"{_PKG}.models.label_providers.ClassForContentOnlyPositionAwareSOSProvider",
    # ---- vector quantization ----
    "modules.vector_quantization.quantize2_mask.VectorQuantize2": f"{_PKG}.ops.vq.VectorQuantizeEMA",
    "modules.vector_quantization.quantize2.VectorQuantize2": f"{_PKG}.ops.vq.VectorQuantizeEMA",
    "modules.vector_quantization.quantize_codebook_mask.MaskVectorQuantize": f"{_PKG}.ops.vq.VectorQuantizeEMA",
    # ---- losses / discriminator ----
    "modules.losses.vqperceptual_multidisc.VQLPIPSWithDiscriminator": f"{_PKG}.losses.vqperceptual.VQLPIPSWithDiscriminator",
    "modules.losses.vqperceptual.VQLPIPSWithDiscriminator": f"{_PKG}.losses.vqperceptual.VQLPIPSWithDiscriminator",
    "modules.losses.vqperceptual.DummyLoss": f"{_PKG}.losses.vqperceptual.DummyLoss",
    "modules.discriminator.model.NLayerDiscriminator": f"{_PKG}.nn.discriminator.NLayerDiscriminator",
    # ---- data ----
    "data.build.DataModuleFromConfig": f"{_PKG}.data.datasets.DataModuleFromConfig",
    "data.imagenet.ImageNetTrain": f"{_PKG}.data.datasets.ImageNetTrain",
    "data.imagenet.ImageNetValidation": f"{_PKG}.data.datasets.ImageNetValidation",
    "data.faceshq.FFHQTrain": f"{_PKG}.data.datasets.FFHQTrain",
    "data.faceshq.FFHQValidation": f"{_PKG}.data.datasets.FFHQValidation",
}


def resolve_target(target: str) -> str:
    return TARGET_ALIASES.get(target, target)
