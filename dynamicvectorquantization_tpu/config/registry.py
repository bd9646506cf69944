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
    "models.stage2_dynamic.dqtransformer_t2i.Dualformer": f"{_PKG}.models.dqtransformer.T2IDualformer",
    # ---- text encoders (t2i) ----
    "modules.text_encoders.clip_text_encoder.CLIPTextEncoder": f"{_PKG}.nn.text_encoders.CLIPTextEncoder",
    "modules.text_encoders.bert_text_encoder.BERTTextEncoder": f"{_PKG}.nn.text_encoders.BERTTextEncoder",
    # from-scratch CLIP text tower + BPE (reference vendors OpenAI CLIP at
    # modules/text_encoders/clip_text_encoder/; it imports itself under the
    # shorter `modules.clip_text_encoder.` path via sys.path hacks — both
    # spellings resolve here)
    "modules.text_encoders.clip_text_encoder.clip_text_embedding.CLIPTextEmbedding": f"{_PKG}.nn.clip_text.CLIPTextEmbedding",
    "modules.clip_text_encoder.clip_text_embedding.CLIPTextEmbedding": f"{_PKG}.nn.clip_text.CLIPTextEmbedding",
    "modules.text_encoders.clip_text_encoder.my_tokenizer.my_tokenize.Tokenize": f"{_PKG}.utils.clip_bpe.Tokenize",
    "modules.clip_text_encoder.my_tokenizer.my_tokenize.Tokenize": f"{_PKG}.utils.clip_bpe.Tokenize",
    "modules.text_encoders.clip_text_encoder.clip.simple_tokenizer.SimpleTokenizer": f"{_PKG}.utils.clip_bpe.ClipBPETokenizer",
    "modules.clip_text_encoder.clip.simple_tokenizer.SimpleTokenizer": f"{_PKG}.utils.clip_bpe.ClipBPETokenizer",
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
    "modules.vector_quantization.quantize_codebook_mask.MaskVectorQuantize": f"{_PKG}.ops.quantizers.MaskVectorQuantize",
    # ---- losses / discriminator ----
    "modules.losses.vqperceptual_multidisc.VQLPIPSWithDiscriminator": f"{_PKG}.losses.vqperceptual.VQLPIPSWithDiscriminator",
    "modules.losses.vqperceptual.VQLPIPSWithDiscriminator": f"{_PKG}.losses.vqperceptual.VQLPIPSWithDiscriminator",
    "modules.losses.vqperceptual.DummyLoss": f"{_PKG}.losses.vqperceptual.DummyLoss",
    "modules.discriminator.model.NLayerDiscriminator": f"{_PKG}.nn.discriminator.NLayerDiscriminator",
    "modules.discriminator.stylegan.Discriminator": f"{_PKG}.nn.stylegan_discriminator.StyleGAN2Discriminator",
    "modules.discriminator.stylegan_lucidrains.Discriminator": f"{_PKG}.nn.stylegan_discriminator.LucidrainsDiscriminator",
    # ---- legacy stage-1 baselines ----
    "models.stage1.vqgan.VQModel": f"{_PKG}.models.vqgan.VQModel",
    "models.stage1.vqgan_multivq.VQModel": f"{_PKG}.models.vqgan.MultiVQModel",
    "modules.vector_quantization.quantize2_list.VectorQuantize2": f"{_PKG}.ops.vq.VectorQuantizeEMA",
    "modules.vqvae.quantize2.VectorQuantize2": f"{_PKG}.ops.vq.VectorQuantizeEMA",
    "modules.diffusionmodules.model.Encoder": f"{_PKG}.nn.vqgan_codec.VQGANEncoder",
    "modules.diffusionmodules.model.Decoder": f"{_PKG}.nn.vqgan_codec.VQGANDecoder",
    # dead code in the reference (no config/import reaches them; r03 VERDICT
    # footnote) — ported in nn/ddpm_unet.py so the inventory has no asterisks
    "modules.diffusionmodules.model.Model": f"{_PKG}.nn.ddpm_unet.DDPMUNet",
    "modules.diffusionmodules.model.VUNet": f"{_PKG}.nn.ddpm_unet.VUNet",
    "modules.diffusionmodules.model.SimpleDecoder": f"{_PKG}.nn.ddpm_unet.SimpleDecoder",
    "modules.diffusionmodules.model.UpsampleDecoder": f"{_PKG}.nn.ddpm_unet.UpsampleDecoder",
    "models.stage1.rqvae.RQModel": f"{_PKG}.models.vqgan.RQModel",
    "models.stage1.rqvae.VQModel": f"{_PKG}.models.vqgan.RQModel",
    # ---- legacy quantizers ----
    "modules.vector_quantization.quantize_vqgan.VectorQuantizer": f"{_PKG}.ops.quantizers.VectorQuantizer",
    "modules.vector_quantization.quantize_vqgan.VectorQuantizer2": f"{_PKG}.ops.quantizers.VectorQuantizer2",
    "modules.vector_quantization.quantize.VectorQuantizer": f"{_PKG}.ops.quantizers.VectorQuantizer",
    "modules.vector_quantization.quantize_vqgan.GumbelQuantize": f"{_PKG}.ops.quantizers.GumbelQuantize",
    "modules.vector_quantization.quantize_vqgan.EMAVectorQuantizer": f"{_PKG}.ops.quantizers.EMAVectorQuantizer",
    "modules.vector_quantization.quantize_rqvae.RQBottleneck": f"{_PKG}.ops.quantizers.RQBottleneck",
    # ---- legacy stage-2 (minGPT family) ----
    "modules.transformer.mingpt.GPT": f"{_PKG}.nn.mingpt.GPT",
    "modules.transformer.stacked_mingpt.StackedPositionGPT": f"{_PKG}.nn.stacked_mingpt.StackedPositionGPT",
    "modules.transformer.position_aware_mingpt.PositionAwareGPT": f"{_PKG}.nn.vit.PositionAwareGPT",
    "modules.transformer.vit.VisionTransformerEncoder": f"{_PKG}.nn.vit.VisionTransformerEncoder",
    "modules.transformer.vit.VisionTransformerDecoder": f"{_PKG}.nn.vit.VisionTransformerDecoder",
    "modules.vector_quantization.quantize_lucidrains.VectorQuantize": f"{_PKG}.ops.quantize_lucidrains.LucidrainsVectorQuantize",
    "models.stage2.uncond_transformer.UncondTransformer": f"{_PKG}.models.legacy_transformer.UncondTransformer",
    "models.stage2.uncond_transformer.Net2NetTransformer": f"{_PKG}.models.legacy_transformer.UncondTransformer",
    "models.stage2.class_transformer.ClassTransformer": f"{_PKG}.models.legacy_transformer.ClassTransformer",
    "models.stage2.class_transformer.Net2NetTransformer": f"{_PKG}.models.legacy_transformer.ClassTransformer",
    "models.stage2.text2image_transformer.Text2ImageTransformer": f"{_PKG}.models.legacy_transformer.Text2ImageTransformer",
    "models.stage2.text2image_transformer2.Text2ImageTransformer": f"{_PKG}.models.legacy_transformer.Text2ImageTransformer2",
    "models.stage2.uncond_rqtransformer.RQTransformerTrainer": f"{_PKG}.models.legacy_transformer.RQTransformerTrainer",
    "modules.transformer.mingpt_t2i.T2IGPT": f"{_PKG}.nn.mingpt.GPT",
    # ---- legacy sequence permuters ----
    "modules.transformer.permuter.Identity": f"{_PKG}.models.sequence_permuters.Identity",
    "modules.transformer.permuter.Subsample": f"{_PKG}.models.sequence_permuters.Subsample",
    "modules.transformer.permuter.ZCurve": f"{_PKG}.models.sequence_permuters.ZCurve",
    "modules.transformer.permuter.SpiralOut": f"{_PKG}.models.sequence_permuters.SpiralOut",
    "modules.transformer.permuter.SpiralIn": f"{_PKG}.models.sequence_permuters.SpiralIn",
    "modules.transformer.permuter.Random": f"{_PKG}.models.sequence_permuters.Random",
    "modules.transformer.permuter.AlternateParsing": f"{_PKG}.models.sequence_permuters.AlternateParsing",
    # ---- legacy conditioners ----
    "utils.utils.SOSProvider": f"{_PKG}.models.legacy_transformer.SOSProvider",
    "utils.utils.Labelator": f"{_PKG}.models.legacy_transformer.Labelator",
    # ---- masked attention decoder (attn_model experiments) ----
    "modules.diffusionmodules.attn_model.AttnDecoder": f"{_PKG}.nn.attn_decoder.AttnDecoder",
    "modules.diffusionmodules.attn_model.TokenReconstruction": f"{_PKG}.nn.attn_decoder.TokenReconstruction",
    "modules.diffusionmodules.attn_model.SelfAttnBlock": f"{_PKG}.nn.attn_decoder.MaskedSelfAttnBlock",
    "modules.diffusionmodules.attn_model.BiasedSelfAttnBlock": f"{_PKG}.nn.attn_decoder.MaskedSelfAttnBlock",
    "modules.diffusionmodules.attn_model.ResnetBlock_kernel_1": f"{_PKG}.nn.attn_decoder.ResnetBlockK1",
    # ---- trainer-internal callbacks/loggers (reference train.py defaults;
    #      functionality is native to our Trainer — see each shim's docstring) ----
    "utils.logger.SetupCallback": f"{_PKG}.utils.logging.SetupCallback",
    "utils.logger.CaptionImageLogger": f"{_PKG}.utils.logging.ImageLogger",
    "pytorch_lightning.callbacks.ModelCheckpoint": f"{_PKG}.utils.logging.LightningShim",
    "pytorch_lightning.callbacks.LearningRateMonitor": f"{_PKG}.utils.logging.LightningShim",
    "pytorch_lightning.callbacks.RichModelSummary": f"{_PKG}.utils.logging.LightningShim",
    "pytorch_lightning.loggers.TensorBoardLogger": f"{_PKG}.utils.logging.LightningShim",
    "pytorch_lightning.loggers.WandbLogger": f"{_PKG}.utils.logging.LightningShim",
    # ---- data ----
    "data.build.DataModuleFromConfig": f"{_PKG}.data.datasets.DataModuleFromConfig",
    "data.imagenet.ImageNetTrain": f"{_PKG}.data.datasets.ImageNetTrain",
    "data.imagenet.ImageNetValidation": f"{_PKG}.data.datasets.ImageNetValidation",
    "data.faceshq.FFHQTrain": f"{_PKG}.data.datasets.FFHQTrain",
    "data.faceshq.FFHQValidation": f"{_PKG}.data.datasets.FFHQValidation",
    "data.faceshq.CelebAHQTrain": f"{_PKG}.data.datasets.CelebAHQTrain",
    "data.faceshq.CelebAHQValidation": f"{_PKG}.data.datasets.CelebAHQValidation",
    "data.faceshq.FacesHQTrain": f"{_PKG}.data.datasets.FacesHQTrain",
    "data.faceshq.FacesHQValidation": f"{_PKG}.data.datasets.FacesHQValidation",
    "data.ffhq_lmdb.FFHQ_LMDB": f"{_PKG}.data.ffhq_lmdb.FFHQ_LMDB",
}


def resolve_target(target: str) -> str:
    return TARGET_ALIASES.get(target, target)
