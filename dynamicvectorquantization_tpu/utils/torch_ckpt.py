"""PyTorch -> flax checkpoint conversion for reference DQ-VAE / DQ-Transformer
checkpoints.

The reference saves Lightning checkpoints (`{"state_dict": {...}}`) with the
module trees of `models/stage1_dynamic/dqvae_*.py` and
`models/stage2_dynamic/dqtransformer_*.py`. This module translates those key
paths onto this package's flax trees and fixes layouts:

  * Conv2d weight OIHW -> HWIO transpose;
  * Linear weight (out, in) -> kernel (in, out) transpose;
  * GroupNorm/LayerNorm/BatchNorm weight -> scale;
  * Embedding weight -> embedding table;
  * VQ codebook weight + EMA buffers -> the "ema" collection.

torch (CPU build) is used only for deserializing .pth/.ckpt files.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _conv_kernel(w):
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _linear_kernel(w):
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _block_param(flax_prefix: list[str], rest: str, value, out: dict):
    """Translate one parameter inside a ResnetBlock/AttnBlock/Up/Downsample."""
    parts = rest.split(".")
    name, leaf = parts[0], parts[-1]
    if name in ("norm1", "norm2", "norm", "norm_out"):
        _set(out, flax_prefix + [name, "GroupNorm_0",
                                  "scale" if leaf == "weight" else "bias"], value)
    elif name in ("conv1", "conv2", "nin_shortcut", "conv_shortcut", "conv",
                  "q", "k", "v", "proj_out", "conv_in", "conv_out"):
        if leaf == "weight":
            _set(out, flax_prefix + [name, "kernel"], _conv_kernel(value))
        else:
            _set(out, flax_prefix + [name, "bias"], value)
    else:
        raise KeyError(f"unmapped block param {'.'.join(flax_prefix)} :: {rest}")


def convert_dqvae_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Reference DualGrain/TripleGrain VQModel state_dict -> flax variables
    {"params": ..., "ema": ...}."""
    params: dict = {}
    ema: dict = {}

    for key, v in sd.items():
        if key.startswith("loss.") or key.startswith("entropy_calculation"):
            continue  # loss tower handled by convert_loss_state_dict
        parts = key.split(".")
        root = parts[0]

        if root == "encoder":
            sub = parts[1]
            if sub == "conv_in":
                _block_param(["encoder", "down"], ".".join(parts[1:]), v, params)
            elif sub == "down":
                i = parts[2]
                kind = parts[3]  # block / attn / downsample
                if kind == "block":
                    j = parts[4]
                    _block_param(
                        ["encoder", "down", f"down_{i}_block_{j}"],
                        ".".join(parts[5:]), v, params,
                    )
                elif kind == "attn":
                    j = parts[4]
                    _block_param(
                        ["encoder", "down", f"down_{i}_attn_{j}"],
                        ".".join(parts[5:]), v, params,
                    )
                elif kind == "downsample":
                    _block_param(
                        ["encoder", "down", f"down_{i}_downsample"],
                        ".".join(parts[4:]), v, params,
                    )
            elif sub in ("mid_coarse", "mid_median", "mid_fine"):
                head = {"mid_coarse": "head_coarse", "mid_median": "head_median",
                        "mid_fine": "head_fine"}[sub]
                inner = {"block_1": "mid_block_1", "attn_1": "mid_attn_1",
                         "block_2": "mid_block_2"}[parts[2]]
                _block_param(["encoder", head, inner], ".".join(parts[3:]), v, params)
            elif sub.startswith("norm_out_"):
                head = "head_" + sub.split("_")[-1]
                _set(params, ["encoder", head, "norm_out", "GroupNorm_0",
                              "scale" if parts[-1] == "weight" else "bias"], v)
            elif sub.startswith("conv_out_"):
                head = "head_" + sub.split("_")[-1]
                leaf = "kernel" if parts[-1] == "weight" else "bias"
                _set(params, ["encoder", head, "conv_out", leaf],
                     _conv_kernel(v) if leaf == "kernel" else v)
            elif sub == "router":
                rest = parts[2:]
                if rest[0] == "gate":
                    if len(rest) == 2:  # 1layer-fc: gate.weight / gate.bias
                        leaf = "kernel" if rest[-1] == "weight" else "bias"
                        _set(params, ["encoder", "router", "gate", leaf],
                             _linear_kernel(v) if leaf == "kernel" else v)
                    else:  # sequential: gate.0 / gate.2
                        name = {"0": "gate_0", "2": "gate_2"}[rest[1]]
                        leaf = "kernel" if rest[-1] == "weight" else "bias"
                        _set(params, ["encoder", "router", name, leaf],
                             _linear_kernel(v) if leaf == "kernel" else v)
                elif rest[0].startswith("feature_norm"):
                    _set(params, ["encoder", "router", rest[0],
                                  "scale" if rest[-1] == "weight" else "bias"], v)
            else:
                raise KeyError(f"unmapped encoder key {key}")

        elif root == "decoder":
            sub = parts[1]
            if sub in ("conv_in", "conv_out"):
                _block_param(["decoder"], ".".join(parts[1:]), v, params)
            elif sub == "norm_out":
                _set(params, ["decoder", "norm_out", "GroupNorm_0",
                              "scale" if parts[-1] == "weight" else "bias"], v)
            elif sub == "mid":
                inner = {"block_1": "mid_block_1", "attn_1": "mid_attn_1",
                         "block_2": "mid_block_2"}[parts[2]]
                _block_param(["decoder", inner], ".".join(parts[3:]), v, params)
            elif sub == "up":
                i = parts[2]
                kind = parts[3]
                if kind == "block":
                    j = parts[4]
                    _block_param(["decoder", f"up_{i}_block_{j}"],
                                 ".".join(parts[5:]), v, params)
                elif kind == "attn":
                    j = parts[4]
                    _block_param(["decoder", f"up_{i}_attn_{j}"],
                                 ".".join(parts[5:]), v, params)
                elif kind == "upsample":
                    _block_param(["decoder", f"up_{i}_upsample"],
                                 ".".join(parts[4:]), v, params)
            elif sub == "position_bias_fourier":
                # lff.ffm.conv.{weight,bias} -> ffm 1x1 conv
                leaf = "kernel" if parts[-1] == "weight" else "bias"
                _set(params, ["decoder", "position_bias_fourier", "ffm", leaf],
                     _conv_kernel(v) if leaf == "kernel" else v)
            elif sub == "position_bias_learned":
                table = parts[2]  # row_embed / col_embed
                _set(params, ["decoder", "position_bias_learned", table, "embedding"], v)
            elif sub == "position_bias":
                table = parts[2]
                _set(params, ["decoder", "position_bias_learned", table, "embedding"], v)
            else:
                raise KeyError(f"unmapped decoder key {key}")

        elif root in ("quant_conv", "post_quant_conv"):
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            _set(params, [root, leaf], _conv_kernel(v) if leaf == "kernel" else v)

        elif root == "quantize":
            if key.endswith("codebook.weight"):
                _set(ema, ["quantize", "codebook"], v)
            elif key.endswith("cluster_size_ema"):
                _set(ema, ["quantize", "cluster_size_ema"], v)
            elif key.endswith("embed_ema"):
                _set(ema, ["quantize", "embed_ema"], v)
        else:
            raise KeyError(f"unmapped key {key}")

    return {"params": params, "ema": ema}


def convert_stackgpt_state_dict(sd: Dict[str, np.ndarray], prefix="transformer.") -> dict:
    """Reference StackGPT state_dict (optionally `transformer.`-prefixed inside
    a Dualformer ckpt) -> flax {"params": ...}."""
    params: dict = {}
    for key, v in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        parts = k.split(".")
        root = parts[0]
        if root in ("content_emb", "content_coarse_pos_emb", "content_fine_pos_emb",
                    "seg_emb"):
            _set(params, [root, "embedding"], v)
        elif root == "pos_emb":
            _set(params, ["pos_emb"], v)
        elif root in ("position_transformer", "content_transformer"):
            i = parts[1]
            mod = parts[2]
            if mod in ("ln1", "ln2"):
                _set(params, [root, f"h_{i}", mod,
                              "scale" if parts[-1] == "weight" else "bias"], v)
            elif mod == "attn":
                name = parts[3]  # key/query/value/proj
                leaf = "kernel" if parts[-1] == "weight" else "bias"
                _set(params, [root, f"h_{i}", "attn", name, leaf],
                     _linear_kernel(v) if leaf == "kernel" else v)
            elif mod == "mlp":
                name = {"0": "mlp_fc", "2": "mlp_proj"}[parts[3]]
                leaf = "kernel" if parts[-1] == "weight" else "bias"
                _set(params, [root, f"h_{i}", name, leaf],
                     _linear_kernel(v) if leaf == "kernel" else v)
        elif root in ("position_head", "content_head"):
            idx = parts[1]
            if idx == "0":  # LayerNorm
                _set(params, [f"{root}_ln", "scale" if parts[-1] == "weight" else "bias"], v)
            else:  # Linear (no bias)
                _set(params, [root, "kernel"], _linear_kernel(v))
        else:
            raise KeyError(f"unmapped transformer key {key}")
    return {"params": params}


def convert_discriminator_state_dict(sd, prefix="loss.discriminator.", n_layers=3):
    """PatchGAN `main.<seq_idx>` sequential -> conv_i/norm_i names."""
    params: dict = {}
    stats: dict = {}
    # sequential layout: conv,lrelu then (conv,bn,lrelu)*n then conv,bn,lrelu then conv
    conv_idx = {0: "conv_0"}
    norm_idx = {}
    pos = 2
    for n in range(1, n_layers + 1):
        conv_idx[pos] = f"conv_{n}"
        norm_idx[pos + 1] = f"norm_{n}"
        pos += 3
    conv_idx[pos] = "conv_out"

    for key, v in sd.items():
        if not key.startswith(prefix):
            continue
        parts = key[len(prefix):].split(".")
        if parts[0] != "main":
            continue
        seq = int(parts[1])
        leaf = parts[2]
        if seq in conv_idx:
            name = conv_idx[seq]
            if leaf == "weight":
                _set(params, [name, "kernel"], _conv_kernel(v))
            else:
                _set(params, [name, "bias"], v)
        elif seq in norm_idx:
            name = norm_idx[seq]
            if leaf == "weight":
                _set(params, [name, "scale"], v)
            elif leaf == "bias":
                _set(params, [name, "bias"], v)
            elif leaf == "running_mean":
                _set(stats, [name, "mean"], v)
            elif leaf == "running_var":
                _set(stats, [name, "var"], v)
    return {"params": params, "batch_stats": stats}


def convert_clip_text_state_dict(sd, prefix="", layers=None):
    """OpenAI CLIP (or reference CLIPTextEmbedding) state_dict -> our
    `nn.clip_text.CLIPTextTransformer` params. Visual-tower keys are
    ignored; `attn.in_proj_weight` splits columns into the fused qkv Dense.
    Reference module tree: clip/model.py:152-300."""
    params: dict = {}
    for key, v in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        if k.startswith("visual.") or k in ("logit_scale",):
            continue
        if k == "token_embedding.weight":
            _set(params, ["token_embedding", "embedding"], v)
        elif k == "positional_embedding":
            _set(params, ["positional_embedding"], v)
        elif k == "text_projection":
            _set(params, ["text_projection"], v)
        elif k.startswith("ln_final."):
            _set(params, ["ln_final",
                          "scale" if k.endswith("weight") else "bias"], v)
        elif k.startswith("transformer.resblocks."):
            parts = k.split(".")
            i = parts[2]
            root = f"resblock_{i}"
            rest = ".".join(parts[3:])
            if layers is not None and int(i) >= layers:
                raise KeyError(f"resblock {i} beyond configured {layers} layers")
            if rest == "attn.in_proj_weight":
                _set(params, [root, "in_proj", "kernel"], _linear_kernel(v))
            elif rest == "attn.in_proj_bias":
                _set(params, [root, "in_proj", "bias"], v)
            elif rest == "attn.out_proj.weight":
                _set(params, [root, "out_proj", "kernel"], _linear_kernel(v))
            elif rest == "attn.out_proj.bias":
                _set(params, [root, "out_proj", "bias"], v)
            elif rest in ("ln_1.weight", "ln_1.bias", "ln_2.weight", "ln_2.bias"):
                ln, leaf = rest.split(".")
                _set(params, [root, ln, "scale" if leaf == "weight" else "bias"], v)
            elif rest.startswith("mlp."):
                name = parts[4]  # c_fc / c_proj
                leaf = parts[5]
                if leaf == "weight":
                    _set(params, [root, name, "kernel"], _linear_kernel(v))
                else:
                    _set(params, [root, name, "bias"], v)
            else:
                raise KeyError(f"unmapped clip key {key}")
    return {"params": params}


def convert_stylegan2_disc_state_dict(sd, prefix=""):
    """Reference `modules/discriminator/stylegan.py:308-357` Discriminator
    state_dict -> StyleGAN2Discriminator params.

    Handles the residual blocks, optional attn_and_ff stages, final conv and
    the dense head (whose weight is permuted from torch's (c,h,w) flatten
    order to our NHWC (h,w,c) order)."""
    params: dict = {}
    for key, v in sd.items():
        if not key.startswith(prefix):
            continue
        parts = key[len(prefix):].split(".")
        if parts[0] == "blocks":
            i, sub = parts[1], parts[2]
            root = f"blocks_{i}"
            leaf = parts[-1]
            if sub == "conv_res":
                name = "conv_res"
            elif sub == "net":
                name = {"0": "net_conv1", "2": "net_conv2"}[parts[3]]
            elif sub == "downsample":
                if parts[3] == "0":  # Blur buffer `f`
                    continue
                name = "down_conv"
            else:
                raise KeyError(f"unmapped stylegan2 key {key}")
            if leaf == "weight":
                _set(params, [root, name, "kernel"], _conv_kernel(v))
            else:
                _set(params, [root, name, "bias"], v)
        elif parts[0] == "attn_blocks":
            i, stage = parts[1], parts[2]
            root = f"attn_{i}"
            leaf = parts[-1]
            rest = ".".join(parts[3:])
            if stage == "0":  # Residual(PreNorm(LinearAttention))
                if rest.startswith("fn.norm"):
                    _set(params, [root, "attn_norm",
                                  "g" if leaf == "g" else "b"], v.reshape(-1))
                elif rest == "fn.fn.to_q.weight":
                    _set(params, [root, "attn", "to_q", "kernel"], _conv_kernel(v))
                elif rest == "fn.fn.to_kv.net.0.weight":
                    _set(params, [root, "attn", "to_kv_dw", "kernel"], _conv_kernel(v))
                elif rest == "fn.fn.to_kv.net.1.weight":
                    _set(params, [root, "attn", "to_kv_pw", "kernel"], _conv_kernel(v))
                elif rest.startswith("fn.fn.to_out"):
                    if leaf == "weight":
                        _set(params, [root, "attn", "to_out", "kernel"], _conv_kernel(v))
                    else:
                        _set(params, [root, "attn", "to_out", "bias"], v)
                else:
                    raise KeyError(f"unmapped stylegan2 attn key {key}")
            else:  # Residual(PreNorm(conv-FF))
                if rest.startswith("fn.norm"):
                    _set(params, [root, "ff_norm",
                                  "g" if leaf == "g" else "b"], v.reshape(-1))
                elif rest.startswith("fn.fn.0"):
                    if leaf == "weight":
                        _set(params, [root, "ff_conv1", "kernel"], _conv_kernel(v))
                    else:
                        _set(params, [root, "ff_conv1", "bias"], v)
                elif rest.startswith("fn.fn.2"):
                    if leaf == "weight":
                        _set(params, [root, "ff_conv2", "kernel"], _conv_kernel(v))
                    else:
                        _set(params, [root, "ff_conv2", "bias"], v)
                else:
                    raise KeyError(f"unmapped stylegan2 ff key {key}")
        elif parts[0] == "final_conv":
            if parts[1] == "weight":
                _set(params, ["final_conv", "kernel"], _conv_kernel(v))
            else:
                _set(params, ["final_conv", "bias"], v)
        elif parts[0] == "to_logit":
            if parts[1] == "weight":
                c = v.shape[1] // 4  # latent = 2*2*chan_last, torch (c,h,w) order
                w = v.reshape(1, c, 2, 2)
                w = np.transpose(w, (2, 3, 1, 0)).reshape(4 * c, 1)
                _set(params, ["to_logit", "kernel"], w)
            else:
                _set(params, ["to_logit", "bias"], v)
    return {"params": params}


def convert_lucidrains_disc_state_dict(sd, prefix=""):
    """Reference `modules/discriminator/stylegan_lucidrains.py:85-126`
    Discriminator state_dict -> LucidrainsDiscriminator params."""
    params: dict = {}
    for key, v in sd.items():
        if not key.startswith(prefix):
            continue
        parts = key[len(prefix):].split(".")
        leaf = parts[-1]
        if parts[0] == "layers":
            i = int(parts[1])
            if i == 0:  # Sequential(CrossEmbedLayer, LeakyReLU)
                j = parts[4]
                name = ["layer0_cross_embed", f"convs_{j}"]
                if leaf == "weight":
                    _set(params, name + ["kernel"], _conv_kernel(v))
                else:
                    _set(params, name + ["bias"], v)
            else:
                stage = parts[2]
                root = f"layers_{i - 1}"
                if stage == "0":  # strided conv4
                    name, is_norm = f"{root}_conv", False
                elif stage == "2":  # GroupNorm
                    name, is_norm = f"{root}_norm", True
                elif stage == "3":  # ResnetBlock
                    if parts[3] == "block" and parts[4] == "groupnorm":
                        name, is_norm = f"{root}_res_groupnorm", True
                    elif parts[3] == "block" and parts[4] == "project":
                        name, is_norm = f"{root}_res_project", False
                    else:
                        raise KeyError(f"unmapped lucidrains key {key}")
                else:
                    raise KeyError(f"unmapped lucidrains key {key}")
                if is_norm:
                    _set(params, [name, "scale" if leaf == "weight" else "bias"], v)
                elif leaf == "weight":
                    _set(params, [name, "kernel"], _conv_kernel(v))
                else:
                    _set(params, [name, "bias"], v)
        elif parts[0] == "to_logits":
            name = {"0": "logits_conv1", "2": "logits_conv2"}[parts[1]]
            if leaf == "weight":
                _set(params, [name, "kernel"], _conv_kernel(v))
            else:
                _set(params, [name, "bias"], v)
    return {"params": params}


# torchvision VGG16 `features.<i>` conv indices -> our conv_0..conv_12
_VGG_FEATURE_TO_CONV = {0: 0, 2: 1, 5: 2, 7: 3, 10: 4, 12: 5, 14: 6,
                        17: 7, 19: 8, 21: 9, 24: 10, 26: 11, 28: 12}


def convert_lpips_weights(vgg_sd=None, lin_sd=None):
    """Build LPIPS params from torchvision vgg16 state_dict (features.*) and
    the 5 lin-head tensors (reference `modules/lpips/vgg.pth`)."""
    params: dict = {"net": {}}
    if vgg_sd is not None:
        for key, v in vgg_sd.items():
            m = re.match(r"features\.(\d+)\.(weight|bias)", key)
            if not m:
                continue
            fi, leaf = int(m.group(1)), m.group(2)
            if fi not in _VGG_FEATURE_TO_CONV:
                continue
            name = f"conv_{_VGG_FEATURE_TO_CONV[fi]}"
            if leaf == "weight":
                _set(params, ["net", name, "kernel"], _conv_kernel(v))
            else:
                _set(params, ["net", name, "bias"], v)
    if lin_sd is not None:
        for key, v in lin_sd.items():
            m = re.match(r"lin(\d)\.model\.1\.weight", key)
            if m:
                _set(params, [f"lin{m.group(1)}", "kernel"], _conv_kernel(v))
    return params


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def export_dqvae_state_dict(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse of `convert_dqvae_state_dict`: flax variables -> a reference-
    style torch state_dict (numpy values; OIHW conv / (out,in) linear). Lets
    models trained here be consumed by the reference repo, and provides the
    converter round-trip test oracle."""
    sd: Dict[str, np.ndarray] = {}

    def conv_back(w):
        return np.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW

    def lin_back(w):
        return np.transpose(w, (1, 0))

    for path, v in _flatten(variables.get("params", {})).items():
        parts = list(path)
        leaf = parts[-1]
        # normalize leaf names
        if leaf == "kernel":
            tleaf = "weight"
            tv = conv_back(v) if v.ndim == 4 else lin_back(v)
        elif leaf == "scale":
            tleaf, tv = "weight", v
        elif leaf == "embedding":
            tleaf, tv = "weight", v
        else:
            tleaf, tv = leaf, v

        mods = parts[:-1]
        # drop flax's GroupNorm wrapper level
        mods = [m for m in mods if m != "GroupNorm_0"]
        key = None
        root = mods[0] if mods else ""
        if root in ("quant_conv", "post_quant_conv"):
            key = f"{root}.{tleaf}"
        elif root == "encoder":
            sub = mods[1]
            import re as _re

            if sub == "down" and mods[2] == "conv_in":  # conv_in in DownStack
                key = f"encoder.conv_in.{tleaf}"
            elif sub == "down":
                m = _re.match(r"down_(\d+)_(block|attn|downsample)(?:_(\d+))?", mods[2])
                i, kind, j = m.group(1), m.group(2), m.group(3)
                rest = ".".join(mods[3:])
                if kind == "downsample":
                    key = f"encoder.down.{i}.downsample.{rest}.{tleaf}"
                else:
                    key = f"encoder.down.{i}.{kind}.{j}.{rest}.{tleaf}"
            elif sub in ("head_coarse", "head_median", "head_fine"):
                grain = sub.split("_")[1]
                inner = mods[2]
                inv = {"mid_block_1": "block_1", "mid_attn_1": "attn_1",
                       "mid_block_2": "block_2"}
                if inner in inv:
                    rest = ".".join(mods[3:])
                    key = f"encoder.mid_{grain}.{inv[inner]}.{rest}.{tleaf}"
                elif inner == "norm_out":
                    key = f"encoder.norm_out_{grain}.{tleaf}"
                elif inner == "conv_out":
                    key = f"encoder.conv_out_{grain}.{tleaf}"
            elif sub == "router":
                name = mods[2]
                if name == "gate":
                    key = f"encoder.router.gate.{tleaf}"
                elif name in ("gate_0", "gate_2"):
                    key = f"encoder.router.gate.{name.split('_')[1]}.{tleaf}"
                else:
                    key = f"encoder.router.{name}.{tleaf}"
        elif root == "decoder":
            sub = mods[1]
            import re as _re

            inv_mid = {"mid_block_1": "block_1", "mid_attn_1": "attn_1",
                       "mid_block_2": "block_2"}
            if sub in ("conv_in", "conv_out", "norm_out"):
                key = f"decoder.{sub}.{tleaf}"
            elif sub in inv_mid:
                rest = ".".join(mods[2:])
                key = f"decoder.mid.{inv_mid[sub]}.{rest}.{tleaf}"
            elif sub == "position_bias_fourier":
                key = f"decoder.position_bias_fourier.lff.ffm.conv.{tleaf}"
            elif sub == "position_bias_learned":
                key = f"decoder.position_bias_learned.{mods[2]}.{tleaf}"
            else:
                m = _re.match(r"up_(\d+)_(block|attn|upsample)(?:_(\d+))?", sub)
                i, kind, j = m.group(1), m.group(2), m.group(3)
                rest = ".".join(mods[2:])
                if kind == "upsample":
                    key = f"decoder.up.{i}.upsample.{rest}.{tleaf}"
                else:
                    key = f"decoder.up.{i}.{kind}.{j}.{rest}.{tleaf}"
        if key is None:
            raise KeyError(f"unmapped export path {path}")
        sd[key] = tv

    ema = variables.get("ema", {}).get("quantize", {})
    if ema:
        sd["quantize.codebook.weight"] = np.asarray(ema["codebook"])
        sd["quantize.codebook.cluster_size_ema"] = np.asarray(ema["cluster_size_ema"])
        sd["quantize.codebook.embed_ema"] = np.asarray(ema["embed_ema"])
    return sd


def load_dqvae_checkpoint(path: str) -> dict:
    """Reference stage-1 .ckpt -> flax variables for DQVAENet."""
    return convert_dqvae_state_dict(load_torch_state_dict(path))


def load_dualformer_checkpoint(path: str) -> dict:
    """Reference stage-2 .ckpt -> {"transformer": vars, "first_stage": vars}."""
    sd = load_torch_state_dict(path)
    fs = {k[len("first_stage_model."):]: v for k, v in sd.items()
          if k.startswith("first_stage_model.")}
    return {
        "transformer": convert_stackgpt_state_dict(sd, prefix="transformer."),
        "first_stage": convert_dqvae_state_dict(fs),
    }
