"""PyTorch state_dict → flax params converters.

Dev-time-only dependency on torch tensors is avoided: all functions take a
``dict[str, np.ndarray]`` (use ``state_dict_to_numpy`` on a torch state_dict
first). Layout rules:
  - torch Linear weight (out, in)  -> flax Dense kernel (in, out): transpose
  - torch Conv2d weight (O, I/g, kh, kw) -> flax Conv kernel (kh, kw, I/g, O)
  - torch Embedding weight (V, D)  -> flax Embed "embedding" unchanged

Name maps mirror the reference modules they convert (cited per function), so
the released ``VitVQGAN.pt`` checkpoint and any reference-trained weights
load directly (SURVEY.md §7 hard-part #2).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def state_dict_to_numpy(sd) -> dict[str, np.ndarray]:
    def to_np(v):
        if isinstance(v, np.ndarray):  # already host (e.g. test stand-ins)
            return v
        v = v.detach().cpu()
        if str(v.dtype) == "torch.bfloat16":  # Tensor.numpy() rejects bf16
            v = v.float()
        return np.asarray(v.numpy())

    return {k: to_np(v) for k, v in sd.items()}


def _lin(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv(sd: Mapping, prefix: str) -> dict:
    w = sd[f"{prefix}.weight"]  # (O, I/g, kh, kw)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _gamma_ln(sd: Mapping, prefix: str) -> dict:
    return {"gamma": sd[f"{prefix}.gamma"]}


def _torch_ln(sd: Mapping, prefix: str) -> dict:
    return {"gamma": sd[f"{prefix}.weight"], "beta": sd[f"{prefix}.bias"]}


def convert_softmax_attention(sd: Mapping, p: str = "") -> dict:
    """models/softmax_attention.py: q.0 / kv.0 (Sequential idx 0) / W_o."""
    p = p + "." if p else ""
    return {
        "wq": _lin(sd, f"{p}q.0"),
        "wkv": _lin(sd, f"{p}kv.0"),
        "wo": _lin(sd, f"{p}W_o"),
    }


def convert_feed_forward(sd: Mapping, p: str = "") -> dict:
    """models/transformer.py:30-43 GEGLU FFN: ff.0 / ff.2 (GammaLN) / ff.3."""
    p = p + "." if p else ""
    return {
        "ff_in": _lin(sd, f"{p}ff.0"),
        "norm": _gamma_ln(sd, f"{p}ff.2"),
        "ff_out": _lin(sd, f"{p}ff.3"),
    }


def convert_encoder_layer(sd: Mapping, p: str) -> dict:
    return {
        "self_attn": convert_softmax_attention(sd, f"{p}.self_attn"),
        "ff": convert_feed_forward(sd, f"{p}.feed_forward"),
        "norm1": _gamma_ln(sd, f"{p}.norm1"),
        "norm2": _gamma_ln(sd, f"{p}.norm2"),
    }


def convert_encoder(sd: Mapping, p: str, depth: int) -> dict:
    return {
        f"layers_{i}": convert_encoder_layer(sd, f"{p}.layers.{i}")
        for i in range(depth)
    }


def convert_decoder_layer(sd: Mapping, p: str) -> dict:
    return {
        "self_attn": convert_softmax_attention(sd, f"{p}.self_attn"),
        "cross_attn": convert_softmax_attention(sd, f"{p}.cross_attn"),
        "ff": convert_feed_forward(sd, f"{p}.feed_forward"),
        "norm1": _gamma_ln(sd, f"{p}.norm1"),
        "norm2": _gamma_ln(sd, f"{p}.norm2"),
        "norm3": _gamma_ln(sd, f"{p}.norm3"),
    }


def convert_decoder(sd: Mapping, p: str, depth: int) -> dict:
    return {
        f"layers_{i}": convert_decoder_layer(sd, f"{p}.layers.{i}")
        for i in range(depth)
    }


def convert_moe_layer(sd: Mapping, p: str = "") -> dict:
    """models/moe.py: gate + per-expert Linears stacked into one bank."""
    p = p + "." if p else ""
    n = 0
    while f"{p}experts.{n}.weight" in sd:
        n += 1
    kernels = np.stack(
        [np.ascontiguousarray(sd[f"{p}experts.{i}.weight"].T) for i in range(n)]
    )
    biases = np.stack([sd[f"{p}experts.{i}.bias"] for i in range(n)])
    return {
        "gate": _lin(sd, f"{p}gate"),
        "experts_kernel": kernels,
        "experts_bias": biases,
    }


def convert_switchhead_attention(sd: Mapping, p: str = "") -> dict:
    """models/switchhead_attention.py: q.0 / k.0 / W_s.0 / W_d.0 + expert banks."""
    p = p + "." if p else ""
    n = 0
    while f"{p}experts_v.{n}.weight" in sd:
        n += 1
    return {
        "wq": _lin(sd, f"{p}q.0"),
        "wk": _lin(sd, f"{p}k.0"),
        "ws": _lin(sd, f"{p}W_s.0"),
        "wd": _lin(sd, f"{p}W_d.0"),
        "experts_v": np.stack(
            [np.ascontiguousarray(sd[f"{p}experts_v.{i}.weight"].T) for i in range(n)]
        ),
        "experts_out": np.stack(
            [np.ascontiguousarray(sd[f"{p}experts_out.{i}.weight"].T) for i in range(n)]
        ),
    }


def convert_agent_attention(sd: Mapping, p: str = "") -> dict:
    """models/agent_attention.py: qkv / W_o / bias1 / bias2 / dwc.1 (Conv2d)."""
    p = p + "." if p else ""
    return {
        "wqkv": _lin(sd, f"{p}qkv"),
        "wo": _lin(sd, f"{p}W_o"),
        "bias1": sd[f"{p}bias1"],
        "bias2": sd[f"{p}bias2"],
        "dwc": _conv(sd, f"{p}dwc.1"),
    }


def convert_transformer(sd: Mapping, enc_depth: int, dec_depth: int) -> dict:
    """models/transformer.py:138-163 seq2seq Transformer."""
    return {
        "enc_input_proj": {"embedding": sd["enc_input_proj.weight"]},
        "dec_input_proj": {"embedding": sd["dec_input_proj.weight"]},
        "enc_init_norm": _gamma_ln(sd, "enc_init_norm"),
        "encoder": convert_encoder(sd, "encoder", enc_depth),
        "enc_final_norm": _gamma_ln(sd, "enc_final_norm"),
        "dec_init_norm": _gamma_ln(sd, "dec_init_norm"),
        "decoder": convert_decoder(sd, "decoder", dec_depth),
        "dec_final_norm": _gamma_ln(sd, "dec_final_norm"),
        "linear": _lin(sd, "linear"),
    }


# --------------------------------------------------------------------------- #
# Vision models
# --------------------------------------------------------------------------- #

_FF_PATTERNS = [
    ("{p}.feed_forward.0", "{p}.feed_forward.2"),       # Sequential(Lin,GELU,Lin)
    ("{p}.feed_forward.fc1", "{p}.feed_forward.fc2"),    # timm/xformers MLP
    ("{p}.feed_forward.mlp.0", "{p}.feed_forward.mlp.2"),
    ("{p}.mlp.fc1", "{p}.mlp.fc2"),
]


def _convert_vit_mlp(sd: Mapping, p: str) -> dict:
    """ViTVQGAN block FFN: the snapshot's class is broken (SURVEY §2.9#1), so
    real checkpoints may use any of several working layouts — detect."""
    for a, b in _FF_PATTERNS:
        a, b = a.format(p=p), b.format(p=p)
        if f"{a}.weight" in sd:
            return {"mlp_in": _lin(sd, a), "mlp_out": _lin(sd, b)}
    raise KeyError(f"no known FFN layout under {p} (tried {_FF_PATTERNS})")


def convert_vitvqgan_block(sd: Mapping, p: str) -> dict:
    return {
        "self_attn": convert_softmax_attention(sd, f"{p}.self_attn"),
        "mlp": _convert_vit_mlp(sd, p),
        "norm1": _torch_ln(sd, f"{p}.norm1"),
        "norm2": _torch_ln(sd, f"{p}.norm2"),
    }


def _convert_patch_embed(sd: Mapping, p: str) -> dict:
    """to_patch_embedding Sequential: 1=LN, 2=Linear, 3=LN (vitvqgan.py:89-94)."""
    return {
        "norm1": _torch_ln(sd, f"{p}.1"),
        "proj": _lin(sd, f"{p}.2"),
        "norm2": _torch_ln(sd, f"{p}.3"),
    }


def convert_vitvqgan(sd: Mapping, depth: int) -> dict:
    """Full ViTVQGAN (vitvqgan.py:180-215) including pre/post-quant and the
    codebook embedding — the VitVQGAN.pt conversion path."""
    enc = {
        "patch_embed": _convert_patch_embed(sd, "encoder.to_patch_embedding"),
        "pos_enc": sd["encoder.pos_enc"],
        "pre_norm": _torch_ln(sd, "encoder.pre_norm"),
    }
    for i in range(depth):
        enc[f"layers_{i}"] = convert_vitvqgan_block(
            sd, f"encoder.encoder.layers.{i}"
        )
    dec = {
        "pos_enc": sd["decoder.pos_enc"],
        "pre_norm": _torch_ln(sd, "decoder.pre_norm"),
        "fc": _lin(sd, "decoder.fc"),
    }
    for i in range(depth):
        dec[f"layers_{i}"] = convert_vitvqgan_block(
            sd, f"decoder.decoder.layers.{i}"
        )
    return {
        "encoder": enc,
        "pre_quant": _lin(sd, "pre_quant"),
        "codebook": {"embedding": sd["codebook.embedding.weight"]},
        "post_quant": _lin(sd, "post_quant"),
        "decoder": dec,
    }


def _convert_groupnorm(sd: Mapping, p: str) -> dict:
    """reference GroupNorm wrapper: {p}.gn.{weight,bias} -> gn/{scale,bias}."""
    return {"gn": {"scale": sd[f"{p}.gn.weight"], "bias": sd[f"{p}.gn.bias"]}}


def _convert_residual_block(sd: Mapping, p: str) -> dict:
    """ResidualBlock: block.0 GN / block.2 conv / block.3 GN / block.5 conv
    (+ channel_up)."""
    out = {
        "norm1": _convert_groupnorm(sd, f"{p}.block.0"),
        "conv1": _conv(sd, f"{p}.block.2"),
        "norm2": _convert_groupnorm(sd, f"{p}.block.3"),
        "conv2": _conv(sd, f"{p}.block.5"),
    }
    if f"{p}.channel_up.weight" in sd:
        out["channel_up"] = _conv(sd, f"{p}.channel_up")
    return out


def _convert_nonlocal(sd: Mapping, p: str) -> dict:
    # proj_out is dead code in the reference forward — keys dropped on purpose
    return {
        "gn": _convert_groupnorm(sd, f"{p}.gn"),
        "q": _conv(sd, f"{p}.q"),
        "k": _conv(sd, f"{p}.k"),
        "v": _conv(sd, f"{p}.v"),
    }


def convert_planned_stack(sd: Mapping, p: str, plan) -> dict:
    """CNN encoder/decoder: torch Sequential index == plan index."""
    out = {}
    for idx, (kind, cls, kw) in enumerate(plan):
        tp = f"{p}.{idx}"
        if kind in ("conv_in", "conv_out"):
            out[f"m{idx}"] = _conv(sd, tp)
        elif kind == "res":
            out[f"m{idx}"] = _convert_residual_block(sd, tp)
        elif kind == "attn":
            out[f"m{idx}"] = _convert_nonlocal(sd, tp)
        elif kind in ("down", "up"):
            out[f"m{idx}"] = {"conv": _conv(sd, f"{tp}.conv")}
        elif kind == "norm":
            out[f"m{idx}"] = _convert_groupnorm(sd, tp)
        # swish: no params
    return out


def convert_vqgan(sd: Mapping) -> dict:
    from attention_models_tpu.models.vqgan import decoder_plan, encoder_plan

    dim = sd["pre_quant.weight"].shape[0]
    return {
        "encoder": convert_planned_stack(sd, "encoder.model", encoder_plan(dim)),
        "pre_quant": _conv(sd, "pre_quant"),
        "codebook": {"embedding": sd["codebook.embedding.weight"]},
        "post_quant": _conv(sd, "post_quant"),
        "decoder": convert_planned_stack(sd, "decoder.model", decoder_plan(dim)),
    }


def convert_discriminator(sd: Mapping, n_layers: int = 3):
    """NLayerDiscriminator Sequential: conv,lrelu,(conv,bn,lrelu)*,conv.
    Returns (params, batch_stats)."""
    params = {"conv0": _conv(sd, "model.0")}
    stats = {}
    idx = 2
    for n in range(1, n_layers + 1):
        params[f"conv{n}"] = _conv(sd, f"model.{idx}")
        params[f"bn{n}"] = {
            "scale": sd[f"model.{idx + 1}.weight"],
            "bias": sd[f"model.{idx + 1}.bias"],
        }
        stats[f"bn{n}"] = {
            "mean": sd[f"model.{idx + 1}.running_mean"],
            "var": sd[f"model.{idx + 1}.running_var"],
        }
        idx += 3
    params["conv_out"] = _conv(sd, f"model.{idx}")
    return params, stats


def convert_vit_moe(sd: Mapping, depth: int) -> dict:
    """models/vit_moe.py:49-106."""
    out = {
        "patch_embed": _convert_patch_embed(sd, "to_patch_embedding"),
        "class_token": sd["class_token"],
        "pos_enc": sd["pos_enc"],
        "norm": _torch_ln(sd, "norm"),
        "class_embed": _lin(sd, "class_embed"),
    }
    for i in range(depth):
        p = f"encoder.layers.{i}"
        out[f"layers_{i}"] = {
            "self_attn": convert_switchhead_attention(sd, f"{p}.self_attn"),
            "moe": convert_moe_layer(sd, f"{p}.moe"),
            "norm1": _torch_ln(sd, f"{p}.norm1"),
            "norm2": _torch_ln(sd, f"{p}.norm2"),
        }
    return out


def convert_hf_clip_text(sd: Mapping, layers: int = 12) -> dict:
    """HF CLIPTextModel state_dict -> ClipTextModel params
    (keys: text_model.embeddings.*, text_model.encoder.layers.{i}.*)."""
    p = "text_model"
    out = {
        "token_embedding": {
            "embedding": sd[f"{p}.embeddings.token_embedding.weight"]
        },
        "position_embedding": sd[f"{p}.embeddings.position_embedding.weight"],
        "final_ln": _torch_ln(sd, f"{p}.final_layer_norm"),
    }
    for i in range(layers):
        lp = f"{p}.encoder.layers.{i}"
        out[f"layers_{i}"] = {
            "ln1": _torch_ln(sd, f"{lp}.layer_norm1"),
            "wq": _lin(sd, f"{lp}.self_attn.q_proj"),
            "wk": _lin(sd, f"{lp}.self_attn.k_proj"),
            "wv": _lin(sd, f"{lp}.self_attn.v_proj"),
            "wo": _lin(sd, f"{lp}.self_attn.out_proj"),
            "ln2": _torch_ln(sd, f"{lp}.layer_norm2"),
            "fc1": _lin(sd, f"{lp}.mlp.fc1"),
            "fc2": _lin(sd, f"{lp}.mlp.fc2"),
        }
    return out


def convert_vgg16_lpips(vgg_sd: Mapping, lin_sd: Mapping | None = None) -> dict:
    """torchvision VGG16 ``features`` conv weights (+ optional lpips 'lin'
    1x1 heads) -> training/losses.LPIPS params. torchvision feature indices
    of the 13 convs: 0,2,5,7,10,12,14,17,19,21,24,26,28."""
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg = {}
    for i, ti in enumerate(conv_idx):
        vgg[f"conv{i}"] = _conv(vgg_sd, f"features.{ti}")
    out = {"vgg": vgg}
    if lin_sd is not None:
        # lpips keys: lin{k}.model.1.weight, shape (1, C, 1, 1)
        for k in range(5):
            w = lin_sd[f"lin{k}.model.1.weight"]
            out[f"lin{k}"] = {
                "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
            }
    return out


def convert_inception_fid(sd: Mapping) -> dict:
    """pytorch-fid / torchvision ``inception_v3`` state_dict ->
    models/inception.InceptionV3Features variables ``{"params": ...,
    "batch_stats": ...}``. Every ``*.conv.weight`` key defines one
    BasicConv2d; ``fc`` and ``AuxLogits`` are feature-irrelevant and
    skipped. Raises KeyError listing any leftover unconsumed keys so a
    schema drift in a future artifact is loud, not silent."""
    sd = state_dict_to_numpy(sd)
    params: dict = {}
    stats: dict = {}
    consumed = set()

    def nest(root, path):
        node = root
        for part in path:
            node = node.setdefault(part, {})
        return node

    for key in sd:
        if not key.endswith(".conv.weight"):
            continue
        mod = key[: -len(".conv.weight")]          # e.g. Mixed_5b.branch1x1
        if mod.startswith(("fc", "AuxLogits")):
            continue
        path = mod.split(".")
        w = sd[f"{mod}.conv.weight"]               # (out, in, kh, kw)
        nest(params, path)["conv"] = {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
        }
        nest(params, path)["bn"] = {
            "scale": sd[f"{mod}.bn.weight"],
            "bias": sd[f"{mod}.bn.bias"],
        }
        nest(stats, path)["bn"] = {
            "mean": sd[f"{mod}.bn.running_mean"],
            "var": sd[f"{mod}.bn.running_var"],
        }
        consumed.update({
            f"{mod}.conv.weight", f"{mod}.bn.weight", f"{mod}.bn.bias",
            f"{mod}.bn.running_mean", f"{mod}.bn.running_var",
        })
    leftovers = [
        k for k in sd
        if k not in consumed
        and not k.startswith(("fc.", "AuxLogits."))
        and not k.endswith("num_batches_tracked")
    ]
    if leftovers:
        raise KeyError(f"unconsumed inception keys: {sorted(leftovers)[:8]}")
    return {"params": params, "batch_stats": stats}


def repaired_reference_ff(dim, mlp_dim):
    """The working xFormers-style MLP the reference snapshot intended
    (models/vitvqgan.py:20-34 is a broken non-Module class — SURVEY §2.9#1):
    Linear → GELU → Linear with hidden ``(int(mlp·2/3)+7)//8·8``. Single
    source of truth for every consumer of the repair (inference CLI, golden
    run, parity tests) — the bit-match protocol depends on this rounding."""
    import torch.nn as nn

    hidden = (int(mlp_dim * 2 / 3) + 7) // 8 * 8
    return nn.Sequential(nn.Linear(dim, hidden), nn.GELU(),
                         nn.Linear(hidden, dim))


def load_reference_vitvqgan(ref_path: str, vit_params: dict,
                            cb_params: dict):
    """Import the PyTorch reference's ``models.vitvqgan`` read-only (no
    package __init__ — it drags in modules that crash at this snapshot),
    repair its FeedForward, and construct an eval-mode ViTVQGAN. Used by
    the golden-fidelity protocol to run the SAME weights through the
    reference for the index bit-match (SURVEY.md §3.4)."""
    import os
    import sys
    import types

    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(ref_path, "models")]
        sys.modules["models"] = pkg
    __import__("models.vitvqgan")
    ref = sys.modules["models.vitvqgan"]
    ref.FeedForward = repaired_reference_ff
    return ref.ViTVQGAN(vit_params, cb_params).eval()
