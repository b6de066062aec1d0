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
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}


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
