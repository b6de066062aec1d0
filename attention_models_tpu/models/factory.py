"""build_model(cfg) — config→model dispatch with API parity to
/root/reference/models/model_factory.py:24-151 (same YAML schema), returning
(module, init_fn) pairs would be un-JAX-like; instead this returns the flax
module plus a ``pretrained`` params patch when the config names a VQ
checkpoint (the frozen-tokenizer pattern, model_factory.py:14-17).
"""

from __future__ import annotations

import logging
import os

import jax.numpy as jnp

from attention_models_tpu.models.maskgit import MaskGitTransformer
from attention_models_tpu.models.muse import MUSE
from attention_models_tpu.models.parti import Parti
from attention_models_tpu.models.vit import ViT
from attention_models_tpu.models.vit_moe import ViTMoE
from attention_models_tpu.models.vitvqgan import ViTVQGAN
from attention_models_tpu.models.vqgan import VQGAN

log = logging.getLogger(__name__)


def _dtype(cfg):
    mp = str(cfg.training.get("mixed_precision", "no") or "no")
    return jnp.bfloat16 if mp == "bf16" else jnp.float32


def _vit_params(node, cfg):
    return dict(
        dim=node.dim,
        img_size=cfg.dataset.preprocessing.resolution,
        patch_size=node.patch_size,
        n_heads=node.n_heads,
        d_head=node.d_head,
        depth=node.depth,
        mlp_dim=node.mlp_dim,
        dropout=node.dropout,
    )


def _vq_config(cfg):
    return dict(
        vit_params=_vit_params(cfg.vitvqgan.transformer, cfg),
        codebook_params=dict(
            codebook_dim=cfg.codebook.codebook_dim,
            codebook_size=cfg.codebook.codebook_size,
        ),
    )


def load_vq_checkpoint(path: str, depth: int):
    """Frozen-tokenizer weights for the generators: either a reference
    ``VitVQGAN.pt`` (torch-converted) or an ORBAX checkpoint directory
    from this framework's own VQGANTrainer run (``g_params`` subtree, EMA
    preferred) — train the tokenizer here, then train generators on it
    with no torch round-trip. Returns None when absent (offline dev
    environments keep the random init)."""
    if not path or not os.path.exists(path):
        log.warning("VQ checkpoint %s not found; frozen tokenizer keeps its "
                    "random init", path)
        return None
    if os.path.isdir(path):
        from attention_models_tpu.utils.checkpoint import CheckpointManager

        params = CheckpointManager(path).restore_params_auto()
        if params is None:
            log.warning("orbax dir %s holds no checkpoint; frozen tokenizer "
                        "keeps its random init", path)
        return params
    import torch

    from attention_models_tpu.utils.torch_convert import (
        convert_vitvqgan,
        state_dict_to_numpy,
    )

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return convert_vitvqgan(state_dict_to_numpy(sd), depth=depth)


def build_model(cfg):
    """Returns (model, pretrained_patches) where pretrained_patches maps a
    param subtree name (e.g. "vq") to converted params to overwrite after
    init."""
    name = cfg.model.name
    dtype = _dtype(cfg)
    patches = {}

    if name == "vitvqgan":
        t = cfg.model.transformer
        return ViTVQGAN(
            vit_params=_vit_params(t, cfg),
            codebook_params=dict(
                codebook_dim=cfg.codebook.codebook_dim,
                codebook_size=cfg.codebook.codebook_size,
            ),
            quant=cfg.model.get("quant"),
            dtype=dtype,
        ), patches

    if name == "vqgan":
        return VQGAN(
            dim=cfg.codebook.codebook_dim,
            codebook_size=cfg.codebook.codebook_size,
            dtype=dtype,
        ), patches

    if name in ("muse", "muse_vqgan"):
        # muse_vqgan: Muse over the CNN VQGAN tokenizer. The reference ships
        # such configs (cfg_exp/muse_vqgan*.yaml) but its factory cannot
        # build them (returns None, SURVEY.md §2.7) — supported here.
        if name == "muse_vqgan" or "vitvqgan" not in cfg:
            vq_cfg = dict(
                kind="vqgan",
                dim=cfg.codebook.codebook_dim,
                codebook_size=cfg.codebook.codebook_size,
            )
            vq_params = None
        else:
            vq_cfg = _vq_config(cfg)
            vq_params = load_vq_checkpoint(
                cfg.vitvqgan.get("checkpoint"), cfg.vitvqgan.transformer.depth
            )
        if vq_params is not None:
            patches["vq"] = vq_params
        d = cfg.model.decoder
        e = cfg.model.encoder
        return MUSE(
            dim=cfg.model.dim,
            vq_config=vq_cfg,
            max_length=e.max_length,
            n_heads=d.n_heads,
            d_head=d.d_head,
            depth=d.depth,
            mult=d.mult,
            cond_keep_prob=d.embeds_drop_prob,
            dropout=d.dropout,
            clip_width=e.get("width", 768),
            clip_layers=e.get("layers", 12),
            clip_heads=e.get("heads", 12),
            remat=bool(cfg.training.get("remat", False)),
            scan_layers=bool(cfg.training.get("scan_layers", False)),
            pp_microbatches=cfg.training.get("pipeline_microbatches"),
            quant=cfg.model.get("quant"),
            dtype=dtype,
        ), patches

    if name == "maskgit":
        vq_cfg = _vq_config(cfg)
        vq_params = load_vq_checkpoint(
            cfg.vitvqgan.get("checkpoint"), cfg.vitvqgan.transformer.depth
        )
        if vq_params is not None:
            patches["vq"] = vq_params
        return MaskGitTransformer(
            dim=cfg.model.dim,
            vq_config=vq_cfg,
            vocab_size=cfg.codebook.codebook_size,
            n_heads=cfg.model.n_heads,
            d_head=cfg.model.d_head,
            dec_depth=cfg.model.depth,
            mult=cfg.model.mult,
            dropout=cfg.model.dropout,
            remat=bool(cfg.training.get("remat", False)),
            scan_layers=bool(cfg.training.get("scan_layers", False)),
            pp_microbatches=cfg.training.get("pipeline_microbatches"),
            quant=cfg.model.get("quant"),
            dtype=dtype,
        ), patches

    if name == "parti":
        vq_cfg = dict(kind="vitvqgan", **_vq_config(cfg))
        vq_params = load_vq_checkpoint(
            cfg.vitvqgan.get("checkpoint"), cfg.vitvqgan.transformer.depth
        )
        if vq_params is not None:
            patches["vq"] = vq_params
        e = cfg.model.encoder
        return Parti(
            dim=cfg.model.dim,
            vq_config=vq_cfg,
            max_length=e.max_length,
            n_heads=cfg.model.n_heads,
            d_head=cfg.model.d_head,
            depth=cfg.model.depth,
            clip_width=e.get("width", 768),
            clip_layers=e.get("layers", 12),
            clip_heads=e.get("heads", 12),
            scan_layers=bool(cfg.training.get("scan_layers", False)),
            pp_microbatches=cfg.training.get("pipeline_microbatches"),
            quant=cfg.model.get("quant"),
            cond_keep_prob=float(cfg.model.get("cond_keep_prob", 1.0)),
            dtype=dtype,
        ), patches

    if name == "transformer":
        # seq2seq encoder-decoder LM. The reference documents it only as a
        # README training snippet (README.md:55-89) with no factory branch,
        # config, or trainer; here it is a first-class config-driven model.
        m = cfg.model
        from attention_models_tpu.models.transformer import Transformer

        return Transformer(
            dim=m.dim,
            vocab_size=m.vocab_size,
            n_heads=m.n_heads,
            d_head=m.get("d_head", 64),
            enc_depth=m.enc_depth,
            dec_depth=m.dec_depth,
            n_classes=m.get("n_classes", m.vocab_size),
            dtype=dtype,
        ), patches

    if name == "vit":
        t = cfg.model.transformer
        return ViT(
            dim=t.dim,
            image_size=cfg.dataset.preprocessing.resolution,
            patch_size=t.patch_size,
            depth=t.depth,
            n_heads=t.n_heads,
            d_head=t.get("d_head", 64),
            mlp_dim=t.mlp_dim,
            dropout=t.dropout,
            num_classes=t.num_classes,
            dtype=dtype,
        ), patches

    if name == "vit_moe":
        t = cfg.model.transformer
        return ViTMoE(
            dim=t.dim,
            image_size=cfg.dataset.preprocessing.resolution,
            patch_size=t.patch_size,
            n_heads=t.n_heads,
            d_head=t.get("d_head", 64),
            depth=t.depth,
            n_experts=t.n_experts,
            sel_experts=t.sel_experts,
            dropout=t.dropout,
            num_classes=t.num_classes,
            moe_impl=t.get("moe_impl", "auto"),
            capacity_factor=t.get("capacity_factor"),
            dtype=dtype,
        ), patches

    raise ValueError(f"unknown model {name!r}")
