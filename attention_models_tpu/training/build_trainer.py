"""Trainer dispatch (API parity with /root/reference/trainers/build_trainer.py:6-14)."""

from __future__ import annotations


def build_trainer(cfg, model, dataloaders, pretrained_patches=None):
    from attention_models_tpu.training.generator_trainers import (
        MaskGitTrainer,
        MuseTrainer,
        PartiTrainer,
    )
    from attention_models_tpu.training.vit_trainer import VitTrainer
    from attention_models_tpu.training.vqgan_trainer import VQGANTrainer

    if cfg.model.get("quant"):
        # model.quant is the W8A8 inference path (ops/quant.py): the fused
        # int8 kernels have no VJP and jnp.round has zero gradient, so a
        # training run through it would be silently broken — refuse early.
        raise ValueError(
            "model.quant is inference-only (use it with the inference/ CLIs "
            "or generate()); unset it for training"
        )
    name = cfg.model.name
    if name in ("vqgan", "vitvqgan"):
        cls = VQGANTrainer
    elif name in ("muse", "muse_vqgan"):
        cls = MuseTrainer
    elif name in ("vit", "vit_moe"):
        cls = VitTrainer
    elif name == "maskgit":
        cls = MaskGitTrainer
    elif name == "parti":
        cls = PartiTrainer
    elif name == "transformer":
        from attention_models_tpu.training.transformer_trainer import (
            TransformerTrainer,
        )

        cls = TransformerTrainer
    else:
        raise ValueError(f"no trainer for model {name!r}")
    return cls(cfg, model, dataloaders, pretrained_patches)
