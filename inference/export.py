"""Export a trained model to a self-contained serving artifact (StableHLO).

    python inference/export.py --config=cfg/vitvqgan.yaml \
        [--ckpt outputs/.../checkpoints/run] [--surface recon|encode|decode|generate] \
        [--batch 8] [--output model.amtpu]

The reference framework's only deployment artifact is a pickled ``.pt``
state_dict that requires the full Python model zoo at serving time
(/root/reference/trainers/utils/base_trainer.py:92-107). This CLI bakes
params + compute graph into one ``jax.export`` blob that any JAX runtime on
the same platform can reload and call with zero framework code:

    from attention_models_tpu.utils.export import load_fn
    model = load_fn("model.amtpu")
    out = model.call(imgs)

Surfaces:
  recon    — ViTVQGAN/VQGAN reconstruction forward (imgs -> recon)
  encode   — tokenizer encode (imgs -> codebook indices)
  decode   — tokenizer decode (indices -> imgs)
  generate — maskgit/muse/parti sampling loop (rng[, token ids] -> imgs)
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _restore_params(variables, ckpt, key):
    """Replace ``variables['params']`` with the trained ``key`` subtree of
    an orbax checkpoint (partial restore — trainers save the full train
    state). Falls back to the given variables with a warning."""
    if ckpt and os.path.isdir(ckpt):
        from attention_models_tpu.utils.checkpoint import CheckpointManager

        params = CheckpointManager(ckpt).restore_params(
            variables["params"], key=key
        )
        if params is not None:
            return {"params": params}
    print("warning: no checkpoint loaded; exporting random init",
          file=sys.stderr)
    return variables


def _load_trained(cfg, model, example_args, ckpt):
    import jax

    variables = jax.jit(model.init)(jax.random.key(0), *example_args)
    return _restore_params(variables, ckpt, "g_params")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir (default: random init)")
    ap.add_argument("--surface", default="recon",
                    choices=["recon", "encode", "decode", "generate"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--timesteps", type=int, default=18)
    ap.add_argument("--output", default=None,
                    help="default: <model_name>_<surface>.amtpu")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.factory import build_model
    from attention_models_tpu.utils.config import load_config
    from attention_models_tpu.utils.export import export_fn

    cfg = load_config(args.config)
    name = cfg.model.name
    model, _patches = build_model(cfg)
    res = int(cfg.dataset.preprocessing.resolution)
    imgs = jnp.zeros((args.batch, 3, res, res), jnp.float32)

    if name in ("vitvqgan", "vqgan"):
        variables = _load_trained(cfg, model, (imgs,), args.ckpt)
        if args.surface == "recon":
            fn = lambda x: model.apply(variables, x)[0]
            example = (imgs,)
        elif args.surface == "encode":
            fn = lambda x: model.apply(variables, x,
                                       method=type(model).encode_imgs)
            example = (imgs,)
        elif args.surface == "decode":
            idx = jnp.zeros((args.batch, int(model.num_patches)), jnp.int32)
            fn = lambda i: model.apply(variables, i,
                                       method=type(model).decode_indices)
            example = (idx,)
        else:
            raise SystemExit(f"surface {args.surface!r} needs a generator "
                             f"model, got {name!r}")
    elif name in ("maskgit", "muse", "muse_vqgan", "parti"):
        if args.surface != "generate":
            raise SystemExit(f"model {name!r} exports the 'generate' surface")
        from attention_models_tpu.utils.checkpoint import (
            apply_param_patches,
        )

        rng = jax.random.key(0)
        if name == "parti":
            from attention_models_tpu.models.parti import parti_generate
            from attention_models_tpu.models.text_encoder import tokenize

            ids = jnp.array(tokenize(["an example prompt"] * args.batch))
            variables = jax.jit(functools.partial(
                model.init, method=type(model).init_all))(
                    jax.random.key(0), ids, imgs)
            if _patches:  # pretrained tokenizer weights into the init
                variables = apply_param_patches(variables, _patches)
            variables = _restore_params(variables, args.ckpt, "params")
            fn = functools.partial(parti_generate, model, variables)
            example = (ids, rng)
        elif name == "maskgit":
            variables = jax.jit(functools.partial(
                model.init, method=type(model).init_all))(
                    jax.random.key(0), imgs, rng)
            if _patches:
                variables = apply_param_patches(variables, _patches)
            variables = _restore_params(variables, args.ckpt, "params")
            fn = functools.partial(
                model.apply, variables, batch=args.batch,
                timesteps=args.timesteps, method=type(model).generate)
            example = (rng,)
        else:
            from attention_models_tpu.models.text_encoder import tokenize

            ids = jnp.array(tokenize(["an example prompt"] * args.batch))
            variables = jax.jit(functools.partial(
                model.init, method=type(model).init_all))(
                    jax.random.key(0), ids, imgs, rng)
            if _patches:
                variables = apply_param_patches(variables, _patches)
            variables = _restore_params(variables, args.ckpt, "params")
            fn = functools.partial(
                model.apply, variables, timesteps=args.timesteps,
                method=type(model).generate)
            example = (ids, rng)
    else:
        raise SystemExit(f"don't know how to export model {name!r}")

    out_path = args.output or f"{name}_{args.surface}.amtpu"
    export_fn(fn, example, out_path,
              meta={"model": name, "surface": args.surface,
                    "config": args.config, "resolution": res,
                    "batch": args.batch})
    size = os.path.getsize(out_path) / 1e6
    print(f"exported {name}/{args.surface} "
          f"[platform {jax.default_backend()}] -> {out_path} ({size:.1f} MB)")


if __name__ == "__main__":
    main()
