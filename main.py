"""CLI entry point (API parity with /root/reference/main.py):

    python main.py --config=cfg/vitvqgan.yaml [dotted.key=value ...]

Builds model → data loaders → trainer from the YAML config (same schema as
the reference) and runs training on the TPU mesh.
"""

import logging
import os
import sys


def _honor_platform_env():
    """Restore standard ``JAX_PLATFORMS`` semantics. Site hooks (e.g. the
    axon TPU-tunnel sitecustomize) may force their platform via
    ``jax.config`` — which beats env vars — so ``JAX_PLATFORMS=cpu python
    main.py`` would silently land on the TPU. Re-assert the user's env
    choice before any backend initialization."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    have = jax.config.jax_platforms or ""
    # same primary platform (e.g. env "axon" vs hook's "axon,cpu"): keep
    # the hook's richer fallback list; only override a real disagreement
    if have.split(",")[0].strip() == want.split(",")[0].strip():
        return
    try:
        jax.config.update("jax_platforms", want)
    except Exception as e:
        # backend already up (e.g. re-entrant import) — training would
        # silently proceed on the wrong platform, so say which one
        print(
            f"WARNING: could not honor JAX_PLATFORMS={want!r} "
            f"(active: {have!r}): {e}",
            file=sys.stderr,
        )


_honor_platform_env()

from attention_models_tpu.data import build_loader
from attention_models_tpu.models.factory import build_model
from attention_models_tpu.parallel import runtime_init
from attention_models_tpu.training import build_trainer
from attention_models_tpu.utils.config import config_from_cli

LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}


def main(argv):
    cfg = config_from_cli(argv)
    level_name = str(cfg.experiment.get("log_level", "info")).lower()
    if level_name not in LEVELS:
        raise SystemExit(
            f"unknown experiment.log_level {level_name!r}; "
            f"valid: {sorted(LEVELS)}"
        )
    logging.basicConfig(
        level=LEVELS[level_name],
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    runtime_init()

    # persistent executable cache: re-running a config (or resuming after
    # preemption) skips recompiles — over a remote-compile TPU link a cold
    # compile of the deeper models takes minutes. Opt out or relocate via
    # training.compilation_cache_dir ("" disables).
    cache_dir = cfg.training.get("compilation_cache_dir",
                                 "/tmp/jax_cache")
    if cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if cfg.training.get("debug_nans"):
        from attention_models_tpu.utils.profiling import enable_nan_checks

        enable_nan_checks(True)

    model, patches = build_model(cfg)
    data_loaders = build_loader(cfg)
    trainer = build_trainer(cfg, model, data_loaders,
                            pretrained_patches=patches)
    trainer.train()


if __name__ == "__main__":
    main(sys.argv[1:])
