"""attention-models-tpu: a TPU-native JAX/XLA/Pallas framework.

Rebuilds the capabilities of the PyTorch reference ``pranoyr/attention-models``
(see SURVEY.md) as an idiomatic TPU-first stack:

- ``ops``       — pure compute ops: Pallas flash attention, fused codebook
                  nearest-neighbor lookup, vectorized MoE dispatch, sampling.
- ``models``    — flax.linen model zoo: attention primitives, transformer
                  blocks, ViT/ViT-MoE, VQGAN/ViTVQGAN tokenizers, MaskGIT,
                  Muse, Parti.
- ``parallel``  — device mesh creation and parameter/batch sharding rules
                  (DP/TP/EP via GSPMD; collectives ride ICI).
- ``training``  — optax/orbax trainers: GAN trainer for the tokenizers,
                  CE trainers for classifiers and generators.
- ``data``      — host input pipeline (COCO captions, image folders,
                  synthetic) with device prefetch.
- ``utils``     — config (YAML + dotted CLI overrides), metrics, PRNG,
                  profiling, torch-checkpoint conversion.
"""

__version__ = "0.1.0"


def sync(out):
    """Package-canonical device synchronizer for ALL timing code: fetch one
    element to host (``utils.profiling.force_sync``). ``jax.
    block_until_ready`` can be a NO-OP on tunneled experimental platforms
    (axon), which silently corrupts wall-clock measurements — never time
    with it directly."""
    from attention_models_tpu.utils.profiling import force_sync

    force_sync(out)
