"""Benchmark: ViTVQGAN 256px reconstruction throughput (imgs/sec/chip) — the
BASELINE.md headline metric. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}

Baseline: the driver north-star is 2,000 imgs/sec on a v5e-8 (8 chips) =
250 imgs/sec/chip; vs_baseline = value / 250. Extra diagnostics (batch sweep,
MaskGIT/Muse per-decode-step latency) go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(out):
    """Force execution by fetching one element to the host (block_until_ready
    can be a no-op on experimental tunneled platforms)."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def time_fn(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)  # device stream is FIFO: last value ready => all iters done
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from attention_models_tpu.models.vitvqgan import ViTVQGAN, vitvqgan_base

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    model = vitvqgan_base(img_size=256, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    init_imgs = jnp.zeros((2, 3, 256, 256), jnp.bfloat16)
    # synthesize params host-side from the init shapes (values don't matter
    # for throughput; avoids a large one-off on-device init program)
    shapes = jax.eval_shape(model.init, rng, init_imgs)
    rs = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(0.02 * rs.standard_normal(s.shape), s.dtype),
        shapes,
    )
    log(f"params: {sum(x.size for x in jax.tree.leaves(params)) / 1e6:.1f}M")

    recon = jax.jit(lambda p, x: model.apply(p, x)[0])

    best = 0.0
    best_bs = 0
    for bs in (16, 32, 64, 128):
        try:
            imgs = jnp.array(
                np.random.RandomState(0).rand(bs, 3, 256, 256), jnp.bfloat16
            )
            dt = time_fn(recon, params, imgs)
            ips = bs / dt
            log(f"recon bs={bs}: {dt * 1e3:.2f} ms  {ips:.0f} imgs/s")
            if ips > best:
                best, best_bs = ips, bs
        except Exception as e:  # OOM at large batch etc.
            log(f"recon bs={bs}: failed ({type(e).__name__})")
            break

    # ---- extra diagnostics: generator decode latency ------------------------ #
    try:
        encode = jax.jit(
            lambda p, x: model.apply(p, x, method=ViTVQGAN.encode_imgs)
        )
        imgs = jnp.array(
            np.random.RandomState(0).rand(best_bs, 3, 256, 256), jnp.bfloat16
        )
        dt_enc = time_fn(encode, params, imgs)
        log(f"encode-only bs={best_bs}: {dt_enc * 1e3:.2f} ms "
            f"({best_bs / dt_enc:.0f} imgs/s)")
    except Exception as e:
        log(f"encode bench failed: {e}")

    print(json.dumps({
        "metric": "vitvqgan_256px_recon_throughput",
        "value": round(best, 1),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(best / 250.0, 3),
        "batch_size": best_bs,
    }))


if __name__ == "__main__":
    main()
