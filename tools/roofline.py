"""Per-component roofline decomposition for the fused GAN train step and
the ViT/ViT-MoE classifier step (VERDICT r4 #3/#4).

Method: a single TPU core executes one program's ops serially (no inter-op
overlap), so component device-time is measured as ABLATION DELTAS between
jitted step variants that differ by exactly one term. The variant chain for
the GAN step (the reference's main workload,
/root/reference/trainers/vitgqgan.py:133-209):

    V0 g_fwd        generator forward only (rec, cb)
    V1 +g_bwd       + vjp through l1+l2+codebook upstream + adam update
    V2 +lpips       + perceptual loss fwd and bwd-through-rec
    V3 +adv         + G-phase discriminator forward + bwd-through-rec
    V4 +d_hinge     + D phase (fake/real forwards, hinge, d-grads, adam)
    V5 +gp = FULL   + WGAN-GP interpolate double-backward

Each variant is timed (time_fn, 10 iters through the tunnel) and costed
from its own compiled executable (XLA cost analysis), so Δtime and ΔFLOPs
per component can't drift from what actually ran. A profiler-trace per-op
table (tools/trace_summary.py aggregation) over the FULL step crosschecks
the ablation totals.

Usage:
    python tools/roofline.py --case gan --bs 32 [--trace /tmp/gan_trace]
    python tools/roofline.py --case vit --bs 256 [--trace /tmp/vit_trace]
    python tools/roofline.py --case vit_moe_dense --bs 64
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: timing/MFU helpers)
from bench import PEAK_BF16, compiled_flops, log, time_fn  # noqa: E402


def _table(rows):
    log(f"{'component':<22}{'Δms':>9}{'ΔGFLOP':>10}{'TFLOP/s':>9}{'MFU%':>6}")
    for name, dms, dgf in rows:
        tf = dgf / dms if dms > 0 else 0.0  # GFLOP/ms == TFLOP/s
        mfu = 100 * tf * 1e12 / PEAK_BF16
        log(f"{name:<22}{dms:>9.2f}{dgf:>10.1f}{tf:>9.1f}{mfu:>6.1f}")


def _measure_chain(variants, args_of):
    """Time + cost each (name, jitted) variant; return chained-delta rows
    [(component, Δms, ΔGFLOP)] plus the full-step absolutes."""
    rows, prev = [], (0.0, 0.0)
    absolutes = []
    for name, step in variants:
        a = args_of()
        dt = time_fn(step, *a, iters=10)
        fl = compiled_flops(step, *a)
        absolutes.append((name, dt * 1e3, fl / 1e9))
        rows.append((name, dt * 1e3 - prev[0], (fl - prev[1]) / 1e9))
        prev = (dt * 1e3, fl)
        log(f"  measured {name}: {dt * 1e3:.2f} ms, {fl / 1e9:.1f} GFLOP"
            f"{bench.mfu_str(fl, dt)}")
    return rows, absolutes


def _capture_trace(step, args, trace_dir, iters=5):
    import jax

    from attention_models_tpu.utils.profiling import force_sync

    out = step(*args)
    force_sync(out)
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = step(*args)
    force_sync(out)
    jax.profiler.stop_trace()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_summary import summarize

    log(f"--- per-op device-time table ({iters} steps, {trace_dir}) ---")
    summarize(trace_dir, steps=iters, top=25)


# --------------------------------------------------------------------------- #
# GAN case
# --------------------------------------------------------------------------- #

def roofline_gan(bs: int, trace_dir: str | None, remat: bool = False,
                 chain: int = 0, full_only: bool = False):
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from attention_models_tpu.models.discriminator import NLayerDiscriminator
    from attention_models_tpu.models.vitvqgan import vitvqgan_base
    from attention_models_tpu.training.losses import (
        LPIPS,
        g_nonsaturating_loss,
        gradient_penalty,
        hinge_d_loss,
    )

    model = vitvqgan_base(img_size=256, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    init_imgs = jnp.zeros((2, 3, 256, 256), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, rng, init_imgs)
    rs = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(0.02 * rs.standard_normal(s.shape), s.dtype),
        shapes,
    )
    discr = NLayerDiscriminator(input_nc=3, ndf=64, n_layers=3,
                                dtype=jnp.bfloat16)
    lpips = LPIPS(dtype=jnp.bfloat16)
    d_vars = bench._synth_params(
        discr, functools.partial(discr.init, train=False),
        jax.random.key(0), init_imgs)
    lp = bench._synth_params(lpips, lpips.init, jax.random.key(0),
                             init_imgs, init_imgs)
    tx = optax.adam(1e-4)
    g_opt = tx.init(params["params"])
    d_opt = tx.init(d_vars["params"])
    d_stats = d_vars.get("batch_stats", {})

    def d_apply(dp, x):
        return discr.apply({"params": dp, "batch_stats": d_stats}, x)

    def make_inner(level: int):
        """level: 0=g_fwd 1=+g_bwd 2=+lpips 3=+adv 4=+d_hinge 5=+gp."""
        g_fwd = lambda p, imgs: model.apply({"params": p}, imgs)
        if remat:
            g_fwd = jax.checkpoint(g_fwd)

        def step(g_params, g_opt_s, d_params, d_opt_s, imgs, rng):
            if level == 0:
                rec, cb = g_fwd(g_params, imgs)
                return jnp.mean(rec) + cb

            (rec, cb), g_vjp = jax.vjp(lambda p: g_fwd(p, imgs), g_params)
            rec_sg = jax.lax.stop_gradient(rec)

            if level >= 4:
                def d_loss_fn(dp):
                    loss = hinge_d_loss(d_apply(dp, rec_sg),
                                        d_apply(dp, imgs))
                    if level >= 5:
                        loss = loss + gradient_penalty(
                            lambda x: d_apply(dp, x), rng, imgs, rec_sg)
                    return loss

                d_grads = jax.grad(d_loss_fn)(d_params)
                d_updates, d_opt_s = tx.update(d_grads, d_opt_s, d_params)
                d_params = optax.apply_updates(d_params, d_updates)

            def g_loss_fn(rec, cb):
                loss = (cb + jnp.mean(jnp.abs(rec - imgs))
                        + jnp.mean((rec - imgs) ** 2))
                if level >= 2:
                    loss = loss + jnp.mean(
                        lpips.apply(lp, rec.astype(jnp.float32),
                                    imgs.astype(jnp.float32)))
                if level >= 3:
                    loss = loss + 0.1 * g_nonsaturating_loss(
                        d_apply(d_params, rec))
                return loss

            out_bar = jax.grad(g_loss_fn, argnums=(0, 1))(rec, cb)
            (g_grads,) = g_vjp(out_bar)
            g_updates, g_opt_s = tx.update(g_grads, g_opt_s, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            return g_params, g_opt_s, d_params, d_opt_s

        return step

    imgs = jnp.array(np.random.RandomState(0).rand(bs, 3, 256, 256),
                     jnp.bfloat16)

    def args_of():
        return (params["params"], g_opt, d_vars["params"], d_opt, imgs,
                jax.random.key(1))

    tag = "+rematG" if remat else ""
    log(f"=== GAN step roofline, bs={bs}{tag}, 256px bf16 ===")
    if not full_only:
        names = ["g_fwd", "+g_bwd+adam", "+lpips", "+adv", "+d_hinge+adam",
                 "+gp (FULL)"]
        variants = [(names[i], jax.jit(make_inner(i))) for i in range(6)]
        rows, absolutes = _measure_chain(variants, args_of)
        log("--- chained component deltas ---")
        _table(rows)
        full_name, full_ms, full_gf = absolutes[-1]
        tf = full_gf / full_ms  # GFLOP/ms == TFLOP/s
        log(f"FULL step: {full_ms:.1f} ms, {full_gf:.0f} GFLOP, "
            f"{tf:.1f} TFLOP/s, {100 * tf * 1e12 / PEAK_BF16:.1f}% MFU")
    else:
        step = jax.jit(make_inner(5))
        a = args_of()
        dt = time_fn(step, *a, iters=10)
        fl = compiled_flops(step, *a)
        log(f"FULL step bs={bs}{tag}: {dt * 1e3:.1f} ms "
            f"({bs / dt:.0f} imgs/s){bench.mfu_str(fl, dt)}")
    if chain:
        # steady-state: K steps inside ONE jitted lax.scan (removes the
        # per-dispatch tunnel overhead the same way the bench headline's
        # chained-recon does; params/opt states thread through the carry)
        inner = make_inner(5)

        @jax.jit
        def chained(g_params, g_opt_s, d_params, d_opt_s, imgs, rng):
            def body(carry, _):
                return inner(*carry, imgs, rng), 0.0
            carry, _ = jax.lax.scan(
                body, (g_params, g_opt_s, d_params, d_opt_s), None,
                length=chain)
            return carry

        a = args_of()
        dt = time_fn(chained, *a, iters=2, warmup=1) / chain
        # XLA cost analysis counts a scan body ONCE regardless of trip
        # count (the r4 chained-recon lesson) — no /chain on the FLOPs
        fl = compiled_flops(chained, *a)
        log(f"FULL step steady-state (scan x{chain}) bs={bs}{tag}: "
            f"{dt * 1e3:.1f} ms/step ({bs / dt:.0f} imgs/s)"
            f"{bench.mfu_str(fl, dt)}")
    if trace_dir:
        _capture_trace(jax.jit(make_inner(5)), args_of(), trace_dir)


def roofline_gan_ab(bs: int):
    """Batched-tower A/Bs for the GAN step's non-generator terms:

    1. LPIPS: two separate VGG towers (rec, imgs) vs ONE concatenated
       2b-batch tower split at the taps — same math (convs are per-sample),
       bigger conv batches for the MXU.
    2. hinge D phase: discr(fake) + discr(real) as two calls vs one
       2b-batch call split after — same math (BatchNorm runs eval-mode
       running stats in the trainer's D loss).
    Each side measured as value_and_grad wrt the rec-like input (the
    gradient path the real step pays)."""
    import functools

    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.discriminator import NLayerDiscriminator
    from attention_models_tpu.training.losses import (
        LPIPS,
        VGG16Features,
        hinge_d_loss,
    )

    rs = np.random.RandomState(0)
    rec = jnp.array(rs.rand(bs, 3, 256, 256), jnp.bfloat16)
    imgs = jnp.array(rs.rand(bs, 3, 256, 256), jnp.bfloat16)

    lpips = LPIPS(dtype=jnp.bfloat16)
    lp = bench._synth_params(lpips, lpips.init, jax.random.key(0),
                             rec[:2], imgs[:2])

    def lpips_sep_loss(rec):
        return jnp.mean(lpips.apply(lp, rec.astype(jnp.float32),
                                    imgs.astype(jnp.float32)))

    for name, fn in (("lpips fwd 2-tower", jax.jit(lpips_sep_loss)),
                     ("lpips grad 2-tower",
                      jax.jit(jax.grad(lpips_sep_loss)))):
        dt = time_fn(fn, rec, iters=10)
        fl = compiled_flops(fn, rec)
        log(f"{name} bs={bs}: {dt * 1e3:.2f} ms{bench.mfu_str(fl, dt)}")

    # concatenated variant: run VGG once on concat([rec, imgs]) and split
    # the taps; reuse the same lin heads
    vgg_params = {"params": lp["params"]["vgg"]}
    lin_kernels = [lp["params"][f"lin{i}"]["Conv_0"]["kernel"]
                   if "Conv_0" in lp["params"][f"lin{i}"]
                   else lp["params"][f"lin{i}"]["kernel"]
                   for i in range(5)]

    _SHIFT = jnp.array([-0.030, -0.088, -0.188])
    _SCALE = jnp.array([0.458, 0.448, 0.450])

    def lpips_cat_loss(rec):
        def prep(img):
            img = jnp.transpose(img, (0, 2, 3, 1))
            img = img * 2.0 - 1.0
            return (img - _SHIFT.astype(img.dtype)) / _SCALE.astype(img.dtype)

        both = jnp.concatenate([prep(rec.astype(jnp.float32)),
                                prep(imgs.astype(jnp.float32))], axis=0)
        taps = VGG16Features(dtype=jnp.bfloat16, name="vgg").apply(
            vgg_params, both)
        total = 0.0
        for i, t in enumerate(taps):
            a, b_ = t[:bs], t[bs:]
            an = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            bn = b_ / jnp.sqrt(jnp.sum(b_ * b_, -1, keepdims=True) + 1e-10)
            d = (an - bn) ** 2
            lin = jax.lax.conv_general_dilated(
                d.astype(jnp.bfloat16), lin_kernels[i].astype(jnp.bfloat16),
                (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return jnp.mean(total)

    for name, fn in (("lpips fwd 1-tower(2b)", jax.jit(lpips_cat_loss)),
                     ("lpips grad 1-tower(2b)",
                      jax.jit(jax.grad(lpips_cat_loss)))):
        dt = time_fn(fn, rec, iters=10)
        fl = compiled_flops(fn, rec)
        log(f"{name} bs={bs}: {dt * 1e3:.2f} ms{bench.mfu_str(fl, dt)}")

    # ---- hinge D phase: 2 calls vs one 2b call --------------------------- #
    discr = NLayerDiscriminator(input_nc=3, ndf=64, n_layers=3,
                                dtype=jnp.bfloat16)
    d_vars = bench._synth_params(
        discr, functools.partial(discr.init, train=False),
        jax.random.key(0), rec[:2])
    d_stats = d_vars.get("batch_stats", {})
    dp = d_vars["params"]

    def hinge_sep(dp):
        fake = discr.apply({"params": dp, "batch_stats": d_stats}, rec)
        real = discr.apply({"params": dp, "batch_stats": d_stats}, imgs)
        return hinge_d_loss(fake, real)

    def hinge_cat(dp):
        both = discr.apply({"params": dp, "batch_stats": d_stats},
                           jnp.concatenate([rec, imgs], axis=0))
        return hinge_d_loss(both[:bs], both[bs:])

    for name, fn in (("hinge grad 2-call", jax.jit(jax.grad(hinge_sep))),
                     ("hinge grad 1-call(2b)",
                      jax.jit(jax.grad(hinge_cat)))):
        dt = time_fn(fn, dp, iters=10)
        fl = compiled_flops(fn, dp)
        log(f"{name} bs={bs}: {dt * 1e3:.2f} ms{bench.mfu_str(fl, dt)}")


# --------------------------------------------------------------------------- #
# ViT / ViT-MoE case
# --------------------------------------------------------------------------- #

def roofline_vit(kind: str, bs: int, trace_dir: str | None):
    import jax
    import jax.numpy as jnp
    import optax

    res = 256
    model = bench._vit_model(kind)
    params = bench._synth_params(model, model.init, jax.random.key(0),
                                 jnp.zeros((2, 3, res, res), jnp.bfloat16))
    tx = optax.adamw(1e-4)
    opt = tx.init(params["params"])

    def make_step(level: int):
        """0=fwd 1=+xent 2=+bwd 3=+adamw (FULL)."""

        @jax.jit
        def step(p, opt_s, imgs, labels):
            def loss_fn(p):
                logits = model.apply({"params": p}, imgs)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), labels).mean()

            if level == 0:
                return jnp.mean(model.apply({"params": p}, imgs))
            if level == 1:
                return loss_fn(p)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            if level == 2:
                return loss, grads
            updates, opt2 = tx.update(grads, opt_s, p)
            return optax.apply_updates(p, updates), opt2, loss

        return step

    imgs = jnp.array(np.random.RandomState(0).rand(bs, 3, res, res),
                     jnp.bfloat16)
    labels = jnp.array(np.random.RandomState(1).randint(0, 1000, bs),
                       jnp.int32)

    def args_of():
        return (params["params"], opt, imgs, labels)

    names = ["fwd", "+xent", "+bwd", "+adamw (FULL)"]
    variants = [(names[i], make_step(i)) for i in range(4)]
    log(f"=== {kind} step roofline, bs={bs}, 256px bf16 ===")
    rows, absolutes = _measure_chain(variants, args_of)
    log("--- chained component deltas ---")
    _table(rows)
    if trace_dir:
        _capture_trace(make_step(3), args_of(), trace_dir)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--case", required=True,
                    choices=["gan", "gan_ab", "vit", "vit_moe_dense",
                             "vit_moe_scatter"])
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--trace", default=None,
                    help="capture a profiler trace of the full step to this "
                         "dir and print the per-op device-time table")
    ap.add_argument("--remat", action="store_true",
                    help="gan: jax.checkpoint over the generator forward")
    ap.add_argument("--chain", type=int, default=0,
                    help="gan: also measure K steps inside one jitted scan "
                         "(steady-state, no per-dispatch tunnel overhead)")
    ap.add_argument("--full-only", action="store_true",
                    help="gan: skip the ablation chain, measure only the "
                         "full step (for OOM-risky batch sizes)")
    a = ap.parse_args()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    if a.case == "gan":
        roofline_gan(a.bs, a.trace, remat=a.remat, chain=a.chain,
                     full_only=a.full_only)
    elif a.case == "gan_ab":
        roofline_gan_ab(a.bs)
    else:
        roofline_vit(a.case, a.bs, a.trace)


if __name__ == "__main__":
    main()
