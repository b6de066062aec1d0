"""Reproducer / bisect harness for the axon batch-position decode corruption.

Symptom (docs/ROADMAP.md "Round-4 known issue"): on the tunneled axon TPU
backend, a KV-cached autoregressive decode that runs its per-token step
inside ONE jitted ``lax.fori_loop`` produces garbage for EVEN batch rows
from step 0, while ODD rows decode ~correctly. (r5 measurements sharpen
this: the corrupt-row pattern depends on the BATCH SIZE — at 2b the
formerly-safe odd positions corrupt too — it is nondeterministic across
executions of the same compiled program, and a 64-step chunked loop
already fails; only the host-stepped path is reliably clean.) The SAME step dispatched
once per token from the host (same jitted step function, cache threaded
through host calls) is correct for every row — as is the whole thing on a
CPU backend. The capability under test is the reference's AR generate
(/root/reference/models/parti.py:126-153), rebuilt TPU-side as a cached
fori_loop (attention_models_tpu/models/parti.py::_parti_run).

This tool runs BOTH paths on the active backend and prints a per-row
verdict table, so one invocation decides pass/fail for any configuration:

  loop path:  the full decode loop jitted as one program, with the first K
              steps' logits recorded into the loop carry;
  host path:  the identical jitted single-step program called ``steps``
              times from Python, greedy feedback on the host.

Greedy (argmax) decode everywhere — both paths are deterministic, so any
divergence is a compiler/runtime defect, not sampling noise. (fp32 and
bf16 produced bit-identical wrong indices in the r4 investigation: this
is structural corruption, not numerics.)

Usage (run each config as its own process; the axon tunnel is
single-tenant and an OOM poisons the process's HBM pool):

  # the original full-model symptom, trained checkpoint + real captions:
  python tools/axon_decode_repro.py --ckpt outputs/parti_coco_mini

  # structural bisect on synthetic params (no checkpoint needed):
  python tools/axon_decode_repro.py --steps 8 --depth 1 --record 4
  python tools/axon_decode_repro.py --steps 1024 --no-pallas
  python tools/axon_decode_repro.py --steps 64 --module decoder  # raw stack

  # CPU control (must always PASS):
  python tools/axon_decode_repro.py --cpu --steps 64

Knobs: --steps (loop trip count), --depth, --batch, --dim, --dtype,
--record (K recorded steps), --no-pallas (force every ops/ kernel to its
XLA fallback), --module {parti,decoder} (full model vs a raw
Decoder+head), --cache-len (decode table length when it exceeds --steps).

Exit status: 0 = loop and host paths agree (max |Δlogits| < 1e-2 on every
row and identical index sequences); 1 = mismatch (prints which rows).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_parti(depth: int, dim: int, dtype_str: str, cache_len: int):
    import jax.numpy as jnp

    from attention_models_tpu.models.parti import Parti

    vq_config = dict(
        kind="vitvqgan",
        vit_params=dict(dim=512, img_size=256, patch_size=8, n_heads=8,
                        d_head=64, depth=6, mlp_dim=2048, dropout=0.0),
        codebook_params=dict(codebook_size=8192, codebook_dim=32),
    )
    dtype = jnp.bfloat16 if dtype_str == "bf16" else jnp.float32
    # parti_coco_mini scale (cfg_exp/parti_coco_mini.yaml): clip tower
    # width 512 / 4 layers / 8 heads
    return Parti(dim=dim, vq_config=vq_config, n_heads=8, d_head=64,
                 depth=depth, clip_width=512, clip_layers=4, clip_heads=8,
                 dtype=dtype)


def synth_params(init_fn, *args):
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(init_fn, *args)
    rs = np.random.RandomState(0)
    return jax.tree.map(
        lambda s: jnp.asarray(0.5 * rs.standard_normal(s.shape), s.dtype),
        shapes,
    )


def compare_loop_vs_host(variables, step_fn, embed_fn, tok0, cache0,
                         steps: int, record: int, vocab: int,
                         repeats: int = 1):
    """step_fn(variables, tok, cache) -> (last_logits (b, vocab) fp32,
    new_cache); embed_fn(variables, nxt (b,), i) -> next tok. ``variables``
    is threaded as a jit ARGUMENT (a closure would embed the params as
    constants — models/parti.py notes remote-compile requests blow up).
    Returns (loop_idx, loop_rec, host_idx, host_rec)."""
    import jax
    import jax.numpy as jnp

    b = tok0.shape[0]
    record = min(record, steps)

    @jax.jit
    def run_loop(variables, tok0, cache0):
        rec0 = jnp.zeros((record, b, vocab), jnp.float32)
        idx0 = jnp.zeros((b, steps), jnp.int32)

        def body(i, carry):
            idx, tok, cache, rec = carry
            last, cache = step_fn(variables, tok, cache)
            upd = jax.lax.dynamic_update_slice(
                rec, last[None], (jnp.minimum(i, record - 1), 0, 0))
            rec = jnp.where(i < record, upd, rec)  # slots hold EXACT steps
            nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
            idx = jax.lax.dynamic_update_slice(idx, nxt[:, None], (0, i))
            return idx, embed_fn(variables, nxt, i), cache, rec

        idx, _, _, rec = jax.lax.fori_loop(
            0, steps, body, (idx0, tok0, cache0, rec0))
        return idx, rec

    one_step = jax.jit(step_fn)
    one_embed = jax.jit(embed_fn)

    loop_runs = []
    for _ in range(max(1, repeats)):
        loop_idx, loop_rec = run_loop(variables, tok0, cache0)
        loop_runs.append((np.asarray(loop_idx), np.asarray(loop_rec)))
    loop_idx, loop_rec = loop_runs[0]

    tok, cache = tok0, cache0
    host_idx = np.zeros((b, steps), np.int32)
    host_rec = np.zeros((record, b, vocab), np.float32)
    for i in range(steps):
        last, cache = one_step(variables, tok, cache)
        last = np.asarray(last)
        if i < record:
            host_rec[i] = last
        nxt = last.argmax(-1).astype(np.int32)
        host_idx[:, i] = nxt
        tok = one_embed(variables, nxt, i)
    return loop_runs, host_idx, host_rec


def verdict(loop_idx, loop_rec, host_idx, host_rec, targets=None,
            tol: float = 1e-2) -> bool:
    b, steps = loop_idx.shape
    ok = True
    log(f"{'row':>3} {'step0 |Δlogit|max':>18} {'idx match %':>12}"
        + (f" {'acc(loop)':>10} {'acc(host)':>10}" if targets is not None
           else ""))
    for r in range(b):
        d0 = float(np.max(np.abs(loop_rec[0, r] - host_rec[0, r])))
        match = float((loop_idx[r] == host_idx[r]).mean())
        line = f"{r:>3} {d0:>18.4f} {100 * match:>11.1f}%"
        if targets is not None:
            acc_l = float((loop_idx[r] == targets[r, :steps]).mean())
            acc_h = float((host_idx[r] == targets[r, :steps]).mean())
            line += f" {acc_l:>10.3f} {acc_h:>10.3f}"
        row_ok = d0 < tol and match == 1.0
        ok &= row_ok
        log(line + ("" if row_ok else "   <-- MISMATCH"))
    for k in range(1, loop_rec.shape[0]):
        dk = float(np.max(np.abs(loop_rec[k] - host_rec[k])))
        if dk > tol:
            log(f"  (step {k}: |Δlogit|max {dk:.4f} across rows)")
            ok = False
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="orbax run dir (e.g. outputs/parti_coco_mini): "
                         "trained-symptom mode with real captions + token "
                         "targets; otherwise synthetic params")
    ap.add_argument("--steps", type=int, default=1024)
    ap.add_argument("--record", type=int, default=2)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    ap.add_argument("--module", choices=["parti", "decoder"],
                    default="parti")
    ap.add_argument("--cache-len", type=int, default=None,
                    help="KV table length (default: 1024 for parti, "
                         "--steps for decoder)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="force every ops/ kernel to its XLA fallback")
    ap.add_argument("--cpu", action="store_true", help="CPU control run")
    ap.add_argument("--repeat", type=int, default=1,
                    help="execute the compiled loop N times (the r4 "
                         "corruption was nondeterministic across runs)")
    ap.add_argument("--exact", action="store_true",
                    help="drive the REAL parti_generate (greedy) instead "
                         "of the harness loop; compares decoded images "
                         "against the host-stepped indices' VQ decode")
    ap.add_argument("--patch", default="none",
                    choices=["none", "nofilter", "exactfilter",
                             "fp32filter"],
                    help="exact mode: monkeypatch parti.filter_logits to "
                         "bisect which decode-epilogue ingredient triggers "
                         "the corruption")
    ap.add_argument("--host-cache", default=None,
                    help="exact mode: .npz path caching the host-stepped "
                         "indices (identical across patch experiments — "
                         "saves ~5 min per run)")
    ap.add_argument("--workaround", action="store_true",
                    help="exact mode: run parti_generate with "
                         "axon_workaround=True (validates the shipped "
                         "mitigation end-to-end on this backend)")
    ap.add_argument("--json", action="store_true",
                    help="print a one-line JSON verdict on stdout")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.no_pallas:
        from attention_models_tpu.ops import dispatch

        dispatch.on_tpu = lambda platform=None: False

    import jax.numpy as jnp

    log(f"backend={jax.default_backend()} steps={args.steps} "
        f"depth={args.depth} module={args.module} dtype={args.dtype} "
        f"pallas={not args.no_pallas}")

    targets = None
    if args.module == "parti":
        from attention_models_tpu.models.parti import Parti

        model = build_parti(args.depth, args.dim, args.dtype,
                            args.cache_len or 1024)
        b = args.batch
        if args.ckpt:
            from attention_models_tpu.utils.checkpoint import (
                CheckpointManager,
            )

            ids, targets = load_coco_mini_batch(b)
            dummy = jnp.zeros((1, 3, 256, 256), jnp.float32)
            shapes = jax.eval_shape(
                lambda k, i, d: model.init(k, i, d, method=Parti.init_all),
                jax.random.key(0), jnp.asarray(ids), dummy)
            # materialize zeros of the template shapes, then restore
            template = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            ckpt_dir = args.ckpt
            if os.path.isdir(os.path.join(
                    args.ckpt, "checkpoints", "parti_coco_mini_overfit")):
                ckpt_dir = os.path.join(
                    args.ckpt, "checkpoints", "parti_coco_mini_overfit")
            params = CheckpointManager(ckpt_dir).restore_params(
                template["params"])
            if params is None:
                raise SystemExit(f"no checkpoint restored from {ckpt_dir}")
            variables = {"params": params}
        else:
            ids = np.zeros((b, 77), np.int32)
            ids[:, 0] = 49406
            ids[:, 1] = np.arange(b) + 1000  # distinct prompts per row
            ids[:, 2] = 49407
            dummy = jnp.zeros((1, 3, 256, 256), jnp.float32)
            variables = synth_params(
                lambda: model.init(jax.random.key(0), jnp.asarray(ids),
                                   dummy, method=Parti.init_all))
        ids = jnp.asarray(ids)
        ctx = model.apply(variables, ids, method=Parti.prepare_context)
        tok0 = model.apply(variables, b, method=Parti.start_embed)
        _, vars0 = model.apply(variables, tok0, ctx,
                               method=Parti.decode_step, mutable=["cache"])
        cache0 = jax.tree.map(jnp.zeros_like, vars0["cache"])
        pe = model.apply(variables, method=lambda m: m.pos_enc.pe_table())
        vocab = 8192

        def step_fn(v, tok, cache):
            logits, upd = model.apply(
                {**v, "cache": cache}, tok, ctx,
                method=Parti.decode_step, mutable=["cache"])
            return logits[:, -1, :].astype(jnp.float32), upd["cache"]

        def embed_fn(v, nxt, i):
            emb = model.apply(v, nxt[:, None],
                              method=lambda m, ix: m.token_emb(ix))
            return emb + pe[i][None, None, :].astype(emb.dtype)

    else:  # raw Decoder + plain Dense head: no VQ / CLIP / embeddings
        from attention_models_tpu.models.transformer import Decoder

        b = args.batch
        cache_len = args.cache_len or args.steps
        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
        dec = Decoder(args.dim, n_heads=8, d_head=64, depth=args.depth,
                      dtype=dtype, max_decode_len=cache_len)
        rs = np.random.RandomState(1)
        ctx = jnp.asarray(rs.randn(b, 77, args.dim), dtype)
        tok0 = jnp.asarray(rs.randn(b, 1, args.dim), dtype)
        vocab = 512
        head = jnp.asarray(rs.randn(args.dim, vocab) / np.sqrt(args.dim),
                           jnp.float32)
        emb_table = jnp.asarray(rs.randn(vocab, args.dim), dtype)
        variables = synth_params(
            lambda: dec.init(jax.random.key(0), tok0, ctx, decode=True))

        def step_fn(v, tok, cache):
            out, upd = dec.apply(
                {**v, "cache": cache}, tok, ctx, decode=True,
                mutable=["cache"])
            last = out[:, -1, :].astype(jnp.float32) @ head
            return last, upd["cache"]

        def embed_fn(v, nxt, i):
            del i, v
            return emb_table[nxt][:, None, :]

        _, vars0 = dec.apply(variables, tok0, ctx, decode=True,
                             mutable=["cache"])
        cache0 = jax.tree.map(jnp.zeros_like, vars0["cache"])

    if args.exact:
        if args.module != "parti":
            raise SystemExit("--exact requires --module parti")
        import jax as _jax

        from attention_models_tpu.models.parti import parti_generate
        from attention_models_tpu.models.vq_common import vq_num_patches

        n_full = vq_num_patches(model.vq_config)
        if args.steps != n_full:
            log(f"--exact decodes the full token grid: steps "
                f"{args.steps} -> {n_full}")
            args.steps = n_full

        if args.patch != "none":
            # morph _parti_run's program toward the harness loop (which
            # PASSES) one ingredient at a time, from inside the real
            # parti_generate: the sampling filter is the prime structural
            # difference (a 16-iteration bisection fori_loop NESTED in the
            # decode loop body)
            import attention_models_tpu.models.parti as parti_mod

            real_filter = parti_mod.filter_logits
            if args.patch == "nofilter":
                parti_mod.filter_logits = lambda l, p, approx=False: l
            elif args.patch == "exactfilter":
                parti_mod.filter_logits = (
                    lambda l, p, approx=False: real_filter(l, p, False))
            elif args.patch == "fp32filter":
                parti_mod.filter_logits = (
                    lambda l, p, approx=False: real_filter(
                        l.astype(jnp.float32), p, approx))
            log(f"patched parti.filter_logits: {args.patch}")

        cache_file = None
        host_idx = None
        if args.host_cache:
            cache_file = args.host_cache
            if os.path.exists(cache_file):
                z = np.load(cache_file)
                if (z["steps"] == args.steps and z["depth"] == args.depth
                        and z["batch"] == b):
                    host_idx = z["host_idx"]
                    log(f"host indices loaded from {cache_file}")
        if host_idx is None:
            one_step = _jax.jit(step_fn)
            one_embed = _jax.jit(embed_fn)
            tok, cache = tok0, cache0
            host_idx = np.zeros((b, args.steps), np.int32)
            for i in range(args.steps):
                last_d, cache = one_step(variables, tok, cache)
                last = np.asarray(last_d)
                nxt = last.argmax(-1).astype(np.int32)
                host_idx[:, i] = nxt
                tok = one_embed(variables, jnp.asarray(nxt), i)
            if cache_file:
                np.savez(cache_file, host_idx=host_idx, steps=args.steps,
                         depth=args.depth, batch=b)
                log(f"host indices cached to {cache_file}")
        host_imgs = np.asarray(model.apply(
            variables, jnp.asarray(host_idx),
            method=lambda m, ix: m.vq.decode_indices(ix)), np.float32)
        ok = True
        for k in range(1, args.repeat + 1):
            imgs = np.asarray(parti_generate(
                model, variables, jnp.asarray(ids), _jax.random.key(2),
                temperature=0.0, axon_workaround=args.workaround),
                np.float32)
            diffs = np.abs(imgs - host_imgs).reshape(b, -1).max(axis=1)
            bad = [r for r, d in enumerate(diffs) if d > 0.05]
            log(f"exact run {k}: per-row max|Δpix| "
                + " ".join(f"{d:.3f}" for d in diffs)
                + ("" if not bad else f"   <-- MISMATCH rows {bad}"))
            ok &= not bad
        summary = {"backend": jax.default_backend(), "mode": "exact",
                   "steps": args.steps, "depth": args.depth,
                   "batch": b, "repeat": args.repeat, "ok": ok}
        log(("PASS" if ok else "FAIL") + f" {summary}")
        if args.json:
            print(json.dumps(summary), flush=True)
        raise SystemExit(0 if ok else 1)

    loop_runs, host_idx, host_rec = compare_loop_vs_host(
        variables, step_fn, embed_fn, tok0, cache0, args.steps, args.record,
        vocab, repeats=args.repeat)
    ok = verdict(loop_runs[0][0], loop_runs[0][1], host_idx, host_rec,
                 targets)
    # cross-execution stability of the SAME compiled program (the r4
    # investigation saw nondeterminism: first post-compile execution clean,
    # later ones corrupt)
    for k, (idx_k, _) in enumerate(loop_runs[1:], start=2):
        same = float((idx_k == loop_runs[0][0]).mean())
        vs_host = float((idx_k == host_idx).mean())
        if same < 1.0 or vs_host < 1.0:
            log(f"run {k}/{args.repeat}: vs run1 {100*same:.1f}%, "
                f"vs host {100*vs_host:.1f}%   <-- NONDETERMINISTIC")
            ok = False
    if args.repeat > 1:
        log(f"cross-run stability over {args.repeat} executions: "
            + ("stable" if ok else "UNSTABLE"))
    summary = {
        "backend": jax.default_backend(), "module": args.module,
        "steps": args.steps, "depth": args.depth, "batch": args.batch,
        "dtype": args.dtype, "pallas": not args.no_pallas, "ok": ok,
    }
    log(("PASS" if ok else "FAIL") + f" {summary}")
    if args.json:
        print(json.dumps(summary), flush=True)
    raise SystemExit(0 if ok else 1)


def load_coco_mini_batch(b: int):
    """(text_ids (b, 77) int32, target token grids (b, 1024) int32) for the
    first b samples of the coco_mini overfit set, caption-paired via the
    deterministic dataset order the token cache was built in
    (training/base_trainer.py _pretokenize: shuffle=False scan)."""
    from attention_models_tpu.data.loaders import build_loader
    from attention_models_tpu.models.text_encoder import tokenize
    from attention_models_tpu.utils.config import load_config

    cfg = load_config("cfg_exp/parti_coco_mini.yaml")
    train_dl, _ = build_loader(cfg)
    ds = train_dl.dataset
    texts = [ds[i][1] for i in range(b)]
    z = np.load("outputs/parti_coco_mini/checkpoints/vq_token_cache.npz")
    return (np.asarray(tokenize(texts, 77), np.int32),
            z["cache"][:b].astype(np.int32))


if __name__ == "__main__":
    main()
