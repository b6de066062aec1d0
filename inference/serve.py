"""Batch-serving front-end over the dynamic-batching inference engine.

The reference's entire deployment story is per-image argparse scripts
(/root/reference/inference/*.py — rebuild the model, load a .pt, process one
image, exit). This CLI keeps ONE resident compiled model behind
``attention_models_tpu.serving.BatchedInferenceEngine`` and serves many
requests against it, in either mode:

  # file/stdin mode: one prompt per line -> numbered JPEGs + engine stats
  python inference/serve.py --model muse --prompts prompts.txt --outdir out/

  # HTTP mode (localhost JSON API; stdlib http.server, no extra deps):
  python inference/serve.py --model muse --port 8000
  curl -d '{"prompt": "stop sign", "seed": 3}' localhost:8000/generate
  curl localhost:8000/stats

Buckets/warmup: requests coalesce into padded batches of --bucket-sizes;
--warmup compiles every bucket before serving so first-request latency is
steady-state.
"""

import argparse
import json
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_service(args):
    import functools

    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.factory import load_vq_checkpoint
    from attention_models_tpu.serving import (
        maskgit_service,
        muse_service,
        parti_service,
        vq_recon_service,
    )
    from attention_models_tpu.utils.checkpoint import (
        CheckpointManager,
        apply_param_patches,
    )

    vq_config = dict(
        vit_params=dict(dim=512, img_size=args.resolution, patch_size=8,
                        n_heads=8, d_head=64, depth=6, mlp_dim=2048,
                        dropout=0.0),
        codebook_params=dict(codebook_size=8192, codebook_dim=32),
    )
    gen_kw = dict(timesteps=args.timesteps, approx_topk=args.approx_topk)
    if args.model == "muse":
        from attention_models_tpu.models.muse import MUSE

        model = MUSE(dim=args.dim, vq_config=vq_config, n_heads=args.heads,
                     d_head=64, depth=args.depth, mult=args.mult,
                     quant=args.quant)
        ids = jnp.zeros((1, model.max_length), jnp.int32)
        dummy = jnp.zeros((1, 3, args.resolution, args.resolution))
        variables = jax.jit(functools.partial(model.init,
                                              method=MUSE.init_all))(
            jax.random.key(0), ids, dummy, jax.random.key(1))
        mk = functools.partial(muse_service,
                               guidance_scale=args.guidance_scale, **gen_kw)
    elif args.model == "parti":
        from attention_models_tpu.models.parti import Parti

        model = Parti(dim=args.dim, vq_config=vq_config, n_heads=args.heads,
                      d_head=64, depth=args.depth, quant=args.quant)
        ids = jnp.zeros((1, model.max_length), jnp.int32)
        dummy = jnp.zeros((1, 3, args.resolution, args.resolution))
        variables = jax.jit(functools.partial(model.init,
                                              method=Parti.init_all))(
            jax.random.key(0), ids, dummy)
        mk = functools.partial(
            parti_service, approx_topk=args.approx_topk,
            guidance_scale=args.guidance_scale or 0.0)
    elif args.model == "maskgit":
        from attention_models_tpu.models.maskgit import MaskGitTransformer

        model = MaskGitTransformer(dim=args.dim, vq_config=vq_config,
                                   vocab_size=8192, n_heads=args.heads,
                                   d_head=64, dec_depth=args.depth,
                                   quant=args.quant)
        dummy = jnp.zeros((1, 3, args.resolution, args.resolution))
        variables = jax.jit(functools.partial(
            model.init, method=MaskGitTransformer.init_all))(
            jax.random.key(0), dummy, jax.random.key(1))
        mk = functools.partial(maskgit_service, **gen_kw)
    elif args.model == "vitvqgan":
        from attention_models_tpu.models.vitvqgan import ViTVQGAN

        model = ViTVQGAN(**vq_config)
        dummy = jnp.zeros((1, 3, args.resolution, args.resolution))
        variables = jax.jit(model.init)(jax.random.key(0), dummy)
        mk = vq_recon_service
    else:
        raise SystemExit(f"unknown --model {args.model}")

    if args.ckpt and os.path.isdir(args.ckpt):
        params = CheckpointManager(args.ckpt).restore_params(
            variables["params"])
        if params is not None:
            variables = {"params": params}
    if args.vq_ckpt and args.model != "vitvqgan":
        vq = load_vq_checkpoint(args.vq_ckpt, depth=6)
        if vq is not None:
            variables = apply_param_patches(variables, {"vq": vq})
    return model, variables, mk(model, variables)


def to_jpeg(img_chw, path):
    from PIL import Image

    arr = (np.clip(np.asarray(img_chw, np.float32), 0, 1) * 255).astype(
        np.uint8).transpose(1, 2, 0)
    Image.fromarray(arr).save(path)


def _load_image(path, resolution):
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((resolution, resolution))
    return np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0


def run_file_mode(engine, args):
    """One request per input line: a prompt (muse/parti), an image path
    (vitvqgan reconstruction), or anything/blank (maskgit — seed only)."""
    from attention_models_tpu.models.text_encoder import tokenize

    src = open(args.prompts) if args.prompts != "-" else sys.stdin
    prompts = [ln.strip() for ln in src if ln.strip()]
    os.makedirs(args.outdir, exist_ok=True)
    futs = []
    for i, p in enumerate(prompts):
        if args.model in ("muse", "parti"):
            inp = np.array(tokenize([p]))[0]
        elif args.model == "vitvqgan":
            inp = _load_image(p, args.resolution)
        else:
            inp = {}
        futs.append((i, p, engine.submit(inp, seed=args.seed + i)))
    for i, p, f in futs:
        path = os.path.join(args.outdir, f"{i:04d}.jpg")
        to_jpeg(f.result(), path)
        print(f"[{i}] {p!r} -> {path}", flush=True)
    print(json.dumps(engine.stats(), default=str), file=sys.stderr)


def run_http_mode(engine, args):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from attention_models_tpu.models.text_encoder import tokenize

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path.rstrip("/") == "/stats":
                self._json(200, engine.stats())
            else:
                self._json(404, {"error": "use POST /generate or GET /stats"})

        def do_POST(self):  # noqa: N802
            if self.path.rstrip("/") != "/generate":
                self._json(404, {"error": "POST /generate"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                seed = int(req.get("seed", 0))
                if args.model in ("muse", "parti"):
                    inp = np.array(tokenize([req.get("prompt", "")]))[0]
                elif args.model == "vitvqgan":
                    import base64
                    import io

                    from PIL import Image

                    raw = base64.b64decode(req["image_base64"])
                    img = Image.open(io.BytesIO(raw)).convert("RGB").resize(
                        (args.resolution, args.resolution))
                    inp = np.asarray(img, np.float32).transpose(2, 0, 1) / 255
                else:
                    inp = {}
                img = engine.submit(inp, seed=seed).result(timeout=600)
                import base64
                import io

                from PIL import Image

                arr = (np.clip(np.asarray(img, np.float32), 0, 1) * 255
                       ).astype(np.uint8).transpose(1, 2, 0)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                self._json(200, {
                    "seed": seed,
                    "jpeg_base64": base64.b64encode(buf.getvalue()).decode(),
                })
            except Exception as e:  # noqa: BLE001 — serve errors as JSON
                self._json(500, {"error": repr(e)})

        def log_message(self, *a):  # quiet access log
            pass

    srv = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving {args.model} on http://{args.host}:{args.port} "
          f"(POST /generate, GET /stats)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="muse",
                    choices=["muse", "parti", "maskgit", "vitvqgan"])
    ap.add_argument("--prompts", default=None,
                    help="prompt file ('-' = stdin); omit for --port mode")
    ap.add_argument("--outdir", default="outputs/serve")
    ap.add_argument("--port", type=int, default=0,
                    help="start a localhost HTTP JSON API on this port")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--bucket-sizes", default="1,2,4,8")
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--warmup", action="store_true",
                    help="compile every bucket before serving")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--vq-ckpt", default=None)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--timesteps", type=int, default=18)
    ap.add_argument("--guidance-scale", type=float, default=None)
    ap.add_argument("--approx-topk", action="store_true")
    ap.add_argument("--quant", default=None, choices=["int8", "int8_wide"])
    ap.add_argument("--continuous", action="store_true",
                    help="parti only: slot-based continuous batching "
                         "(serving_ar.PartiSlotEngine) — admits a request "
                         "into a free KV-cache slot at any chunk boundary "
                         "instead of waiting for a full bucket decode")
    ap.add_argument("--slots", type=int, default=4,
                    help="resident KV-cache slots for --continuous")
    ap.add_argument("--chunk-steps", type=int, default=64,
                    help="decoder steps between admission points "
                         "for --continuous")
    args = ap.parse_args()

    from attention_models_tpu.serving import BatchedInferenceEngine

    model, variables, run_batch = build_service(args)
    if args.continuous:
        if args.model != "parti":
            raise SystemExit("--continuous is the AR (parti) engine")
        from attention_models_tpu.serving_ar import PartiSlotEngine

        engine = PartiSlotEngine(
            model, variables, slots=args.slots, chunk_steps=args.chunk_steps,
            approx_topk=args.approx_topk,
            guidance_scale=args.guidance_scale or 0.0,
        )
        if args.warmup:
            print("warming up slot engine", flush=True)
            t0 = __import__("time").perf_counter()
            engine.warmup()
            print(f"warmup done in "
                  f"{__import__('time').perf_counter() - t0:.1f}s", flush=True)
        try:
            if args.port:
                run_http_mode(engine, args)
            elif args.prompts:
                run_file_mode(engine, args)
            else:
                raise SystemExit("pass --prompts FILE or --port N")
        finally:
            engine.close()
        return
    buckets = tuple(int(b) for b in args.bucket_sizes.split(","))
    engine = BatchedInferenceEngine(run_batch, bucket_sizes=buckets,
                                    max_wait_ms=args.max_wait_ms,
                                    name=args.model)
    if args.warmup:
        if args.model in ("muse", "parti"):
            example = np.zeros((model.max_length,), np.int32)
        elif args.model == "maskgit":
            example = {}
        else:
            example = np.zeros((3, args.resolution, args.resolution),
                               np.float32)
        print("warming up buckets", buckets, flush=True)
        t0 = __import__("time").perf_counter()
        engine.warmup(example)
        print(f"warmup done in "
              f"{__import__('time').perf_counter() - t0:.1f}s", flush=True)

    try:
        if args.port:
            run_http_mode(engine, args)
        elif args.prompts:
            run_file_mode(engine, args)
        else:
            raise SystemExit("pass --prompts FILE or --port N")
    finally:
        engine.close()


if __name__ == "__main__":
    main()
