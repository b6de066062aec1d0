"""Serving latency/throughput benchmark (VERDICT r2 #3).

Drives the serving engines with synthetic Poisson bursts at several arrival
rates and reports per-rate p50/p99 latency + sustained imgs/s, for:

- muse:   BatchedInferenceEngine over muse_service (18-step CFG decode)
- parti:  BatchedInferenceEngine over parti_service (bucket batching,
          1024-step AR decode) AND serving_ar.PartiSlotEngine (slot-based
          continuous batching) — the head-of-line-blocking A/B

Models are at the reference inference scale (bench.py's _BENCH_VQ_CFG:
muse dim 768 depth 16 mult 8; parti dim 512 depth 6) with synthetic params
(throughput is weight-value independent). Run on the TPU:

    python tools/serve_bench.py [--models muse,parti] [--requests 32]

One JSON line per (service, rate) to stdout; progress to stderr.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def drive(submit, n_requests: int, rate_hz: float, make_input, seed0=0):
    """Open-loop Poisson arrivals: submit at exp(rate) intervals; each
    request's latency is stamped by a done-callback at RESOLUTION time (a
    blocking collect loop would fold submission-phase wall clock into the
    early requests' latencies). Returns (latencies_s, wall_s)."""
    rs = np.random.RandomState(1234)
    lats = []
    futs = []
    t_start = time.perf_counter()
    t_next = t_start
    for i in range(n_requests):
        now = time.perf_counter()
        if t_next > now:
            time.sleep(t_next - now)
        t_sub = time.perf_counter()
        f = submit(make_input(i), seed0 + i)
        f.add_done_callback(
            lambda fut, t=t_sub: lats.append(time.perf_counter() - t))
        futs.append(f)
        t_next += rs.exponential(1.0 / rate_hz)
    for f in futs:
        f.result(timeout=1200)
    # result() can return before done-callbacks fire (waiters are notified
    # first) — wait for every latency stamp so percentiles cover all n
    deadline = time.perf_counter() + 10.0
    while len(lats) < n_requests and time.perf_counter() < deadline:
        time.sleep(0.001)
    wall = time.perf_counter() - t_start
    return np.asarray(sorted(lats)), wall


def report(name: str, rate, lats, wall, n, engine_stats=None):
    rec = {
        "service": name,
        "rate_hz": rate,
        "requests": n,
        "throughput_rps": round(n / wall, 3),
        "p50_s": round(float(np.percentile(lats, 50)), 3),
        "p99_s": round(float(np.percentile(lats, 99)), 3),
        "max_s": round(float(lats.max()), 3),
    }
    if engine_stats:
        for k in ("latency_p50_ms", "latency_p95_ms", "occupancy",
                  "slot_occupancy"):
            if k in engine_stats:
                rec[k] = round(float(engine_stats[k]), 3)
    print(json.dumps(rec), flush=True)


def bench_muse(rates, n_requests, buckets=(1, 2, 4, 8)):
    import jax

    from attention_models_tpu.serving import (
        BatchedInferenceEngine,
        muse_service,
    )
    from bench import _bench_muse

    log("building muse service (dim 768 depth 16)...")
    muse, ids, params = _bench_muse(1)
    run = muse_service(muse, params, timesteps=18, approx_topk=True)
    ids_row = np.asarray(ids[0])

    for rate in rates:
        eng = BatchedInferenceEngine(run, bucket_sizes=buckets,
                                     max_wait_ms=20.0, name="muse")
        eng.warmup(ids_row)
        lats, wall = drive(eng.submit, n_requests, rate,
                           lambda i: ids_row)
        report(f"muse_bucket{max(buckets)}", rate, lats, wall, n_requests,
               eng.stats())
        eng.close()


def bench_parti(rates, n_requests, slots=4, chunk_steps=64,
                buckets=(1, 2, 4, 8)):
    import functools

    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.parti import Parti
    from attention_models_tpu.serving import (
        BatchedInferenceEngine,
        parti_service,
    )
    from attention_models_tpu.serving_ar import PartiSlotEngine
    from bench import _BENCH_VQ_CFG, _synth_params
    from attention_models_tpu.models.text_encoder import tokenize

    log("building parti service (dim 512 depth 6, 1024-step AR)...")
    parti = Parti(dim=512, vq_config=_BENCH_VQ_CFG, n_heads=8, d_head=64,
                  depth=6, dtype=jnp.bfloat16)
    ids = jnp.array(tokenize(["a stop sign"]))
    params = _synth_params(
        parti,
        functools.partial(parti.init, method=Parti.init_all),
        jax.random.key(0), ids, jnp.zeros((1, 3, 256, 256), jnp.bfloat16),
    )
    ids_row = np.asarray(ids[0])

    run = parti_service(parti, params, approx_topk=True)
    for rate in rates:
        eng = BatchedInferenceEngine(run, bucket_sizes=buckets,
                                     max_wait_ms=20.0, name="parti")
        eng.warmup(ids_row)
        lats, wall = drive(eng.submit, n_requests, rate, lambda i: ids_row)
        report(f"parti_bucket{max(buckets)}", rate, lats, wall,
               n_requests, eng.stats())
        eng.close()

    for rate in rates:
        eng = PartiSlotEngine(parti, params, slots=slots,
                              chunk_steps=chunk_steps, approx_topk=True)
        eng.warmup()
        lats, wall = drive(eng.submit, n_requests, rate, lambda i: ids_row)
        report(f"parti_slots{slots}_chunk{chunk_steps}", rate, lats, wall,
               n_requests, eng.stats())
        eng.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="muse,parti")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--rates", default="1,4,16",
                    help="arrival rates (req/s), comma-separated")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--buckets", default="1,2,4,8")
    ap.add_argument("--chunk-steps", type=int, default=64)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend={jax.default_backend()}")

    rates = [float(r) for r in args.rates.split(",")]
    buckets = tuple(int(b) for b in args.buckets.split(","))
    if "muse" in args.models:
        bench_muse(rates, args.requests, buckets)
    if "parti" in args.models:
        bench_parti(rates, args.requests, args.slots, args.chunk_steps,
                    buckets)


if __name__ == "__main__":
    main()
