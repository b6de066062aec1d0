"""Serving runtime tests: dynamic batching correctness (ordering, bucket
padding, exceptions, backpressure, drain) and the batch-invariance contract
of the generator services — a request's output depends only on its own
(inputs, seed), not on co-batched traffic. The reference has no serving
surface at all (its deployment story is per-image argparse scripts,
/root/reference/inference/*.py)."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_models_tpu.serving import (
    BatchedInferenceEngine,
    ServingError,
    maskgit_service,
    muse_service,
    vq_encode_service,
)

# ----------------------------------------------------------- engine core --


def _linear_run_batch():
    """Row-dependent deterministic batch fn: out[i] = 3*x[i] + seed[i]."""
    calls = []

    @jax.jit
    def fn(x, seeds):
        return 3.0 * x + seeds[:, None].astype(jnp.float32)

    def run_batch(inputs, seeds):
        calls.append(len(seeds))
        return fn(jnp.asarray(inputs["x"]), jnp.asarray(seeds))

    return run_batch, calls


def test_engine_slices_rows_back_to_the_right_request():
    run_batch, calls = _linear_run_batch()
    eng = BatchedInferenceEngine(
        run_batch, bucket_sizes=(2, 4), autostart=False
    )
    xs = [np.full((3,), float(i), np.float32) for i in range(5)]
    futs = [eng.submit({"x": x}, seed=10 + i) for i, x in enumerate(xs)]
    eng.start()
    for i, f in enumerate(futs):
        np.testing.assert_allclose(f.result(timeout=60), 3.0 * xs[i] + 10 + i)
    eng.close()
    # 5 requests through buckets {2,4}: every dispatch was padded to a bucket
    assert all(c in (2, 4) for c in calls)
    s = eng.stats()
    assert s["requests"] == 5
    assert s["batches"] == sum(1 for _ in calls)
    assert 0 < s["occupancy"] <= 1.0
    assert "latency_p50_ms" in s


def test_engine_coalesces_a_burst_into_one_bucket():
    run_batch, calls = _linear_run_batch()
    eng = BatchedInferenceEngine(
        run_batch, bucket_sizes=(1, 4), autostart=False
    )
    futs = [eng.submit({"x": np.zeros((2,), np.float32)}, seed=i)
            for i in range(3)]
    eng.start()
    [f.result(timeout=60) for f in futs]
    eng.close()
    # all 3 queued before start -> one padded batch of 4, not 3 singles
    assert calls == [4]
    assert eng.stats()["rows_padded"] == 1


def test_engine_propagates_exceptions_to_futures():
    def run_batch(inputs, seeds):
        raise ValueError("boom")

    eng = BatchedInferenceEngine(run_batch, bucket_sizes=(2,),
                                 autostart=False)
    futs = [eng.submit({"x": np.zeros(1, np.float32)}) for _ in range(2)]
    eng.start()
    for f in futs:
        with pytest.raises(ValueError, match="boom"):
            f.result(timeout=60)
    eng.close()
    assert eng.stats()["errors"] == 2


def test_engine_backpressure_and_close_semantics():
    release = threading.Event()

    def run_batch(inputs, seeds):
        release.wait(timeout=30)
        return jnp.asarray(inputs["x"])

    eng = BatchedInferenceEngine(run_batch, bucket_sizes=(1,), max_queue=2,
                                 autostart=False)
    x = {"x": np.zeros(1, np.float32)}
    eng.submit(x), eng.submit(x)
    with pytest.raises(ServingError, match="queue full"):
        eng.submit(x)
    release.set()
    eng.start()
    eng.close()  # drains the two queued requests
    with pytest.raises(ServingError, match="after close"):
        eng.submit(x)


def test_engine_concurrent_submitters():
    run_batch, _ = _linear_run_batch()
    eng = BatchedInferenceEngine(run_batch, bucket_sizes=(1, 2, 4, 8),
                                 max_wait_ms=5.0)
    results = {}

    def client(i):
        x = np.full((2,), float(i), np.float32)
        results[i] = (eng({"x": x}, seed=i), x)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    eng.close()
    for i, (out, x) in results.items():
        np.testing.assert_allclose(out, 3.0 * x + i)
    assert eng.stats()["requests"] == 12


def test_engine_warmup_compiles_each_bucket():
    shapes = set()

    @jax.jit
    def fn(x, seeds):
        return x * 2.0

    def run_batch(inputs, seeds):
        shapes.add(len(seeds))
        return fn(jnp.asarray(inputs["x"]), seeds)

    eng = BatchedInferenceEngine(run_batch, bucket_sizes=(1, 2, 4),
                                 autostart=False)
    eng.warmup({"x": np.zeros((3,), np.float32)})
    assert shapes == {1, 2, 4}
    eng.close()


# ------------------------------------------------- model service adapters --

TINY_VQ = dict(
    vit_params=dict(dim=32, img_size=16, patch_size=8, n_heads=2, d_head=16,
                    depth=1, mlp_dim=64, dropout=0.0),
    codebook_params=dict(codebook_size=32, codebook_dim=8),
)
TINY_CLIP = dict(clip_width=32, clip_layers=1, clip_heads=2)


@pytest.fixture(scope="module")
def tiny_muse():
    from attention_models_tpu.models.muse import MUSE
    from attention_models_tpu.models.text_encoder import tokenize

    m = MUSE(dim=32, vq_config=TINY_VQ, max_length=8, n_heads=2, d_head=16,
             depth=1, mult=2, dropout=0.0, **TINY_CLIP)
    ids = np.array(tokenize(["a cat", "a dog", "a fish"], max_length=8))
    params = m.init(jax.random.key(0), jnp.asarray(ids[:2]),
                    jnp.zeros((2, 3, 16, 16)), jax.random.key(1),
                    method=MUSE.init_all)
    return m, params, ids


def test_muse_service_is_batch_invariant(tiny_muse):
    """The same (text, seed) request must render the SAME image whether it
    ran alone (bucket 1) or co-batched with other traffic and padding
    (bucket 4) — per-row keys + vmap make serving results reproducible
    independent of batch composition."""
    m, params, ids = tiny_muse
    run = muse_service(m, params, timesteps=3)

    solo = [np.asarray(run(ids[i:i + 1], np.asarray([7 + i], np.int32))[0])
            for i in range(3)]

    eng = BatchedInferenceEngine(run, bucket_sizes=(4,), autostart=False)
    futs = [eng.submit(ids[i], seed=7 + i) for i in range(3)]
    eng.start()
    batched = [f.result(timeout=300) for f in futs]
    eng.close()

    assert eng.stats()["batch_sizes"][4] == 1  # really ran as one padded 4
    for i in range(3):
        np.testing.assert_allclose(batched[i], solo[i], rtol=1e-5, atol=1e-5)
        assert np.all(np.isfinite(batched[i]))


def test_muse_service_seed_changes_output(tiny_muse):
    m, params, ids = tiny_muse
    run = muse_service(m, params, timesteps=3)
    a = np.asarray(run(ids[:1], np.asarray([0], np.int32)))
    b = np.asarray(run(ids[:1], np.asarray([1], np.int32)))
    assert not np.allclose(a, b)


def test_maskgit_service_generates_from_seed_only():
    from attention_models_tpu.models.maskgit import MaskGitTransformer

    m = MaskGitTransformer(dim=32, vq_config=TINY_VQ, vocab_size=32,
                           n_heads=2, d_head=16, dec_depth=1, dropout=0.0)
    params = m.init(jax.random.key(0), jnp.zeros((2, 3, 16, 16)),
                    jax.random.key(1), method=MaskGitTransformer.init_all)
    run = maskgit_service(m, params, timesteps=2, num_masked=4)
    eng = BatchedInferenceEngine(run, bucket_sizes=(2,), autostart=False)
    f1, f2 = eng.submit({}, seed=1), eng.submit({}, seed=2)
    eng.start()
    img1, img2 = f1.result(timeout=300), f2.result(timeout=300)
    eng.close()
    assert img1.shape == (3, 16, 16)
    assert np.all(np.isfinite(img1)) and np.all(np.isfinite(img2))
    assert not np.allclose(img1, img2)  # different seeds -> different samples


def test_vq_encode_service_matches_direct_call():
    from attention_models_tpu.models.vitvqgan import ViTVQGAN

    m = ViTVQGAN(**TINY_VQ)
    imgs = np.random.RandomState(0).rand(3, 3, 16, 16).astype(np.float32)
    params = m.init(jax.random.key(0), jnp.asarray(imgs[:1]))
    direct = np.asarray(
        m.apply(params, jnp.asarray(imgs), method=ViTVQGAN.encode_imgs)
    )
    run = vq_encode_service(m, params)
    eng = BatchedInferenceEngine(run, bucket_sizes=(1, 4), autostart=False)
    futs = [eng.submit(imgs[i]) for i in range(3)]
    eng.start()
    got = [f.result(timeout=120) for f in futs]
    eng.close()
    for i in range(3):
        np.testing.assert_array_equal(got[i], direct[i])


def test_parti_service_roundtrip():
    from attention_models_tpu.models.parti import Parti
    from attention_models_tpu.models.text_encoder import tokenize
    from attention_models_tpu.serving import parti_service

    m = Parti(dim=32, vq_config=TINY_VQ, max_length=8, n_heads=2, d_head=16,
              depth=1, **TINY_CLIP)
    ids = np.array(tokenize(["a cat", "a dog"], max_length=8))
    imgs = jnp.zeros((2, 3, 16, 16))
    params = m.init(jax.random.key(0), jnp.asarray(ids), imgs,
                    method=Parti.init_all)
    run = parti_service(m, params)
    eng = BatchedInferenceEngine(run, bucket_sizes=(2,), autostart=False)
    futs = [eng.submit(ids[i], seed=i) for i in range(2)]
    eng.start()
    outs = [f.result(timeout=300) for f in futs]
    eng.close()
    for o in outs:
        assert o.shape == (3, 16, 16)
        assert np.all(np.isfinite(o))
