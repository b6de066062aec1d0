"""Slot-based continuous batching for AR serving (serving_ar.py).

Pins the contracts that distinguish it from the bucket engine:
- a request's output is a pure function of (text, seed) — independent of
  slot placement, co-resident traffic, and admission time (batch-invariant
  serving under CONTINUOUS batching, where slots sit at different depths)
- slots are reused across requests (cache reset on admit)
- guidance_scale=1.0 bit-equals the unguided engine (CFG plumbing: g=1 is
  exactly the conditional stream — same property as parti_generate's)
"""

import jax
import numpy as np
import pytest

from attention_models_tpu.models.parti import Parti
from attention_models_tpu.models.text_encoder import tokenize
from attention_models_tpu.serving_ar import PartiSlotEngine

TINY_VQ = dict(
    vit_params=dict(dim=32, img_size=16, patch_size=8, n_heads=2, d_head=16,
                    depth=1, mlp_dim=64, dropout=0.0),
    codebook_params=dict(codebook_size=32, codebook_dim=8),
)
TINY_CLIP = dict(clip_width=32, clip_layers=1, clip_heads=2)


@pytest.fixture(scope="module")
def tiny_parti():
    import jax.numpy as jnp

    m = Parti(dim=32, vq_config=TINY_VQ, max_length=8, n_heads=2, d_head=16,
              depth=1, **TINY_CLIP)
    ids = np.array(tokenize(["a cat", "a dog", "a bird", "a fish"],
                            max_length=8))
    params = m.init(jax.random.key(0), jnp.asarray(ids[:2]),
                    jnp.zeros((2, 3, 16, 16)), method=Parti.init_all)
    return m, params, ids


def test_slot_engine_output_independent_of_traffic_and_slot(tiny_parti):
    m, params, ids = tiny_parti
    # alone in an otherwise idle engine
    with PartiSlotEngine(m, params, slots=2, chunk_steps=2) as eng:
        alone = eng(ids[0], seed=7)
    assert alone.shape == (3, 16, 16) and np.isfinite(alone).all()

    # same request under congestion: more requests than slots, so it lands
    # in some slot alongside traffic at different decode depths
    with PartiSlotEngine(m, params, slots=2, chunk_steps=1) as eng:
        futs = [eng.submit(ids[i % 4], seed=100 + i) for i in range(3)]
        target = eng.submit(ids[0], seed=7)
        outs = [f.result(timeout=300) for f in futs]
        congested = target.result(timeout=300)
        stats = eng.stats()
    for o in outs:
        assert o.shape == (3, 16, 16) and np.isfinite(o).all()
    np.testing.assert_array_equal(alone, congested)
    assert stats["requests"] == 4
    assert 0.0 < stats["slot_occupancy"] <= 1.0
    assert "latency_p50_ms" in stats


@pytest.mark.slow
def test_slot_engine_single_slot_serializes_and_reuses_cache(tiny_parti):
    m, params, ids = tiny_parti
    with PartiSlotEngine(m, params, slots=1, chunk_steps=2) as eng:
        outs = [eng(ids[i], seed=i) for i in range(3)]
        # repeat request 0: the slot was reused twice in between — a stale
        # cache would change the result
        again = eng(ids[0], seed=0)
    np.testing.assert_array_equal(outs[0], again)
    # different (text, seed) pairs produce different images
    assert not np.array_equal(outs[0], outs[1])


@pytest.mark.slow
def test_slot_engine_guidance_one_equals_unguided(tiny_parti):
    m, params, ids = tiny_parti
    with PartiSlotEngine(m, params, slots=1, chunk_steps=4) as eng:
        plain = eng(ids[1], seed=3)
    with PartiSlotEngine(m, params, slots=1, chunk_steps=4,
                         guidance_scale=1.0) as eng:
        guided = eng(ids[1], seed=3)
    np.testing.assert_array_equal(plain, guided)


@pytest.mark.slow
def test_slot_engine_warmup_and_close_semantics(tiny_parti):
    m, params, ids = tiny_parti
    eng = PartiSlotEngine(m, params, slots=2, chunk_steps=2, autostart=False)
    eng.warmup()  # compiles admit/chunk/decode without starting the loop
    fut = eng.submit(ids[2], seed=1)
    eng.start()
    out = fut.result(timeout=300)
    assert out.shape == (3, 16, 16)
    eng.close()
    from attention_models_tpu.serving import ServingError

    with pytest.raises(ServingError):
        eng.submit(ids[0])


def test_slot_engine_close_fails_queued_requests(tiny_parti):
    """close() must not strand queued futures: with the loop never started
    (autostart=False), queued requests fail with ServingError instead of
    hanging their callers forever."""
    from attention_models_tpu.serving import ServingError

    m, params, ids = tiny_parti
    eng = PartiSlotEngine(m, params, slots=1, chunk_steps=2, autostart=False)
    fut = eng.submit(ids[0], seed=0)
    eng.close()
    with pytest.raises(ServingError):
        fut.result(timeout=5)
