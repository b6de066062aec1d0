"""InceptionV3 FID tower (models/inception.py) + converter.

No pretrained weights exist offline, so these tests pin what CAN be pinned:
the flax graph builds and produces (b, 2048) pool3 features
deterministically, the converter's key schema round-trips a synthetic
torchvision-style state_dict into EXACTLY the flax variable tree (structure
and shapes — catches any branch/name/stride drift between the two), and the
count-exclude-pad average pool matches its definition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_models_tpu.models.inception import (
    InceptionV3Features,
    _avg_pool_nopad_count,
)
from attention_models_tpu.utils.torch_convert import convert_inception_fid


@pytest.fixture(scope="module")
def tower():
    m = InceptionV3Features()
    v = m.init(jax.random.key(0), jnp.zeros((1, 3, 64, 64)))
    return m, v


def _to_torch_sd(variables):
    """Inverse of convert_inception_fid: flax variables -> torchvision-style
    flat state_dict (numpy)."""
    sd = {}

    def walk(params, stats, prefix):
        for name, sub in params.items():
            if name == "conv":
                w = np.transpose(np.asarray(sub["kernel"]), (3, 2, 0, 1))
                sd[f"{prefix}.conv.weight"] = w
            elif name == "bn":
                sd[f"{prefix}.bn.weight"] = np.asarray(sub["scale"])
                sd[f"{prefix}.bn.bias"] = np.asarray(sub["bias"])
                sd[f"{prefix}.bn.running_mean"] = np.asarray(
                    stats["bn"]["mean"])
                sd[f"{prefix}.bn.running_var"] = np.asarray(
                    stats["bn"]["var"])
            else:
                p = f"{prefix}.{name}" if prefix else name
                walk(sub, stats[name], p)

    walk(variables["params"], variables["batch_stats"], "")
    return sd


@pytest.mark.slow
def test_converter_roundtrips_the_exact_variable_tree(tower):
    m, v = tower
    sd = _to_torch_sd(v)
    # a real torchvision checkpoint also carries these — must be tolerated
    sd["fc.weight"] = np.zeros((1008, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1008,), np.float32)
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.zeros((), np.int64)

    got = convert_inception_fid(sd)
    flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_want = jax.tree_util.tree_flatten_with_path(
        {"params": v["params"], "batch_stats": v["batch_stats"]})[0]
    assert [p for p, _ in flat_got] == [p for p, _ in flat_want]
    for (p, a), (_, b) in zip(flat_got, flat_want):
        assert a.shape == b.shape, (p, a.shape, b.shape)
    # values survive the double transpose bit-exactly
    for (p, a), (_, b) in zip(flat_got, flat_want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p))


@pytest.mark.slow
def test_converter_rejects_schema_drift(tower):
    _, v = tower
    sd = _to_torch_sd(v)
    sd["Mixed_9z.branch_new.conv.bias"] = np.zeros((4,), np.float32)
    with pytest.raises(KeyError):
        convert_inception_fid(sd)


@pytest.mark.slow
def test_pool3_features_shape_and_determinism(tower):
    m, v = tower
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(2, 3, 64, 64), jnp.float32
    )
    f1 = m.apply(v, imgs)
    f2 = m.apply(v, imgs)
    assert f1.shape == (2, 2048)
    assert np.isfinite(np.asarray(f1)).all()
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    # different inputs -> different features
    f3 = m.apply(v, imgs[::-1])
    assert not np.array_equal(np.asarray(f1), np.asarray(f3))


def test_avg_pool_count_exclude_pad():
    """Corner cell of a 3x3 SAME avg pool averages over 4 real elements
    (count_include_pad=False), not 9."""
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    out = _avg_pool_nopad_count(x)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], 1.0, atol=1e-6)
    # include-pad semantics would give 4/9 at the corner
    x2 = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    corner = np.asarray(_avg_pool_nopad_count(x2))[0, 0, 0, 0]
    np.testing.assert_allclose(corner, np.mean([0, 1, 4, 5]), atol=1e-5)
