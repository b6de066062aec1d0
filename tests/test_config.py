import textwrap

from attention_models_tpu.utils.config import Config, config_from_cli, load_config


def _write(tmp_path, body):
    p = tmp_path / "cfg.yaml"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_attribute_access_and_nesting(tmp_path):
    path = _write(
        tmp_path,
        """
        model:
          name: vitvqgan
          transformer:
            dim: 512
            depth: 6
        """,
    )
    cfg = load_config(path)
    assert cfg.model.name == "vitvqgan"
    assert cfg.model.transformer.dim == 512


def test_interpolation(tmp_path):
    path = _write(
        tmp_path,
        """
        optimizer:
          params:
            learning_rate: 0.0001
        lr_scheduler:
          params:
            learning_rate: ${optimizer.params.learning_rate}
        """,
    )
    cfg = load_config(path)
    assert cfg.lr_scheduler.params.learning_rate == 0.0001


def test_cli_overrides(tmp_path):
    path = _write(
        tmp_path,
        """
        training:
          num_epochs: 200
          mixed_precision: "bf16"
        dataset:
          params:
            batch_size: 8
        """,
    )
    cfg = config_from_cli(
        [f"--config={path}", "training.num_epochs=3", "dataset.params.batch_size=2",
         "experiment.new_key=null"]
    )
    assert cfg.training.num_epochs == 3
    assert cfg.dataset.params.batch_size == 2
    assert cfg.experiment.new_key is None
    assert cfg.training.mixed_precision == "bf16"


def test_merge_and_to_dict():
    a = Config({"a": {"b": 1, "c": 2}, "d": 3})
    b = a.merge({"a": {"b": 10}})
    assert b.a.b == 10 and b.a.c == 2 and b.d == 3
    assert b.to_dict() == {"a": {"b": 10, "c": 2}, "d": 3}


def test_missing_key_raises():
    cfg = Config({"x": 1})
    try:
        _ = cfg.y
        raise AssertionError("expected AttributeError")
    except AttributeError:
        pass


def test_main_honors_jax_platforms_env(tmp_path):
    """Regression: site hooks (the axon TPU tunnel) force their platform via
    jax.config, which beats env vars — `JAX_PLATFORMS=cpu python main.py`
    silently landed on the TPU. main._honor_platform_env restores standard
    env semantics before any backend touch."""
    import os
    import subprocess
    import sys

    code = (
        "import main, jax; "
        "assert jax.devices()[0].platform == 'cpu', jax.devices()"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # plain 1-device cpu is fine here
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=240, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert r.returncode == 0, r.stderr[-2000:]
