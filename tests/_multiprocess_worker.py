"""Subprocess worker for test_multiprocess.py — the REAL multi-host proof.

Runs the ViT overfit trainer end-to-end under ``jax.process_count() == N``
(N CPU processes x 4 virtual devices each, Gloo collectives), exercising the
seams that single-process tests can only fake:

- ``parallel.runtime_init`` → ``jax.distributed.initialize`` from the
  JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
  (the multi-host pod contract, parallel/mesh.py:24-47)
- ``BaseTrainer._host_batch_rows`` + ``DataLoader.row_filter``: each process
  loads only its own rows of the global batch
- ``BaseTrainer._multihost_shard``: global batch assembly from per-device
  shards via make_array_from_single_device_arrays

Replaces the reference's never-tested Accelerate multi-node story
(/root/reference/trainers/utils/base_trainer.py:29-39).

Usage: python _multiprocess_worker.py WORKDIR PROC_ID NUM_PROCS PORT \
           [dotted.key=value ...]
Extra args are config overrides (e.g. ``training.fsdp=true`` to run the
ZeRO-3 path with params/moments sharded ACROSS processes).
Prints ``LOSSES <json list>`` from the process's metrics.jsonl on exit.
"""

import json
import os
import sys


def main():
    workdir, pid, nproc, port = sys.argv[1:5]

    import jax

    # the axon sitecustomize force-sets jax_platforms; config beats env
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    if int(nproc) > 1:
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        os.environ["JAX_NUM_PROCESSES"] = nproc
        os.environ["JAX_PROCESS_ID"] = pid

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from attention_models_tpu.parallel import runtime_init

    runtime_init()
    assert jax.process_count() == int(nproc), jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * int(nproc)

    from attention_models_tpu.data import build_loader
    from attention_models_tpu.models.factory import build_model
    from attention_models_tpu.training import build_trainer
    from attention_models_tpu.utils.config import load_config

    cfg = load_config(os.path.join(repo, "cfg_exp", "vit_overfit.yaml"))
    # global batch 8 over 8 devices → dp=8, every device owns one row and
    # each of the 2 processes owns 4 rows (dp uses the FULL device set; a
    # smaller batch would build the mesh from process 0's devices only)
    cfg.set_path("dataset.params.batch_size", 8)
    cfg.set_path("experiment.max_train_examples", 16)
    cfg.set_path("training.num_epochs", 3)
    cfg.set_path("experiment.eval_every", 1000000)  # train path only
    for override in sys.argv[5:]:
        key, _, val = override.partition("=")
        try:
            val = json.loads(val)  # numbers / true / false / null
        except ValueError:
            pass  # raw string
        cfg.set_path(key, val)

    # per-process cwd: outputs/ (metrics, checkpoints) must not clobber
    os.chdir(workdir)

    model, patches = build_model(cfg)
    loaders = build_loader(cfg)
    trainer = build_trainer(cfg, model, loaders, pretrained_patches=patches)

    if int(nproc) > 1:
        rows = trainer.host_rows
        assert rows is not None and len(rows) == 8 // int(nproc), rows
        assert trainer.train_dl.row_filter is not None
    trainer.train()

    with open("outputs/vit_overfit/metrics.jsonl") as f:
        records = [json.loads(line) for line in f if line.strip()]
    losses = [r["loss"] for r in records if "loss" in r]
    print("LOSSES " + json.dumps(losses), flush=True)


if __name__ == "__main__":
    main()
