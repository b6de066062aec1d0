"""Base trainer: the TPU-native replacement for the reference's
Accelerate-backed BaseTrainer (/root/reference/trainers/utils/base_trainer.py).

Responsibilities: device mesh + batch sharding (data parallelism — grads are
averaged by XLA inside the jitted step, replacing DDP all-reduce), host PRNG,
metrics writer, orbax checkpointing of the FULL train state, output dirs, and
the save/sample/eval/log cadence driven by the ``experiment.*`` keys. The
reference's iters-per-epoch bugs (SURVEY.md §2.9#4-5) are fixed here once for
every subclass."""

from __future__ import annotations

import logging
import math
import os

import jax
import numpy as np

from attention_models_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
)
from attention_models_tpu.utils.checkpoint import CheckpointManager
from attention_models_tpu.utils.metrics import MetricsWriter
from attention_models_tpu.utils.prng import RngStream

log = logging.getLogger(__name__)


class BaseTrainer:
    def __init__(self, cfg, model, dataloaders, pretrained_patches=None):
        self.cfg = cfg
        self.model = model
        self.pretrained_patches = pretrained_patches or {}
        self.train_dl, self.val_dl = dataloaders
        self.project_name = cfg.experiment.project_name
        self.exp_name = cfg.experiment.exp_name

        self.global_step = 0
        self.num_epoch = int(cfg.training.num_epochs)
        self.gradient_accumulation_steps = int(
            cfg.training.get("gradient_accumulation_steps", 1) or 1
        )
        self.batch_size = int(cfg.dataset.params.batch_size)
        self.max_grad_norm = cfg.training.get("max_grad_norm")
        self.save_every = int(cfg.experiment.save_every)
        self.sample_every = int(cfg.experiment.sample_every)
        self.log_every = int(cfg.experiment.log_every)
        self.eval_every = int(cfg.experiment.eval_every)

        # correct iters/epoch (fixes §2.9#4: reference never sets this attr)
        eff_batch = self.batch_size * self.gradient_accumulation_steps
        self.num_iters_per_epoch = max(
            math.ceil(len(self.train_dl.dataset) / eff_batch), 1
        )

        tp = int(cfg.training.get("tensor_parallel", 1) or 1)
        sp = int(cfg.training.get("sequence_parallel", 1) or 1)
        pp = int(cfg.training.get("pipeline_parallel", 1) or 1)
        self.fsdp = bool(cfg.training.get("fsdp", False))
        if self.fsdp and pp > 1:
            raise ValueError(
                "training.fsdp composes with data/tensor/sequence "
                "parallelism; the pipeline stage axis already shards the "
                "layer stack — set one of fsdp / pipeline_parallel, not both"
            )
        if tp * sp * pp > len(jax.devices()):
            raise ValueError(
                f"tensor_parallel*sequence_parallel*pipeline_parallel = "
                f"{tp * sp * pp} exceeds the {len(jax.devices())} available "
                f"devices"
            )
        if pp > 1:
            if tp > 1 or sp > 1:
                raise ValueError(
                    "training.pipeline_parallel composes with data "
                    "parallelism only (set tensor_parallel and "
                    "sequence_parallel to 1)"
                )
            if not cfg.training.get("scan_layers", False):
                raise ValueError(
                    "training.pipeline_parallel requires "
                    "training.scan_layers: true — the stage axis shards "
                    "the scan-stacked layer stack"
                )
        avail = len(jax.devices()) // (tp * sp * pp)
        dp = math.gcd(self.batch_size, avail)  # data axis must divide batch
        if dp < avail:
            log.warning(
                "batch_size=%d only divides %d of %d available data-parallel "
                "devices — %d devices idle. Pick a batch size divisible by "
                "the device count to use the full mesh.",
                self.batch_size, dp, avail, (avail - dp) * tp * sp * pp,
            )
        self.mesh = create_mesh(
            data=dp, model=tp, seq=sp, stage=pp,
            devices=jax.devices()[: dp * tp * sp * pp],
        )
        # Ambient mesh for the whole trainer lifetime: attention dispatch
        # reads it from the trace context to run the Pallas flash kernel
        # under shard_map when the model axis is sharded.
        jax.sharding.set_mesh(self.mesh)
        self.data_sharding = batch_sharding(self.mesh)
        self.rng = RngStream(int(cfg.training.get("seed", 42) or 42))

        # multi-host: dataset.params.batch_size is the GLOBAL batch; each
        # host loads only the rows whose data-parallel shards live on its
        # devices (device_put cannot target non-addressable devices)
        self.host_rows = None
        if jax.process_count() > 1:
            self.host_rows = self._host_batch_rows()
            self.train_dl.row_filter = self.host_rows
            log.info(
                "multi-host: process %d/%d loads %d of %d global batch rows",
                jax.process_index(), jax.process_count(),
                len(self.host_rows), self.batch_size,
            )

        output_folder = f"outputs/{self.project_name}"
        self.checkpoint_folder = os.path.join(output_folder, "checkpoints")
        self.image_saved_dir = os.path.join(output_folder, "images")
        os.makedirs(self.checkpoint_folder, exist_ok=True)
        os.makedirs(self.image_saved_dir, exist_ok=True)

        self.metrics = MetricsWriter(
            output_folder, self.project_name, self.exp_name,
            config=cfg.to_dict(),
            enable_wandb=bool(cfg.experiment.get("wandb", False)),
        )
        self.ckpt = CheckpointManager(
            os.path.join(self.checkpoint_folder,
                         f"{self.project_name}_{self.exp_name}")
        )

        self._preempt_requested = False
        self._install_preemption_handler()

        # observability (SURVEY.md §5 tracing): per-step latency EMA logged
        # with the training metrics, plus a config-gated jax.profiler window
        # (training.profile_step = first step to trace, training.
        # profile_num_steps = window length) dumped TensorBoard-viewable.
        from attention_models_tpu.utils.profiling import StepTimer

        self.step_timer = StepTimer()
        self._profile_start = cfg.training.get("profile_step")
        self._profile_steps = int(cfg.training.get("profile_num_steps", 5) or 5)
        self._profile_dir = os.path.join(output_folder, "profile")
        self._profiling = False

        log.info("Train dataset size: %d", len(self.train_dl.dataset))
        log.info("Val dataset size: %d", len(self.val_dl.dataset))
        log.info("Effective iters/epoch: %d", self.num_iters_per_epoch)
        log.info("Mesh: %s", dict(self.mesh.shape))

    # -- preemption resilience (SURVEY.md §5 failure detection) -----------------
    def _install_preemption_handler(self):
        """TPU preemption arrives as SIGTERM; convert it into a
        checkpoint-and-exit at the next step boundary (periodic saves are
        async, so the final save is the only synchronous one)."""
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return

        def _handler(signum, frame):
            log.warning(
                "signal %d received — checkpointing and exiting at the next "
                "step boundary", signum,
            )
            self._preempt_requested = True

        try:
            signal.signal(signal.SIGTERM, _handler)
        except (ValueError, OSError):  # non-main interpreter contexts
            pass

    def check_preemption(self, state) -> bool:
        """Call once per step from the train loop. On a pending SIGTERM:
        force a synchronous save of the CURRENT state and report True so the
        loop can exit; resume will continue at this exact step."""
        if not self._preempt_requested:
            return False
        self.stop_profiler()  # close a pending trace window before exiting
        self.ckpt.save(self.global_step, self._with_rng(state), force=True,
                       wait=True)
        log.warning("preemption checkpoint saved at step %d", self.global_step)
        return True

    # -- train-loop cadence -------------------------------------------------
    @property
    def opt_step(self) -> int:
        """Optimizer-step counter: optax.MultiSteps advances the schedule
        once per ``gradient_accumulation_steps`` micro-steps, so logged LR
        must be sampled here, not at the micro-step counter."""
        return self.global_step // self.gradient_accumulation_steps

    def due(self, every, at_step0: bool = False) -> bool:
        """True when a cadence knob fires this step; 0/None disables it."""
        if not every:
            return False
        if not self.global_step:
            return at_step0
        return self.global_step % int(every) == 0

    def resume_position(self):
        """(start_epoch, batches_to_skip) for mid-epoch resume: re-entering
        at the epoch boundary alone would replay the partial epoch AND run
        past the configured total step count."""
        return divmod(self.global_step, max(len(self.train_dl), 1))

    def on_sample(self):
        """sample_every hook (subclasses: sample grids / prompts)."""

    def on_eval(self):
        """eval_every hook (subclasses: validation pass)."""

    def run_cadence(self, m):
        """Per-step bookkeeping shared by every train loop: save / sample /
        eval / log cadences (0 disables a knob), the step-latency tick, and
        the step counter."""
        if self.due(self.save_every):
            self.save_ckpt(self.state)
        if self.due(self.sample_every):
            self.on_sample()
        if self.due(self.eval_every):
            self.on_eval()
        if self.due(self.log_every, at_step0=True):
            self.metrics.log(self._train_metrics(m), self.global_step)
        self.tick(sync_on=m)
        self.global_step += 1

    def _train_metrics(self, m):
        out = {k: float(v) for k, v in m.items()}
        out["lr"] = float(self.schedule(self.opt_step))
        return out

    # -- observability ------------------------------------------------------
    def tick(self, sync_on=None):
        """Call once per train step, right after the step call. Counts the
        step WITHOUT synchronizing the device — a per-step sync serializes
        dispatch (the host can't enqueue step N+1 until step N's outputs
        land, leaving the TPU idle between steps) — and syncs once at the
        ``log_every`` cadence, logging the window's true per-step average
        as ``step_time_ms`` / ``imgs_per_sec``. Also opens/closes the
        config-gated profiler window."""
        t = self.step_timer
        if t._t0 is None:
            t.start()  # first tick: open after the compile step completes
        else:
            t.lap()
            if self.log_every and not self.global_step % self.log_every:
                dt = t.stop(sync_on=sync_on)
                self.metrics.log(
                    {
                        "step_time_ms": 1000.0 * dt,
                        "step_time_ms_avg": 1000.0 * t.average,
                        "imgs_per_sec": self.batch_size / max(t.average, 1e-9),
                    },
                    self.global_step,
                )
                t.start()
        if self._profile_start is None:
            return
        start = int(self._profile_start)
        if not self._profiling and self.global_step == start:
            jax.profiler.start_trace(self._profile_dir)
            self._profiling = True
            log.info("profiler trace started (steps %d..%d) -> %s",
                     start, start + self._profile_steps, self._profile_dir)
        elif self._profiling and self.global_step >= start + self._profile_steps:
            self.stop_profiler()

    def finish(self):
        """Call at the end of train(): close a pending profiler window and
        BLOCK on outstanding async checkpoint writes — returning while a
        save streams in the background leaves a corrupt .orbax-checkpoint-tmp
        when the interpreter shuts down."""
        self.stop_profiler()
        self.ckpt.wait()
        log.info("Train finished!")

    def stop_profiler(self):
        """Close a pending profiler window (also called at train exit)."""
        if self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            log.info("profiler trace written to %s", self._profile_dir)

    # -- helpers ----------------------------------------------------------------
    def place_state(self, state):
        """Place the full train state on the mesh: weight matrices (and
        their optimizer moments, which share the params' pytree paths) get
        the tensor/expert-parallel shardings from parallel/sharding.py;
        ``training.fsdp: true`` additionally shards every large leaf over
        the data axis (ZeRO-3 — params and moments split across the
        data-parallel devices, GSPMD all-gathers at use); everything else is
        explicitly replicated. Returns (placed_state, shardings) — pass the
        shardings as the step's ``out_shardings`` so updated states stay
        placed instead of falling back to replication."""
        from attention_models_tpu.parallel import param_shardings, shard_pytree
        from attention_models_tpu.parallel.mesh import DATA_AXIS

        min_size = self.cfg.training.get("fsdp_min_size")
        min_size = 1 << 16 if min_size is None else int(min_size)
        shardings = param_shardings(
            state, self.mesh,
            fsdp_axis=DATA_AXIS if self.fsdp else None,
            fsdp_min_size=min_size,
        )
        return shard_pytree(state, shardings), shardings

    def eval_rng(self, tag: int, i: int = 0):
        """Eval/sampling key folded from the CURRENT host-rng position
        WITHOUT advancing the stream: how many keys an eval draws (e.g.
        ``training.eval_fid`` adding decode batches) can then never shift
        the subsequent training trajectory of a fixed-seed run (ADVICE r3).
        ``tag`` namespaces independent eval consumers; ``i`` the batch."""
        import jax

        return jax.random.fold_in(self.rng.fold_in(tag), i)

    def log_image_grid(self, images, path: str, name: str, nrow: int = 6):
        """Save a sample grid to disk AND log it to TB/wandb — the
        reference logs generated grids as wandb.Image during training
        (trainers/muse.py:130-132); disk-only PNGs lose that."""
        from attention_models_tpu.utils.metrics import make_grid, save_image_grid

        images = np.asarray(images, np.float32)
        save_image_grid(images, path, nrow=nrow)
        self.metrics.log_image(name, make_grid(images, nrow), self.global_step)

    def fid_features(self, imgs) -> np.ndarray:
        """(b, 512) pooled VGG16 features for the eval-cadence FID. The
        tower uses a FIXED random init (seed 0) — deterministic, so the
        metric compares like-for-like across evals, runs, AND trainer types
        (a config-seed tower would make values comparable only within one
        seed); convert pretrained weights into the LPIPS tower for
        published-scale FID."""
        import jax
        import jax.numpy as jnp

        if getattr(self, "_fid_feat_fn", None) is None:
            from attention_models_tpu.training.losses import VGG16Features
            from attention_models_tpu.utils.eval_metrics import (
                vgg_fid_features,
            )

            res = int(np.asarray(imgs).shape[-1])
            tower = VGG16Features()
            p = tower.init(
                jax.random.key(0), jnp.zeros((1, res, res, 3), jnp.float32)
            )
            wrapped = {"params": {"vgg": p["params"]}}
            self._fid_feat_fn = jax.jit(
                lambda im: vgg_fid_features(wrapped, im)
            )
        return np.asarray(
            self._fid_feat_fn(jnp.asarray(np.asarray(imgs), jnp.float32))
        )

    def eval_params(self, key: str = "params"):
        """Weights for sampling/eval: the EMA-averaged trainable subtrees
        overlay the live params when ``training.ema_decay`` is set (the
        published MaskGIT/Muse recipes evaluate EMA weights; the reference
        trainers have no equivalent). Training always uses the live params."""
        ema = self.state.get("ema")
        params = self.state[key]
        return {**params, **ema} if ema else params

    def ema_init(self, params: dict, exclude: tuple = ()) -> None:
        """training.ema_decay: install an exponential-moving-average copy of
        the trainable top-level param subtrees into ``self.state["ema"]``.
        Call after building self.state, BEFORE maybe_resume/place_state so
        the EMA is checkpointed, restored, and mesh-placed with everything
        else (sharding rules match by path suffix, so each EMA leaf gets its
        params twin's placement). ``exclude`` lists frozen towers — they
        never move, so averaging them would only duplicate memory. Leaves
        are copied so state donation never sees aliased buffers."""
        import jax.numpy as jnp

        self.ema_decay = float(self.cfg.training.get("ema_decay", 0) or 0)
        if not 0.0 <= self.ema_decay < 1.0:
            raise ValueError(
                f"training.ema_decay must be in [0, 1), got {self.ema_decay}"
            )
        if self.ema_decay:
            self.state["ema"] = jax.tree.map(
                jnp.copy,
                {k: v for k, v in params.items() if k not in exclude},
            )

    def ema_update(self, state: dict, params: dict):
        """Jit-safe one-step EMA: ema <- d*ema + (1-d)*params over the
        subtrees tracked in state["ema"] (params just updated this step)."""
        d = self.ema_decay
        return jax.tree.map(
            lambda e, p: d * e + (1.0 - d) * p,
            state["ema"], {k: params[k] for k in state["ema"]},
        )

    @property
    def replicated(self):
        """Replicated sharding (for scalar metrics step outputs)."""
        return replicated_sharding(self.mesh)

    def shard_batch(self, arr: np.ndarray):
        arr = np.asarray(arr)
        if jax.process_count() > 1:
            return self._multihost_shard(arr)
        if arr.shape[0] % self.mesh.shape["data"]:
            # ragged tail batch (eval, drop_last=False): replicate
            return jax.device_put(arr, replicated_sharding(self.mesh))
        return jax.device_put(arr, batch_sharding(self.mesh, arr.ndim))

    def _host_batch_rows(self) -> np.ndarray:
        """Global-batch rows whose data-parallel shards live on THIS host
        (ownership follows the mesh's device order). The train loader
        fetches only these; eval paths decode the full batch everywhere."""
        sh = batch_sharding(self.mesh, 1)
        m = sh.devices_indices_map((self.batch_size,))
        rows: set[int] = set()
        for d, idx in m.items():
            if d.process_index != jax.process_index():
                continue
            sl = idx[0]
            stop = self.batch_size if sl.stop is None else sl.stop
            rows.update(range(sl.start or 0, stop))
        return np.array(sorted(rows), np.int64)

    def _multihost_shard(self, arr: np.ndarray):
        """Assemble a global batch array across hosts from local rows — one
        device_put per addressable shard + make_array_from_single_device_
        arrays (no host-to-host transfers; XLA collectives never see the
        host boundary). Accepts this host's rows (the filtered train
        loader) or the full global batch (eval: every host decoded the
        same padded batch) and slices its rows out."""
        sh = batch_sharding(self.mesh, arr.ndim)
        gb = (self.batch_size,) + arr.shape[1:]
        if arr.shape[0] == gb[0]:
            local = arr[self.host_rows]
        elif arr.shape[0] == len(self.host_rows):
            local = arr
        else:
            raise ValueError(
                f"multi-host batch must have {gb[0]} (global) or "
                f"{len(self.host_rows)} (host-local) rows, got "
                f"{arr.shape[0]} — pad eval batches with pad_batch()"
            )
        pos = {int(r): i for i, r in enumerate(self.host_rows)}
        m = sh.devices_indices_map(gb)
        shards = []
        for d in sh.addressable_devices:
            sl = m[d][0]
            stop = gb[0] if sl.stop is None else sl.stop
            block = local[[pos[r] for r in range(sl.start or 0, stop)]]
            shards.append(jax.device_put(block, d))
        return jax.make_array_from_single_device_arrays(gb, sh, shards)

    def pad_batch(self, *arrays):
        """Pad a ragged eval tail batch up to the configured batch size by
        repeating the last element, so jitted eval fns reuse the full-batch
        executable instead of recompiling (and falling back to replicated
        placement) for the one odd tail shape per val set. Returns
        (*padded, n_real); callers slice outputs back to ``n_real``."""
        n = int(np.asarray(arrays[0]).shape[0])
        if n >= self.batch_size:
            return (*arrays, n)
        out = []
        for a in arrays:
            a = np.asarray(a)
            pad = np.repeat(a[-1:], self.batch_size - n, axis=0)
            out.append(np.concatenate([a, pad], 0))
        return (*out, n)

    def _with_rng(self, state):
        return {**state, "host_rng": self.rng.key_data()}

    def maybe_resume(self, state):
        """Full-state resume: params, optimizer, step AND host PRNG (the
        reference restores weights+step only, SURVEY.md §5-checkpoint)."""
        path = self.cfg.experiment.get("resume_path_from_checkpoint")
        mgr = None
        if path:
            if not os.path.isdir(path):
                raise FileNotFoundError(
                    f"experiment.resume_path_from_checkpoint={path!r} is not "
                    f"an existing checkpoint directory — refusing to "
                    f"silently start a fresh run"
                )
            mgr = CheckpointManager(path)
        elif self.ckpt.latest_step() is not None and self.cfg.experiment.get(
            "auto_resume", False
        ):
            mgr = self.ckpt
        if mgr is not None:
            restored = mgr.restore(self._with_rng(state))
            if restored is not None:
                self.global_step = int(restored["step"])
                rng_data = restored.pop("host_rng", None)
                if rng_data is not None:
                    self.rng = RngStream(jax.random.wrap_key_data(rng_data))
                return restored
        return state

    def save_ckpt(self, state):
        self.ckpt.save(self.global_step, self._with_rng(state))

    def train(self):
        raise NotImplementedError

    def evaluate(self):
        raise NotImplementedError
