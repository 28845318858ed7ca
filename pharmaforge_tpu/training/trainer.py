"""The training loop: TPU-native replacement for PyTorch Lightning.

Covers the orchestration surface the reference delegates to PL
(train.py:126-153; pharmacodiff.py:245-318):

* epoch loop with fractional-epoch validation (`val_loss_interval`),
* train-time generative evaluation every `sample_interval` epochs
  (pharmacodiff.py:281-284, 320-357): sample pharmacophores for random val
  pockets and log the validity metric,
* Adam + ReduceLROnPlateau on 'val total loss',
* gradient accumulation (`accumulate_grad_batches`) via optax.MultiSteps,
* checkpoint save-last / save-top-k per epoch + full resume,
* metric logging with the reference's metric names,
* data parallelism over a jax device mesh ('data' axis): params replicated,
  batches sharded, padded to divide the mesh when needed.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import optax

from pharmaforge_tpu.data.datamodule import CrossdockedDataModule
from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion
from pharmaforge_tpu.models.size_dist import PharmSizeDistribution
from pharmaforge_tpu.analysis.metrics import SampleAnalyzer
from pharmaforge_tpu.data.batch import stack_batches
from pharmaforge_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to_multiple,
    process_local_rows,
    replicate,
    shard_batch,
    shard_stacked_batch,
)


class _NullLogger:
    """No-op metrics sink for non-zero ranks under jax.distributed: only
    process 0 writes metrics.jsonl / wandb (the reference crashed on rank>0
    instead — train.py:114-127)."""

    def log(self, metrics, step):
        pass

    def finish(self):
        pass
from pharmaforge_tpu.training.checkpoints import RunCheckpointer, abstract_like
from pharmaforge_tpu.training.logging import MetricsLogger
from pharmaforge_tpu.training.optim import ReduceLROnPlateau, make_optimizer
from pharmaforge_tpu.training.sampling import PocketSampler
from pharmaforge_tpu.training.train_state import (
    TrainState,
    make_eval_step,
    make_multi_train_step,
    make_train_step,
)


def _with_retry(fn, *args, retries: int = 2, backoff: float = 15.0,
                on_retry=None, **kwargs):
    """Retry transient device/compile-service failures.

    On this deployment the compile service lives behind a tunnel that can
    drop a response mid-read (JaxRuntimeError INTERNAL ... remote_compile);
    retrying after a pause recovers. Non-transient errors re-raise after the
    retry budget. `on_retry` runs before the retry message prints (the
    trainer uses it to finish an in-place progress line).
    """
    import time as _time
    last = None
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jax runtime errors subclass Exception
            name = type(e).__name__
            transient = ("JaxRuntimeError" in name
                         or "INTERNAL" in str(e)
                         or "remote_compile" in str(e))
            if not transient or attempt == retries:
                raise
            last = e
            if on_retry is not None:
                on_retry()
            print(f"transient device failure ({e}); retrying in {backoff}s "
                  f"({attempt + 1}/{retries})")
            _time.sleep(backoff)
    raise last  # pragma: no cover


class Trainer:

    def __init__(self, config: dict, run_dir: Path,
                 logger: Optional[MetricsLogger] = None,
                 debug: bool = False, seed: int = 0,
                 n_devices: Optional[int] = None):
        self.config = config
        self.run_dir = Path(run_dir)
        self.debug = debug
        # cross-host batch-identity check cadence (see _to_local); 0 means
        # "due now" so the very first batch is always verified
        self._ident_check_every = 100
        self._ident_check_countdown = 0
        self.seed = seed

        tr = config["training"]
        from pharmaforge_tpu.utils.misc import set_matmul_precision
        set_matmul_precision(tr.get("matmul_precision", "float32"))
        self.batch_size = tr["batch_size"]
        self.max_epochs = tr.get("trainer_args", {}).get("max_epochs", 10)
        self.accumulate = tr.get("trainer_args", {}).get(
            "accumulate_grad_batches", 1) or 1
        self.limit_train_batches = 100 if debug else None
        # train steps scanned inside one device call (1 = dispatch each
        # step; >1 amortizes the per-call round-trip on dispatch-bound
        # hosts; see train_state.make_multi_train_step). Same-shape batches
        # are chunked per call, so val/sampling cadence checks coarsen to
        # chunk boundaries.
        self.steps_per_call = tr.get("steps_per_call", 1) or 1
        # PL semantics: float = fraction of the val loader, int = batch count
        self.limit_val_batches = tr.get("trainer_args", {}).get(
            "limit_val_batches", 1.0)

        ev = tr.get("evaluation", {})
        self.sample_interval = ev.get("sample_interval", 1.0)
        self.val_loss_interval = ev.get("val_loss_interval", 1.0)
        self.pharms_per_pocket = ev.get("pharms_per_pocket", 2)
        self.n_pockets_to_sample = ev.get("n_pockets", 8)

        lrs = config.get("lr_scheduler", {})
        self.base_lr = float(lrs.get("base_lr", 1e-3))
        weight_decay = float(lrs.get("weight_decay", 0.0))
        clip_value = tr.get("clip_value")
        self.plateau = ReduceLROnPlateau(
            **{k: v for k, v in lrs.get("reducelronplateau", {}).items()
               if k in ("mode", "factor", "patience", "min_lr", "verbose")})

        self.model: Optional[PharmacophoreDiffusion] = None
        self.optimizer = make_optimizer(self.base_lr, weight_decay,
                                        clip_value)
        if self.accumulate > 1:
            self.optimizer = optax.MultiSteps(self.optimizer,
                                              every_k_schedule=self.accumulate)

        # multi-host (jax.distributed): rank 0 owns every filesystem/stdout
        # side effect — metrics, checkpoints, progress; the loader on each
        # process feeds only its process_local_rows slice of each batch
        self.is_main = jax.process_index() == 0
        self.n_processes = jax.process_count()
        if logger is None:
            logger = (MetricsLogger(self.run_dir, config.get("wandb"))
                      if self.is_main else _NullLogger())
        self.logger = logger
        self.checkpointer = RunCheckpointer(self.run_dir,
                                            **config.get("checkpointing", {}))
        self.mesh = make_mesh(n_devices)
        self.lr = self.base_lr
        self.global_step = 0
        self.epoch = 0
        self.last_sample_marker = 0.0
        self.last_val_marker = 0.0
        self._resume_state = None
        # per-step progress line cadence (reference TQDMProgressBar,
        # train.py:143-148: refresh every 20 steps, every step in --debug)
        self.progress_refresh = 1 if debug else int(
            tr.get("progress_refresh", 20))
        self._progress_width = 0
        self._progress_live = False

    # ----------------------------------------------------------- progress

    def _progress(self, batch_idx: int, n_batches: int, metrics: dict):
        """Per-step progress line on stderr: in-place (carriage-return) on a
        tty, plain lines otherwise. Refresh cadence `progress_refresh`."""
        r = self.progress_refresh
        if not self.is_main:
            return
        if not r or (batch_idx % r and batch_idx != n_batches - 1):
            return
        loss = metrics.get("train total loss", float("nan"))
        msg = (f"epoch {self.epoch} [{batch_idx + 1}/{n_batches}] "
               f"train total loss {loss:.4f} lr {self.lr:.2e}")
        if sys.stderr.isatty():
            self._progress_width = max(self._progress_width, len(msg))
            print("\r" + msg.ljust(self._progress_width), end="",
                  file=sys.stderr, flush=True)
            self._progress_live = True
        else:
            print(msg, file=sys.stderr, flush=True)

    def _progress_close(self):
        """Finish an in-place progress line before other prints."""
        if self._progress_live:
            print(file=sys.stderr, flush=True)
            self._progress_live = False

    # ---------------------------------------------------------- multi-host

    def _to_local(self, batch):
        """Under jax.distributed, slice the (globally identical, already
        padded) batch down to this process's `process_local_rows` before
        `shard_batch` assembles the global array — each host materializes
        only the rows its own devices hold (parallel/mesh.py contract).

        That contract rests on every host's loader yielding byte-identical
        global batches purely from the shared seed; a divergence (e.g.
        num_workers>0 nondeterminism, per-host filesystem ordering) would
        silently assemble a corrupted global batch. Cross-check a digest of
        the batch across processes every `_ident_check_every` batches
        (every batch under --debug) and fail loudly on mismatch.
        """
        if self.n_processes <= 1:
            return batch
        if self._ident_check_countdown <= 0:
            self._assert_batch_identical(batch)
            self._ident_check_countdown = 1 if self.debug \
                else self._ident_check_every
        self._ident_check_countdown -= 1
        start, stop = process_local_rows(batch.pharm_x.shape[0], self.mesh)
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[start:stop],
                                      batch)

    def _assert_batch_identical(self, batch):
        """All-gather a CRC of the global batch and require every process
        to agree before slicing it (silent-divergence guard)."""
        import zlib
        from jax.experimental import multihost_utils
        crc = 0
        for leaf in jax.tree_util.tree_leaves(batch):
            crc = zlib.crc32(np.ascontiguousarray(leaf).tobytes(), crc)
        digests = np.asarray(multihost_utils.process_allgather(
            np.asarray([crc], dtype=np.uint32))).reshape(-1)
        if not (digests == digests[0]).all():
            raise RuntimeError(
                "data-parallel batch divergence: per-process batch digests "
                f"{digests.tolist()} differ (process {jax.process_index()}). "
                "Each host's dataloader must yield byte-identical global "
                "batches from the shared seed; check num_workers / dataset "
                "determinism.")

    # ----------------------------------------------------------------- fit

    def fit(self, model: PharmacophoreDiffusion,
            datamodule: CrossdockedDataModule,
            resume_from: Optional[str] = None):
        self.model = model
        datamodule.setup("fit")

        key = jax.random.key(self.seed)
        key, init_key = jax.random.split(key)

        init_batch = next(iter(datamodule.train_dataloader(seed=self.seed)))
        params = model.init_params(init_key, init_batch)
        opt_state = self.optimizer.init(params)
        state = TrainState(params=params, opt_state=opt_state,
                           step=np.int32(0))

        if resume_from is not None:
            template = abstract_like(
                {"params": state.params, "opt_state": state.opt_state})
            restored, meta = self.checkpointer.restore(template,
                                                       which=resume_from)
            state = TrainState(params=restored["params"],
                               opt_state=restored["opt_state"],
                               step=np.int32(meta["step"]))
            self.global_step = meta["step"]
            self.epoch = meta.get("epoch", 0)
            self.lr = meta.get("lr", self.base_lr)
            self.last_sample_marker = meta.get("last_sample_marker", 0.0)
            self.plateau.load_state_dict(meta.get("plateau", {}))

        state = replicate(state, self.mesh)
        # donation is off so a transient step failure can retry with intact
        # inputs (donated buffers may be invalidated by a failed call)
        train_step = make_train_step(model, self.optimizer, donate=False)
        multi_step = (make_multi_train_step(model, self.optimizer,
                                            donate=False)
                      if self.steps_per_call > 1 else None)
        eval_step = make_eval_step(model)

        size_dist = PharmSizeDistribution(
            self.config["dataset"].get("processed_data_dir"))

        n_params = sum(np.prod(np.shape(p)) for p in
                       jax.tree_util.tree_leaves(state.params))
        if self.is_main:
            print(f"training on mesh {self.mesh.shape} | {n_params:,} "
                  f"params | batch {self.batch_size} | {self.max_epochs} "
                  f"epochs"
                  + (f" | {self.n_processes} processes"
                     if self.n_processes > 1 else ""))

        while self.epoch < self.max_epochs:
            loader = datamodule.train_dataloader(seed=self.seed + self.epoch)
            n_batches = len(loader)
            if self.limit_train_batches:
                n_batches = min(n_batches, self.limit_train_batches)
            epoch_t0 = time.time()
            epoch_metrics: dict[str, list] = {}

            def after_step(batch_idx, aux_row):
                """Per-optimizer-step bookkeeping: metrics + cadence checks.

                `aux_row` holds host floats; cadence (train-time sampling,
                fractional validation) reads the *current* state, so with
                chunked calls it fires at chunk boundaries.
                """
                nonlocal key
                epoch_exact = self.epoch + batch_idx / max(n_batches, 1)
                self.global_step += 1
                metrics = dict(aux_row)
                metrics["lr"] = self.lr
                metrics["epoch_exact"] = epoch_exact
                for k, v in metrics.items():
                    epoch_metrics.setdefault(k, []).append(v)
                self.logger.log(metrics, step=self.global_step)
                self._progress(batch_idx, n_batches, metrics)

                # train-time generative eval (pharmacodiff.py:281-284)
                if (self.sample_interval > 0 and
                        epoch_exact - self.last_sample_marker
                        >= self.sample_interval):
                    self.last_sample_marker = epoch_exact
                    key, skey = jax.random.split(key)
                    quality = self.sample_and_analyze(
                        state.params, datamodule.val_dataset, skey, size_dist)
                    self.logger.log(quality, step=self.global_step)

                # fractional-epoch validation (val_check_interval semantics)
                if (epoch_exact - self.last_val_marker
                        >= self.val_loss_interval):
                    self.last_val_marker = epoch_exact
                    key, vkey = jax.random.split(key)
                    val_metrics = self.validate(state.params, datamodule,
                                                eval_step, vkey)
                    self.logger.log(val_metrics, step=self.global_step)
                    self.lr = self.plateau.step(
                        val_metrics["val total loss"], self.lr)

            def run_single(batch_idx, batch):
                nonlocal state, key
                sharded = shard_batch(self._to_local(batch), self.mesh)
                key, step_key = jax.random.split(key)
                state, aux = _with_retry(train_step, state, sharded,
                                         step_key, self.lr,
                                         on_retry=self._progress_close)
                after_step(batch_idx, {k: float(v) for k, v in aux.items()})

            def run_chunk(entries):
                """One scanned multi-step call over same-shape batches."""
                nonlocal state, key
                idxs = [i for i, _ in entries]
                stacked = shard_stacked_batch(
                    stack_batches([self._to_local(b) for _, b in entries]),
                    self.mesh)
                key, step_key = jax.random.split(key)
                state, aux = _with_retry(multi_step, state, stacked,
                                         step_key, self.lr,
                                         on_retry=self._progress_close)
                rows = {k: np.asarray(v) for k, v in aux.items()}
                for j, batch_idx in enumerate(idxs):
                    after_step(batch_idx,
                               {k: float(v[j]) for k, v in rows.items()})

            pending: dict = {}  # padded shape -> [(batch_idx, batch)]
            from pharmaforge_tpu.data.prefetch import prefetch
            for batch_idx, batch in enumerate(prefetch(loader)):
                if self.limit_train_batches and batch_idx >= self.limit_train_batches:
                    break
                # pad partial batches up to the full batch size (one compiled
                # shape per bucket), then to a mesh-divisible count
                batch, _ = pad_batch_to_multiple(batch, self.batch_size)
                batch, _ = pad_batch_to_multiple(
                    batch, int(np.prod(self.mesh.devices.shape)))
                if self.steps_per_call <= 1:
                    run_single(batch_idx, batch)
                    continue
                shape = batch.prot_x.shape
                entries = pending.setdefault(shape, [])
                entries.append((batch_idx, batch))
                if len(entries) == self.steps_per_call:
                    run_chunk(pending.pop(shape))
            # leftovers smaller than a chunk run through the single-step
            # path (no extra compiled multi-step shapes)
            for entries in pending.values():
                for batch_idx, batch in entries:
                    run_single(batch_idx, batch)
            pending.clear()

            # end of epoch: validation + checkpoint + epoch-aggregated
            # train metrics (the reference logs on_step AND on_epoch,
            # pharmacodiff.py:295-296)
            key, vkey = jax.random.split(key)
            val_metrics = self.validate(state.params, datamodule, eval_step,
                                        vkey)
            epoch_means = {f"{k} epoch": float(np.mean(v))
                           for k, v in epoch_metrics.items()
                           if k.startswith("train")}
            self.logger.log({**val_metrics, **epoch_means},
                            step=self.global_step)
            self.lr = self.plateau.step(val_metrics["val total loss"], self.lr)
            self.epoch += 1

            self._progress_close()
            dt = time.time() - epoch_t0
            steps_per_sec = (batch_idx + 1) / dt if dt > 0 else 0.0
            train_loss = np.mean(epoch_metrics.get("train total loss", [0.0]))
            if self.is_main:
                print(f"epoch {self.epoch}/{self.max_epochs} "
                      f"train total loss {train_loss:.4f} "
                      f"val total loss {val_metrics['val total loss']:.4f} "
                      f"({steps_per_sec:.2f} steps/s)")

            self.save_checkpoint(state, val_metrics["val total loss"])

        return state

    # ------------------------------------------------------------ validate

    def validate(self, params, datamodule, eval_step, key) -> dict:
        from pharmaforge_tpu.data.prefetch import prefetch

        loader = datamodule.val_dataloader(seed=self.seed)
        # trainer_args.limit_val_batches: fraction (float) or count (int)
        n_batches = len(loader)
        limit = self.limit_val_batches
        if isinstance(limit, float):
            n_batches = max(int(n_batches * limit), 1) if limit > 0 else 0
        elif limit is not None:
            n_batches = min(n_batches, int(limit))

        sums: dict[str, float] = {}
        weights = 0.0
        for batch_idx, batch in enumerate(prefetch(loader)):
            if batch_idx >= n_batches:
                break
            bs = batch.batch_size
            # pad partial batches so every bucket compiles a single shape,
            # then shard over the mesh like the train loop (validation is
            # data-parallel too; params are already replicated)
            batch, _ = pad_batch_to_multiple(batch, self.batch_size)
            batch, _ = pad_batch_to_multiple(
                batch, int(np.prod(self.mesh.devices.shape)))
            batch = shard_batch(self._to_local(batch), self.mesh)
            key, sub = jax.random.split(key)
            aux = _with_retry(eval_step, params, batch, sub)
            for k, v in aux.items():
                sums[k] = sums.get(k, 0.0) + float(v) * bs
            weights += bs
        return {k: v / max(weights, 1) for k, v in sums.items()}

    # -------------------------------------------------- sample_and_analyze

    def sample_and_analyze(self, params, val_dataset, key,
                           size_dist) -> dict:
        """Sample pharmacophores mid-training and compute validity
        (reference pharmacodiff.py:320-357)."""
        if self.n_processes > 1:
            # the sampler drives its own single-host batches: pull the
            # replicated params to host numpy so its jit runs on local
            # devices, independent of the global mesh (every rank samples
            # identically; only rank 0 logs the result)
            params = jax.device_get(params)
        n_pockets = min(self.n_pockets_to_sample, len(val_dataset))
        idxs = np.random.default_rng(int(self.global_step)).integers(
            0, len(val_dataset), size=n_pockets)
        pockets = [val_dataset[int(i)] for i in idxs]
        n_pharms = [[len(p["pharm_x"])] * self.pharms_per_pocket
                    for p in pockets]
        init_coms = np.stack([p["pharm_x"].mean(axis=0) for p in pockets])

        # one sampler reused across calls, every pocket padded to the
        # dataset-wide slot count: the T-step sampling chain traces and
        # compiles exactly once for the whole training run
        if getattr(self, "_sampler", None) is None:
            from pharmaforge_tpu.data.batch import bucket_size
            sizes = val_dataset.prot_idx[:, 1] - val_dataset.prot_idx[:, 0]
            slots = bucket_size(int(sizes.max()))
            self._sampler = PocketSampler(self.model, params,
                                          fixed_prot_slots=slots)
        self._sampler.params = params
        per_pocket = self._sampler.sample(pockets, n_pharms, key,
                                          max_batch_size=64,
                                          init_pharm_com=init_coms)
        flat = [ph for pocket_phs in per_pocket for ph in pocket_phs]
        try:
            return SampleAnalyzer().analyze(flat)
        except ValueError:
            return {}

    # ----------------------------------------------------------- checkpoint

    def save_checkpoint(self, state: TrainState, monitored: float):
        if not self.is_main:
            # rank-zero-only writes; replicated state is identical anyway
            return
        host_state = jax.device_get(
            {"params": state.params, "opt_state": state.opt_state})
        meta = {
            "step": int(self.global_step),
            "epoch": int(self.epoch),
            "lr": float(self.lr),
            "last_sample_marker": float(self.last_sample_marker),
            "plateau": self.plateau.state_dict(),
            "monitored": float(monitored),
        }
        self.checkpointer.save(host_state, meta, metric=monitored)
