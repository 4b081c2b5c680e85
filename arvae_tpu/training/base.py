"""Abstract trainer: epoch driver over jitted, mesh-sharded steps.

Functional re-design of the reference ``utils/trainer.py:16-245``:
the per-batch python loop body (forward → loss → backward → Adam step)
becomes ONE jitted ``train_step(state, batch, key)`` compiled once and
executed per batch with the batch sharded over the mesh's data axis —
XLA inserts the gradient all-reduce. Explicit PRNG keys replace the
reference's global torch/numpy seeding (``image_vae_trainer.py:102-104``).

Kept from the reference: the epoch loop structure (train pass, val
pass, ``eval_model`` hook, per-epoch save), the tensorboard scalar
schema (loss/train, loss/valid, acc/train, acc/valid —
``trainer.py:95-100``), and stdout epoch stats.
"""

from __future__ import annotations

import abc
import json
import os
import time
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from arvae_tpu.core.config import TrainerHParams, run_dir
from arvae_tpu.core.checkpoint import Checkpointer
from arvae_tpu.parallel import MeshContext, create_mesh


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array
    # Loss-scale hyperparameters (beta/capacity/gamma/delta) as device
    # scalars: traced DATA rather than compile-time constants, so
    # hyperparameter sweeps (script_hyper_param_exp.py's 35-cell grid)
    # reuse ONE compiled train step instead of recompiling per cell.
    hyper: Any = None


class BaseTrainer(abc.ABC):
    """Owns dataset + model + optimizer + mesh; drives epochs."""

    def __init__(
        self,
        dataset,
        model,
        hparams: TrainerHParams,
        mesh: Optional[MeshContext] = None,
    ):
        self.dataset = dataset
        self.model = model
        self.hparams = hparams
        self.mesh = mesh or create_mesh()
        self.optimizer = optax.adam(hparams.lr)
        self.writer = None
        self.metrics: Dict[str, Any] = {}
        self.cur_epoch_num = 0
        self._base_key = jax.random.key(hparams.rand)
        self.state: Optional[TrainState] = None
        # Set by train_model; None for load-only / --test sessions so a
        # cache written without training never claims a protocol.
        self._train_protocol: Optional[Dict[str, int]] = None

    # -- identity / paths (reference utils/model.py:21-41 semantics) -------

    @abc.abstractmethod
    def model_repr(self) -> str:
        """e.g. 'MnistVAE_r_0_b_4.0_...' — keys all run artifacts."""

    @property
    def run_dir(self) -> str:
        return run_dir(self.model_repr())

    # -- state ---------------------------------------------------------------

    @abc.abstractmethod
    def init_params(self, rng) -> Any:
        """Initializes model parameters from an example batch."""

    def loss_hyper(self) -> Dict[str, jnp.ndarray]:
        """Loss-scale hyperparameters as f32 scalars (see TrainState.hyper)."""
        h = self.hparams
        return {
            "beta": jnp.float32(h.beta),
            "capacity": jnp.float32(h.capacity),
            "gamma": jnp.float32(h.gamma),
            "delta": jnp.float32(h.delta),
        }

    def init_state(self) -> TrainState:
        params = self.init_params(jax.random.fold_in(self._base_key, 0))
        opt_state = self.optimizer.init(params)
        state = TrainState(params=params, opt_state=opt_state,
                           step=jnp.zeros((), jnp.int32),
                           hyper=self.loss_hyper())
        return jax.device_put(state, self.mesh.replicated)

    def ensure_state(self) -> TrainState:
        if self.state is None:
            self.state = self.init_state()
        return self.state

    # -- abstract per-batch computation --------------------------------------

    @abc.abstractmethod
    def make_train_step(self):
        """Returns jit-compiled (state, batch, key) -> (state, metrics)."""

    @abc.abstractmethod
    def make_eval_step(self):
        """Returns jit-compiled (params, batch, key) -> metrics."""

    @abc.abstractmethod
    def process_batch(self, batch: Tuple[np.ndarray, ...]):
        """Host-side batch massaging before device_put."""

    # -- epoch driver ---------------------------------------------------------

    def loss_and_acc_on_epoch(
        self, loader: Iterable, epoch_num: int, train: bool
    ) -> Tuple[float, float]:
        from arvae_tpu.data.prefetch import DevicePrefetcher

        if train:
            step_fn = self._train_step_fn
        else:
            step_fn = self._eval_step_fn
        # background host work + device_put; metric totals stay on device
        # so the step queue never drains on a host sync
        prefetch = DevicePrefetcher(
            loader, self.mesh, process_fn=self.process_batch
        )
        totals = None
        n = 0
        for batch_num, batch in enumerate(prefetch):
            key = jax.random.fold_in(
                self._base_key, (epoch_num + 1) * 100003 + batch_num * 2 + train
            )
            if train:
                self.state, metrics = step_fn(self.state, batch, key)
            else:
                metrics = step_fn(self.state, batch, key)
            if batch_num == 0 and train:
                self._log_loss_split(metrics, epoch_num)  # one host sync
            totals = (
                metrics
                if totals is None
                else jax.tree_util.tree_map(jnp.add, totals, metrics)
            )
            n += 1
        if totals is None:
            return 0.0, 0.0
        return (
            float(totals["loss"]) / n,
            float(totals.get("accuracy", 0.0)) / n,
        )

    def _log_loss_split(self, metrics: Dict[str, Any], epoch_num: int) -> None:
        """First-batch loss-split scalars (reference
        image_vae_trainer.py:147-151,182-196)."""
        if self.writer is None:
            return
        h = self.hparams
        if "recons_loss" in metrics:
            self.writer.add_scalar(
                "loss_split/recons_loss", float(metrics["recons_loss"]), epoch_num
            )
        if "dist_loss" in metrics and h.beta != 0:
            self.writer.add_scalar(
                "loss_split/dist_loss", float(metrics["dist_loss"]) / h.beta,
                epoch_num,
            )
        if "reg_loss" in metrics and h.use_reg_loss and h.gamma != 0:
            self.writer.add_scalar(
                "loss_split/reg_loss", float(metrics["reg_loss"]) / h.gamma,
                epoch_num,
            )

    # Every trainer with a (state, batch, key)-shaped step core rides
    # the device-resident input path (all current trainers do,
    # including the fader's two-optimizer adversarial step); a future
    # trainer with bespoke epoch logic can opt out here. The
    # ARVAE_HOST_LOADER env var forces the host path at runtime.
    supports_device_data = True

    # Measured per-workload scan-unroll optimum for the dispatch chunk
    # (docs/design.md round-5 decisions): the recurrence-dominated music
    # step is flat-to-negative past 4, so 4 is the base default; the
    # image conv family overrides to 8. ARVAE_SCAN_UNROLL still wins.
    scan_unroll_default = 4

    def _maybe_device_runner(self, batch_size: int):
        """Device-resident epoch runner (arvae_tpu.data.device_data) when
        the dataset supports it — avoids the ~100 ms-per-batch
        device_put cost of this TPU's tunneled transport."""
        if not self.supports_device_data:
            return None
        if os.environ.get("ARVAE_HOST_LOADER"):
            return None
        make = getattr(self.dataset, "device_splits", None)
        if make is None or not hasattr(self, "_train_step_core"):
            return None
        from arvae_tpu.data.device_data import DeviceEpochRunner

        train_split, val_split = make(self.mesh, split=(0.70, 0.20))
        return DeviceEpochRunner(
            train_split,
            val_split,
            batch_size,
            self._train_step_core,
            self._eval_step_core,
            self._base_key,
            default_unroll=self.scan_unroll_default,
        )

    def _device_eval_split(self):
        """Device-resident EVAL split when the dataset supports it
        (cached; shared by the image and measure trainers)."""
        if os.environ.get("ARVAE_HOST_LOADER"):
            return None
        make = getattr(self.dataset, "device_eval_split", None)
        if make is None:
            return None
        if not hasattr(self, "_dev_eval_split"):
            self._dev_eval_split = make(self.mesh)
        return self._dev_eval_split

    def _device_val_split(self):
        """Device-resident VALIDATION split — the epoch runner's, when a
        training run is active. The per-epoch ``eval_model`` hook
        reflects validation data, so its harvest can ride the same
        HBM-resident rows the runner already holds instead of pulling
        host batches through the ~100-200 ms/batch transport."""
        runner = getattr(self, "_device_runner", None)
        if runner is not None and runner.val_split.n > 0:
            return runner.val_split
        return None

    @staticmethod
    def _split_scoped_jit(sp, cache_key, make):
        """Jit cache stored ON the split: repeat callers (the per-epoch
        eval hook, tester sweeps) must not re-trace every call — but a
        trainer-held cache keyed by id(sp) would pin every past split's
        HBM buffers through the jitted closures (a retrain builds a
        fresh runner + splits). Tying the cache to the split's own
        lifetime keeps both properties."""
        cache = sp.__dict__.setdefault("_trainer_jits", {})
        if cache_key not in cache:
            cache[cache_key] = jax.jit(make())
        return cache[cache_key]

    def _device_harvest_scan(self, sp, batch_size: int, num_batches: int,
                             encode_batch, tag: str):
        """Latent harvest as ONE jitted scan over a device-resident
        split (the host path costs a device_put round trip per batch on
        this transport). ``encode_batch(params, x, labs, key, i) ->
        (z, labels)`` is the trainer-specific per-batch encoding;
        ``tag`` keys the jit cache per encoding variant."""
        batch_size = min(batch_size, max(sp.n, 1))
        steps = min(sp.num_batches(batch_size), num_batches + 1)
        state = self.ensure_state()

        def make_harvest():
            def harvest(params, rows, labels, key):
                def body(_, i):
                    idx = (jnp.arange(batch_size, dtype=jnp.int32)
                           + i * batch_size)
                    x, labs = sp.gather_batch(rows, labels, idx)
                    return None, encode_batch(params, x, labs, key, i)

                _, (z, l) = jax.lax.scan(body, None, jnp.arange(steps))
                return (z.reshape(-1, z.shape[-1]),
                        l.reshape(-1, l.shape[-1]))

            return harvest

        fn = self._split_scoped_jit(sp, (tag, batch_size, steps),
                                    make_harvest)
        z, labels = fn(
            state.params, sp.images, sp.labels,
            jax.random.fold_in(self._base_key, 7_000_000),
        )
        return np.asarray(z), np.asarray(labels)

    def _device_test_sweep(self, sp, batch_size: int, batch_metrics):
        """(mean_loss, mean_acc) over a device split with equal
        per-batch weight INCLUDING the final partial batch — the host
        loaders are drop_last=False, so silently excluding up to B-1
        tail rows would change the blessed test metrics.
        ``batch_metrics(params, x, labs, key) -> (loss, acc)``."""
        bs = min(batch_size, sp.n)
        steps = max(sp.num_batches(bs), 1)
        rem = sp.n - steps * bs
        state = self.ensure_state()

        def make_sweep():
            def sweep(params, rows, labels, key):
                def body(_, i):
                    idx = jnp.arange(bs, dtype=jnp.int32) + i * bs
                    x, labs = sp.gather_batch(rows, labels, idx)
                    return None, batch_metrics(
                        params, x, labs, jax.random.fold_in(key, i))

                _, (losses, accs) = jax.lax.scan(body, None,
                                                 jnp.arange(steps))
                return losses, accs

            return sweep

        base_key = jax.random.fold_in(self._base_key, 9_000_000)
        losses, accs = self._split_scoped_jit(
            sp, ("test_sweep", bs, steps), make_sweep
        )(state.params, sp.images, sp.labels, base_key)
        losses, accs = list(np.asarray(losses)), list(np.asarray(accs))
        if rem > 0:
            def make_tail():
                def tail(params, rows, labels, key):
                    idx = jnp.arange(rem, dtype=jnp.int32) + steps * bs
                    x, labs = sp.gather_batch(rows, labels, idx)
                    return batch_metrics(params, x, labs, key)

                return tail

            tl, ta = self._split_scoped_jit(
                sp, ("test_tail", bs, steps, rem), make_tail
            )(state.params, sp.images, sp.labels,
              jax.random.fold_in(base_key, steps))
            losses.append(float(tl))
            accs.append(float(ta))
        return float(np.mean(losses)), float(np.mean(accs))

    def protocol_dict(self) -> Dict[str, Any]:
        """Training-protocol provenance for results_dict.json.

        ``num_epochs``/``batch_size`` are None when this session never
        trained (pure ``--test`` reload) — such caches must not pass a
        protocol-gated aggregation. Dataset identity fields are always
        stamped so a ``--short`` dSprites factor grid can't masquerade
        as the full 737k protocol (ADVICE r4)."""
        p: Dict[str, Any] = dict(
            self._train_protocol
            or {"num_epochs": None, "batch_size": None}
        )
        ds = self.dataset
        p["dataset"] = type(ds).__name__
        for attr in ("factor_sizes", "num_bars", "is_short", "class_name"):
            v = getattr(ds, attr, None)
            if v is not None:
                p[attr] = list(v) if isinstance(v, tuple) else v
        return p

    def has_protocol_cache(self, num_epochs: int, batch_size: int) -> bool:
        """True iff this run dir already holds a ``results_dict.json``
        whose protocol stamp matches the requested training protocol
        (epochs, batch size, and the dataset identity fields — so a
        ``--short`` dSprites cache can't satisfy a full-grid request).

        Lets the seed loops in the train CLIs resume a timeout-cut
        protocol restore instead of redoing finished seeds
        (``--skip_cached``)."""
        fp = os.path.join(self.run_dir, "results_dict.json")
        try:
            with open(fp) as fh:
                stamped = json.load(fh).get("protocol") or {}
        except Exception:
            return False
        want = dict(self.protocol_dict())
        want["num_epochs"] = int(num_epochs)
        want["batch_size"] = int(batch_size)
        return all(stamped.get(k) == v for k, v in want.items())

    def train_model(self, batch_size: int, num_epochs: int, log: bool = False):
        # Retraining invalidates any cached eval metrics: the trainers'
        # compute_eval_metrics short-circuits on results_dict.json, so a
        # stale cache from a previous run would be printed as if it
        # described the freshly trained model.
        results_fp = os.path.join(self.run_dir, "results_dict.json")
        if os.path.exists(results_fp):
            os.remove(results_fp)
        # Record the protocol this training run used. The run-dir name
        # encodes only seed/beta/gamma/delta (core/config.py), so a
        # smoke run's cache was previously indistinguishable from the
        # blessed 100-epoch protocol's — queue skip checks and the
        # aggregation step gate on this stamp (ADVICE r4).
        self._train_protocol = {
            "num_epochs": int(num_epochs),
            "batch_size": int(batch_size),
        }

        if log:
            from tensorboardX import SummaryWriter

            ts = time.strftime("%Y-%m-%d_%H:%M:%S")
            self.writer = SummaryWriter(
                logdir=os.path.join("runs", self.model_repr() + ts)
            )

        self.ensure_state()
        self._train_step_fn = self.make_train_step()
        self._eval_step_fn = self.make_eval_step()
        runner = self._maybe_device_runner(batch_size)
        # Exposed so per-epoch hooks (eval_model) can harvest from the
        # device-resident validation split instead of the host loader.
        self._device_runner = runner

        if runner is None:
            gen_train, gen_val, _ = self.dataset.data_loaders(
                batch_size=batch_size, split=(0.70, 0.20)
            )
            n_train = len(gen_train)
            n_val = len(gen_val)
        else:
            # The host loaders would only exist to be counted: building
            # them copies the whole dataset again on the host (~380 MB
            # for full dSprites) while the poison-loader test proves
            # they are never iterated on this path.
            gen_train = gen_val = None
            n_train = runner.train_split.num_batches(batch_size)
            n_val = runner.val_split.num_batches(batch_size)
        print("Num Train Batches: ", n_train)
        print("Num Valid Batches: ", n_val)

        ckpt = Checkpointer(self.run_dir)
        for epoch_index in range(num_epochs):
            self.update_scheduler(epoch_index)
            t0 = time.time()
            if runner is not None:
                self.state, totals, n, first = runner.train_epoch(
                    self.state, epoch_index
                )
                # A split smaller than batch_size yields zero steps and
                # None totals — mirror the host path's 0.0 fallback
                # (loss_and_acc_on_epoch) instead of crashing.
                if first is not None:
                    self._log_loss_split(first, epoch_index)
                mean_loss_train = (
                    float(totals["loss"]) / n if totals is not None else 0.0
                )
                mean_accuracy_train = (
                    float(totals.get("accuracy", 0.0)) / n
                    if totals is not None else 0.0
                )
                vtot, vn = runner.eval_epoch(self.state, epoch_index)
                mean_loss_val = (
                    float(vtot["loss"]) / vn if vtot is not None else 0.0
                )
                mean_accuracy_val = (
                    float(vtot.get("accuracy", 0.0)) / vn
                    if vtot is not None else 0.0
                )
            else:
                mean_loss_train, mean_accuracy_train = (
                    self.loss_and_acc_on_epoch(gen_train, epoch_index,
                                               train=True)
                )
                mean_loss_val, mean_accuracy_val = self.loss_and_acc_on_epoch(
                    gen_val, epoch_index, train=False
                )
            self.eval_model(gen_val, epoch_index)
            dt = time.time() - t0
            if self.writer is not None:
                self.writer.add_scalar("loss/train", mean_loss_train, epoch_index)
                self.writer.add_scalar("loss/valid", mean_loss_val, epoch_index)
                self.writer.add_scalar("acc/train", mean_accuracy_train, epoch_index)
                self.writer.add_scalar("acc/valid", mean_accuracy_val, epoch_index)
            self.print_epoch_stats(
                epoch_index,
                num_epochs,
                mean_loss_train,
                mean_accuracy_train,
                mean_loss_val,
                mean_accuracy_val,
                dt,
            )
            # per-epoch numerics guard (the reference NaN-sweeps weights
            # every forward in Python; one device-side check per epoch)
            from arvae_tpu.utils.profiling import assert_tree_finite

            assert_tree_finite(self.state.params, "model parameters")
            ckpt.save(self.state)

    def eval_model(self, data_loader, epoch_num: int = 0):
        """Optional extra per-epoch evaluation hook."""

    def update_scheduler(self, epoch_num: int):
        """Optional LR/teacher-forcing schedule hook."""

    def load_model(self):
        """Restores params/opt_state/step from the run checkpoint."""
        ckpt = Checkpointer(self.run_dir)
        template = self.ensure_state()
        restored = ckpt.restore(jax.device_get(template))
        self.state = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, restored), self.mesh.replicated
        )

    def maybe_resume(self) -> bool:
        """Restores the run's checkpoint if one exists (full train
        state: params, opt_state, step — exceeds the reference's
        save-only surface). Returns whether training will resume;
        ``train_model`` then continues the optimizer trajectory from
        the restored step."""
        ckpt = Checkpointer(self.run_dir)
        if not ckpt.exists():
            print(f"no checkpoint under {self.run_dir}; training fresh")
            return False
        self.load_model()
        print(f"resumed from {self.run_dir} at step "
              f"{int(self.state.step)}")
        return True

    @staticmethod
    def print_epoch_stats(
        epoch_index,
        num_epochs,
        mean_loss_train,
        mean_accuracy_train,
        mean_loss_val,
        mean_accuracy_val,
        seconds=None,
    ):
        extra = f"  [{seconds:.1f}s]" if seconds is not None else ""
        print(f"Train Epoch: {epoch_index + 1}/{num_epochs}{extra}")
        print(
            f"\tTrain Loss: {mean_loss_train}"
            f"\tTrain Accuracy: {mean_accuracy_train * 100} %"
        )
        print(
            f"\tValid Loss: {mean_loss_val}"
            f"\tValid Accuracy: {mean_accuracy_val * 100} %"
        )

    @staticmethod
    def get_save_dir(run_directory: str, sub_dir_name: str = "results") -> str:
        path = os.path.join(run_directory, sub_dir_name)
        os.makedirs(path, exist_ok=True)
        return path
