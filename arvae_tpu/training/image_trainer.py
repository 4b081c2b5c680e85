"""Image AR-VAE trainer (reference ``imagevae/image_vae_trainer.py``).

One jitted train step computes the full objective
recon + β-capacity-KLD + Σ_dims γ·AR-reg (reference loss at
``image_vae_trainer.py:137-217``); the O(B²) reg block fuses in XLA by
default, with the hand-written Pallas kernel selectable via
``use_pallas`` (see the dispatch note in ops/losses.py). Evaluation
reproduces the
reference protocol: sampled-z latent harvest capped at 201 batches
(``:274-287``), the five-metric suite, test loss/acc, and a
``results_dict.json`` cache with the identical schema (``:289-317``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from arvae_tpu.core.config import (TrainerHParams, normalize_reg_dim,
                                   trainer_config_string)
from arvae_tpu.models.image_vae import MnistVAE
from arvae_tpu.ops.losses import (
    kld_loss,
    pixel_accuracy,
    reconstruction_loss,
    total_reg_loss,
)
from arvae_tpu.training.base import BaseTrainer, TrainState

MNIST_REG_TYPES = {
    "digit_identity": 0,
    "area": 1,
    "length": 2,
    "thickness": 3,
    "slant": 4,
    "width": 5,
    "height": 6,
}

MNIST_NORMALIZATION_FACTORS = {
    "digit_identity": (0, 9),
    "area": (0, 350),
    "length": (0, 100),
    "thickness": (0, 15),
    "slant": (-1.2, 1.2),
    "width": (0, 30),
    "height": (0, 30),
}

DSPRITES_REG_TYPE = {
    "color": 0,
    "shape": 1,
    "scale": 2,
    "orientation": 3,
    "posx": 4,
    "posy": 5,
}

DATASET_REG_TYPE_DICT = {"mnist": MNIST_REG_TYPES, "dsprites": DSPRITES_REG_TYPE}


def get_reg_dim(attr_dict) -> Tuple[int, ...]:
    """All regularizable dims (reference image_vae_trainer.py:55-62)."""
    from arvae_tpu.core.config import expand_reg_dims

    return expand_reg_dims(("all",), attr_dict)


class ImageVAETrainer(BaseTrainer):
    # The conv-stack step keeps gaining from deeper scan-unroll of the
    # dispatch chunk where the music recurrence step does not: measured
    # 3084 / 3181 / 3195 steps/s at unroll 4 / 8 / 16 on the dSprites
    # headline (scripts/bench_unroll_hi.py). 8 takes the >1% win; 16's
    # extra +0.4% is under the adoption bar and doubles the inlined body.
    scan_unroll_default = 8

    def __init__(
        self,
        dataset,
        model: MnistVAE,
        lr: float = 1e-4,
        reg_type: Tuple[str, ...] = (),
        reg_dim: Tuple[int, ...] = (),
        dec_dist: str = "bernoulli",
        beta: float = 4.0,
        gamma: float = 10.0,
        capacity: float = 0.0,
        rand: int = 0,
        delta: float = 1.0,
        mesh=None,
        use_pallas: Optional[bool] = None,
    ):
        name = dataset.__class__.__name__
        if name in ("MorphoMnistDataset", "MnistDataset"):
            self.dataset_type = "mnist"
        elif name == "DspritesDataset":
            self.dataset_type = "dsprites"
        else:
            raise ValueError(f"Dataset type not recognized: {name}")
        self.attr_dict = DATASET_REG_TYPE_DICT[self.dataset_type]
        self.reverse_attr_dict = {v: k for k, v in self.attr_dict.items()}

        hp = TrainerHParams(
            lr=lr,
            beta=beta,
            capacity=capacity,
            gamma=gamma,
            delta=delta,
            dec_dist=dec_dist,
            rand=rand,
            reg_type=tuple(reg_type or ()),
            reg_dim=normalize_reg_dim(reg_dim, reg_type),
        )
        super().__init__(dataset, model, hp, mesh=mesh)
        if use_pallas is None:
            use_pallas = False  # XLA fuses the pairwise block as fast (see ops/losses.py)
        self.use_pallas = use_pallas
        self._example_shape = (
            (1, 1, 28, 28) if self.dataset_type == "mnist" else (1, 1, 64, 64)
        )

    # -- identity -------------------------------------------------------------

    def model_repr(self) -> str:
        base = "MnistVAE" if self.dataset_type == "mnist" else "DspritesVAE"
        return base + trainer_config_string(self.hparams)

    # -- state ------------------------------------------------------------------

    def init_params(self, rng):
        x = jnp.zeros(self._example_shape, jnp.float32)
        k1, k2, k3 = jax.random.split(rng, 3)
        variables = self.model.init(
            {"params": k1, "dropout": k2, "sample": k3}, x, train=True
        )
        return variables["params"]

    # -- batches -----------------------------------------------------------------

    def process_batch(self, batch):
        """(inputs, labels): mnist batches carry (img, digit, morpho) —
        morpho are the labels (reference image_vae_trainer.py:120-135)."""
        if self.dataset_type == "mnist":
            inputs, _, morpho_labels = batch
            return (
                np.asarray(inputs, np.float32),
                np.asarray(morpho_labels, np.float32),
            )
        inputs, labels = batch
        return np.asarray(inputs, np.float32), np.asarray(labels, np.float32)

    # -- loss --------------------------------------------------------------------

    def _loss_fn(self, params, batch, key, train: bool, hyper=None):
        inputs, labels = batch
        h = self.hparams
        hy = hyper if hyper is not None else self.loss_hyper()
        k_drop, k_sample = jax.random.split(key)
        out = self.model.apply(
            {"params": params},
            inputs,
            train=train,
            rngs={"dropout": k_drop, "sample": k_sample},
        )
        recons_loss = reconstruction_loss(out.logits, inputs, h.dec_dist)
        dist_loss = kld_loss(out.z_mean, out.z_log_std, hy["beta"],
                             hy["capacity"])
        loss = recons_loss + dist_loss
        metrics = {"recons_loss": recons_loss, "dist_loss": dist_loss}
        if h.use_reg_loss:
            reg_pairs = tuple((d, d) for d in h.reg_dim)
            reg_loss = total_reg_loss(
                out.z_tilde, labels, reg_pairs, hy["gamma"], hy["delta"],
                use_pallas=self.use_pallas,
            )
            loss = loss + reg_loss
            metrics["reg_loss"] = reg_loss
        metrics["loss"] = loss
        metrics["accuracy"] = pixel_accuracy(jax.nn.sigmoid(out.logits), inputs)
        return loss, metrics

    # -- steps --------------------------------------------------------------------

    def _train_step_core(self, state: TrainState, batch, key):
        grad_fn = jax.value_and_grad(
            lambda p: self._loss_fn(p, batch, key, train=True,
                                    hyper=state.hyper),
            has_aux=True,
        )
        (_, metrics), grads = grad_fn(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1, hyper=state.hyper),
            metrics,
        )

    def _eval_step_core(self, state: TrainState, batch, key):
        _, metrics = self._loss_fn(state.params, batch, key, train=False,
                                   hyper=state.hyper)
        return metrics

    def make_train_step(self):
        return jax.jit(self._train_step_core, donate_argnums=(0,))

    def make_eval_step(self):
        return jax.jit(self._eval_step_core)

    # -- forward helpers -------------------------------------------------------------

    def _forward_fn(self):
        if not hasattr(self, "_fwd_jit"):

            def fwd(params, inputs, key):
                return self.model.apply(
                    {"params": params}, inputs, train=False,
                    rngs={"sample": key},
                )

            self._fwd_jit = jax.jit(fwd)
        return self._fwd_jit

    def decode(self, z: np.ndarray) -> np.ndarray:
        """Sigmoided decoder output for latent codes (host convenience)."""
        if not hasattr(self, "_dec_jit"):

            def dec(params, z):
                logits = self.model.apply(
                    {"params": params}, z, train=False, method="decode"
                )
                return jax.nn.sigmoid(logits)

            self._dec_jit = jax.jit(dec)
        state = self.ensure_state()
        return np.asarray(self._dec_jit(state.params, jnp.asarray(z)))

    # -- evaluation -------------------------------------------------------------------

    def _extract_relevant_attributes(self, attributes):
        attr_list = [
            a for a in self.attr_dict.keys()
            if a not in ("digit_identity", "color")
        ]
        attr_idx = [self.attr_dict[a] for a in attr_list]
        return attributes[:, attr_idx], attr_list

    def _device_harvest(self, batch_size: int, num_batches: int, sp=None,
                        encode_batch=None, tag: str = "harvest"):
        """Latent harvest over a device-resident split — the eval split
        by default, or a caller-provided one, e.g. the epoch runner's
        validation split. ``encode_batch`` overrides the per-batch
        encoding (the fader uses its deterministic encoder + normalized
        labels); the scan/caching machinery lives in
        BaseTrainer._device_harvest_scan."""
        if sp is None:
            sp = self._device_eval_split()

        if encode_batch is None:
            def encode_batch(params, imgs, labs, key, i):
                out = self.model.apply(
                    {"params": params}, imgs, train=False,
                    rngs={"sample": jax.random.fold_in(key, i)},
                )
                return out.z_tilde, labs

        return self._device_harvest_scan(sp, batch_size, num_batches,
                                         encode_batch, tag)

    def compute_representations(self, data_loader, num_batches: int = 200,
                                batch_size: int = 128,
                                use_device: bool = True,
                                split=None):
        """Sampled-z latent harvest (reference image_vae_trainer.py:274-287).

        ``split`` overrides which device-resident split is harvested
        (e.g. the epoch runner's validation split for the per-epoch
        hook); default is the dataset's eval split."""
        sp = (split if split is not None
              else (self._device_eval_split() if use_device else None))
        if sp is not None and sp.n > 0:
            latent_codes, attributes = self._device_harvest(
                batch_size, num_batches, sp=sp
            )
        else:
            state = self.ensure_state()
            fwd = self._forward_fn()
            latent_codes, attributes = [], []
            for sample_id, batch in enumerate(data_loader):
                inputs, labels = self.process_batch(batch)
                key = jax.random.fold_in(self._base_key,
                                         7_000_000 + sample_id)
                out = fwd(state.params, jnp.asarray(inputs), key)
                latent_codes.append(np.asarray(out.z_tilde))
                attributes.append(labels)
                if sample_id == num_batches:
                    break
            latent_codes = np.concatenate(latent_codes, 0)
            attributes = np.concatenate(attributes, 0)
        attributes, attr_list = self._extract_relevant_attributes(attributes)
        return latent_codes, attributes, attr_list

    def compute_eval_metrics(self, batch_size: int = 128):
        """Five-metric suite + test loss, cached as results_dict.json
        (reference image_vae_trainer.py:289-317)."""
        from arvae_tpu.eval import (
            compute_correlation_score,
            compute_interpretability_metric,
            compute_mig,
            compute_modularity,
            compute_sap_score,
        )

        results_fp = os.path.join(self.run_dir, "results_dict.json")
        if os.path.exists(results_fp):
            with open(results_fp, "r") as infile:
                self.metrics = json.load(infile)
            return self.metrics

        # the host loader exists only for the device-split-less fallback
        # — building it copies the dataset on the host (~380 MB for full
        # dSprites), so skip it when the device path will be taken
        sp = self._device_eval_split()
        data_loader = None
        if sp is None or sp.n == 0:
            _, _, data_loader = self.dataset.data_loaders(
                batch_size=batch_size)
        latent_codes, attributes, attr_list = self.compute_representations(
            data_loader
        )
        self.metrics = {
            "interpretability": compute_interpretability_metric(
                latent_codes, attributes, attr_list
            )
        }
        self.metrics.update(compute_correlation_score(latent_codes, attributes))
        self.metrics.update(compute_modularity(latent_codes, attributes))
        self.metrics.update(compute_mig(latent_codes, attributes))
        self.metrics.update(compute_sap_score(latent_codes, attributes))
        self.metrics.update(self.test_model(batch_size=batch_size))
        if self.dataset_type == "mnist":
            resnet_metrics = self.get_resnet_accuracy()
            if resnet_metrics is not None:
                self.metrics.update(resnet_metrics)
        self.metrics["protocol"] = self.protocol_dict()
        os.makedirs(self.run_dir, exist_ok=True)
        with open(results_fp, "w") as outfile:
            json.dump(self.metrics, outfile, indent=2)
        return self.metrics

    def test_model(self, batch_size: int = 128) -> Dict[str, float]:
        """Recon loss/acc on the eval split (reference
        image_vae_trainer.py:582-621)."""
        from arvae_tpu.ops.losses import pixel_accuracy as pix_acc
        from arvae_tpu.ops.losses import reconstruction_loss as rec_loss

        state = self.ensure_state()
        sp = self._device_eval_split()
        if sp is not None and sp.n > 0:
            # clamp like _device_harvest: a split smaller than
            # batch_size would gather out-of-range rows (zero rows on
            # the sharded path, duplicated tail rows on the replicated
            # one) and corrupt the reported test loss/acc
            def batch_metrics(params, imgs, labs, key):
                out = self.model.apply(
                    {"params": params}, imgs, train=False,
                    rngs={"sample": key},
                )
                return (rec_loss(out.logits, imgs, self.hparams.dec_dist),
                        pix_acc(jax.nn.sigmoid(out.logits), imgs))

            mean_loss, mean_acc = self._device_test_sweep(
                sp, batch_size, batch_metrics)
        else:
            _, _, gen_test = self.dataset.data_loaders(batch_size)
            fwd = self._forward_fn()
            total_loss, total_acc, n = 0.0, 0.0, 0
            for sample_id, batch in enumerate(gen_test):
                inputs, _ = self.process_batch(batch)
                key = jax.random.fold_in(self._base_key,
                                         9_000_000 + sample_id)
                out = fwd(state.params, jnp.asarray(inputs), key)
                total_loss += float(
                    rec_loss(out.logits, jnp.asarray(inputs),
                             self.hparams.dec_dist)
                )
                total_acc += float(
                    pix_acc(jax.nn.sigmoid(out.logits), jnp.asarray(inputs))
                )
                n += 1
            n = max(n, 1)
            mean_loss, mean_acc = total_loss / n, total_acc / n
        print("Test Epoch:")
        print("\tTest Loss: ", mean_loss, "\n\tTest Accuracy: ",
              mean_acc * 100)
        return {"test_loss": mean_loss, "test_acc": mean_acc}

    def get_resnet_accuracy(self) -> Optional[Dict]:
        """Digit-identity preservation judged by an external ResNet
        (reference image_vae_trainer.py:319-368). Returns None when no
        trained judge checkpoint exists."""
        from arvae_tpu.training.resnet_judge import load_judge, judge_accuracy

        judge = load_judge()
        if judge is None:
            print("No MnistRESNET checkpoint found - skipping digit_pred_acc "
                  "(train one with test_mnist.py)")
            return None
        return judge_accuracy(self, judge)

    # -- artifact generation (reference image_vae_trainer.py:370-580) -----------

    def plot_data_dist(self, latent_codes, attributes, attr_str, dim1=0, dim2=1):
        """``attributes`` is the reduced matrix from
        ``compute_representations`` (digit_identity/color dropped), so
        the column is located in the reduced order — NOT via
        ``self.attr_dict``, whose indices address the full matrix (the
        reference has exactly that off-by-one,
        image_vae_trainer.py:370-379)."""
        from arvae_tpu.utils.plotting import plot_dim

        attr_list = [
            a for a in self.attr_dict.keys()
            if a not in ("digit_identity", "color")
        ]
        save_filename = os.path.join(
            self.get_save_dir(self.run_dir), f"data_dist_{attr_str}.png"
        )
        return plot_dim(
            latent_codes,
            attributes[:, attr_list.index(attr_str)],
            save_filename,
            dim1=dim1,
            dim2=dim2,
            xlim=4.0,
            ylim=4.0,
        )

    def compute_latent_interpolations(self, latent_code, dim1=0, num_points=10):
        """1-D traversal grid over [-4, 4]
        (reference image_vae_trainer.py:381-389)."""
        from arvae_tpu.utils.plotting import make_grid

        x1 = np.linspace(-4.0, 4.0, num_points)
        z = np.repeat(np.asarray(latent_code), num_points, axis=0)
        z[:, dim1] = x1
        outputs = self.decode(z)
        return make_grid(outputs, nrow=num_points, pad_value=1.0)

    def compute_latent_interpolations2d(
        self, latent_code, dim1=0, dim2=1, num_points=10
    ):
        """2-D traversal grid (reference image_vae_trainer.py:391-403)."""
        from arvae_tpu.utils.plotting import make_grid

        x = np.linspace(-4.0, 4.0, num_points)
        z1, z2 = np.meshgrid(x, x, indexing="ij")
        total = num_points * num_points
        z = np.repeat(np.asarray(latent_code), total, axis=0)
        z[:, dim1] = z1.reshape(-1)
        z[:, dim2] = z2.reshape(-1)
        outputs = self.decode(z)
        return make_grid(outputs, nrow=num_points, pad_value=1.0)

    def plot_latent_reconstructions(self, num_points=10):
        """Original/reconstruction dumps
        (reference image_vae_trainer.py:405-428)."""
        from arvae_tpu.utils.plotting import save_image_grid

        _, _, data_loader = self.dataset.data_loaders(batch_size=num_points)
        state = self.ensure_state()
        fwd = self._forward_fn()
        for sample_id, batch in enumerate(data_loader):
            inputs, _ = self.process_batch(batch)
            key = jax.random.fold_in(self._base_key, 5_000_000)
            out = fwd(state.params, jnp.asarray(inputs), key)
            recons = np.asarray(jax.nn.sigmoid(out.logits))
            save_dir = self.get_save_dir(self.run_dir)
            save_image_grid(
                inputs, os.path.join(save_dir, f"r_original_{sample_id}.png"),
                nrow=num_points, pad_value=1.0,
            )
            save_image_grid(
                recons, os.path.join(save_dir, f"r_recons_{sample_id}.png"),
                nrow=num_points, pad_value=1.0,
            )
            break

    def create_latent_gifs(self, sample_id=9, num_points=10):
        """Traversal GIF over every regularized attribute
        (reference image_vae_trainer.py:430-464)."""
        from arvae_tpu.utils.plotting import (
            grid_to_pil,
            make_grid,
            save_gif_from_list,
        )

        x1 = np.linspace(-4.0, 4.0, num_points)
        _, _, data_loader = self.dataset.data_loaders(batch_size=1)
        interp_dict = self.compute_eval_metrics()["interpretability"]
        state = self.ensure_state()
        fwd = self._forward_fn()
        for sid, batch in enumerate(data_loader):
            if sid != sample_id:
                if sid > sample_id:
                    break
                continue
            inputs, _ = self.process_batch(batch)
            key = jax.random.fold_in(self._base_key, 6_000_000 + sid)
            out = fwd(state.params, jnp.asarray(inputs), key)
            z = np.repeat(np.asarray(out.z_tilde), num_points, axis=0)
            outputs = []
            for attr_str in self.attr_dict.keys():
                if attr_str in ("digit_identity", "color"):
                    continue
                dim = interp_dict[attr_str][0]
                z_copy = z.copy()
                z_copy[:, dim] = x1
                outputs.append(self.decode(z_copy))
            stacked = np.stack(outputs, axis=1)  # (T, n_attr, 1, H, W)
            frames = []
            for n in range(stacked.shape[0]):
                grid = make_grid(
                    stacked[n, :, 0:1, :, :].reshape(-1, 1, *stacked.shape[-2:]),
                    nrow=stacked.shape[1],
                    padding=2,
                    pad_value=1.0,
                )
                frames.append(grid_to_pil(grid))
            gif_fp = os.path.join(
                self.get_save_dir(self.run_dir),
                f"gif_interpolations_{self.dataset_type}_{sample_id}.gif",
            )
            save_gif_from_list(frames, gif_fp)
            break

    def plot_latent_interpolations(self, attr_str="slant", num_points=10):
        """Per-attribute interpolation PNGs for the reference's fixed
        sample set (image_vae_trainer.py:466-506)."""
        from arvae_tpu.utils.plotting import save_image_grid

        sample_ids = {5, 1, 30, 19, 23, 21, 17, 61, 9, 28}
        x1 = np.linspace(-4.0, 4.0, num_points)
        _, _, data_loader = self.dataset.data_loaders(batch_size=1)
        interp_dict = self.compute_eval_metrics()["interpretability"]
        dim = interp_dict[attr_str][0]
        state = self.ensure_state()
        fwd = self._forward_fn()
        save_dir = self.get_save_dir(self.run_dir)
        for sample_id, batch in enumerate(data_loader):
            if sample_id in sample_ids:
                inputs, _ = self.process_batch(batch)
                key = jax.random.fold_in(self._base_key, 6_500_000 + sample_id)
                out = fwd(state.params, jnp.asarray(inputs), key)
                recons = np.asarray(jax.nn.sigmoid(out.logits))
                z = np.repeat(np.asarray(out.z_tilde), num_points, axis=0)
                z[:, dim] = x1
                outputs = self.decode(z)
                save_image_grid(
                    outputs,
                    os.path.join(
                        save_dir,
                        f"latent_interpolations_{attr_str}_{sample_id}.png",
                    ),
                    nrow=num_points, pad_value=1.0,
                )
                save_image_grid(
                    inputs, os.path.join(save_dir, f"original_{sample_id}.png"),
                    nrow=1, pad_value=1.0,
                )
                save_image_grid(
                    recons, os.path.join(save_dir, f"recons_{sample_id}.png"),
                    nrow=1, pad_value=1.0,
                )
            if sample_id == 62:
                break

    def plot_latent_interpolations2d(self, attr_str1, attr_str2, num_points=10):
        """2-D interpolation PNG (reference image_vae_trainer.py:508-552)."""
        from arvae_tpu.utils.plotting import save_image_grid, make_grid

        _, _, data_loader = self.dataset.data_loaders(batch_size=1)
        interp_dict = self.compute_eval_metrics()["interpretability"]
        dim1 = interp_dict[attr_str1][0]
        dim2 = interp_dict[attr_str2][0]
        state = self.ensure_state()
        fwd = self._forward_fn()
        save_dir = self.get_save_dir(self.run_dir)
        for sample_id, batch in enumerate(data_loader):
            if sample_id == 9:
                inputs, _ = self.process_batch(batch)
                key = jax.random.fold_in(self._base_key, 6_600_000)
                out = fwd(state.params, jnp.asarray(inputs), key)
                grid = self.compute_latent_interpolations2d(
                    np.asarray(out.z_tilde), dim1, dim2, num_points
                )
                from arvae_tpu.utils.plotting import grid_to_pil

                grid_to_pil(grid).save(
                    os.path.join(
                        save_dir,
                        f"latent_interpolations_2d_({attr_str1},{attr_str2})"
                        f"_{sample_id}.png",
                    )
                )
            if sample_id == 10:
                break

    def plot_latent_surface(self, attr_str, dim1=0, dim2=1, grid_res=0.1):
        """Latent surface labeled by re-measured morphometrics
        (reference image_vae_trainer.py:554-580)."""
        from arvae_tpu.utils.plotting import plot_dim

        x = np.arange(-5.0, 5.0, grid_res)
        z1, z2 = np.meshgrid(x, x, indexing="ij")
        num_points = z1.size
        rng = np.random.RandomState(self.hparams.rand)
        z = np.repeat(
            rng.randn(1, self.model.z_dim).astype(np.float32), num_points, 0
        )
        z[:, dim1] = z1.reshape(-1)
        z[:, dim2] = z2.reshape(-1)

        mini_batch = 500
        num_mini = max(num_points // mini_batch, 1)
        labels_all = []
        for i in range(num_mini):
            zb = z[i * mini_batch : (i + 1) * mini_batch]
            outputs = self.decode(zb)
            labels_all.append(self.compute_mnist_morpho_labels(outputs, attr_str))
        labels_all = np.concatenate(labels_all, 0)
        z = z[: num_mini * mini_batch]
        save_filename = os.path.join(
            self.get_save_dir(self.run_dir), f"latent_surface_{attr_str}.png"
        )
        plot_dim(z, labels_all, save_filename, dim1=dim1, dim2=dim2)

    def compute_mnist_morpho_labels(self, outputs, morpho_attr_str=None):
        """Re-measures morphometrics of decoded images on host with a
        process pool (reference image_vae_trainer.py:668-674)."""
        import multiprocessing

        from arvae_tpu.data.morphomnist.measure import measure_batch

        a = np.asarray(outputs).squeeze(axis=1)
        with multiprocessing.Pool() as pool:
            labels = measure_batch(a, pool=pool).values
        if morpho_attr_str is not None:
            labels = labels[:, self.attr_dict[morpho_attr_str] - 1]
        return labels

    # -- per-epoch eval hook (tensorboard images/metrics) -----------------------

    def eval_model(self, data_loader, epoch_num: int = 0):
        """Per-epoch tensorboard evaluation: interpretability scalars,
        reconstruction grid, attribute-distribution scatter and a
        latent-traversal grid (reference image_vae_trainer.py:219-259)."""
        if self.writer is None:
            return None
        from arvae_tpu.eval import compute_interpretability_metric
        from arvae_tpu.utils.plotting import make_grid

        # Per-epoch hook reflects *validation* data. When a training run
        # is active the epoch runner already holds the validation split
        # in HBM — harvest from it (zero per-batch host transfers);
        # otherwise fall back to the host loader we were given.
        val_sp = self._device_val_split()
        if val_sp is None and data_loader is None:
            # train_model skips building host loaders on the device
            # path; this branch only triggers when the runner's val
            # split is empty (tiny datasets)
            _, data_loader, _ = self.dataset.data_loaders(
                batch_size=128, split=(0.70, 0.20))
        latent_codes, attributes, attr_list = self.compute_representations(
            data_loader, num_batches=20, use_device=False, split=val_sp
        )
        interp_metrics = compute_interpretability_metric(
            latent_codes, attributes, attr_list
        )
        for attr in interp_metrics.keys():
            self.writer.add_scalar(
                "interpretability_metric/" + attr,
                interp_metrics[attr][1],
                epoch_num,
            )

        # reconstruction comparison on the first val batch — the same 16
        # rows every epoch, so gather them from the device split once and
        # cache; host-loader fallback otherwise
        state = self.ensure_state()
        fwd = self._forward_fn()
        if not hasattr(self, "_val_grid_inputs"):
            if val_sp is not None and val_sp.n > 0:
                # a split smaller than 16 rows just yields a smaller grid
                # (data_loader is None on the device path, so there is
                # no host fallback to reach for)
                k = min(16, val_sp.n)
                imgs, _ = jax.jit(
                    lambda im, lb: val_sp.gather_batch(
                        im, lb, jnp.arange(k, dtype=jnp.int32))
                )(val_sp.images, val_sp.labels)
                self._val_grid_inputs = imgs
            else:
                first = next(iter(data_loader))
                inputs, _ = self.process_batch(first)
                self._val_grid_inputs = jnp.asarray(inputs[:16])
        inputs = self._val_grid_inputs
        out = fwd(state.params, inputs,
                  jax.random.fold_in(self._base_key, 8_000_000 + epoch_num))
        recons = np.asarray(jax.nn.sigmoid(out.logits))
        comparison = np.concatenate([inputs[:16], recons[:16]], axis=0)
        self.writer.add_image(
            "reconstruction",
            make_grid(comparison, nrow=min(16, len(inputs)), pad_value=1.0),
            epoch_num,
        )

        # attribute scatter + traversal grid (reference :234-259)
        if len(self.hparams.reg_dim) == 0:
            attr_str = "slant" if self.dataset_type == "mnist" else "shape"
            dim1, dim2 = 0, 1
        else:
            attr_str = self.reverse_attr_dict[self.hparams.reg_dim[0]]
            dim1 = self.hparams.reg_dim[0]
            dim2 = (
                self.hparams.reg_dim[1]
                if len(self.hparams.reg_dim) > 1 else 0
            )
        from arvae_tpu.utils.plotting import plot_dim

        # (the reference indexes the reduced attribute matrix with
        # full-dict indices — image_vae_trainer.py:370-379 — an
        # off-by-one; the column is located by name here)
        col = attr_list.index(attr_str) if attr_str in attr_list else 0
        img = plot_dim(
            latent_codes, attributes[:, col],
            os.path.join(self.get_save_dir(self.run_dir),
                         f"data_dist_{attr_str}.png"),
            dim1=dim1, dim2=dim2, xlim=4.0, ylim=4.0,
        )
        self.writer.add_image(
            "attribute_distribution", np.transpose(img, (2, 0, 1)), epoch_num
        )
        interp = self.compute_latent_interpolations(latent_codes[:1], dim1)
        self.writer.add_image("interpolations", interp, epoch_num)
        return {"interpretability": interp_metrics}
