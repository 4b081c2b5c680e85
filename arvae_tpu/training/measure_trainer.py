"""Music AR-VAE trainer (reference ``measurevae/measure_vae_trainer.py``).

The loss is token cross-entropy + β-KLD + AR regularization where the
attribute labels (rhy_complexity / pitch_range / note_density /
contour) are computed **on the fly from the score tensor inside the
jitted step** via the tensorized extractors — the reference does this
per batch in Python through music21 (``measure_vae_trainer.py:167-186``,
its hottest host-side path per SURVEY.md §3.2).
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
from arvae_tpu.data.attributes import MUSIC_REG_TYPE
from arvae_tpu.models.measure_vae import MEASURE_SEQ_LEN, MeasureVAE
from arvae_tpu.ops.losses import (
    kld_loss,
    token_accuracy,
    token_cross_entropy_loss,
    total_reg_loss,
)
from arvae_tpu.training.base import BaseTrainer, TrainState


class MeasureVAETrainer(BaseTrainer):
    def __init__(
        self,
        dataset,
        model: MeasureVAE,
        lr: float = 1e-4,
        reg_type: Tuple[str, ...] = (),
        reg_dim: Tuple[int, ...] = (),
        beta: float = 0.001,
        gamma: float = 1.0,
        capacity: float = 0.0,
        rand: int = 0,
        delta: float = 10.0,
        mesh=None,
        use_pallas: Optional[bool] = None,
    ):
        if dataset.class_name[5:9] == "Chor":
            self.dataset_type = "bach"
        elif dataset.class_name[5:9] == "Folk":
            self.dataset_type = "folk"
        else:
            raise ValueError("Dataset Type not recognized")
        self.attr_dict = MUSIC_REG_TYPE
        self.reverse_attr_dict = {v: k for k, v in self.attr_dict.items()}

        hp = TrainerHParams(
            lr=lr,
            beta=beta,
            capacity=capacity,
            gamma=gamma,
            delta=delta,
            rand=rand,
            reg_type=tuple(reg_type or ()),
            reg_dim=normalize_reg_dim(reg_dim, reg_type),
        )
        super().__init__(dataset, model, hp, mesh=mesh)
        if use_pallas is None:
            use_pallas = False  # XLA fuses the pairwise block as fast (see ops/losses.py)
        self.use_pallas = use_pallas
        # Finalize the corpus before caching the vocab-sized attribute
        # tables: make_dataset can grow the vocabulary past a stale dict
        # cache, and embedding lookups clamp inside jit (silently wrong)
        # rather than raising — catch the undersized model loudly here.
        dataset.get_dataset()
        # process_batch reshapes rows into fixed MEASURE_SEQ_LEN ticks
        # and the tensorized attribute tables assume the same grid — a
        # non-4/4 corpus (18-tick measures) would reshape cleanly and
        # train on bar-straddling windows with no error. Reject loudly.
        ticks = dataset.beat_subdivisions * dataset.time_sig_num
        if ticks != MEASURE_SEQ_LEN:
            raise ValueError(
                f"dataset measures span {ticks} ticks "
                f"({dataset.time_sig_num}/{dataset.time_sig_den} × "
                f"{dataset.beat_subdivisions} subdivisions) but MeasureVAE "
                f"is built on {MEASURE_SEQ_LEN}-tick measures"
            )
        if model.num_notes < len(dataset.note2index_dicts):
            raise ValueError(
                f"model num_notes={model.num_notes} is smaller than the "
                f"finalized vocabulary ({len(dataset.note2index_dicts)}); "
                "size the model AFTER dataset.get_dataset() — the corpus "
                "build grew the vocab past the cached dict file"
            )
        self.attrs = dataset.attrs  # MusicAttributes tables

    # -- identity --------------------------------------------------------------

    def model_repr(self) -> str:
        # Non-default decoder variants get their own run dirs, mirroring
        # how the reference bakes the decoder __repr__ into the path.
        decoder_tag = {
            "hier": "", "sr": "_SRDecoder", "sr-no-input": "_SRDecoderNoInput"
        }.get(getattr(self.model, "decoder_type", "hier"), "")
        if getattr(self.model, "sampling", "argmax") != "argmax":
            decoder_tag += "_" + self.model.sampling
        return (
            self.dataset_type + "_MeasureVAE" + decoder_tag
            + trainer_config_string(self.hparams)
        )

    # -- state -----------------------------------------------------------------

    def init_params(self, rng):
        score = jnp.zeros((1, MEASURE_SEQ_LEN), jnp.int32)
        k1, k2, k3 = jax.random.split(rng, 3)
        variables = self.model.init(
            {"params": k1, "sample": k2, "dropout": k3}, score, train=True
        )
        return variables["params"]

    # -- batches ---------------------------------------------------------------

    def process_batch(self, batch):
        """n-bar rows → per-measure rows
        (reference measure_vae_trainer.py:75-93)."""
        score, metadata = batch
        score = np.asarray(score, np.int32)
        metadata = np.asarray(metadata, np.int32)
        b = score.shape[0]
        score = score.reshape(b * (score.shape[1] // MEASURE_SEQ_LEN),
                              MEASURE_SEQ_LEN)
        metadata = metadata.reshape(score.shape[0], -1)
        return score, metadata

    # -- attribute labels -------------------------------------------------------

    def compute_attribute_labels(self, score, attr_list=None):
        """(B, A) in MUSIC_REG_TYPE order
        (reference measure_vae_trainer.py:167-186)."""
        return self.attrs.compute_labels(
            jnp.asarray(score),
            attr_list or list(self.attr_dict.keys()),
        )

    # -- loss -------------------------------------------------------------------

    def _loss_fn(self, params, batch, key, train: bool, hyper=None):
        score, _ = batch
        h = self.hparams
        hy = hyper if hyper is not None else self.loss_hyper()
        out = self.model.apply(
            {"params": params}, score, train=train, rng_key=key
        )
        recons_loss = token_cross_entropy_loss(out.weights, score)
        dist_loss = kld_loss(out.z_mean, out.z_log_std, hy["beta"],
                             hy["capacity"])
        loss = recons_loss + dist_loss
        metrics = {"recons_loss": recons_loss, "dist_loss": dist_loss}
        if h.use_reg_loss:
            labels = self.attrs.compute_labels(score)
            reg_pairs = tuple((d, d) for d in h.reg_dim)
            reg_loss = total_reg_loss(
                out.z_tilde, labels, reg_pairs, hy["gamma"], hy["delta"],
                use_pallas=self.use_pallas,
            )
            loss = loss + reg_loss
            metrics["reg_loss"] = reg_loss
        metrics["loss"] = loss
        metrics["accuracy"] = token_accuracy(out.weights, score)
        return loss, metrics

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

    # -- forward helpers ---------------------------------------------------------

    def _forward_fn(self):
        if not hasattr(self, "_fwd_jit"):

            def fwd(params, score, key):
                return self.model.apply(
                    {"params": params}, score, train=False, rng_key=key
                )

            self._fwd_jit = jax.jit(fwd)
        return self._fwd_jit

    def _decoder_fn(self):
        if not hasattr(self, "_dec_jit"):

            def dec(params, z, dummy_score, key):
                return self.model.apply(
                    {"params": params}, z, dummy_score, train=False, key=key,
                    method="decode",
                )

            self._dec_jit = jax.jit(dec)
        return self._dec_jit

    def decode_latent_codes(self, latent_codes: np.ndarray):
        """Latents → (Score, token tensor)
        (reference measure_vae_trainer.py:281-288)."""
        state = self.ensure_state()
        dummy = np.zeros(
            (latent_codes.shape[0],
             self.dataset.beat_subdivisions * 4),
            np.int32,
        )
        _, samples = self._decoder_fn()(
            state.params, jnp.asarray(latent_codes, jnp.float32),
            jnp.asarray(dummy), jax.random.fold_in(self._base_key, 42),
        )
        samples = np.asarray(samples)
        score = self.dataset.tensor_to_m21score(samples)
        return score, samples

    # -- evaluation ---------------------------------------------------------------

    def compute_representations(self, data_loader, num_batches: int = 200,
                                batch_size: int = 256,
                                use_device: bool = True):
        state = self.ensure_state()
        sp = self._device_eval_split() if use_device else None
        if sp is not None and sp.n > 0:

            def encode_batch(params, score, labs, key, i):
                out = self.model.apply(
                    {"params": params}, score, train=False,
                    rng_key=jax.random.fold_in(key, i),
                )
                return out.z_tilde, self.attrs.compute_labels(score)

            latent_codes, attributes = self._device_harvest_scan(
                sp, batch_size, num_batches, encode_batch, "harvest")
        else:
            fwd = self._forward_fn()
            latent_codes, attributes = [], []
            for batch_id, batch in enumerate(data_loader):
                score, _ = self.process_batch(batch)
                key = jax.random.fold_in(self._base_key,
                                         7_000_000 + batch_id)
                out = fwd(state.params, jnp.asarray(score), key)
                latent_codes.append(np.asarray(out.z_tilde))
                attributes.append(
                    np.asarray(self.compute_attribute_labels(score))
                )
                if batch_id == num_batches:
                    break
            latent_codes = np.concatenate(latent_codes, 0)
            attributes = np.concatenate(attributes, 0)
        attr_list = list(self.attr_dict.keys())
        return latent_codes, attributes, attr_list

    def compute_eval_metrics(self, batch_size: int = 256):
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

        # host loader only for the device-split-less fallback (building
        # it re-tensorizes the corpus on the host)
        sp = self._device_eval_split()
        data_loader = None
        if sp is None or sp.n == 0:
            _, _, data_loader = self.dataset.data_loaders(
                batch_size=batch_size)
            if len(data_loader) == 0:  # eval split smaller than batch
                _, _, data_loader = self.dataset.data_loaders(
                    batch_size=max(
                        1, data_loader.base.n if hasattr(data_loader, "base")
                        else data_loader.n)
                )
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
        self.metrics["protocol"] = self.protocol_dict()
        os.makedirs(self.run_dir, exist_ok=True)
        with open(results_fp, "w") as outfile:
            json.dump(self.metrics, outfile, indent=2)
        return self.metrics

    def test_model(self, batch_size: int = 256) -> Dict[str, float]:
        """Token CE + accuracy over the test split (reference
        measure_vae_trainer.py:188-214). Rides the device-resident
        split as ONE jitted scan when available — the host loader costs
        a ~100-200 ms device_put per batch on this transport — with the
        host path as fallback."""
        state = self.ensure_state()
        sp = self._device_eval_split()
        if sp is not None and sp.n > 0:

            def batch_metrics(params, score, labs, key):
                out = self.model.apply(
                    {"params": params}, score, train=False, rng_key=key,
                )
                return (token_cross_entropy_loss(out.weights, score),
                        token_accuracy(out.weights, score))

            mean_loss, mean_acc = self._device_test_sweep(
                sp, batch_size, batch_metrics)
        else:
            _, _, gen_test = self.dataset.data_loaders(batch_size)
            if len(gen_test) == 0:
                _, _, gen_test = self.dataset.data_loaders(
                    max(1, gen_test.base.n if hasattr(gen_test, "base")
                        else gen_test.n)
                )
            fwd = self._forward_fn()
            total_loss, total_acc, n = 0.0, 0.0, 0
            for sample_id, batch in enumerate(gen_test):
                score, _ = self.process_batch(batch)
                key = jax.random.fold_in(self._base_key,
                                         9_000_000 + sample_id)
                out = fwd(state.params, jnp.asarray(score), key)
                total_loss += float(
                    token_cross_entropy_loss(out.weights, jnp.asarray(score))
                )
                total_acc += float(
                    token_accuracy(out.weights, jnp.asarray(score))
                )
                n += 1
            n = max(n, 1)
            mean_loss, mean_acc = total_loss / n, total_acc / n
        print("Test Epoch:")
        print("\tTest Loss: ", mean_loss, "\n\tTest Accuracy: ",
              mean_acc * 100)
        return {"test_loss": mean_loss, "test_acc": mean_acc}

    # -- artifacts (reference measure_vae_trainer.py:245-352) --------------------

    def plot_data_dist(self, latent_codes, attributes, attr_str, dim1=0, dim2=1):
        from arvae_tpu.utils.plotting import plot_dim

        save_filename = os.path.join(
            self.get_save_dir(self.run_dir), f"data_dist_{attr_str}.png"
        )
        return plot_dim(
            latent_codes, attributes[:, self.attr_dict[attr_str]],
            save_filename, dim1=dim1, dim2=dim2, xlim=4.0, ylim=4.0,
        )

    def compute_latent_interpolations(
        self, latent_code, original_score: "Score", dim1=0, num_points=5
    ):
        """Traversal decoded to measures, original spliced at the center
        (reference measure_vae_trainer.py:290-308)."""
        assert num_points % 2 == 1
        x1 = np.linspace(-4.0, 4.0, num_points)
        z = np.repeat(np.asarray(latent_code, np.float32), num_points, axis=0)
        z[:, dim1] = x1
        score_list, tensor_list = [], []
        for n in range(num_points):
            score, tensor = self.decode_latent_codes(z[n : n + 1])
            score_list.append(score)
            tensor_list.append(tensor)
        score_list[num_points // 2] = original_score
        concatenated = self.dataset.concatenate_scores(score_list)
        tensors = np.concatenate(tensor_list, 0)
        return concatenated, tensors

    def plot_latent_interpolations(self, latent_codes, attr_str,
                                   num_points=10):
        """MIDI + pianoroll artifacts per sample
        (reference measure_vae_trainer.py:256-279)."""
        from arvae_tpu.utils.midi import notes_to_pianoroll
        from arvae_tpu.utils.plotting import plot_pianoroll

        n = min(num_points, latent_codes.shape[0])
        interp_dict = self.compute_eval_metrics()["interpretability"]
        dim = interp_dict[attr_str][0]
        save_dir = self.get_save_dir(self.run_dir)
        for i in range(n):
            original_score, _ = self.decode_latent_codes(
                latent_codes[i : i + 1]
            )
            original_score.write_midi(os.path.join(save_dir,
                                                   f"original_{i}.mid"))
            score, tensor_score = self.compute_latent_interpolations(
                latent_codes[i : i + 1], original_score, dim, num_points=5
            )
            attr_labels = np.asarray(
                self.compute_attribute_labels(tensor_score, [attr_str])
            ).flatten()
            midi_fp = os.path.join(
                save_dir, f"latent_interpolations_{attr_str}_{i}.mid"
            )
            score.write_midi(midi_fp)
            roll = notes_to_pianoroll(score.notes)
            plot_pianoroll(
                roll, attr_labels, attr_str,
                midi_fp.replace(".mid", ".png"),
            )

    def plot_latent_surface(self, attr_str, dim1=0, dim2=1, grid_res=0.5):
        """Attribute surface from decoded samples
        (reference measure_vae_trainer.py:310-352)."""
        from arvae_tpu.utils.plotting import plot_dim

        x = np.arange(-5.0, 5.0, grid_res)
        z1, z2 = np.meshgrid(x, x, indexing="ij")
        num_points = z1.size
        rng = np.random.RandomState(self.hparams.rand)
        z = np.repeat(
            rng.randn(1, self.model.latent_space_dim).astype(np.float32),
            num_points, 0,
        )
        z[:, dim1] = z1.reshape(-1)
        z[:, dim2] = z2.reshape(-1)
        mini = 500
        num_mini = max(num_points // mini, 1)
        labels_all = []
        for i in range(num_mini):
            zb = z[i * mini : (i + 1) * mini]
            _, samples = self.decode_latent_codes(zb)
            samples = samples.reshape(zb.shape[0], -1)
            labels_all.append(
                np.asarray(self.compute_attribute_labels(samples, [attr_str]))
            )
        labels_all = np.concatenate(labels_all, 0)
        z = z[: num_mini * mini]
        save_filename = os.path.join(
            self.get_save_dir(self.run_dir), f"latent_surface_{attr_str}.png"
        )
        plot_dim(z, labels_all, save_filename, dim1=dim1, dim2=dim2)
