"""Offline analysis of trained MeasureVAE models with a frozen decoder
(reference ``measurevae/vae_tester.py:19-533`` + ``vae_tester_glsr.py``).

Covers the full reference surface: interpretability probe (discrete MI
+ linear regression), test loss/acc, two-point and attribute-dimension
interpolations rendered as scores/MIDI, latent scatters by attribute,
attribute surfaces from decoded samples, PCA/t-SNE projections, and the
transposition-cluster plot.
"""

from __future__ import annotations

import os
import random
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from sklearn.decomposition import PCA
from sklearn.linear_model import LinearRegression
from sklearn.manifold import TSNE
from sklearn.metrics import mutual_info_score

from arvae_tpu.data.music_theory import END_SYMBOL, START_SYMBOL
from arvae_tpu.models.measure_vae import MEASURE_SEQ_LEN
from arvae_tpu.ops.losses import token_accuracy, token_cross_entropy_loss


class VAETester:
    """Frozen-decoder analysis driver around a MeasureVAETrainer."""

    def __init__(self, trainer, plots_dir: Optional[str] = None):
        self.trainer = trainer
        self.dataset = trainer.dataset
        self.model = trainer.model
        self.z_dim = trainer.model.latent_space_dim
        self.measure_seq_len = MEASURE_SEQ_LEN
        self.plots_dir = plots_dir or os.path.join(trainer.run_dir, "plots")
        os.makedirs(self.plots_dir, exist_ok=True)
        self._rng = random.Random(0)

    # -- harvest helpers -----------------------------------------------------

    def _encode_batches(self, gen, attr_type: Optional[str], sample: bool,
                        max_batches: int = 200, return_scores: bool = False):
        """Encodes up to max_batches+1 batches — the break sits after
        the append, reproducing the reference's cap semantics
        (vae_tester.py / compute_representations encode 201 batches at
        the documented 200 cap)."""
        state = self.trainer.ensure_state()
        fwd = self.trainer._forward_fn()
        z_all, attr_all, scores = [], [], []
        for sample_id, batch in enumerate(gen):
            score, _ = self.trainer.process_batch(batch)
            key = jax.random.fold_in(jax.random.key(1), sample_id)
            out = fwd(state.params, jnp.asarray(score), key)
            z = out.z_tilde if sample else out.z_mean
            z_all.append(np.asarray(z))
            if return_scores:
                scores.append(score)
            if attr_type is not None:
                attr_all.append(self._attr(score, attr_type))
            if sample_id >= max_batches:
                break
        z_all = np.concatenate(z_all, 0)
        attr_all = np.concatenate(attr_all, 0) if attr_all else None
        if return_scores:
            return z_all, attr_all, scores
        return z_all, attr_all

    def _attr(self, score, attr_type: str) -> np.ndarray:
        ds = self.dataset
        fns = {
            "rhy_complexity": ds.get_rhy_complexity,
            "num_notes": ds.get_note_density_in_measure,
            "note_range": ds.get_pitch_range_in_measure,
            "rhy_entropy": ds.get_rhythmic_entropy,
            "beat_strength": ds.get_beat_strength,
        }
        return np.asarray(fns[attr_type](score))

    # -- interpretability probe (reference vae_tester.py:58-111) -------------

    def test_interpretability(self, batch_size: int, attr_type: str
                              ) -> Tuple[int, float]:
        _, _, gen_test = self.dataset.data_loaders(
            batch_size=batch_size, split=(0.01, 0.01)
        )
        z_all, attr_all = self._encode_batches(gen_test, attr_type, sample=True)
        # The reference feeds raw float latents to the *categorical*
        # sklearn mutual_info_score (vae_tester.py:58-111): every float
        # is its own category, so MI(z_i; attr) == H(attr) for EVERY
        # dim and argmax degenerates to dim 0 regardless of which dim
        # encodes the attribute. Per the capability-not-the-bug policy
        # (SURVEY §2), quantile-bin the latents first so the probe
        # actually discriminates dims.
        mutual_info = np.zeros(self.z_dim)
        n_bins = max(2, min(20, len(z_all) // 20))
        for i in range(self.z_dim):
            edges = np.quantile(z_all[:, i], np.linspace(0, 1, n_bins + 1))
            binned = np.clip(
                np.searchsorted(edges[1:-1], z_all[:, i]), 0, n_bins - 1)
            mutual_info[i] = mutual_info_score(binned, attr_all)
        dim = int(np.argmax(mutual_info))
        reg = LinearRegression().fit(z_all[:, dim : dim + 1], attr_all)
        score = float(reg.score(z_all[:, dim : dim + 1], attr_all))
        return dim, score

    # -- test loss (reference vae_tester.py:113-129, 207-253) -----------------

    def test_model(self, batch_size: int) -> Tuple[float, float]:
        _, _, gen_test = self.dataset.data_loaders(
            batch_size=batch_size, split=(0.01, 0.01)
        )
        state = self.trainer.ensure_state()
        fwd = self.trainer._forward_fn()
        mean_loss, mean_acc, n = 0.0, 0.0, 0
        for sample_id, batch in enumerate(gen_test):
            score, _ = self.trainer.process_batch(batch)
            out = fwd(state.params, jnp.asarray(score),
                      jax.random.fold_in(jax.random.key(2), sample_id))
            mean_loss += float(
                token_cross_entropy_loss(out.weights, jnp.asarray(score))
            )
            mean_acc += float(token_accuracy(out.weights, jnp.asarray(score)))
            n += 1
        n = max(n, 1)
        print("Test Epoch:")
        print("\tTest Loss: ", mean_loss / n,
              "\n\tTest Accuracy: ", mean_acc / n * 100)
        return mean_loss / n, mean_acc / n

    # -- interpolations (reference vae_tester.py:131-205) ----------------------

    def decode_mid_point(self, z1: np.ndarray, z2: np.ndarray, n: int
                         ) -> np.ndarray:
        """Decode z1, n interpolants, z2 → one (1, (n+2)*24) tensor."""
        assert n >= 1
        zs = [z1]
        for i in range(n):
            zs.append(z1 + (z2 - z1) * (i + 1) / (n + 1))
        zs.append(z2)
        # ONE batched decode: per-point batch-1 decoder executions pay
        # this backend's per-call RPC overhead (~0.05-1 s each), which
        # turns a traversal sweep into minutes of dead time
        z_batch = np.concatenate(
            [np.asarray(z, np.float32).reshape(1, -1) for z in zs], axis=0)
        _, samples = self.trainer.decode_latent_codes(z_batch)
        return np.asarray(samples).reshape(1, -1)

    def test_interpolation(self, tensor_score1, tensor_score2, n: int = 1):
        """Latent interpolation between two measures → Score."""
        state = self.trainer.ensure_state()
        fwd = self.trainer._forward_fn()
        out1 = fwd(state.params, jnp.asarray(tensor_score1), jax.random.key(0))
        out2 = fwd(state.params, jnp.asarray(tensor_score2), jax.random.key(1))
        tensor = self.decode_mid_point(
            np.asarray(out1.z_mean), np.asarray(out2.z_mean), n
        )
        return self.dataset.tensor_to_m21score(tensor)

    def test_interp(self, n: int = 10):
        """Interpolate two random val/test measures, write MIDI
        (reference vae_tester.py:131-150; .show() becomes a .mid file)."""
        _, gen_val, gen_test = self.dataset.data_loaders(
            batch_size=1, split=(0.01, 0.5)
        )
        pick = lambda gen: self.trainer.process_batch(
            list(gen)[self._rng.randint(0, len(gen) - 1)]
        )[0]
        score = self.test_interpolation(pick(gen_test), pick(gen_val), n)
        fp = os.path.join(self.plots_dir, "interp_two_point.mid")
        score.write_midi(fp)
        return score

    def test_attr_reg_interpolations(self, num_points=10, dim=0,
                                     num_interps=20):
        """Traversals along a regularized dim → MIDI files
        (reference vae_tester.py:194-205)."""
        rng = np.random.RandomState(0)
        for i in range(num_points):
            z = rng.randn(1, self.z_dim).astype(np.float32)
            z1, z2 = z.copy(), z.copy()
            z1[:, dim] = -3.0
            z2[:, dim] = 3.0
            tensor = self.decode_mid_point(z1, z2, num_interps)
            score = self.dataset.tensor_to_m21score(tensor)
            score.write_midi(
                os.path.join(self.plots_dir, f"attr_interp_d{dim}_{i}.mid")
            )

    # -- scatter / surface plots (reference vae_tester.py:255-369) -------------

    def plot_data_attr_dist(self, dim1: int = 0, dim2: int = 1):
        _, _, gen_test = self.dataset.data_loaders(
            batch_size=16, split=(0.7, 0.15)
        )
        # the latents are deterministic given the per-batch fold-in keys,
        # so one encoder harvest serves all three attribute colorings
        z_all, _, scores = self._encode_batches(gen_test, None, sample=True,
                                                return_scores=True)
        for reg_type in ("rhy_complexity", "num_notes", "note_range"):
            attr_all = np.concatenate(
                [self._attr(s, reg_type) for s in scores], 0
            )
            fp = os.path.join(
                self.plots_dir,
                f"data_dist_{reg_type}_[{dim1},{dim2}].png",
            )
            self.plot_dim(z_all, attr_all, fp, dim1=dim1, dim2=dim2,
                          xlim=6, ylim=6)

    def plot_attribute_surface(self, dim1=0, dim2=1, grid_res=0.5):
        x = np.arange(-5.0, 5.0, grid_res)
        z1, z2 = np.meshgrid(x, x, indexing="ij")
        num_points = z1.size
        rng = np.random.RandomState(0)
        z = np.repeat(rng.randn(1, self.z_dim).astype(np.float32),
                      num_points, 0)
        z[:, dim1] = z1.reshape(-1)
        z[:, dim2] = z2.reshape(-1)
        mini = 500
        # ceil division: flooring would silently drop up to mini-1 grid
        # points (a whole band of the surface) from every plot
        num_mini = max(-(-num_points // mini), 1)
        results = {"note_density": [], "note_range": [], "rhy_complexity": []}
        for i in range(num_mini):
            zb = z[i * mini : (i + 1) * mini]
            if len(zb) == 0:
                break
            _, samples = self.trainer.decode_latent_codes(zb)
            samples = samples.reshape(zb.shape[0], -1)
            results["note_density"].append(
                self.dataset.get_note_density_in_measure(samples))
            results["note_range"].append(
                self.dataset.get_pitch_range_in_measure(samples))
            results["rhy_complexity"].append(
                self.dataset.get_rhy_complexity(samples))
        for name, vals in results.items():
            fp = os.path.join(
                self.plots_dir, f"attr_surf_{name}_[{dim1},{dim2}].png"
            )
            self.plot_dim(z, np.concatenate(vals, 0), fp, dim1=dim1, dim2=dim2)

    def plot_attribute_dist(self, attribute="num_notes", plt_type="pca"):
        """PCA/t-SNE latent projection colored by an attribute
        (reference vae_tester.py:371-434), with the reference's START/END
        sentinel coloring."""
        _, _, gen_test = self.dataset.data_loaders(
            batch_size=64, split=(0.01, 0.01)
        )
        state = self.trainer.ensure_state()
        fwd = self.trainer._forward_fn()
        z_all, n_all = [], []
        start_idx = self.dataset.note2index_dicts[START_SYMBOL]
        end_idx = self.dataset.note2index_dicts[END_SYMBOL]
        for sample_id, batch in enumerate(gen_test):
            score, _ = self.trainer.process_batch(batch)
            out = fwd(state.params, jnp.asarray(score),
                      jax.random.fold_in(jax.random.key(3), sample_id))
            z_all.append(np.asarray(out.z_mean))
            attr = self._attr(score, attribute).copy()
            attr[score[:, 0] == start_idx] = -0.1
            attr[score[:, 0] == end_idx] = -0.2
            n_all.append(attr)
            if sample_id >= 5:
                break
        z_all = np.concatenate(z_all, 0)
        n_all = np.concatenate(n_all, 0)
        fp = os.path.join(self.plots_dir,
                          f"{plt_type}_{attribute}_measure_vae.png")
        if plt_type == "pca":
            self.plot_pca(z_all, n_all, fp)
        elif plt_type == "tsne":
            self.plot_tsne(z_all, n_all, fp)
        elif plt_type == "dim":
            self.plot_dim(z_all, n_all, fp)
        else:
            raise ValueError("Invalid plot type")

    def plot_transposition_points(self, plt_type="pca"):
        """Latent clusters of one tune's transpositions
        (reference vae_tester.py:436-475)."""
        tunes = self.dataset._corpus_tunes()
        tune = tunes[self._rng.randint(0, len(tunes) - 1)]
        state = self.trainer.ensure_state()
        fwd = self.trainer._forward_fn()
        z_all, n_all = [], []
        for shift in self.dataset._transposition_shifts(tune):
            tokens = self.dataset._tokens(tune, shift)[None, :]
            bars = self.dataset.split_tensor_to_bars(tokens)
            out = fwd(state.params, jnp.asarray(bars, jnp.int32),
                      jax.random.key(4))
            z_all.append(np.asarray(out.z_mean))
            n_all.append(np.arange(bars.shape[0]))
        z_all = np.concatenate(z_all, 0)
        n_all = np.concatenate(n_all, 0)
        fp = os.path.join(self.plots_dir,
                          f"{plt_type}_transposition_measure_vae.png")
        if plt_type == "pca":
            self.plot_pca(z_all, n_all, fp)
        else:
            self.plot_tsne(z_all, n_all, fp)

    # -- static plot helpers (reference vae_tester.py:477-533) -----------------

    @staticmethod
    def plot_pca(data, target, filename):
        pca = PCA(n_components=2, whiten=False)
        pca_z = pca.fit_transform(data)
        plt.scatter(pca_z[:, 0], pca_z[:, 1], c=target, cmap="viridis",
                    alpha=0.3)
        plt.colorbar()
        plt.savefig(filename, format="png", dpi=150)
        plt.close()

    @staticmethod
    def plot_tsne(data, target, filename):
        perplexity = min(40, max(2, len(data) // 4))
        tsne = TSNE(n_components=2, perplexity=perplexity)
        tsne_z = tsne.fit_transform(data)
        plt.scatter(tsne_z[:, 0], tsne_z[:, 1], c=target, cmap="viridis",
                    alpha=0.3)
        plt.colorbar()
        plt.savefig(filename, format="png", dpi=150)
        plt.close()

    @staticmethod
    def plot_dim(data, target, filename, dim1=0, dim2=1, xlim=None, ylim=None):
        # one scatter helper for the whole codebase — a styling fix in
        # utils.plotting must reach the tester's figures too
        from arvae_tpu.utils.plotting import plot_dim as _plot_dim

        _plot_dim(data, target, filename, dim1=dim1, dim2=dim2,
                  xlim=xlim, ylim=ylim)
        print("saved: " + filename)


class VAETesterGLSR(VAETester):
    """GLSR-model variant (reference vae_tester_glsr.py:5-25).

    The reference subclass rewires the analysis onto the GLSR run: it
    appends 'GLSR' to the trainer config (selecting the GLSR run dir)
    and loads that checkpoint. Here the same wiring builds a
    ``MeasureVAETrainerGLSR`` around the dataset/model — whose
    ``model_repr`` carries the 'GLSR' suffix — and restores its
    checkpoint before analysis.
    """

    def __init__(
        self,
        dataset,
        model,
        reg_type: str = "rhy_complexity",
        reg_dim: int = 0,
        gamma: float = 1.0,
        rand: int = 0,
        plots_dir: Optional[str] = None,
        load: bool = True,
    ):
        from arvae_tpu.training.glsr_trainer import MeasureVAETrainerGLSR

        # gamma selects the run dir (the trainer_config string carries
        # g_<gamma>); the blessed non-degenerate GLSR run uses a gamma
        # scaled so the N(100,1) prior term is commensurate with recon
        # CE — see scripts/glsr_gamma_sweep.py and RESULTS.md
        trainer = MeasureVAETrainerGLSR(
            dataset, model, reg_type=reg_type, reg_dim=reg_dim,
            gamma=gamma, rand=rand,
        )
        assert trainer.model_repr().endswith("GLSR")
        if load:
            trainer.load_model()
        super().__init__(trainer, plots_dir=plots_dir)
