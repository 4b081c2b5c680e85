"""Blessed VAETester analysis sweep on a trained folk model (round-3
item 8) — mirrors the reference's figs/ surface
(``measurevae/vae_tester.py:371-508``).

Loads the cached folk AR-VAE seed-0 checkpoint
(models/folk_MeasureVAE_r_0_b_0.001_g_1.0_d_10.0_all_), runs every
analysis the tester exposes, and writes the artifacts to
``figs/tester_folk/``. With ``--glsr`` it additionally runs the
VAETesterGLSR surface on the blessed GLSR run.

Usage: python scripts/run_tester_sweep.py [--glsr]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arvae_tpu.data.attributes import MUSIC_REG_TYPE  # noqa: E402
from arvae_tpu.data.bar_dataset import FolkNBarDataset  # noqa: E402
from arvae_tpu.models.measure_vae import MeasureVAE  # noqa: E402
from arvae_tpu.training.measure_trainer import MeasureVAETrainer  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_trainer():
    # (the --glsr path does not come through here: VAETesterGLSR wires
    # its own GLSR trainer + checkpoint restore)
    dataset = FolkNBarDataset(dataset_type="train", is_short=True, num_bars=1)
    dataset.get_dataset()  # finalize any vocab growth before sizing
    model = MeasureVAE(
        num_notes=len(dataset.note2index_dicts),
        note_embedding_dim=10,
        num_encoder_layers=2,
        encoder_hidden_size=128,
        latent_space_dim=32,
        num_decoder_layers=2,
        decoder_hidden_size=128,
    )
    return MeasureVAETrainer(
        dataset=dataset, model=model,
        reg_type=("all",), reg_dim=tuple(MUSIC_REG_TYPE.values()),
        beta=0.001, gamma=1.0, delta=10.0, rand=0,
    )


def run_surface(tester, label: str):
    print(f"[{label}] test_model ...", flush=True)
    loss, acc = tester.test_model(batch_size=256)
    print(f"[{label}] test loss {loss:.4f} acc {acc:.4f}", flush=True)

    # the tester's attribute vocabulary mirrors the reference
    # (vae_tester.py:58-111), which differs from the trainer reg names
    for attr in ("rhy_complexity", "num_notes", "note_range",
                 "rhy_entropy", "beat_strength"):
        dim, r2 = tester.test_interpretability(256, attr)
        print(f"[{label}] interpretability {attr}: dim {dim} "
              f"R2 {r2:.3f}", flush=True)

    print(f"[{label}] interpolations ...", flush=True)
    tester.test_interp(n=8)
    for attr, dim in MUSIC_REG_TYPE.items():
        tester.test_attr_reg_interpolations(num_points=8, dim=dim,
                                            num_interps=4)

    print(f"[{label}] latent scatters + surfaces ...", flush=True)
    tester.plot_data_attr_dist(dim1=0, dim2=1)
    tester.plot_attribute_surface(dim1=0, dim2=1, grid_res=1.0)
    for plt_type in ("pca", "tsne"):
        tester.plot_attribute_dist(attribute="num_notes", plt_type=plt_type)
    tester.plot_transposition_points(plt_type="pca")
    print(f"[{label}] artifacts in {tester.plots_dir}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glsr", action="store_true")
    args = ap.parse_args()

    from arvae_tpu.eval.tester import VAETester, VAETesterGLSR

    if args.glsr:
        # VAETesterGLSR wires its own GLSR trainer + checkpoint restore
        from arvae_tpu.data.bar_dataset import FolkNBarDataset

        dataset = FolkNBarDataset(dataset_type="train", is_short=True,
                                  num_bars=1)
        dataset.get_dataset()  # finalize any vocab growth before sizing
        model = MeasureVAE(
            num_notes=len(dataset.note2index_dicts),
            note_embedding_dim=10, num_encoder_layers=2,
            encoder_hidden_size=128, latent_space_dim=32,
            num_decoder_layers=2, decoder_hidden_size=128,
        )
        out = os.path.join(REPO, "figs", "tester_folk_glsr")
        # gamma=1e-3: the blessed non-degenerate GLSR run (gamma sweep,
        # logs/r4/glsr_sweep.log — best interpretability at 69.6% acc)
        tester = VAETesterGLSR(
            dataset, model, reg_type="rhy_complexity",
            reg_dim=MUSIC_REG_TYPE["rhy_complexity"], gamma=1e-3, rand=0,
            plots_dir=out,
        )
        run_surface(tester, "glsr")
    else:
        trainer = build_trainer()
        trainer.load_model()
        out = os.path.join(REPO, "figs", "tester_folk")
        tester = VAETester(trainer, plots_dir=out)
        run_surface(tester, "ar-vae")


if __name__ == "__main__":
    main()
