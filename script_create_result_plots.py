"""Paper-figure generation (reference ``script_create_result_plots.py``):
loads cached ``results_dict.json`` for β-VAE vs AR-VAE on all four
datasets × seeds and produces the digit-prediction, reconstruction,
per-metric box plots and the pair plot."""

import os

import click
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

from arvae_tpu.data.bar_dataset import ChoraleNBarDataset, FolkNBarDataset
from arvae_tpu.data.dsprites import DspritesDataset
from arvae_tpu.data.mnist import MorphoMnistDataset
from arvae_tpu.eval import EVAL_METRIC_DICT
from arvae_tpu.models import DspritesVAE, MnistVAE
from arvae_tpu.models.measure_vae import MeasureVAE
from arvae_tpu.training.image_trainer import (
    DSPRITES_REG_TYPE,
    MNIST_REG_TYPES,
    ImageVAETrainer,
    get_reg_dim,
)
from arvae_tpu.data.attributes import MUSIC_REG_TYPE
from arvae_tpu.training.measure_trainer import MeasureVAETrainer
from arvae_tpu.utils.plotting import create_box_plot, create_pair_plot

PLOTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plots")


def build_dataset_dict(short: bool):
    music_kwargs = dict(dataset_type="train", is_short=short, num_bars=1)
    mnist_ds = MorphoMnistDataset()
    dsprites_factor = (1, 3, 3, 10, 16, 16) if short else (1, 3, 6, 40, 32, 32)
    dsprites_ds = DspritesDataset(factor_sizes=dsprites_factor)
    bach_ds = ChoraleNBarDataset(**music_kwargs)
    folk_ds = FolkNBarDataset(**music_kwargs)

    def music_model(ds):
        ds.get_dataset()  # finalize any vocab growth before sizing
        return MeasureVAE(
            num_notes=len(ds.note2index_dicts),
            note_embedding_dim=10,
            num_encoder_layers=2,
            encoder_hidden_size=128,
            encoder_dropout_prob=0.5,
            latent_space_dim=32,
            num_decoder_layers=2,
            decoder_hidden_size=128,
            decoder_dropout_prob=0.5,
        )

    def image_variants(beta_vae_beta=4.0):
        return {
            r"$\beta$-VAE": dict(metric_dlist=[], reg_type=(), reg_dim=(),
                                 beta=beta_vae_beta, capacity=0.0, gamma=0.0),
            "AR-VAE": dict(metric_dlist=[], reg_type=("all",), reg_dim=None,
                           beta=1.0, capacity=0.0, gamma=10.0),
        }

    def music_variants():
        return {
            r"$\beta$-VAE": dict(metric_dlist=[], reg_type=(), reg_dim=(),
                                 beta=0.001, capacity=0.0, gamma=0.0),
            "AR-VAE": dict(metric_dlist=[], reg_type=("all",),
                           reg_dim=tuple(MUSIC_REG_TYPE.values()),
                           beta=0.001, capacity=0.0, gamma=1.0),
        }

    dd = {
        "dsprites": dict(repr="2-d sprites", attr_dict=DSPRITES_REG_TYPE,
                         dataset=dsprites_ds, model=DspritesVAE(),
                         trainer=ImageVAETrainer,
                         model_dict=image_variants()),
        "mnist": dict(repr="Morpho-MNIST", attr_dict=MNIST_REG_TYPES,
                      dataset=mnist_ds, model=MnistVAE(),
                      trainer=ImageVAETrainer, model_dict=image_variants()),
        "bach": dict(repr="Bach Chorales", attr_dict=MUSIC_REG_TYPE,
                     dataset=bach_ds, model=music_model(bach_ds),
                     trainer=MeasureVAETrainer, model_dict=music_variants()),
        "folk": dict(repr="Folk Music", attr_dict=MUSIC_REG_TYPE,
                     dataset=folk_ds, model=music_model(folk_ds),
                     trainer=MeasureVAETrainer, model_dict=music_variants()),
    }
    for d in ("dsprites", "mnist"):
        dd[d]["model_dict"]["AR-VAE"]["reg_dim"] = get_reg_dim(
            dd[d]["attr_dict"]
        )
    return dd


@click.command()
@click.option("--seeds", default=10, help="number of seeds to collect")
@click.option("--short/--full", default=False)
def main(seeds, short):
    dataset_dict = build_dataset_dict(short)
    os.makedirs(PLOTS_DIR, exist_ok=True)

    for d in dataset_dict.keys():
        for m, cfg in dataset_dict[d]["model_dict"].items():
            for r in range(seeds):
                trainer = dataset_dict[d]["trainer"](
                    dataset=dataset_dict[d]["dataset"],
                    model=dataset_dict[d]["model"],
                    lr=1e-4,
                    reg_type=cfg["reg_type"],
                    reg_dim=cfg["reg_dim"],
                    beta=cfg["beta"],
                    capacity=cfg["capacity"],
                    gamma=cfg["gamma"],
                    rand=r,
                )
                results_fp = os.path.join(trainer.run_dir, "results_dict.json")
                if not os.path.exists(results_fp):
                    print(f"skip {d}/{m}/seed{r}: no cached results at "
                          f"{results_fp}")
                    continue
                trainer.writer = None
                cfg["metric_dlist"].append(trainer.compute_eval_metrics())

    # Digit-prediction plot (mnist only; anchor 96.15% per reference :212-213)
    digit_pred_crit = {"recons": "Reconstructed", "interp": "Interpolated"}
    rows = []
    for k, crit in digit_pred_crit.items():
        for m, cfg in dataset_dict["mnist"]["model_dict"].items():
            for r in cfg["metric_dlist"]:
                if "digit_pred_acc" in r:
                    rows.append((r["digit_pred_acc"][k] * 100, crit, m))
    if rows:
        df = pd.DataFrame(rows, columns=["Accuracy (in %)", "Criteria",
                                         "Model"])
        save_path = os.path.join(PLOTS_DIR, "digit_pred_acc.pdf")
        create_box_plot(df, "Criteria", "Accuracy (in %)", "Model", save_path,
                        anchor=(0.5, 96.15))

    # Reconstruction accuracy box plot
    rows = []
    for d in dataset_dict.keys():
        for m, cfg in dataset_dict[d]["model_dict"].items():
            for r in cfg["metric_dlist"]:
                rows.append((r["test_acc"] * 100, dataset_dict[d]["repr"], m))
    if rows:
        df = pd.DataFrame(
            rows, columns=["Reconstruction Accuracy (in %)", "Datasets",
                           "Model"]
        )
        create_box_plot(df, "Datasets", "Reconstruction Accuracy (in %)",
                        "Model", os.path.join(PLOTS_DIR, "reconstruction.pdf"))

    # Per-metric box plots
    for k in EVAL_METRIC_DICT.keys():
        rows = []
        for d in dataset_dict.keys():
            for m, cfg in dataset_dict[d]["model_dict"].items():
                for r in cfg["metric_dlist"]:
                    v = r[k]["mean"][1] if k == "interpretability" else r[k]
                    rows.append((v, dataset_dict[d]["repr"], m))
        if rows:
            df = pd.DataFrame(rows, columns=[EVAL_METRIC_DICT[k], "Datasets",
                                             "Model"])
            create_box_plot(
                df, "Datasets", EVAL_METRIC_DICT[k], "Model",
                os.path.join(PLOTS_DIR,
                             f"evaluation_{EVAL_METRIC_DICT[k]}.pdf"),
            )

    # Pair plot
    rows = []
    for d in dataset_dict.keys():
        for m, cfg in dataset_dict[d]["model_dict"].items():
            for r in cfg["metric_dlist"]:
                vals = [
                    r[k]["mean"][1] if k == "interpretability" else r[k]
                    for k in EVAL_METRIC_DICT.keys()
                ]
                kind = "Music" if d in ("folk", "bach") else "Image"
                rows.append(vals + [f"{m}:{kind}"])
    if rows:
        cols = [EVAL_METRIC_DICT[k] for k in EVAL_METRIC_DICT.keys()] + ["Model"]
        df = pd.DataFrame(rows, columns=cols)
        create_pair_plot(df, "Model", os.path.join(PLOTS_DIR, "pair_plot.pdf"))
    print(f"plots written to {PLOTS_DIR}")


if __name__ == "__main__":
    main()
