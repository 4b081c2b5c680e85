"""γ×δ hyperparameter sweep (reference ``script_hyper_param_exp.py:16-143``):
train (or read cached) AR-VAE runs over the γ×δ grid at β=1.0 and emit
the interpretability-vs-reconstruction scatter."""

import json
import os
import shutil

import click
import numpy as np
import pandas as pd

from arvae_tpu.core.checkpoint import Checkpointer
from arvae_tpu.data.dsprites import DspritesDataset
from arvae_tpu.data.mnist import MorphoMnistDataset
from arvae_tpu.eval import EVAL_METRIC_DICT
from arvae_tpu.models import DspritesVAE, MnistVAE
from arvae_tpu.training.image_trainer import (
    DSPRITES_REG_TYPE,
    MNIST_REG_TYPES,
    ImageVAETrainer,
    get_reg_dim,
)
from arvae_tpu.utils.plotting import create_scatter_plot

GAMMAS = [0.01, 0.1, 1.0, 2.0, 5.0, 10.0, 100.0]
DELTAS = [100.0, 10.0, 1.0, 0.1, 0.01]


@click.command()
@click.option("--dataset_type", "-d", default="mnist")
@click.option("--batch_size", default=128)
@click.option("--num_epochs", default=100)
@click.option("--lr", default=1e-4)
@click.option("--capacity", default=0.0)
@click.option("--dec_dist", default="bernoulli")
@click.option("--train/--test", "do_train", default=True)
@click.option("--log/--no_log", default=False)
@click.option("--short/--full", default=False)
def main(dataset_type, batch_size, num_epochs, lr, capacity, dec_dist,
         do_train, log, short):
    if dataset_type == "mnist":
        dataset = MorphoMnistDataset()
        model = MnistVAE()
        attr_dict = MNIST_REG_TYPES
    elif dataset_type == "dsprites":
        factor_sizes = (1, 3, 3, 10, 16, 16) if short else (1, 3, 6, 40, 32, 32)
        dataset = DspritesDataset(factor_sizes=factor_sizes)
        model = DspritesVAE()
        attr_dict = DSPRITES_REG_TYPE
    else:
        raise ValueError("Invalid dataset_type")

    reg_type = ("all",)
    reg_dim = get_reg_dim(attr_dict)

    results_list = []
    for g in GAMMAS:
        for d in DELTAS:
            trainer = ImageVAETrainer(
                dataset=dataset,
                model=model,
                lr=lr,
                reg_type=reg_type,
                reg_dim=reg_dim,
                beta=1.0,
                capacity=capacity,
                gamma=g,
                delta=d,
                dec_dist=dec_dist,
                rand=0,
            )
            # Fault-isolate each cell: extreme corners of the grid can
            # diverge (the NaN guard raises mid-epoch) or the tunneled
            # transport can die mid-cell — either must cost ONE scatter
            # point, not the remaining grid. (The round-5 restore lost
            # cells 22-35 to an uncaught per-cell failure at
            # gamma=5, delta=100.)
            #
            # Reuse is gated on the protocol stamp, NOT bare checkpoint
            # existence: train_model checkpoints every epoch, so a cell
            # that failed mid-protocol leaves a loadable-but-partial
            # checkpoint behind — a re-run must retrain it, never bless
            # metrics from a 4/100-epoch model. A dir whose training
            # raised is quarantined to <run_dir>.failed for the same
            # reason (Checkpointer.exists() would find it otherwise).
            trained_full = False
            try:
                cached = trainer.has_protocol_cache(num_epochs, batch_size)
                if not cached:
                    if not do_train:
                        print(f"skip gamma={g} delta={d} (no finished cell)")
                        continue
                    trainer.train_model(batch_size=batch_size,
                                        num_epochs=num_epochs, log=log)
                    trained_full = True  # returned = full protocol ran
                else:
                    trainer.load_model()
                    trained_full = True
                trainer.writer = None
                # one compute per cell; the fresh-train case writes the
                # results cache here and the cached case re-reads it
                r = trainer.compute_eval_metrics(batch_size=batch_size)
            except Exception as e:
                print(f"CELL-FAILED gamma={g} delta={d}: {e!r}"[:500],
                      flush=True)
                if not trained_full and Checkpointer(trainer.run_dir).exists():
                    failed_dir = trainer.run_dir.rstrip(os.sep) + ".failed"
                    shutil.rmtree(failed_dir, ignore_errors=True)
                    os.rename(trainer.run_dir, failed_dir)
                    print(f"quarantined partial cell -> {failed_dir}",
                          flush=True)
                continue
            print(json.dumps(r, indent=2))
            row = [g, d]
            for k in EVAL_METRIC_DICT.keys():
                row.append(r[k]["mean"][1] if k == "interpretability" else r[k])
            row.append(r["test_acc"] * 100)
            results_list.append(row)

    if not results_list:
        print("no cached results for any (gamma, delta) cell - "
              "run without --test first")
        return
    columns = ["$\\gamma$", "$\\delta$"]
    columns += [EVAL_METRIC_DICT[k] for k in EVAL_METRIC_DICT.keys()]
    columns.append("Reconstruction Accuracy (in %)")
    df = pd.DataFrame(columns=columns, data=np.asarray(results_list))
    save_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plots", "hyper_param.pdf"
    )
    create_scatter_plot(
        df,
        x_axis="Interpretability",
        y_axis="Reconstruction Accuracy (in %)",
        grouping="$\\gamma$",
        save_path=save_path,
    )
    print(f"saved {save_path} ({len(df)} runs)")


if __name__ == "__main__":
    main()
