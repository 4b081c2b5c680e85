"""Train a fader-network baseline — CLI-compatible with the reference
``train_image_fader.py:12-78`` (plus --rand/--short conveniences).

Example:
    python train_image_fader.py -d dsprites --short --num_epochs 5
"""

import json

import click

from arvae_tpu.data.dsprites import DspritesDataset
from arvae_tpu.data.mnist import MorphoMnistDataset
from arvae_tpu.models import (
    DspritesFaderNetwork,
    ImageFaderDiscriminator,
    MnistFaderNetwork,
)
from arvae_tpu.training.fader_trainer import ImageFaderTrainer


@click.command()
@click.option("--dataset_type", "-d", default="mnist",
              help="dataset to be used, `mnist` or `dsprites`")
@click.option("--batch_size", default=128, help="training batch size")
@click.option("--num_epochs", default=100, help="number of training epochs")
@click.option("--lr", default=1e-4, help="learning rate")
@click.option("--beta", default=4.0,
              help="weight of the adversarial (discriminator) loss")
@click.option("--train/--test", "do_train", default=True,
              help="train or test the specified model")
@click.option("--log/--no_log", default=False,
              help="log the results for tensorboard")
@click.option("--resume/--no_resume", default=False,
              help="restore the run's checkpoint (params, optimizer "
                   "state, step) before training, continuing the "
                   "trajectory")
@click.option("--rand", default=0, help="random seed")
@click.option("--short/--full", default=False,
              help="use a reduced dSprites factor grid for quick runs")
def main(dataset_type, batch_size, num_epochs, lr, beta, do_train, log,
         resume, rand, short):
    if dataset_type == "mnist":
        dataset = MorphoMnistDataset()
        model = MnistFaderNetwork()
    elif dataset_type == "dsprites":
        factor_sizes = (1, 3, 3, 10, 16, 16) if short else (1, 3, 6, 40, 32, 32)
        dataset = DspritesDataset(factor_sizes=factor_sizes)
        model = DspritesFaderNetwork()
    else:
        raise ValueError("Invalid dataset_type. Choose between mnist and dsprites")
    disc_model = ImageFaderDiscriminator(num_attributes=model.num_attributes)

    trainer = ImageFaderTrainer(
        dataset=dataset,
        fader_model=model,
        disc_model=disc_model,
        lr=lr,
        beta=beta,
        rand=int(rand),
    )

    if resume:
        trainer.maybe_resume()
    if do_train:
        trainer.train_model(batch_size=batch_size, num_epochs=num_epochs,
                            log=log)
    else:
        trainer.load_model()

    trainer.writer = None
    metrics = trainer.compute_eval_metrics(batch_size=batch_size)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
