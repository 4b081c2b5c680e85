"""Train an image AR-VAE (MNIST / dSprites) — CLI-compatible with the
reference ``train_image_vae.py:12-157``.

Examples:
    python train_image_vae.py -d dsprites --rand 0 -r all --beta 1.0
    python train_image_vae.py -d mnist --num_epochs 100 -r slant -r thickness
"""

import json

import click

from arvae_tpu.core.config import expand_reg_dims
from arvae_tpu.data.dsprites import DspritesDataset
from arvae_tpu.data.mnist import MorphoMnistDataset
from arvae_tpu.models import DspritesVAE, MnistVAE
from arvae_tpu.training.image_trainer import (
    DSPRITES_REG_TYPE,
    MNIST_REG_TYPES,
    ImageVAETrainer,
)


@click.command()
@click.option("--dataset_type", "-d", default="mnist",
              help="dataset to be used, `mnist` or `dsprites`")
@click.option("--batch_size", default=128, help="training batch size")
@click.option("--num_epochs", default=100, help="number of training epochs")
@click.option("--lr", default=1e-4, help="learning rate")
@click.option("--beta", default=4.0, help="parameter for weighting KLD loss")
@click.option("--capacity", default=0.0, help="parameter for beta-VAE capacity")
@click.option("--gamma", default=10.0,
              help="parameter for weighting regularization loss")
@click.option("--delta", default=1.0, help="parameter for controlling the spread")
@click.option("--dec_dist", default="bernoulli",
              help="distribution of the decoder")
@click.option("--train/--test", "do_train", default=True,
              help="train or test the specified model")
@click.option("--log/--no_log", default=False,
              help="log the results for tensorboard")
@click.option("--resume/--no_resume", default=False,
              help="restore the run's checkpoint (params, optimizer "
                   "state, step) before training, continuing the "
                   "trajectory")
@click.option("--rand", default=None,
              help="random seed for the random number generator")
@click.option("--reg_type", "-r", default=None, multiple=True,
              help="attribute name string to be used for regularization")
@click.option("--short/--full", default=False,
              help="use a reduced dSprites factor grid for quick runs")
@click.option("--pallas/--no_pallas", "use_pallas", default=None,
              help="force the fused Pallas reg-loss kernel on/off")
@click.option("--bf16/--f32", "bf16", default=False,
              help="run the conv/dense stacks in bfloat16 (MXU-native; "
                   "params, heads and logits stay float32)")
@click.option("--skip_cached/--no_skip_cached", default=False,
              help="skip seeds whose results_dict.json already carries a "
                   "matching protocol stamp (resume a timeout-cut "
                   "multi-seed protocol run)")
def main(
    dataset_type,
    batch_size,
    num_epochs,
    lr,
    beta,
    capacity,
    gamma,
    delta,
    dec_dist,
    do_train,
    log,
    resume,
    rand,
    reg_type,
    short,
    use_pallas,
    bf16,
    skip_cached,
):
    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32
    if dataset_type == "mnist":
        dataset = MorphoMnistDataset()
        model = MnistVAE(compute_dtype=compute_dtype)
        attr_dict = MNIST_REG_TYPES
    elif dataset_type == "dsprites":
        factor_sizes = (1, 3, 3, 10, 16, 16) if short else (1, 3, 6, 40, 32, 32)
        dataset = DspritesDataset(factor_sizes=factor_sizes)
        model = DspritesVAE(compute_dtype=compute_dtype)
        attr_dict = DSPRITES_REG_TYPE
    else:
        raise ValueError("Invalid dataset_type. Choose between mnist and dsprites")

    # reg-name -> latent-dim expansion (reference train_image_vae.py:73-89),
    # shared with the sweep/plot scripts via core.config.expand_reg_dims
    reg_type = tuple(reg_type or ())
    if len(reg_type) != 0:
        unknown = [r for r in reg_type if r != "all" and r not in attr_dict]
        if unknown or ("all" in reg_type and len(reg_type) != 1):
            raise click.BadParameter(
                f"unknown reg_type {unknown or list(reg_type)}; choose "
                f"from {sorted(attr_dict)} or 'all' (alone)"
            )
        reg_dim = expand_reg_dims(reg_type, attr_dict)
    else:
        reg_dim = (0,)

    seeds = range(0, 10) if rand is None else [int(rand)]
    for r in seeds:
        trainer = ImageVAETrainer(
            dataset=dataset,
            model=model,
            lr=lr,
            reg_type=reg_type,
            reg_dim=reg_dim,
            beta=beta,
            capacity=capacity,
            gamma=gamma,
            delta=delta,
            dec_dist=dec_dist,
            rand=r,
            use_pallas=use_pallas,
        )

        if skip_cached and do_train and trainer.has_protocol_cache(
            num_epochs, batch_size
        ):
            print(f"skip seed {r}: protocol-stamped cache in "
                  f"{trainer.run_dir}")
            continue
        if resume:
            trainer.maybe_resume()
        if do_train:
            trainer.train_model(
                batch_size=batch_size, num_epochs=num_epochs, log=log
            )
        else:
            trainer.load_model()

        trainer.writer = None
        metrics = trainer.compute_eval_metrics(batch_size=batch_size)
        print(json.dumps(metrics, indent=2))

        for sample_id in [0, 1, 4]:
            trainer.create_latent_gifs(sample_id=sample_id)


if __name__ == "__main__":
    main()
